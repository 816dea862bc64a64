"""Live-DB schema introspection over JDBC — the reference's
INFORMATION_SCHEMA path (reference server/MySQLDBManager.js:97-127,
176-236; PostgresDBManager.js:130-162 does the same via pg_catalog).

Split in two so the logic is testable without a JDBC driver jar:

- `jdbc_meta_frames` issues the three catalog reads as JDBC pushdown
  subqueries (metadata-scale — single-partition reads are correct here;
  the DATA reads are the partitioned ones, sources/jdbc.py).
- `catalog_from_meta_frames` / `meta_tables_df` / `meta_fk_df` turn those
  frames into the engine's Catalog and into the exact meta-DataFrame
  shapes the `join_meta_*` operators consume (operators/relational.py),
  so a live database plugs into the same planner + query surface as the
  fixture catalogs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.plans.catalog import (
    Catalog,
    ForeignKey,
    TableMeta,
)

# The reference's introspection queries, verbatim shapes
# (server/MySQLDBManager.js:99-111,152-159,176-226). {db} is the schema.
MYSQL_META_QUERIES = {
    "tables": (
        "SELECT TABLE_NAME AS table_name FROM INFORMATION_SCHEMA.TABLES"
        " WHERE TABLE_SCHEMA = '{db}' AND TABLE_TYPE = 'BASE TABLE'"
    ),
    "columns": (
        "SELECT TABLE_NAME AS table_name, ORDINAL_POSITION AS"
        " ordinal_position, COLUMN_NAME AS column_name,"
        " COLUMN_KEY AS column_key"
        " FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_SCHEMA = '{db}'"
    ),
    "key_column_usage": (
        "SELECT TABLE_NAME AS table_name, COLUMN_NAME AS column_name,"
        " CONSTRAINT_NAME AS constraint_name,"
        " REFERENCED_TABLE_NAME AS referenced_table,"
        " REFERENCED_COLUMN_NAME AS referenced_column"
        " FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE"
        " WHERE TABLE_SCHEMA = '{db}'"
    ),
}


def jdbc_meta_frames(
    spark: SparkSession,
    url: str,
    db: str,
    properties: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Read the three INFORMATION_SCHEMA relations over JDBC (each query is
    pushed down as a subquery-aliased dbtable)."""
    out = {}
    for name, sql in MYSQL_META_QUERIES.items():
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", f"({sql.format(db=db)}) AS q")
        )
        for k, v in (properties or {}).items():
            reader = reader.option(k, v)
        out[name] = reader.load()
    return out


def meta_tables_df(meta: dict[str, DataFrame]) -> DataFrame:
    """(table_name) — the frame `join_meta_left`/`fn_case_when_referenced`
    consume (same shape as operators/relational._meta_tables_df)."""
    return meta["tables"].select("table_name")


def meta_fk_df(meta: dict[str, DataFrame]) -> DataFrame:
    """(table_name, column_name, referenced_table, referenced_column) —
    the FK-edge frame the `join_meta_*` operators consume."""
    return (
        meta["key_column_usage"]
        .filter(F.col("referenced_table").isNotNull())
        .select("table_name", "column_name", "referenced_table",
                "referenced_column")
    )


def meta_columns_df(meta: dict[str, DataFrame]) -> DataFrame:
    """(table_name, ordinal_position, column_name) — the ordered-columns
    frame (`agg_group_concat_ordered`)."""
    return meta["columns"].select(
        "table_name", "ordinal_position", "column_name"
    )


def catalog_from_meta_frames(
    meta: dict[str, DataFrame],
    row_counts: dict[str, int] | None = None,
) -> Catalog:
    """INFORMATION_SCHEMA frames -> the engine's Catalog (the structure
    the planner consumes; reference server/DBMigration.js:14-60 builds its
    RelationalDatabase from the same three queries + COUNT(*) per table).

    All three frames are metadata-scale (one row per table/column/FK), so
    collecting them to the driver mirrors where the reference itself is
    driver-bound — the planner is driver-side by design.
    """
    rc = row_counts or {}
    cols_by_table: dict[str, list[tuple[int, str]]] = {}
    pks: dict[str, list[tuple[int, str]]] = {}
    for r in meta["columns"].collect():
        cols_by_table.setdefault(r["table_name"], []).append(
            (r["ordinal_position"], r["column_name"])
        )
        if "column_key" in meta["columns"].columns and r["column_key"] == "PRI":
            pks.setdefault(r["table_name"], []).append(
                (r["ordinal_position"], r["column_name"])
            )
    fks: dict[str, list[ForeignKey]] = {}
    kcu = meta["key_column_usage"]
    for r in kcu.filter(F.col("referenced_table").isNotNull()).collect():
        fks.setdefault(r["table_name"], []).append(
            ForeignKey(r["column_name"], r["referenced_table"],
                       r["referenced_column"])
        )
    # PRIMARY-constraint rows are the PK fallback when COLUMN_KEY is absent
    # (reference getPrimaryKeys, server/MySQLDBManager.js:176-200).
    if not pks:
        for r in kcu.filter(F.col("constraint_name") == "PRIMARY").collect():
            pks.setdefault(r["table_name"], []).append(
                (0, r["column_name"])
            )

    tables = [
        TableMeta(
            name=r["table_name"],
            num_rows=rc.get(r["table_name"], 0),
            columns=[c for _, c in sorted(cols_by_table.get(
                r["table_name"], []))],
            primary_keys=[c for _, c in sorted(pks.get(r["table_name"], []))],
            foreign_keys=fks.get(r["table_name"], []),
        )
        for r in meta["tables"].collect()
    ]
    return Catalog(tables)


def jdbc_catalog(
    spark: SparkSession,
    url: str,
    db: str,
    row_counts: dict[str, int] | None = None,
    properties: dict[str, str] | None = None,
) -> Catalog:
    """End-to-end: live INFORMATION_SCHEMA -> Catalog (needs a JDBC driver
    jar on the classpath; the frame->Catalog logic above is what the
    fixture-backed tests exercise in a driverless sandbox)."""
    return catalog_from_meta_frames(
        jdbc_meta_frames(spark, url, db, properties), row_counts
    )
