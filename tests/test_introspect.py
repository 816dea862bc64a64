"""INFORMATION_SCHEMA introspection -> Catalog + join_meta_* meta frames,
exercised over fixture DataFrames shaped exactly like the reference's
catalog queries return (no JDBC driver in this sandbox; the SQL strings
and frame->Catalog logic are the live path)."""

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.plans import northwind_catalog
from relational_to_doc_oriented_nosql_migrator_spark.sources.introspect import (
    MYSQL_META_QUERIES,
    catalog_from_meta_frames,
    meta_columns_df,
    meta_fk_df,
    meta_tables_df,
)


@pytest.fixture(scope="module")
def meta(spark):
    """Fixture INFORMATION_SCHEMA frames for the Northwind schema, built
    FROM the known catalog so the round trip is checkable."""
    nw = northwind_catalog()
    tables = spark.createDataFrame(
        [(t.name,) for t in nw.tables.values()], "table_name string"
    )
    columns = spark.createDataFrame(
        [
            (t.name, i + 1, c, "PRI" if c in t.primary_keys else "")
            for t in nw.tables.values()
            for i, c in enumerate(t.columns)
        ],
        "table_name string, ordinal_position int, column_name string,"
        " column_key string",
    )
    kcu = spark.createDataFrame(
        [
            (t.name, fk.column, f"fk_{t.name}_{fk.column}",
             fk.referenced_table, fk.referenced_column)
            for t in nw.tables.values()
            for fk in t.foreign_keys
        ]
        + [
            (t.name, pk, "PRIMARY", None, None)
            for t in nw.tables.values()
            for pk in t.primary_keys
        ],
        "table_name string, column_name string, constraint_name string,"
        " referenced_table string, referenced_column string",
    )
    return {"tables": tables, "columns": columns, "key_column_usage": kcu}


def test_queries_match_reference_shapes():
    # The verbatim INFORMATION_SCHEMA queries the reference issues
    # (server/MySQLDBManager.js:99-111,152-159,176-226).
    assert "INFORMATION_SCHEMA.TABLES" in MYSQL_META_QUERIES["tables"]
    assert "TABLE_TYPE = 'BASE TABLE'" in MYSQL_META_QUERIES["tables"]
    assert "ORDINAL_POSITION" in MYSQL_META_QUERIES["columns"]
    assert (
        "REFERENCED_TABLE_NAME"
        in MYSQL_META_QUERIES["key_column_usage"]
    )


def test_meta_frames_match_operator_schemas(spark, meta):
    """The frames must have the exact shapes operators/relational.py's
    join_meta_* queries consume."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.relational import (
        _meta_fk_df,
        _meta_tables_df,
        _meta_columns_df,
    )

    assert meta_tables_df(meta).schema == _meta_tables_df(spark).schema
    assert meta_fk_df(meta).schema == _meta_fk_df(spark).schema
    assert meta_columns_df(meta).schema == _meta_columns_df(spark).schema


def test_catalog_round_trips(meta):
    rc = {"orderdetail": 2155, "product": 77}
    got = catalog_from_meta_frames(meta, rc)
    want = northwind_catalog(rc)
    assert set(got.tables) == set(want.tables)
    for name, w in want.tables.items():
        g = got.get_table(name)
        assert g.columns == w.columns, name
        assert g.primary_keys == w.primary_keys, name
        assert sorted(
            (f.column, f.referenced_table, f.referenced_column)
            for f in g.foreign_keys
        ) == sorted(
            (f.column, f.referenced_table, f.referenced_column)
            for f in w.foreign_keys
        ), name
        assert g.num_rows == w.num_rows or name not in rc
        assert g.is_referenced == w.is_referenced, name
        assert g.referencing_tables == w.referencing_tables, name


def test_join_meta_queries_run_on_introspected_frames(spark, meta):
    """The operator-level joins produce the same answers over introspected
    frames as over the fixture frames (here: FK count per table)."""
    from pyspark.sql import functions as F

    tables, fks = meta_tables_df(meta), meta_fk_df(meta)
    counts = {
        r["table_name"]: r["n"]
        for r in tables.join(fks, "table_name", "left")
        .groupBy("table_name")
        .agg(F.count("referenced_table").alias("n"))
        .collect()
    }
    want = {t.name: len(t.foreign_keys)
            for t in northwind_catalog().tables.values()}
    assert counts == want
