"""Workload analyzer — query log -> per-table GAF/UAF stats + MAF threshold.

Reference pipeline (server/LogManager.js:4-100): tokenize the raw log with a
dialect regex, keep Query/statement entries whose normalized body starts with
select|insert|update|delete|create, SQL-parse each into distinct table refs
'{op}::{db}::{table}', then for each select/insert/update/delete ref add the
table's row count to its gaf (and to uaf for writes); finally
maf = 0.0125 * sum(gaf) (server/models/RelationalDatabase.js:17-24).

Spark-first: the whole pipeline is DataFrame ops (regexp tokenize -> filter
-> pandas-UDF table-ref extraction -> explode -> groupBy), so a 100 TB query
log would distribute; only the final per-table stats (metadata-scale) are
collected to update the driver-side catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.functions.scalar import (
    whitespace_normalize,
)
from relational_to_doc_oriented_nosql_migrator_spark.functions.sqlparse import (
    sql_tablelist_udf,
)
from relational_to_doc_oriented_nosql_migrator_spark.plans.catalog import Catalog

# Entry anchors (reference server/LogManager.js:15-16,36-37). We anchor on
# the line-start timestamp of each entry; bodies may span lines.
MYSQL_ENTRY_SPLIT = r"(?m)(?=^\d{6}\s+\d{1,2}:\d{2}:\d{2}\s)"
MYSQL_ENTRY_RE = (
    r"(?s)^\d{6}\s+\d{1,2}:\d{2}:\d{2}\s+\d+\s+"
    r"(Connect|Quit|Query|Init DB|Sleep|Shutdown|Create DB|Drop DB|Refresh|"
    r"Statistics|Processlist|Kill|Change user|Binlog Dump|Table Dump|"
    r"Field List|Execute|Prepare|Close stmt|Reset stmt|Fetch|Daemon)\s+(.*)$"
)
PG_ENTRY_SPLIT = r"(?m)(?=^\d{4}-\d{2}-\d{2}\s+\d{2}:\d{2}:\d{2}\.\d{3}\s)"
PG_ENTRY_RE = (
    r"(?s)^\d{4}-\d{2}-\d{2}\s+\d{2}:\d{2}:\d{2}\.\d{3}\s*\+\d{2}\s*\[\d+\]\s*"
    r"(?:LOG:\s*statement:|STATEMENT:)\s*(.*)$"
)

# `filter_statement_type` (reference server/LogManager.js:25,42)
STATEMENT_HEAD_RE = r"^(select|insert|update|delete|create)\b"
# `filter_dml_type` (reference server/LogManager.js:85-91)
DML_OPS = ("select", "insert", "update", "delete")


def statements_df(log_df: DataFrame, dialect: str = "mysql") -> DataFrame:
    """Wholetext log -> one row per kept, whitespace-normalized statement.

    Implements `fn_regex_log_extract_{mysql,pg}` + `fn_whitespace_normalize`
    + `filter_statement_type`.
    """
    if dialect == "mysql":
        split_re, entry_re, body_group = MYSQL_ENTRY_SPLIT, MYSQL_ENTRY_RE, 2
    elif dialect in ("postgresql", "pg"):
        split_re, entry_re, body_group = PG_ENTRY_SPLIT, PG_ENTRY_RE, 1
    else:
        raise ValueError(f"unknown dialect: {dialect}")

    entries = log_df.select(
        F.explode(F.split(F.col("value"), split_re)).alias("entry")
    )
    if dialect == "mysql":
        entries = entries.select(
            F.regexp_extract("entry", entry_re, 1).alias("command"),
            F.regexp_extract("entry", entry_re, body_group).alias("body"),
        ).filter(F.col("command") == "Query")
    else:
        entries = entries.select(
            F.regexp_extract("entry", entry_re, body_group).alias("body")
        )
    return (
        entries.select(whitespace_normalize(F.col("body")).alias("stmt"))
        .filter(F.lower(F.col("stmt")).rlike(STATEMENT_HEAD_RE))
    )


def tablelist_df(stmts: DataFrame, dialect: str = "mysql") -> DataFrame:
    """`fn_sql_tablelist`: statements -> exploded '{op}::{db}::{table}'
    ref strings (the raw parser output, reference server/LogManager.js:67)."""
    return stmts.select(
        F.explode(sql_tablelist_udf(dialect)(F.col("stmt"))).alias("ref")
    )


def split_tableref_df(refs: DataFrame) -> DataFrame:
    """`fn_split_tableref`: '{op}::{db}::{table}' -> (op, db, table_name)
    columns (reference server/LogManager.js:79-82)."""
    parts = F.split(F.col("ref"), "::")
    return refs.select(
        parts.getItem(0).alias("op"),
        parts.getItem(1).alias("db"),
        parts.getItem(2).alias("table_name"),
    )


def table_refs_df(stmts: DataFrame, dialect: str = "mysql") -> DataFrame:
    """Statements -> exploded (op, db, table) refs, DML only
    (`fn_sql_tablelist` -> `fn_split_tableref` -> `filter_dml_type`)."""
    return split_tableref_df(tablelist_df(stmts, dialect)).filter(
        F.col("op").isin(*DML_OPS)
    )


def workload_stats(refs: DataFrame, row_counts: DataFrame) -> DataFrame:
    """`agg_workload_gaf_uaf`: per-table row-count-weighted access stats.

    row_counts: DataFrame(table_name, num_rows). Tables absent from the
    catalog are dropped (reference skips unknown tables,
    server/LogManager.js:91-97); gaf/uaf are LONG row-count sums.
    """
    counted = refs.groupBy("table_name").agg(
        F.count(F.lit(1)).alias("accesses"),
        F.count(F.when(F.col("op") != "select", F.lit(1))).alias("writes"),
    )
    return (
        counted.join(F.broadcast(row_counts), "table_name", "inner")
        .select(
            "table_name",
            (F.col("accesses") * F.col("num_rows")).cast("long").alias("gaf"),
            (F.col("writes") * F.col("num_rows")).cast("long").alias("uaf"),
        )
    )


def maf_of(stats: DataFrame) -> float:
    """`agg_maf_scalar`: maf = 0.0125 * sum(gaf)."""
    row = stats.agg((F.sum("gaf") * F.lit(0.0125)).alias("maf")).first()
    return float(row["maf"] or 0.0)


def apply_workload(
    spark: SparkSession, catalog: Catalog, log_content: str, dialect: str = "mysql"
) -> None:
    """Run the full pipeline and fold the stats into the catalog."""
    log_df = spark.createDataFrame([(log_content,)], "value string")
    stmts = statements_df(log_df, dialect)
    refs = table_refs_df(stmts, dialect)
    row_counts = spark.createDataFrame(
        [(t.name, t.num_rows) for t in catalog.tables.values()],
        "table_name string, num_rows long",
    )
    for row in workload_stats(refs, row_counts).collect():
        table = catalog.get_table(row["table_name"])
        if table is not None:
            table.gaf = int(row["gaf"])
            table.uaf = int(row["uaf"])
