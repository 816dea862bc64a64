"""End-to-end migration pipeline (the reference's `migrate`, Spark-first).

Reference lifecycle (server/DBMigration.js:14-182):
  load dump -> introspect schema -> workload stats from query log ->
  convert schema (embed/reference planning) -> materialize nested docs ->
  write JSON collections.

Here: parquet tables + out-of-band FK metadata -> optional query-log
workload -> driver-side planning (plans/planner.py) -> Catalyst-executed
nesting DAG (plans/nesting.py) -> JSON sink (sinks/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from relational_to_doc_oriented_nosql_migrator_spark.plans import (
    Catalog,
    convert_schema,
    materialize,
    tpch_catalog,
)
from relational_to_doc_oriented_nosql_migrator_spark.sources import (
    ALL_TABLES,
    load_tables,
)
from relational_to_doc_oriented_nosql_migrator_spark import workload as workload_mod


def build_testdata_catalog(
    spark: SparkSession, sf_dir: str, tables: dict[str, DataFrame] | None = None
) -> tuple[Catalog, dict[str, DataFrame]]:
    """Catalog for the driver testdata: schemas from parquet footers, row
    counts via `agg_count_star`, FK graph from plans/catalog.py."""
    tables = tables or load_tables(spark, sf_dir, ALL_TABLES)
    columns = {name: df.columns for name, df in tables.items()}
    counts = {name: df.count() for name, df in tables.items()}
    return tpch_catalog(columns, counts), tables


def migrate(
    spark: SparkSession,
    sf_dir: str,
    log_content: str | None = None,
    log_dialect: str = "mysql",
    normalize_dates: bool = True,
) -> dict[str, DataFrame]:
    """Full pipeline: returns {root collection name: nested DataFrame}."""
    catalog, tables = build_testdata_catalog(spark, sf_dir)
    if log_content:
        workload_mod.apply_workload(spark, catalog, log_content, log_dialect)
    plan = convert_schema(catalog)
    return materialize(tables, catalog, plan, normalize_dates=normalize_dates)
