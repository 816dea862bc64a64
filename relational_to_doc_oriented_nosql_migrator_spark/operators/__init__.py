"""Operator inventory (SURVEY §2) as (spark, sf_dir) -> DataFrame builders.

Every module exposes:
  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLES: dict[str, str]   # DuckDB ANSI-SQL equivalents (omitted for
                            # non-SQL-expressible ops -> rows-only check)
"""

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    planops,
    relational,
    similarity,
    temporal,
    text,
    windows,
    workload_ops,
)
from relational_to_doc_oriented_nosql_migrator_spark import streaming

MODULES = (relational, workload_ops, windows, text, dedup, similarity,
           streaming, multimodal, temporal, planops, pipeline)


def all_queries():
    out = {}
    for m in MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in MODULES:
        out.update(m.ORACLES)
    return out
