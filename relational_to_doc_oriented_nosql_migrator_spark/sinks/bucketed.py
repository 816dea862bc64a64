"""Bucketed-table sink (SURVEY §7.2 step 7 — co-located joins at scale).

Writing both sides of a recurring big-big join bucketed (and sorted) by
the join key makes every subsequent join between them shuffle-free: each
bucket pairs 1:1 across tables, so Catalyst plans a SortMergeJoin with no
Exchange on either side. At 100 TB this converts the nesting pipeline's
dominant shuffle (children keyed by FK) into a one-time layout cost paid
at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (+sorted) table; `path` makes it external."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def join_exchanges(spark: SparkSession, left: str, right: str,
                   left_key: str, right_key: str) -> int:
    """Number of Exchange operators in the physical plan of
    left ⋈ right on key — 0 when bucketing co-locates both sides."""
    df = spark.table(left).join(
        spark.table(right),
        spark.table(left)[left_key] == spark.table(right)[right_key],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
