"""Temporal join operators Spark lacks natively (SURVEY §2.3 notes the
reference has none either; they're standard feature-pipeline primitives and
DuckDB oracles them directly, so both are first-class checked queries).

- `ext_asof_join`: for each purchase, the most recent click at-or-before it
  by the same user. Implemented as the union-then-window pattern: tag both
  sides, sort per user by event time, carry the last click forward with
  last(..., ignorenulls) — one shuffle keyed by user, no inequality join,
  no nested-loop. DuckDB oracle: native ASOF JOIN.
- `ext_range_join`: event pairs within a time band. Implemented as the
  bucketized range join: coarse time-bucket equi-join (each left row joins
  its own and the next bucket) + exact band filter — the scale shape that
  avoids BroadcastNestedLoopJoin entirely.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
    scratch_dir,
    sql_dec_sum,
    t,
)

RANGE_SECONDS = 120  # range-join band width


def _dedup_clicks(ev):
    """One click per (user_id, ts): keep max event_id, so the as-of pick at
    tied timestamps is deterministic on both engines."""
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )


def q_ext_asof_join(spark, sf_dir):
    """Most recent click at-or-before each purchase, per user."""
    ev = t(spark, sf_dir, "events")
    clicks = _dedup_clicks(ev).select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id").alias("purchase_id"),
    )
    # Clicks sort before purchases at equal ts (is_purchase 0 < 1), so an
    # exactly-simultaneous click is eligible — matching ASOF's >= bound.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "user_id",
        "ets",
        "is_purchase",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("prev_click_id"),
        F.last("click_value", ignorenulls=True).over(w)
        .alias("prev_click_value"),
    )
    return merged.filter(F.col("is_purchase") == 1).select(
        "user_id",
        F.col("ets").alias("purchase_ts"),
        "purchase_id",
        "prev_click_id",
        "prev_click_value",
    )


def q_ext_range_join(spark, sf_dir):
    """Click->purchase pairs per user within RANGE_SECONDS, via bucketized
    equi-join (bucket b joins b and b+1; exact band filter after)."""
    ev = t(spark, sf_dir, "events")
    bucket = (F.unix_timestamp(F.col("ts").cast("timestamp"))
              / RANGE_SECONDS).cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        bucket.alias("b"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        bucket.alias("pb"),
    )
    # A purchase within [click_ts, click_ts + RANGE] lives in the click's
    # bucket or the next one.
    expanded = clicks.withColumn(
        "jb", F.explode(F.array(F.col("b"), F.col("b") + 1))
    )
    joined = expanded.join(
        purchases,
        (F.col("jb") == F.col("pb")) & (F.col("user_id") == F.col("p_user")),
    )
    in_band = (
        (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr(f"INTERVAL {RANGE_SECONDS} SECONDS"))
    )
    return joined.filter(in_band).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"
    )


def q_ext_cdc_merge_latest(spark, sf_dir):
    """CDC changelog compaction (SCD type-1 merge): treat the event
    stream as a change log keyed by (user_id, event_type) and emit the
    latest version of every key plus its version count — the compaction
    pass that turns an append-only change stream back into current-state
    (the batch equivalent of a MERGE INTO ... WHEN MATCHED UPDATE).

    Scale shape: ONE map-side-combined hash aggregation keyed by the
    merge key; latest-version selection is max of a (ts, event_id,
    value) struct (lexicographic, deterministic — no window sort over
    the full changelog, no self-join). At 100 TB this is the shape that
    compacts a day's changelog in a single shuffle.
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.max(F.struct("ts", "event_id", "value")).alias("m"),
            F.count(F.lit(1)).alias("n_versions"),
        )
        .select(
            "user_id",
            "event_type",
            F.col("m.ts").alias("last_ts"),
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.value").alias("last_value"),
            "n_versions",
        )
    )


def q_ext_incremental_agg(spark, sf_dir):
    """Incremental aggregate maintenance (materialized-rollup refresh):
    the daily (day, event_type) rollup is maintained as BASE-partial +
    DELTA-partial -> merge, instead of recomputing over the full history
    — the nightly-ETL shape where yesterday's materialized summary
    absorbs today's increment at O(delta + |summary|) cost.

    The partial sums are stored as EXACT decimals (not doubles), so the
    merge is associative and the incremental result is value-identical
    to a full recompute — which is precisely what the DuckDB oracle
    checks (it recomputes from scratch). Base = 90% of events by id hash,
    delta = the rest; the base partial round-trips through parquet to
    make the materialization real.

    Scale shape: two map-side-combined rollups (one over the base scan —
    in production, read back instead of recomputed — one over the small
    delta) + a merge groupBy over two |summary|-sized frames.
    """
    import os

    ev = t(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    is_delta = (F.col("event_id") % 10) == 9

    def partial(df):
        return df.groupBy(day, "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )

    base_dir = os.path.join(
        scratch_dir("sg_incr_agg_"), "base_summary"
    )
    partial(ev.filter(~is_delta)).write.mode("overwrite").parquet(base_dir)
    base = spark.read.parquet(base_dir)
    merged = (
        base.unionByName(partial(ev.filter(is_delta)))
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sv").alias("sv"),
        )
    )
    return merged.select(
        "day", "event_type", "n_events",
        F.col("sv").cast("double").alias("sum_value"),
    )


QUERIES = {
    "ext_asof_join": q_ext_asof_join,
    "ext_range_join": q_ext_range_join,
    "ext_cdc_merge_latest": q_ext_cdc_merge_latest,
    "ext_incremental_agg": q_ext_incremental_agg,
}

ORACLES = {
    "ext_asof_join": """
WITH clicks AS (
  SELECT user_id, ts, event_id, value FROM (
    SELECT user_id, ts, event_id, value,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
),
purchases AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.ts AS purchase_ts, p.event_id AS purchase_id,
       c.event_id AS prev_click_id, c.value AS prev_click_value
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    "ext_range_join": f"""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       c.ts AS click_ts, p.ts AS purchase_ts
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL {RANGE_SECONDS} SECONDS
""",
    # row_number replication of the lexicographic (ts, event_id) max;
    # last_value passes through unmodified parquet doubles, so the hash
    # compare sees identical bits on both engines.
    "ext_cdc_merge_latest": """
SELECT user_id, event_type, ts AS last_ts, event_id AS last_event_id,
       value AS last_value, n_versions
FROM (
  SELECT user_id, event_type, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS r,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
  FROM events
) WHERE r = 1
""",
    # Full recompute — the incremental base+delta merge must equal it.
    "ext_incremental_agg": f"""
SELECT ts::DATE AS day, event_type, COUNT(*) AS n_events,
       {sql_dec_sum('value')} AS sum_value
FROM events GROUP BY 1, 2
""",
}
