"""common.global_row_number / exact_ntile vs Spark's native global
window — the distributed exact-rank construction must agree with the
single-partition reference bit-for-bit on every frame shape: ties in the
leading sort column (broken by the unique tiebreak), totals below the
bucket count, a single row, skewed value distributions, and totals not
divisible by the bucket count."""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
    exact_ntile,
    global_row_number,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id long, score double")


def _reference(df, n_buckets):
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return {
        r["id"]: (r["rnk"], r["tile"])
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rnk"),
            F.ntile(n_buckets).over(w).alias("tile"),
        ).collect()
    }


def _distributed(df, n_buckets):
    ranked = global_row_number(
        df, [F.desc("score"), F.asc("id")], out="rnk", total_out="n"
    )
    return {
        r["id"]: (r["rnk"], r["tile"])
        for r in ranked.select(
            "id",
            "rnk",
            exact_ntile(F.col("rnk"), F.col("n"), n_buckets).alias("tile"),
        ).collect()
    }


def test_matches_native_window_across_shapes(spark):
    rng = random.Random(7)
    shapes = [
        # (n_rows, n_distinct_scores, n_buckets)
        (1, 1, 3),      # single row
        (2, 1, 3),      # total < buckets, all scores tied
        (7, 3, 3),      # ties + non-divisible total
        (10, 10, 10),   # total == buckets
        (97, 5, 3),     # heavy ties, prime total
        (100, 100, 7),  # unique scores, non-divisible
    ]
    for n_rows, n_scores, n_buckets in shapes:
        rows = [
            (i, float(rng.randrange(n_scores)))
            for i in rng.sample(range(10 * n_rows), n_rows)
        ]
        df = _frame(spark, rows)
        assert _distributed(df, n_buckets) == _reference(df, n_buckets), (
            n_rows, n_scores, n_buckets,
        )


def test_skewed_single_score(spark):
    # Every row identical in the sort key except the tiebreak: all rows
    # land in ONE range partition; ranks must still be a permutation of
    # 1..n and ntile sizes must follow the SQL fill rule.
    df = _frame(spark, [(i, 1.0) for i in range(50)])
    got = _distributed(df, 4)
    assert sorted(r for r, _ in got.values()) == list(range(1, 51))
    sizes = {}
    for _, tile in got.values():
        sizes[tile] = sizes.get(tile, 0) + 1
    # 50 = 2 buckets of 13 + 2 of 12.
    assert sizes == {1: 13, 2: 13, 3: 12, 4: 12}
    assert got == _reference(df, 4)


def test_rank_and_counts_read_materialized_pid(spark):
    """global_row_number is only correct if the rank branch and the
    counts branch observe IDENTICAL range-partition boundaries. The
    lazy two-branch construction relied on ReuseExchange deduplicating
    the repartitionByRange shuffle — which silently failed on the
    perplexity-bucket plan (column pruning de-canonicalized the second
    exchange; two range exchanges executed, sampling boundaries
    independently). _pid is now FROZEN AS DATA via a scratch-parquet
    materialization (r05 ADVICE), so the returned plans of both
    registered consumers must contain NO range exchange at all: the
    range shuffle happens once, inside the eager staging write."""
    import re

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for qid in ("ext_window_ntile", "ext_text_perplexity_bucket"):
        df = qs[qid](spark, "/root/testdata/sf0.001")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert not re.search(r"Exchange rangepartitioning", final), (
            f"{qid}: a range exchange survives in the query plan — "
            "boundary consistency is back to depending on ReuseExchange"
        )


def test_staging_write_memoized_per_plan(spark):
    """Building the SAME ranked plan twice in one process must reuse the
    first staging write (r06 ADVICE: plan lints / registry enumeration
    re-build queries without executing them, and each build used to run
    a corpus-scale staging job and hold one scratch copy until process
    exit). Keyed on the staged plan's semanticHash; cleanup_scratch()
    invalidates (entries point into the removed dirs)."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import common as C

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 7 % 13).alias("score")
    )
    before = len(C._SCRATCH_DIRS)
    r1 = global_row_number(df, [F.col("score"), F.col("id")])
    n1 = len(C._SCRATCH_DIRS)
    r2 = global_row_number(df, [F.col("score"), F.col("id")])
    assert len(C._SCRATCH_DIRS) == n1 > before
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))
    # a DIFFERENT order key is a different plan -> its own staging dir
    global_row_number(df, [F.col("id")])
    assert len(C._SCRATCH_DIRS) == n1 + 1


def test_hash_collision_degrades_to_miss(spark, monkeypatch):
    """semanticHash is a 32-bit Java hashCode — two distinct plans can
    collide on the memo key (r07 ADVICE). Force a collision by pinning
    the hash constant: the sameSemantics re-verification must give each
    plan its own staging dir and correct ranks, never serve the other
    plan's staged data."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import common as C

    df = spark.range(50).select(
        F.col("id"), (F.col("id") * 7 % 13).alias("score")
    )
    # Patch the CONCRETE class (Spark 4's classic DataFrame overrides
    # the pyspark.sql.DataFrame base — patching the base is a no-op).
    monkeypatch.setattr(type(df), "semanticHash", lambda self: 42)
    r_by_score = global_row_number(df, [F.col("score"), F.col("id")])
    n1 = len(C._SCRATCH_DIRS)
    r_by_id = global_row_number(df, [F.col("id")])
    assert len(C._SCRATCH_DIRS) == n1 + 1  # collision -> miss, new dir
    # both plans collide onto ONE key, resolved by sameSemantics inside
    colliding = [v for k, v in C._GRNK_STAGE_CACHE.items() if k[0] == 42]
    assert colliding and any(len(v) >= 2 for v in colliding)
    by_score = {row["id"]: row["_grnk"] for row in r_by_score.collect()}
    by_id = {row["id"]: row["_grnk"] for row in r_by_id.collect()}
    assert by_id == {i: i + 1 for i in range(50)}
    assert by_score != by_id
    # rebuilding either plan still HITS its own entry (no thrash)
    n2 = len(C._SCRATCH_DIRS)
    global_row_number(df, [F.col("id")])
    assert len(C._SCRATCH_DIRS) == n2
