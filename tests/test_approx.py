"""Approximate aggregates: no SQL oracle (sketches are engine-specific),
so correctness is an explicit error bound against the exact answer."""

from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t
from relational_to_doc_oriented_nosql_migrator_spark.operators.windows import (
    approx_distinct_df,
    q_ext_approx_distinct,
)
from tests.conftest import SF001


def test_approx_distinct_within_error_bound(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_df(spark, SF001).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in t(spark, SF001, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        # HLL++ default rsd is 5%; allow 3 sigma.
        assert abs(approx[et] - n) <= max(1, 0.15 * n), (et, approx[et], n)


def test_approx_distinct_registered_query_flags_all_within_bound(spark):
    rows = q_ext_approx_distinct(spark, SF001).collect()
    assert rows and all(r["within_bound"] for r in rows)


def test_percentile_approx_within_error_bound(spark):
    """percentile_approx (the 100 TB sketch path promised by the
    ext_percentiles docstring) must track the exact interpolating
    percentile within the sketch's accuracy budget."""
    li = t(spark, SF001, "lineitem")
    exact = {
        r["l_returnflag"]: r["p50"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["a50"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile_approx(l_extendedprice, 0.5, 1000)"
            ).alias("a50")
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for flag, p in exact.items():
        assert abs(approx[flag] - p) <= 0.02 * abs(p), (flag, approx[flag], p)
