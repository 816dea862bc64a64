"""Bucketed co-located joins: same results, zero shuffles."""

import pytest

from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t
from relational_to_doc_oriented_nosql_migrator_spark.sinks.bucketed import (
    join_exchanges,
    write_bucketed,
)
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = t(spark, SF0001, "orders")
    lineitem = t(spark, SF0001, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8,
                   path=str(base / "orders_b"))
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8,
                   path=str(base / "lineitem_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # Disable broadcast so the plan must co-locate via bucketing, not hide
    # the shuffle behind a broadcast of the small test data.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert join_exchanges(
            spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey"
        ) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 << 20))


def test_bucketed_join_matches_plain_join(bucketed):
    spark = bucketed
    plain = (
        t(spark, SF0001, "orders")
        .join(
            t(spark, SF0001, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    via_buckets = (
        spark.table("orders_b")
        .join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert plain == via_buckets > 0
