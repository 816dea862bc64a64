"""Scale-up generator: row counts multiply, key spaces stay disjoint, and
document copies are shingle-disjoint (near-dup structure replicates
linearly instead of creating cross-copy identical twins)."""

import importlib.util
import os

from pyspark.sql import functions as F


def _gen_mod():
    spec = importlib.util.spec_from_file_location(
        "gen_scale_data",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "gen_scale_data.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_factor2_scale_up(spark, tmp_path):
    from tests.conftest import SF0001

    out = str(tmp_path / "sf_scaled")
    _gen_mod().generate(SF0001, 2, out, spark=spark, verbose=False)

    def n(d, t):
        return spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()

    for t in ("region", "nation"):  # dims fixed
        assert n(out, t) == n(SF0001, t)
    for t in ("customer", "orders", "lineitem", "documents", "events",
              "embeddings"):
        assert n(out, t) == 2 * n(SF0001, t)

    # key spaces disjoint -> scaled key count is exactly 2x distinct
    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    assert docs.select("doc_id").distinct().count() == docs.count()

    # copy-1 docs tokenized with per-copy suffix -> zero shared tokens
    base_docs = spark.read.parquet(
        os.path.join(SF0001, "documents.parquet")
    ).count()
    # doc_id starts at 0, so copy-1 ids are exactly [base_docs, 2*base_docs)
    copy1 = docs.filter(F.col("doc_id") >= base_docs)
    assert copy1.filter(~F.col("text").rlike("_1( |$)")).count() == 0

    # FK integrity per copy: every scaled lineitem orderkey exists
    li = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(out, "orders.parquet"))
    dangling = li.join(od, li.l_orderkey == od.o_orderkey, "left_anti")
    assert dangling.count() == 0
