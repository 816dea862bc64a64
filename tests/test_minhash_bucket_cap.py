"""MinHash LSH bucket-size cap: oversized band buckets are skipped,
counted, and surfaced — never silently expanded (quadratic) or silently
dropped. The audit travels on the returned DataFrame (`minhash_audit`),
not module state, so concurrent builders can't race."""

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.operators import dedup


def _sh(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, sh array<string>")


def test_mega_cluster_skipped_small_bucket_survives(spark):
    # 6 identical docs (every band bucket size 6 > cap 4) plus one
    # identical pair on a disjoint shingle set (bucket size 2, kept).
    mega = [(f"m{i}", ["s1 a", "s2 b", "s3 c"]) for i in range(6)]
    pair = [("p1", ["t1 x", "t2 y", "t3 z"]),
            ("p2", ["t1 x", "t2 y", "t3 z"])]
    with pytest.warns(UserWarning, match=r"skipped \d+ band bucket"):
        out = dedup.minhash_pairs_from(
            spark, _sh(spark, mega + pair), bucket_cap=4
        )
    assert {(r.doc_a, r.doc_b) for r in out.collect()} == {("p1", "p2")}
    assert out.minhash_audit["skipped_buckets"] >= 1
    assert out.minhash_audit["largest_bucket"] == 6
    assert out.minhash_audit["cap"] == 4


def test_no_oversized_buckets_no_warning(spark):
    pair = [("p1", ["t1 x", "t2 y", "t3 z"]),
            ("p2", ["t1 x", "t2 y", "t3 z"])]
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        out = dedup.minhash_pairs_from(spark, _sh(spark, pair))
    assert {(r.doc_a, r.doc_b) for r in out.collect()} == {("p1", "p2")}
    assert out.minhash_audit["skipped_buckets"] == 0
    assert out.minhash_audit["cap"] == dedup.MINHASH_BUCKET_CAP


def test_audit_false_is_plan_only_and_unaudited(spark):
    pair = [("p1", ["t1 x", "t2 y", "t3 z"]),
            ("p2", ["t1 x", "t2 y", "t3 z"])]
    out = dedup.minhash_pairs_from(spark, _sh(spark, pair), audit=False)
    assert out.minhash_audit is None
    # still computes the same pairs when eventually materialized
    assert {(r.doc_a, r.doc_b) for r in out.collect()} == {("p1", "p2")}
