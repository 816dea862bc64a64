"""The brute-force all-pairs baselines must refuse scale-sized inputs."""

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.operators import dedup
from tests.conftest import SF001


def test_guard_raises_above_ceiling(spark, monkeypatch):
    monkeypatch.setattr(dedup, "ALL_PAIRS_CEILING", 10)
    with pytest.raises(ValueError, match="ext_dedup_minhash"):
        dedup.q_ext_dedup_ngram_jaccard(spark, SF001)
    with pytest.raises(ValueError, match="ext_dedup_embedding_lsh"):
        dedup.q_ext_dedup_embedding(spark, SF001)


def test_guard_passes_small_corpus(spark):
    # sf0.001 is far below the real ceiling — the baselines still build.
    assert dedup.q_ext_dedup_ngram_jaccard(spark, SF001).columns == [
        "doc_a", "doc_b", "jaccard",
    ]


def test_similarity_query_set_guard(spark, monkeypatch):
    """The ANN ops broadcast their query side, so a corpus-strided query
    set must refuse loudly once it exceeds the bounded-workload ceiling
    (the production seam takes an external bounded query set). The check
    is parquet-footer metadata only — no Spark job."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import similarity

    monkeypatch.setattr(similarity, "QUERY_SET_CEILING", 0)
    for op in (
        similarity.q_ext_similarity_topk,
        similarity.q_ext_similarity_lsh,
        similarity.q_ext_similarity_ivf,
        similarity.q_ext_similarity_ivfpq,
        similarity.q_ext_similarity_ivfpq_indexed,
    ):
        with pytest.raises(ValueError, match="BOUNDED workload"):
            op(spark, SF001)


def test_query_guard_sized_per_broadcast_path(spark, monkeypatch):
    """The ceiling divides the broadcast budget by each path's ACTUAL
    per-query broadcast width (r05 ADVICE): the LSH path ships the
    LSH_TABLES-exploded key frame (12 vector rows per query), so with a
    budget of 3 such rows it must refuse the sf0.001 4-query set while
    the 1-row-per-query topk path still passes."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import similarity

    monkeypatch.setattr(
        similarity,
        "QUERY_BCAST_BUDGET_BYTES",
        3 * similarity.LSH_TABLES * similarity.VEC_ROW_BYTES,
    )
    with pytest.raises(ValueError, match="BOUNDED workload"):
        similarity.q_ext_similarity_lsh(spark, SF001)
    assert "query_id" in similarity.q_ext_similarity_topk(spark, SF001).columns


def test_similarity_query_set_guard_passes_bench_scales(spark):
    from relational_to_doc_oriented_nosql_migrator_spark.operators import similarity

    # sf0.001 (200 vectors -> 4 queries) sits far under the ceiling.
    df = similarity.q_ext_similarity_lsh(spark, SF001)
    assert "query_id" in df.columns
