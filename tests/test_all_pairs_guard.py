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
