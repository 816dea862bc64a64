"""The external driver records correctness rows for only the first 50
registry entries (insertion order) — pin the round-3 ordering contract:
the 41 ids whose last driver proof was round 1, the two dedup ids whose
code materially changed this round, and 7 of the 9 round-3-new operators
(the window is full at 50; ext_mm_decode_dims and ext_events_funnel wait
for the round-4 rotation)."""

import __spark_entry__ as entrymod

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    DRIVER_WINDOW_FIRST,
    all_oracles,
    all_queries,
)


def test_priority_block_leads_registry():
    order = list(all_queries())
    assert order[: len(DRIVER_WINDOW_FIRST)] == list(DRIVER_WINDOW_FIRST)
    # Everything the driver hasn't proven yet must sit inside its window.
    assert len(DRIVER_WINDOW_FIRST) <= 50


def test_registry_complete_and_oracle_backed():
    qs, ors = all_queries(), all_oracles()
    # 91 as of round 2 + round-3 adds: unigram_logprob, bigram_logprob,
    # tfidf_top, knn_classify, stream_enrich_agg, stream_interval_join,
    # domain_mix_temperature, dedup_common_ngrams, mm_decode_dims,
    # events_funnel, events_retention, embed_centroids
    assert len(qs) == 103
    assert set(ors) == set(qs)  # every query oracle-checked as of round 2
    # entry module passes through the same ordering
    assert list(entrymod.queries()) == list(qs)
