"""The external driver records correctness rows for only the first 50
registry entries (insertion order) — pin the round-6 ordering contract.

After round 5, every one of the 145 ids has a green driver row and
every id's LATEST row is green (r05: 50, r03: 49, r04: 46). Round 6 is
the freshness rotation the r05 verdict ordered: the window is exactly
the 49 ids whose latest hard-signal row is r03, led by
ext_stream_enrich_agg and ext_stream_interval_join (they took the
round-5 files-sink/RocksDB swap on code paths whose newest driver rows
predate it), then the batch window/temporal agg block, the r01-era
relational/workload/projection/filter/function block, and the
remaining r03-era text/dedup/setops ids. The 1 remaining slot carries
the one id whose code materially changed in round 6:
ext_pack_sequences (adaptive PACK_BUCKETS from footer row counts, r05
verdict watch item #1). Displaced to the tail: the full r04 and r05
window contents — all with green latest rows and unchanged this round,
still re-proven by the local all-ids suite and tools/driver_audit.py
every run."""

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
    # 91 as of round 2 + 12 round-3 adds + 42 round-4 adds:
    # events_attribution, dedup_canonical, embed_quantize, embed_pq,
    # similarity_ivfpq, dedup_embedding_lsh, events_sessionize,
    # events_anomaly, text_perplexity_bucket, src_csv_import,
    # src_jsonl_import, cdc_merge_latest, mm_dedup_exact,
    # fk_orphan_audit, stream_sessionize, pivot, unpivot, histogram,
    # migrate_reconcile, fuzzy_join_names, moving_avg, text_entropy,
    # session_paths, basket_pairs, dedup_containment,
    # similarity_ivfpq_indexed, events_transitions, profile_table,
    # dedup_minhash_incremental, sink_parquet_compacted, skew_report,
    # text_chunk, text_pmi, dedup_dup_rate, window_ntile, corr_stats,
    # graph_pagerank, incremental_agg, stream_cdc_upsert,
    # text_quality_score, sink_parquet_sorted, src_parquet_mergeschema
    assert len(qs) == 145
    assert set(ors) == set(qs)  # every query oracle-checked as of round 2
    # entry module passes through the same ordering
    assert list(entrymod.queries()) == list(qs)
