"""Operator inventory (SURVEY §2) as (spark, sf_dir) -> DataFrame builders.

Every module exposes:
  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLES: dict[str, str]   # DuckDB ANSI-SQL equivalents (omitted for
                            # non-SQL-expressible ops -> rows-only check)
"""

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    dedup,
    graph,
    multimodal,
    pipeline,
    planops,
    relational,
    similarity,
    temporal,
    text,
    windows,
    workload_ops,
)
from relational_to_doc_oriented_nosql_migrator_spark import streaming

MODULES = (relational, workload_ops, windows, text, dedup, similarity,
           streaming, multimodal, temporal, planops, pipeline, graph)

# The external correctness driver records rows for only the FIRST 50
# registry entries (dict insertion order). Rounds 1-6 rotated this
# window by hand (see git history for the per-round rationale); after
# r06, EVERY one of the 145 ids has a green driver row and every id's
# LATEST row is green (r06: 50, r05: 49, r04: 46).
#
# From round 7 the rotation is MECHANICAL (r06 verdict task #6):
# tools/derive_window.py computes the window from the CORRECTNESS_r*.json
# ledger — ROUND_CHANGED_IDS promoted to the head (a materially-changed
# op earns a fresh hard-signal row on principle), remaining slots filled
# stalest-first (latest-row round, ties broken by canonical registry
# position). The literal below is that tool's output, pasted so the
# registry never depends on ledger files at import time;
# tests/test_registry_order.py recomputes it and fails on drift.
#
# Round-7 changed ids: the IVF-PQ family trains its Lloyd/PQ codebooks
# on a bounded deterministic sample instead of full-corpus scans (r06
# verdict task #4). Both ids were already the stalest cohort (r04), so
# promotion only moves them to the head. The 46 r04-latest ids follow,
# then the 4 canonically-first r05 ids fill the window to 50.
ROUND_CHANGED_IDS = (
    "ext_similarity_ivfpq",
    "ext_similarity_ivfpq_indexed",
)

DRIVER_WINDOW_FIRST = (
    # materially changed in round 7 -> re-prove first
    "ext_similarity_ivfpq",
    "ext_similarity_ivfpq_indexed",
    # latest driver row is r04 — stalest-first freshness rotation
    "src_csv_import",
    "src_jsonl_import",
    "src_parquet_mergeschema",
    "ext_fk_orphan_audit",
    "ext_migrate_reconcile",
    "ext_fuzzy_join_names",
    "ext_basket_pairs",
    "ext_skew_report",
    "ext_corr_stats",
    "ext_events_funnel",
    "ext_events_retention",
    "ext_events_attribution",
    "ext_events_sessionize",
    "ext_session_paths",
    "ext_events_transitions",
    "ext_events_anomaly",
    "ext_pivot",
    "ext_unpivot",
    "ext_histogram",
    "ext_moving_avg",
    "ext_text_entropy",
    "ext_text_bigram_logprob",
    "ext_text_chunk",
    "ext_text_pmi",
    "ext_text_quality_score",
    "ext_dedup_dup_rate",
    "ext_dedup_canonical",
    "ext_dedup_minhash",
    "ext_dedup_embedding_lsh",
    "ext_dedup_containment",
    "ext_dedup_minhash_incremental",
    "ext_similarity_lsh",
    "ext_similarity_ivf",
    "ext_embed_centroids",
    "ext_embed_quantize",
    "ext_embed_pq",
    "ext_stream_cdc_upsert",
    "ext_stream_sessionize",
    "ext_mm_dedup_exact",
    "ext_mm_decode_dims",
    "ext_cdc_merge_latest",
    "ext_incremental_agg",
    "sink_parquet_compacted",
    "sink_parquet_sorted",
    # latest driver row is r05 — the 4 canonically-first fill the window
    "src_full_scan",
    "src_sql_dump_import",
    "src_indexed_lookup",
    "ext_profile_table",
)


def all_queries():
    full = {}
    for m in MODULES:
        full.update(m.QUERIES)
    out = {k: full.pop(k) for k in DRIVER_WINDOW_FIRST}
    out.update(full)
    return out


def all_oracles():
    out = {}
    for m in MODULES:
        out.update(m.ORACLES)
    return out


def all_scaled_oracles(sf_dir: str):
    """Oracles re-rendered for a specific SF: the static all_oracles()
    entries are the driver-scale (sf0.01) renderings of the few
    data-adaptive oracles (LSH key width, packer bucket count); a
    harness auditing another SF substitutes these so oracle and engine
    derive the adaptive constants from the same footer row counts."""
    out = all_oracles()
    for m in MODULES:
        for qid, render in getattr(m, "SCALED_ORACLES", {}).items():
            out[qid] = render(sf_dir)
    return out
