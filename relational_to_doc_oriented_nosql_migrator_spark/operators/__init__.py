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
# registry entries (dict insertion order). The rotation is MECHANICAL
# (r06 verdict task #6): tools/derive_window.py computes the window from
# the CORRECTNESS_r*.json ledger — ROUND_CHANGED_IDS promoted to the
# head (a materially-changed op earns a fresh hard-signal row on
# principle), remaining slots filled stalest-first (round of each id's
# latest GREEN row, ties broken by canonical registry position). The
# literal below is that tool's output, pasted so the registry never
# depends on ledger files at import time; tests/test_registry_order.py
# recomputes it and fails on drift.
#
# WINDOW_LEDGER_MAX anchors the derivation to the ledger state this
# literal was frozen against (r07 verdict task #2): the driver drops the
# CURRENT round's CORRECTNESS_r{N}.json into the tree mid-round, and
# without the anchor that new file would rotate the derived window to
# the NEXT cohort and redden the drift check for anyone cloning between
# the ledger landing and the next freeze. Bump it (and re-paste the
# literal) exactly once per round, when rotating the window.
#
# Round-13 window: ROUND_CHANGED_IDS promotes (a) the eleven ids whose
# plans changed THIS round — the packed-BIGINT basket-pair rollup, the
# in-array entropy histogram, PMI (fused variant tried mid-round and
# reverted; promoted out of caution), and
# the similarity family whose spread repartitions went keyless
# round-robin -> hash-on-vec_id (topk, lsh, ivf, ivfpq, ivfpq_indexed,
# both knn ids, embed_pq) — and (b) the three r12 rewrites the r12
# window rotation predated (VERDICT r12 item 3: rewritten AFTER the
# rotation, so the driver never re-proved their new shapes):
# graph_pagerank, curation_pipeline, stream_to_json_files
# (ext_basket_pairs, the fourth, is already in (a)), and (c)
# ext_dedup_containment, whose posting self-join was replaced by
# in-bucket pair expansion later in r13, and ext_fuzzy_join_names,
# whose spread went round-robin -> hash-on-name. The remaining slots are
# stalest-first over the post-r12 ledger.
WINDOW_LEDGER_MAX = 12

ROUND_CHANGED_IDS = (
    "ext_basket_pairs",
    "ext_text_entropy",
    "ext_text_pmi",
    "ext_similarity_topk",
    "ext_similarity_lsh",
    "ext_similarity_ivf",
    "ext_similarity_ivfpq",
    "ext_similarity_ivfpq_indexed",
    "ext_knn_classify",
    "ext_knn_classify_indexed",
    "ext_embed_pq",
    "ext_graph_pagerank",
    "ext_curation_pipeline",
    "stream_to_json_files",
    "ext_dedup_containment",
    "ext_fuzzy_join_names",
)

DRIVER_WINDOW_FIRST = (
    "ext_fuzzy_join_names",
    "ext_basket_pairs",
    "ext_text_entropy",
    "ext_text_pmi",
    "ext_dedup_containment",
    "ext_similarity_topk",
    "ext_similarity_lsh",
    "ext_similarity_ivf",
    "ext_similarity_ivfpq",
    "ext_similarity_ivfpq_indexed",
    "ext_knn_classify",
    "ext_knn_classify_indexed",
    "ext_embed_pq",
    "stream_to_json_files",
    "ext_curation_pipeline",
    "ext_graph_pagerank",
    "ext_domain_mix_temperature",
    "ext_pack_sequences",
    "src_full_scan",
    "src_sql_dump_import",
    "src_indexed_lookup",
    "src_csv_import",
    "src_jsonl_import",
    "src_parquet_mergeschema",
    "ext_fk_orphan_audit",
    "ext_migrate_reconcile",
    "ext_profile_table",
    "ext_skew_report",
    "proj_attribute_select",
    "proj_drop_fk_column",
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
    "ext_text_bigram_logprob",
    "ext_text_chunk",
    "ext_text_quality_score",
    "ext_dedup_dup_rate",
    "ext_dedup_canonical",
    "ext_dedup_minhash",
    "ext_dedup_minhash_incremental",
    "ext_embed_centroids",
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
