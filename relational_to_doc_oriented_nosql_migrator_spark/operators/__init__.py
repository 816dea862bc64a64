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
# Round-11 window: ROUND_CHANGED_IDS promotes the three ids whose
# DRIVER-EXECUTED geometry changed this round: sink_json_collections
# (write-then-check emptiness + NDJSON text-count read-back replace the
# isEmpty()/schema-parse path at every scale) and the two *_indexed
# similarity ids (index persistence is now the DEFAULT — the driver's
# env-var-less run now exercises the fingerprint-keyed publish/reuse
# path). The remaining 47 slots are stalest-first: the r08-latest
# cohort (ledger state after r10: r10 50, r09 50, r08 46). Invariant
# after the r11 driver run: every id's latest row is r09+.
WINDOW_LEDGER_MAX = 10

ROUND_CHANGED_IDS = (
    "sink_json_collections",
    "ext_similarity_ivfpq_indexed",
    "ext_knn_classify_indexed",
)

DRIVER_WINDOW_FIRST = (
    "sink_json_collections",
    "ext_similarity_ivfpq_indexed",
    "ext_knn_classify_indexed",
    "proj_rename_ref",
    "join_nest_one_to_many",
    "join_nest_salted",
    "agg_collect_children",
    "fn_split_trim",
    "ext_window_ntile",
    "ext_approx_distinct",
    "ext_text_stats",
    "ext_text_quality",
    "ext_text_langid",
    "ext_text_fingerprint",
    "ext_text_perplexity_bucket",
    "ext_dedup_exact",
    "ext_dedup_ngram_jaccard",
    "ext_dedup_simhash",
    "ext_dedup_simhash_pairs",
    "ext_similarity_topk",
    "ext_similarity_lsh",
    "stream_to_json_files",
    "ext_stream_tumbling_agg",
    "ext_stream_sliding_agg",
    "ext_stream_session_agg",
    "ext_stream_dedup",
    "ext_stream_stateful",
    "ext_mm_attach_meta",
    "ext_mm_decode_features",
    "ext_mm_resize",
    "ext_mm_frame_sample",
    "ext_asof_join",
    "ext_range_join",
    "plan_topo_order",
    "plan_self_ref_detect",
    "plan_embed_or_reference",
    "plan_one_way_embed",
    "plan_two_way_embed",
    "plan_referencing",
    "sink_http_response",
    "sink_parquet_partitioned",
    "ext_curation_pipeline",
    "ext_text_pii_scrub",
    "ext_decontaminate",
    "ext_repetition_filter",
    "ext_domain_mix",
    "ext_sample_stratified",
    "ext_graph_pagerank",
    "filter_fk_match",
    "filter_nonempty_doc",
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
