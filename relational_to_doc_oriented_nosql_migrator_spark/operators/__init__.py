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
# Round-12 window: ROUND_CHANGED_IDS promotes the five ids whose
# DRIVER-EXECUTED plans changed this round: the four IVF/IVF-PQ
# similarity ids (the ADC distance-table build swapped its per-query
# O((M*K)^2) map scatter for a shared slot->rank indirection — same
# values, different physical plan) plus sink_json_collections (doc
# counts now come from write-time observe()/roots-frame metrics; the
# NDJSON text-count read-back pass is gone). The remaining 45 slots
# are stalest-first: the r09-latest cohort (ledger state after r11:
# r11 50, r10 49, r09 47). Invariant after the r12 driver run: every
# id's latest row is r10+.
WINDOW_LEDGER_MAX = 11

ROUND_CHANGED_IDS = (
    "sink_json_collections",
    "ext_similarity_ivf",
    "ext_similarity_ivfpq",
    "ext_similarity_ivfpq_indexed",
    "ext_knn_classify_indexed",
)

DRIVER_WINDOW_FIRST = (
    "sink_json_collections",
    "ext_similarity_ivf",
    "ext_similarity_ivfpq",
    "ext_similarity_ivfpq_indexed",
    "ext_knn_classify_indexed",
    "filter_nonempty_collection",
    "join_denormalize_m2m",
    "join_meta_left",
    "join_meta_pg_catalog",
    "fn_case_when_referenced",
    "agg_count_star",
    "agg_fk_count_grouped",
    "agg_group_concat_ordered",
    "agg_group_concat_distinct",
    "agg_pricing_summary",
    "sort_meta_output",
    "fn_date_normalize",
    "fn_whitespace_normalize",
    "src_log_text",
    "fn_regex_log_extract_mysql",
    "fn_regex_log_extract_pg",
    "filter_statement_type",
    "fn_sql_tablelist",
    "fn_split_tableref",
    "filter_dml_type",
    "agg_workload_gaf_uaf",
    "agg_maf_scalar",
    "ext_window_rank",
    "ext_window_lag_lead",
    "ext_tumbling_agg",
    "ext_sliding_agg",
    "ext_session_agg",
    "ext_grouping_sets",
    "ext_cube",
    "ext_window_running",
    "ext_setops",
    "ext_json_extract",
    "ext_percentiles",
    "ext_text_tokens",
    "ext_split_assign",
    "ext_token_bigrams",
    "ext_text_unigram_logprob",
    "ext_text_tfidf_top",
    "ext_dedup_common_ngrams",
    "ext_dedup_components",
    "ext_dedup_embedding",
    "ext_dedup_embedding_lsh",
    "ext_knn_classify",
    "ext_stream_enrich_agg",
    "ext_stream_interval_join",
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
