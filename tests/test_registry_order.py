"""The external driver records correctness rows for only the first 50
registry entries (insertion order) — pin the window ordering contract.

From round 7 the rotation is mechanical (r06 verdict task #6):
tools/derive_window.py computes the window from the CORRECTNESS_r*.json
ledger (ROUND_CHANGED_IDS promoted to the head, remaining slots filled
stalest-first with canonical-registry-position tiebreak), and the
DRIVER_WINDOW_FIRST literal in operators/__init__.py must equal that
derivation — a stale hand-paste fails here."""

import __spark_entry__ as entrymod

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    DRIVER_WINDOW_FIRST,
    ROUND_CHANGED_IDS,
    WINDOW_LEDGER_MAX,
    all_oracles,
    all_queries,
)
from tools.derive_window import derive_window, latest_rows


def test_priority_block_leads_registry():
    order = list(all_queries())
    assert order[: len(DRIVER_WINDOW_FIRST)] == list(DRIVER_WINDOW_FIRST)
    # Everything the driver hasn't proven yet must sit inside its window.
    assert len(DRIVER_WINDOW_FIRST) <= 50


def test_window_matches_ledger_derivation():
    """DRIVER_WINDOW_FIRST is the checked-in output of the derivation
    tool — changed ids first, then stalest-first from the ledger.

    The derivation is anchored to WINDOW_LEDGER_MAX (the ledger round
    the literal was frozen against), so the driver dropping the CURRENT
    round's CORRECTNESS_r{N}.json mid-round cannot flip this test red
    (the r07 verdict's one suite failure)."""
    derived = derive_window(ROUND_CHANGED_IDS, max_round=WINDOW_LEDGER_MAX)
    assert list(DRIVER_WINDOW_FIRST) == derived
    # Changed ids lead the window.
    assert set(DRIVER_WINDOW_FIRST[: len(ROUND_CHANGED_IDS)]) == set(
        ROUND_CHANGED_IDS
    )


def test_derivation_anchor_and_green_only(tmp_path):
    """Unit-pin the two latest_rows() filters: ledgers past the anchor
    round are ignored (mid-round stability), and only hash_match==true
    rows count toward freshness — a red or oracle-less latest row keeps
    its id window-eligible like a never-proven id."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"hash_match": True, "err": None},
        "b": {"hash_match": None, "err": "no_oracle"},
        "c": {"hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "c": {"hash_match": False, "err": "boom"},
        "d": {"hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "a": {"hash_match": True, "err": None},
    }))
    got = latest_rows(tmp_path, max_round=2)
    # r03 ignored (past anchor); b's no_oracle row and c's red r02 row
    # don't count, so c's freshness stays at its green r01 row.
    assert got == {"a": 1, "c": 1, "d": 2}
    assert latest_rows(tmp_path, max_round=3)["a"] == 3


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
    # + 1 round-9 add: knn_classify_indexed (the scale-path kNN)
    assert len(qs) == 146
    assert set(ors) == set(qs)  # every query oracle-checked as of round 2
    # entry module passes through the same ordering
    assert list(entrymod.queries()) == list(qs)
