"""Planted-data semantics tests for the round-4 graph / maintenance
operators: fixed-point PageRank pinned against a hand-computed exact
reference on a crafted graph, chunking edge widths, and the
incremental-rollup merge under an empty delta."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    graph as G,
    temporal as T,
    text as X,
)


def _write_graph(tmp, orders, lineitems):
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([o[0] for o in orders], type=pa.int64()),
            "o_custkey": pa.array([o[1] for o in orders], type=pa.int64()),
        }),
        os.path.join(str(tmp), "orders.parquet"),
    )
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([l[0] for l in lineitems],
                                   type=pa.int64()),
            "l_suppkey": pa.array([l[1] for l in lineitems],
                                  type=pa.int64()),
        }),
        os.path.join(str(tmp), "lineitem.parquet"),
    )


def _expected_pagerank(edges):
    """Sequential replica of the engine's exact fixed-point math."""
    sym = set(edges) | {(b, a) for a, b in edges}
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    n = len(deg)
    units = {v: G.UNIT // n for v in deg}
    for _ in range(G.ITERS):
        s = {v: 0 for v in deg}
        for a, b in sym:
            s[b] += units[a] // deg[a]
        units = {
            v: (G.TELEPORT_NUM * (G.UNIT // 100)) // n
            + (G.DAMPING_NUM * s[v]) // G.DAMPING_DEN
            for v in deg
        }
    return {v: u / float(G.UNIT) for v, u in units.items()}


def test_pagerank_matches_exact_sequential_replica(spark, tmp_path):
    """Star-plus-tail graph: supplier 1 is hub for customers 1-3;
    customer 3 also buys from supplier 2. Engine output must equal the
    sequential fixed-point computation EXACTLY (no tolerance) — that is
    the whole point of the integer formulation."""
    _write_graph(
        tmp_path,
        orders=[(100, 1), (101, 2), (102, 3), (103, 3)],
        lineitems=[(100, 1), (101, 1), (102, 1), (103, 2)],
    )
    edges = [("c1", "s1"), ("c2", "s1"), ("c3", "s1"), ("c3", "s2")]
    expected = _expected_pagerank(edges)
    got = {
        r.node: r.pagerank
        for r in G.q_ext_graph_pagerank(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # Hub outranks every leaf; symmetric leaves tie exactly.
    assert got["s1"] == max(got.values())
    assert got["c1"] == got["c2"]
    # Mass conservation up to integer-truncation loss (strictly < 1e-12
    # lost per division; generous bound).
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_broadcast_gate_branches(spark, tmp_path, monkeypatch):
    """The |nodes|-sized rank/degree broadcast is gated on the node count
    (PAGERANK_BROADCAST_MAX_NODES): below it the per-iteration joins are
    hint-forced broadcasts; above it the hints drop and the static plan
    is a key-shuffled join (SortMergeJoin pre-AQE — AQE may still elect
    broadcast from RUNTIME sizes, which cannot OOM the way a forced hint
    does). Pin both the plan shape of each branch and their value
    equality (the fixed-point math is exact, so the branches must agree
    bit-for-bit)."""
    _write_graph(
        tmp_path,
        orders=[(100, 1), (101, 2), (102, 3), (103, 3)],
        lineitems=[(100, 1), (101, 1), (102, 1), (103, 2)],
    )

    def plan_of(max_nodes):
        monkeypatch.setattr(G, "PAGERANK_BROADCAST_MAX_NODES", max_nodes)
        e = G._edges(spark, str(tmp_path)).persist()
        try:
            n_nodes = e.select("src").distinct().count()
            frame = G._pagerank_frame(e, n_nodes)
            plan = frame._jdf.queryExecution().sparkPlan().toString()
            rows = {r.node: r.pagerank for r in frame.collect()}
        finally:
            e.unpersist()
        return plan, rows

    # Disable size-based auto-broadcast so the plans isolate the HINT's
    # effect — this simulates the 100x graph where every frame's size
    # estimate exceeds the threshold. (At the planted-toy scale the
    # unhinted branch would otherwise still broadcast via the size rule,
    # which is exactly the benign degrade the gate buys.)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted_plan, hinted = plan_of(10**9)
        unhinted_plan, unhinted = plan_of(0)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # The forced hint broadcasts the |nodes| frames even with the
    # threshold off — the hard-fail shape the gate exists to prevent...
    assert "BroadcastHashJoin" in hinted_plan
    # ...while the gated-off branch shuffles the per-iteration joins on
    # the key instead of forcing a corpus-proportional broadcast.
    assert "SortMergeJoin" in unhinted_plan
    assert "BroadcastHashJoin" not in unhinted_plan
    assert unhinted == hinted


def test_chunk_edge_widths(spark, tmp_path):
    """Docs at exactly W, W+1, and < S tokens: one full chunk (the
    would-be trailing window at start S+1 adds no new tokens and is
    suppressed), a full chunk plus a short trailing chunk that adds
    exactly the extra token, and a single short chunk."""
    w, s = X.CHUNK_W, X.CHUNK_S
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            " ".join(f"t{i}" for i in range(w)),        # exactly W
            " ".join(f"t{i}" for i in range(w + 1)),    # W + 1
            "a b",                                       # < stride
        ],
        "lang": ["en"] * 3,
        "source": ["src0"] * 3,
        "n_chars": [0, 0, 3],
    })
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = X.q_ext_text_chunk(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # Exactly W tokens -> ONE chunk; the redundant trailing window
    # (a strict subset of chunk 0) must be suppressed.
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert len(d1) == 1
    assert d1[0].n_chunk_tokens == w
    # W+1 tokens -> the second chunk holds the overlap + the extra token.
    d2 = sorted(by_doc[2], key=lambda r: r.chunk_idx)
    assert d2[0].n_chunk_tokens == w
    assert d2[1].n_chunk_tokens == (w + 1) - s
    # Consecutive chunks overlap by exactly W - S tokens.
    assert d2[0].chunk_text.split()[s:] == d2[1].chunk_text.split()[: w - s]
    # Tiny doc -> exactly one chunk with all tokens.
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chunk_tokens == 2


def test_chunk_matches_replica_for_all_small_lengths(spark, tmp_path):
    """Every token count 1..40 (covering all stride/remainder classes,
    including each suppressed-trailing-window case) must produce exactly
    the chunks of a sequential Python replica of the stride semantics."""
    w, s = X.CHUNK_W, X.CHUNK_S

    def replica(tokens):
        out = []
        n = len(tokens)
        for start in range(1, n + 1, s):
            if start != 1 and start + (w - s) > n:
                continue  # window adds nothing beyond the previous one
            piece = tokens[start - 1: start - 1 + w]
            out.append(((start - 1) // s, len(piece), " ".join(piece)))
        return out

    docs = pd.DataFrame({
        "doc_id": list(range(1, 41)),
        "text": [" ".join(f"w{i}t{j}" for j in range(i))
                 or "x" for i in range(1, 41)],
        "lang": ["en"] * 40,
        "source": ["src0"] * 40,
        "n_chars": [0] * 40,
    })
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    got = {}
    for r in X.q_ext_text_chunk(spark, str(tmp_path)).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.n_chunk_tokens, r.chunk_text)
        )
    for _, row in docs.iterrows():
        toks = row.text.split(" ")
        assert sorted(got[row.doc_id]) == replica(toks), row.doc_id


def test_stream_cdc_upsert_replay_is_idempotent(spark, tmp_path):
    """Re-running the whole stream with a FRESH checkpoint but the SAME
    app identity (the worst-case at-least-once replay: every batch
    re-delivered under one txnAppId, Delta's idempotent-sink contract)
    against the existing state must change nothing — the (app, batch)
    stamp guard, not the checkpoint, is what makes the sink
    idempotent."""
    from relational_to_doc_oriented_nosql_migrator_spark.streaming import ops as S

    src = os.path.join(str(tmp_path), "events.parquet")
    rows = [
        (1, "2024-08-07 10:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-08-07 11:00:00", 7, "click", 2.0, "{}"),
        (3, "2024-08-07 12:00:00", 8, "view", 3.0, "{}"),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    pq.write_table(pa.Table.from_pandas(df, schema=schema), src)

    state = os.path.join(str(tmp_path), "state")
    os.makedirs(state)

    def run(ckpt):
        # Glob form: the file-stream source requires a directory basePath.
        events = S.read_events_stream(
            spark, str(tmp_path),
            path=os.path.join(str(tmp_path), "events.*"),
        )
        S.stream_cdc_upsert(events, state,
                            os.path.join(str(tmp_path), ckpt),
                            app_id="replaytest")

    run("ckpt1")
    first = sorted(
        (r.user_id, r.event_type, r.n_versions, r["m"]["event_id"])
        for r in spark.read.parquet(
            S._latest_cdc_state(state, "replaytest")[0][2]
        ).collect()
    )
    assert first == [(7, "click", 2, 2), (8, "view", 1, 3)]
    run("ckpt2")  # full replay
    second = sorted(
        (r.user_id, r.event_type, r.n_versions, r["m"]["event_id"])
        for r in spark.read.parquet(
            S._latest_cdc_state(state, "replaytest")[0][2]
        ).collect()
    )
    assert second == first
    # Exactly one stamp survives: the stale-sweep removed crash leftovers.
    assert len(os.listdir(state)) == 1


def test_incremental_agg_empty_delta(spark, tmp_path):
    """event_id chosen so NO row lands in the delta partition: the merge
    must still equal the plain rollup (the quiet-day refresh)."""
    rows = [
        (10, "2024-08-07 10:00:00", 1, "click", 1.5, "{}"),
        (11, "2024-08-07 11:00:00", 1, "click", 2.5, "{}"),
        (12, "2024-08-08 10:00:00", 2, "view", 4.0, "{}"),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    got = {
        (str(r.day), r.event_type): (r.n_events, r.sum_value)
        for r in T.q_ext_incremental_agg(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("2024-08-07", "click"): (2, 4.0),
        ("2024-08-08", "view"): (1, 4.0),
    }


def test_pagerank_footer_path_partitions_edge_cache_by_dst(spark):
    """r13: below the broadcast gate the registered query caches the
    symmetrized edge frame hash-partitioned on dst, so each iteration's
    partial aggregation collapses to one row per node before its
    exchange (the planted-graph tests above exercise the footer-less
    fallback, which keeps the unpartitioned cache). Pin the layout on
    the real footer-backed testdata and the value parity between the
    two cache layouts."""
    from pyspark.sql import functions as F

    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        footer_rows,
    )
    from tests.conftest import SF0001

    n = footer_rows(SF0001, "customer") + footer_rows(SF0001, "supplier")
    assert n <= G.PAGERANK_BROADCAST_MAX_NODES  # testdata sits below the gate

    # the registered builder's gated cache layout
    e = G._edges(spark, SF0001).repartition(F.col("dst")).persist()
    try:
        frame = G._pagerank_frame(e, n)
        plan = frame._jdf.queryExecution().sparkPlan().toString()
        assert "REPARTITION_BY_COL" in plan, plan
        assert "hashpartitioning(dst" in plan, plan
        partitioned = {r.node: r.pagerank for r in frame.collect()}
    finally:
        e.unpersist()

    via_query = {
        r.node: r.pagerank
        for r in G.q_ext_graph_pagerank(spark, SF0001).collect()
    }
    assert via_query == partitioned
