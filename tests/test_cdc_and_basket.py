"""Planted-data semantics tests for the CDC compaction and basket-pair
operators — the shipped testdata exercises them at volume, these pin the
edge semantics (tie-breaks, within-basket bounds) on crafted inputs."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    relational as R,
    temporal as T,
)


def _write_events(path, rows):
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
    pq.write_table(pa.Table.from_pandas(df, schema=schema), path)


def test_cdc_merge_tie_breaks_on_event_id(spark, tmp_path):
    """Two versions at the SAME timestamp: the higher event_id wins (the
    lexicographic (ts, event_id, value) struct max) — deterministic, not
    arrival-order-dependent."""
    _write_events(os.path.join(str(tmp_path), "events.parquet"), [
        (1, "2024-08-07 10:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-08-07 10:00:00", 7, "click", 2.0, "{}"),   # same ts
        (3, "2024-08-07 09:00:00", 7, "click", 9.0, "{}"),   # older
    ])
    rows = {(r.user_id, r.event_type): r for r in
            T.q_ext_cdc_merge_latest(spark, str(tmp_path)).collect()}
    r = rows[(7, "click")]
    assert r.last_event_id == 2
    assert r.last_value == 2.0
    assert r.n_versions == 3


def test_basket_pairs_bounded_and_supported(spark, tmp_path):
    """Crafted baskets: pair expansion stays within each order, duplicate
    lineitems of the same part collapse, and min-support filters
    singletons."""
    li = pa.table({
        # order 1: parts {10, 20, 30}; order 2: {10, 20}; order 3: {10,
        # 20} with part 20 listed twice (must not double-count)
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3, 3], type=pa.int64()),
        "l_partkey": pa.array([10, 20, 30, 10, 20, 10, 20, 20],
                              type=pa.int64()),
        "l_linenumber": pa.array(range(8), type=pa.int32()),
    })
    pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    pairs = {(r.part_a, r.part_b): r.n_orders for r in
             R.q_ext_basket_pairs(spark, str(tmp_path)).collect()}
    # (10, 20) co-occurs in all three orders; (10, 30)/(20, 30) only in
    # order 1 -> below min support 2 -> absent.
    assert pairs == {(10, 20): 3}


def test_basket_pairs_big_partkeys_fall_back_unpacked(spark, tmp_path):
    """Part keys past the 31-bit packing bound: the footer-stats guard
    must route to the UNPACKED pair shape (shiftleft(x, 32) would
    corrupt or overflow) and values stay exact."""
    big = 1 << 31
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 3], type=pa.int64()),
        "l_partkey": pa.array([big + 10, big + 20] * 3, type=pa.int64()),
        "l_linenumber": pa.array(range(6), type=pa.int32()),
    })
    pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    df = R.q_ext_basket_pairs(spark, str(tmp_path))
    import io as _io
    import contextlib as _ctx

    buf = _io.StringIO()
    with _ctx.redirect_stdout(buf):
        df.explain("simple")
    assert "shiftleft" not in buf.getvalue()
    pairs = {(r.part_a, r.part_b): r.n_orders for r in df.collect()}
    assert pairs == {(big + 10, big + 20): 3}
