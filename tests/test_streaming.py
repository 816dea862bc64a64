"""Structured Streaming semantics that the oracle parity suite can't see:
multi-batch watermark advancement and late-data dropping."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from relational_to_doc_oriented_nosql_migrator_spark.streaming import (
    read_events_stream,
    run_stream_to_batch,
    stream_tumbling_agg,
)


def _write_events(path: str, rows: list[tuple], mtime: float) -> None:
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("ns")),  # same physical type as testdata
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema), path)
    os.utime(path, (mtime, mtime))


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """Three micro-batches: on-time data, a watermark-advancing event, then
    a record far older than the watermark. Append-mode output must contain
    the finalized on-time window and no trace of the late event.

    (The late record arrives two batches after the advancing event because
    the watermark used for late-row filtering is the one committed from the
    batches BEFORE the previous one — filtering with the freshly-advanced
    value only takes effect one batch later.)"""
    d = str(tmp_path)
    now = time.time()
    # Batch 1: three events 10:00-10:05.
    _write_events(
        os.path.join(d, "b1.parquet"),
        [
            (1, "2024-08-07 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-08-07 10:03:00", 1, "click", 1.0, "{}"),
            (3, "2024-08-07 10:05:00", 2, "click", 1.0, "{}"),
        ],
        now - 30,
    )
    # Batch 2: advances event time to 12:00 (watermark -> 11:50).
    _write_events(
        os.path.join(d, "b2.parquet"),
        [(4, "2024-08-07 12:00:00", 1, "click", 1.0, "{}")],
        now - 20,
    )
    # Batch 3: a record at 08:00, hours behind the watermark -> dropped.
    _write_events(
        os.path.join(d, "b3.parquet"),
        [(99, "2024-08-07 08:00:00", 3, "late", 999.0, "{}")],
        now - 10,
    )

    events = read_events_stream(
        spark, d, max_files_per_trigger=1, path=os.path.join(d, "*.parquet")
    )
    out = run_stream_to_batch(
        stream_tumbling_agg(events, watermark="10 minutes"), "append"
    ).collect()

    by_window = {str(r["window_start"]): r for r in out}
    # On-time window finalized once the watermark passed its end.
    assert "2024-08-07 10:00:00" in by_window
    assert by_window["2024-08-07 10:00:00"]["n_events"] == 3
    # The late event's window never appears, in any form.
    assert "2024-08-07 08:00:00" not in by_window
    assert not any(r["event_type"] == "late" for r in out)
    # The 12:00 window is not yet finalized (watermark 11:50 < 12:10), so
    # append mode must not have emitted it.
    assert "2024-08-07 12:00:00" not in by_window


def test_stateful_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState: state persists across micro-batches — the
    update-mode output's final row per user reflects both batches."""
    from relational_to_doc_oriented_nosql_migrator_spark.streaming import (
        stream_user_stats,
    )

    d = str(tmp_path)
    now = time.time()
    _write_events(
        os.path.join(d, "b1.parquet"),
        [(1, "2024-08-07 10:00:00", 7, "click", 1.5, "{}"),
         (2, "2024-08-07 10:01:00", 7, "click", 2.5, "{}")],
        now - 20,
    )
    _write_events(
        os.path.join(d, "b2.parquet"),
        [(3, "2024-08-07 10:02:00", 7, "click", 3.0, "{}")],
        now - 10,
    )
    events = read_events_stream(
        spark, d, max_files_per_trigger=1, path=os.path.join(d, "*.parquet")
    )
    rows = run_stream_to_batch(stream_user_stats(events), "update").collect()
    # Update mode emits one row per user per batch; the max-count row is the
    # final state: 3 events, 7.0 total value.
    final = max((r for r in rows if r["user_id"] == 7),
                key=lambda r: r["n_events"])
    assert final["n_events"] == 3
    assert final["sum_value_micros"] == 7_000_000


def test_stream_file_sink_exactly_once(spark, tmp_path):
    """Streamed JSON file sink: all rows land once; a restart over the same
    checkpoint emits nothing new (exactly-once via checkpoint)."""
    from relational_to_doc_oriented_nosql_migrator_spark.streaming import (
        read_events_stream,
        stream_to_json_files,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    now = time.time()
    _write_events(
        os.path.join(src, "b1.parquet"),
        [(i, "2024-08-07 10:00:00", i % 3, "click", 1.0, "{}")
         for i in range(20)],
        now - 10,
    )

    def run():
        events = read_events_stream(
            spark, src, path=os.path.join(src, "*.parquet")
        ).select("event_id", "user_id", "event_type")
        stream_to_json_files(events, out, ckpt)

    run()
    assert spark.read.json(out).count() == 20
    run()  # same checkpoint, no new input -> no duplicates
    assert spark.read.json(out).count() == 20


def test_interval_join_matches_across_micro_batches(spark, tmp_path):
    """Stream-stream interval join state: a click in batch 1 must still
    join a purchase arriving in batch 2 (click state buffered across the
    micro-batch boundary), while a purchase outside the 30-minute window
    must not match. Files are written with micros timestamps, also
    covering the native-micros (TIMESTAMP_NTZ) normalization path."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from relational_to_doc_oriented_nosql_migrator_spark.streaming import (
        stream_interval_join,
    )

    def write_micros(path, rows, mtime):
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"]
        )
        df["ts"] = pd.to_datetime(df["ts"])
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),  # native micros -> NTZ read
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pandas(df, schema=schema), path)
        os.utime(path, (mtime, mtime))

    d = str(tmp_path)
    now = time.time()
    # Batch 1: clicks only.
    write_micros(
        os.path.join(d, "b1.parquet"),
        [
            (1, "2024-08-07 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-08-07 10:00:00", 2, "click", 1.0, "{}"),
        ],
        now - 20,
    )
    # Batch 2: one purchase inside the 30-min window (user 1), one far
    # outside it (user 2).
    write_micros(
        os.path.join(d, "b2.parquet"),
        [
            (11, "2024-08-07 10:10:00", 1, "purchase", 5.0, "{}"),
            (12, "2024-08-07 13:00:00", 2, "purchase", 5.0, "{}"),
        ],
        now - 10,
    )

    events = read_events_stream(
        spark, d, max_files_per_trigger=1, path=os.path.join(d, "*.parquet")
    )
    rows = run_stream_to_batch(
        stream_interval_join(events), "append"
    ).collect()
    got = {(r["purchase_id"], r["click_id"], r["user_id"]) for r in rows}
    assert got == {(11, 1, 1)}


def test_sessionize_interval_union_across_batches(spark, tmp_path):
    """Interval-union sessionization: state persists across micro-batches
    AND tolerates out-of-order arrival — batch 2 delivers an event that
    falls BETWEEN batch 1's two sessions and bridges them into one."""
    from relational_to_doc_oriented_nosql_migrator_spark.streaming import (
        stream_sessionize,
    )

    d = str(tmp_path)
    now = time.time()
    # Batch 1: two events 50 minutes apart -> 2 sessions.
    _write_events(
        os.path.join(d, "b1.parquet"),
        [(1, "2024-08-07 10:00:00", 7, "click", 1.0, "{}"),
         (2, "2024-08-07 10:50:00", 7, "click", 1.0, "{}")],
        now - 20,
    )
    # Batch 2: an out-of-order event at 10:25 bridges both gaps
    # (25 min to each neighbor) -> sessions merge into ONE.
    _write_events(
        os.path.join(d, "b2.parquet"),
        [(3, "2024-08-07 10:25:00", 7, "click", 1.0, "{}")],
        now - 10,
    )
    events = read_events_stream(
        spark, d, max_files_per_trigger=1, path=os.path.join(d, "*.parquet")
    )
    rows = run_stream_to_batch(stream_sessionize(events), "update").collect()
    per_batch = [r for r in rows if r["user_id"] == 7]
    assert len(per_batch) == 2
    # Update mode emits one row per batch: 2 sessions, then 1 merged.
    assert {r["n_sessions"] for r in per_batch} == {2, 1}
    merged = next(r for r in per_batch if r["n_sessions"] == 1)
    start = pd.Timestamp("2024-08-07 10:00:00").value // 1000
    end = pd.Timestamp("2024-08-07 11:20:00").value // 1000
    assert merged["first_start_micros"] == start
    assert merged["last_end_micros"] == end


def test_files_sink_complete_append_and_empty(spark, tmp_path):
    """run_stream_to_batch(sink='files'): complete mode lands via
    foreachBatch parquet overwrite, append mode via the checkpointed
    parquet streaming sink, and an ALL-FILTERED append result must come
    back as an empty, correctly-typed frame (the read-back passes the
    stream's schema explicitly — schema inference over a zero-data-file
    commit raises instead). Update mode must refuse: a batch's update
    output is only the changed rows, which no overwrite/append can
    reconstruct without upsert keys."""
    import pytest

    from relational_to_doc_oriented_nosql_migrator_spark.streaming import (
        stream_dedup_keys,
    )

    d = str(tmp_path)
    now = time.time()
    _write_events(
        os.path.join(d, "b1.parquet"),
        [
            (1, "2024-08-07 10:00:00", 1, "click", 1.0, "{}"),
            (1, "2024-08-07 10:00:00", 1, "click", 1.0, "{}"),  # dup id
            (2, "2024-08-07 10:03:00", 1, "view", 2.0, "{}"),
        ],
        now - 30,
    )

    def src():
        return read_events_stream(
            spark, d, path=os.path.join(d, "*.parquet")
        )

    # complete mode -> foreachBatch overwrite path.
    got = run_stream_to_batch(
        stream_tumbling_agg(src()), "complete", sink="files"
    ).collect()
    assert {(r["event_type"], r["n_events"]) for r in got} == {
        ("click", 2), ("view", 1)
    }

    # append mode -> checkpointed parquet streaming sink (dedup emits
    # each (user_id, event_type) key once).
    dedup = run_stream_to_batch(
        stream_dedup_keys(src()), "append", sink="files"
    )
    assert sorted((r["user_id"], r["event_type"])
                  for r in dedup.collect()) == [(1, "click"), (1, "view")]

    # append mode with an all-filtered result -> empty frame, same schema.
    empty = run_stream_to_batch(
        stream_dedup_keys(src()).filter("user_id < 0"), "append",
        sink="files",
    )
    assert empty.count() == 0
    assert "user_id" in empty.columns

    # update mode refuses the files sink.
    with pytest.raises(ValueError, match="upsert"):
        run_stream_to_batch(stream_tumbling_agg(src()), "update",
                            sink="files")
