"""Streaming state-scaling probe (r06 verdict task #8).

Runs the stateful streaming ops at one or more scale factors and records,
per op and SF, what StreamingQuery progress reports: state-store rows and
bytes (max across batches), micro-batch count and wall times, and output
rows. The claim this artifact checks is the README's scale contract —
state is bounded by SESSIONS/USERS/WINDOWS (watermark-evicted), not by
stream length — by showing state growth from sf1.0 to sf10 tracks the
key population, not the 10x event count.

Usage:
  PYTHONPATH=/root/repo python tools/stream_state_probe.py \
      [sf_dir ...] > STREAM_STATE_r07.json
Defaults to /root/testdata/sf0.1 /tmp/spark_graft_scale/sf1.0
/tmp/spark_graft_scale/sf10 (skipping absent dirs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_IDS = (
    "ext_stream_tumbling_agg",
    "ext_stream_sliding_agg",
    "ext_stream_session_agg",
    "ext_stream_dedup",
    "ext_stream_stateful",
    "ext_stream_sessionize",
    "ext_stream_enrich_agg",
    "ext_stream_interval_join",
)

DEFAULT_DIRS = (
    "/root/testdata/sf0.1",
    "/tmp/spark_graft_scale/sf1.0",
    "/tmp/spark_graft_scale/sf10",
)


def probe_one(spark, qs, qid: str, sf_dir: str) -> dict:
    from relational_to_doc_oriented_nosql_migrator_spark.streaming import ops

    t0 = time.time()
    df = qs[qid](spark, sf_dir)
    rows = df.count()
    wall = round(time.time() - t0, 1)
    batches = []
    state_rows = 0
    state_bytes = 0
    for p in ops.LAST_STREAM_PROGRESS:
        batches.append(p.get("batchDuration") or
                       p.get("durationMs", {}).get("triggerExecution"))
        for so in p.get("stateOperators", []):
            state_rows = max(state_rows, so.get("numRowsTotal", 0))
            state_bytes = max(state_bytes, so.get("stateMemory",
                              so.get("memoryUsedBytes", 0)))
    return {
        "rows_out": rows,
        "wall_s": wall,
        "n_batches": len(batches),
        "batch_ms": batches,
        "state_rows_max": state_rows,
        "state_bytes_max": state_bytes,
    }


def main() -> None:
    from relational_to_doc_oriented_nosql_migrator_spark.session import get_spark

    spark = get_spark(app_name="stream_state_probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    dirs = [d for d in (sys.argv[1:] or DEFAULT_DIRS) if os.path.isdir(d)]
    out: dict = {"what": "streaming state-store scaling probe",
                 "session": "tuned get_spark (RocksDB state store)",
                 "sfs": {}}
    for sf_dir in dirs:
        res = {}
        for qid in STREAM_IDS:
            try:
                res[qid] = probe_one(spark, qs, qid, sf_dir)
            except Exception as ex:  # noqa: BLE001 — record, keep probing
                res[qid] = {"error": f"{type(ex).__name__}: {str(ex)[:200]}"}
            print(f"# {sf_dir} {qid}: {res[qid]}", file=sys.stderr,
                  flush=True)
        out["sfs"][sf_dir] = res
        # Scratch from the files sinks accumulates one dir per op; sweep
        # between SFs so the sf10 pass starts clean.
        from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
            cleanup_scratch,
        )

        cleanup_scratch()
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
