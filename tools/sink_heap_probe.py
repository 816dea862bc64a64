#!/usr/bin/env python
"""Pristine-JVM heap-margin probe for sink_json_collections at sf10
(r08 verdict #2 "done" criterion: 3 consecutive pristine-JVM passes
with measured peak-heap margin).

Each invocation is ONE pristine JVM running the registered sink query
end to end (full migrate + JSON write + read-back counts) against
$PROBE_SF_DIR, then reporting wall time and the JVM-wide peak heap via
JMX memory pools (peak usage is tracked per pool since JVM start, so a
single-query process measures exactly this query's footprint). Run it
N times from the shell for N pristine generations:

  for i in 1 2 3; do
    PYTHONPATH=/root/repo python tools/sink_heap_probe.py
  done

Output: one JSON line {t, rows, peak_heap_mb, max_heap_mb, margin_pct}.
peak_heap_mb is the max of getHeapMemoryUsage().getUsed() SAMPLED at
250 ms during the run (summing per-pool JMX peaks overestimates: Eden's
peak and Old's peak never coexist under G1 — measured 12.2 GB "peak"
inside an 8 GB heap); old_gen_peak_mb (the JMX pool peak) rides along
as the stable-occupancy floor indicator.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from relational_to_doc_oriented_nosql_migrator_spark.session import get_spark

    spark = get_spark(app_name="sink_heap_probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    # Py4J gateway access from a sampler thread opens its own callback
    # connection — safe for concurrent reads.
    mem = mf.getMemoryMXBean()
    peak = [0]
    stop = threading.Event()

    def sample():
        while not stop.is_set():
            try:
                used = mem.getHeapMemoryUsage().getUsed()
                if used > peak[0]:
                    peak[0] = used
            except Exception:
                pass
            stop.wait(0.25)

    sampler = threading.Thread(target=sample, daemon=True)
    sampler.start()

    sf = os.environ.get("PROBE_SF_DIR", "/tmp/spark_graft_scale/sf10")
    # SINK_THRESHOLD sweeps the streamed-assembly knee (r10 verdict
    # task #5): it overrides nesting.HEAVY_ROOT_SUBTREE_ROWS for this
    # one run — 0 streams every embedded child, a huge value disables
    # streaming entirely (pure row materialization).
    thr_env = os.environ.get("SINK_THRESHOLD")
    thr = int(thr_env) if thr_env else None
    t0 = time.time()
    n = e.queries()["sink_json_collections"](spark, sf, threshold=thr).count()
    t = round(time.time() - t0, 1)
    stop.set()
    sampler.join(timeout=5)

    # Post-run live set: sampled "used" under G1 is mostly uncollected
    # garbage (the collector runs lazily, and the streamed path's
    # transient document rows are humongous allocations that land
    # straight in old gen), so force a full GC and read the floor. The
    # believable HEADROOM signal is the smaller-heap pass
    # (SPARK_GRAFT_DRIVER_MEM=4g), not the 8 GB sampled peak.
    jvm.java.lang.System.gc()
    time.sleep(1)
    live = mem.getHeapMemoryUsage().getUsed()

    old_peak = 0
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        if "Old Gen" in p.getName():
            old_peak = max(old_peak, p.getPeakUsage().getUsed())
    max_heap = mem.getHeapMemoryUsage().getMax()
    # Host load bracketing the draw (r11 verdict task #4): same-evening
    # pristine draws spanned 95.7-234.0s under EXTERNAL load, so a draw
    # is only admissible to the quiet-median protocol when its measured
    # load is below the agreed ceiling — record it rather than recall it.
    out = {
        "id": "sink_json_collections",
        "sf_dir": sf,
        "threshold": thr,
        "t": t,
        "rows": n,
        "load_1m_end": round(os.getloadavg()[0], 2)
        if hasattr(os, "getloadavg") else None,
        "peak_heap_mb": round(peak[0] / 2**20),
        "old_gen_peak_mb": round(old_peak / 2**20),
        "post_gc_live_mb": round(live / 2**20),
        "max_heap_mb": round(max_heap / 2**20),
        "margin_pct": round(100 * (1 - peak[0] / max_heap), 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
