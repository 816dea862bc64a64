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
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from relational_to_doc_oriented_nosql_migrator_spark.session import get_spark

    spark = get_spark(app_name="sink_heap_probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    sf = os.environ.get("PROBE_SF_DIR", "/tmp/spark_graft_scale/sf10")
    t0 = time.time()
    n = e.queries()["sink_json_collections"](spark, sf).count()
    t = round(time.time() - t0, 1)

    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    peak = 0
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        if str(p.getType()) == "Heap memory":
            peak += p.getPeakUsage().getUsed()
    max_heap = mf.getMemoryMXBean().getHeapMemoryUsage().getMax()
    out = {
        "id": "sink_json_collections",
        "sf_dir": sf,
        "t": t,
        "rows": n,
        "peak_heap_mb": round(peak / 2**20),
        "max_heap_mb": round(max_heap / 2**20),
        "margin_pct": round(100 * (1 - peak / max_heap), 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
