#!/usr/bin/env python
"""sf30 (300x bench-scale) stretch probe of the r12 rewrites
(r12 VERDICT item 7): ext_graph_pagerank, ext_basket_pairs,
ext_curation_pipeline — confirm the removed-shuffle shapes hold two
orders above bench scale, one ledgered row each.

Generates the needed tables once (factor 3 from the sf10 dir, disjoint
key spaces — orders/lineitem/documents plus the customer/supplier
footer-metadata dependents), then times one count() per id with the
probe harness's session settings. Appends JSON lines to
SF100_STRETCH_r13.jsonl.

Usage: PYTHONPATH=/root/repo python tools/stretch_sf30.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_scale/sf10"
OUT = "/tmp/spark_graft_scale/sf30"
LEDGER = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "SF100_STRETCH_r13.jsonl")
TABLES = {"orders", "lineitem", "documents", "customer", "supplier"}


def main():
    from relational_to_doc_oriented_nosql_migrator_spark.session import get_spark

    spark = get_spark(
        app_name="stretch_sf30",
        extra_conf={"spark.cleaner.periodicGC.interval": "1min"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def ledger(rec):
        rec["load_1m"] = round(os.getloadavg()[0], 2)
        with open(LEDGER, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    if not os.path.isdir(OUT):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "gen_scale_data",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "gen_scale_data.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        t0 = time.time()
        tmp = OUT + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        mod.generate(base_dir=BASE, factor=3, out_dir=tmp, spark=spark,
                     verbose=False, only=TABLES)
        os.rename(tmp, OUT)
        ledger({"stage": "gen_sf30", "t": round(time.time() - t0, 1),
                "tables": sorted(TABLES)})

    import __spark_entry__ as e

    qs = e.queries()
    for qid in ("ext_basket_pairs", "ext_curation_pipeline",
                "ext_graph_pagerank"):
        t0 = time.time()
        try:
            n = qs[qid](spark, OUT).count()
            ledger({"stage": "probe", "id": qid, "sf": "sf30",
                    "t": round(time.time() - t0, 1), "rows": n})
        except Exception as exc:  # noqa: BLE001 — ledger the failure
            ledger({"stage": "probe", "id": qid, "sf": "sf30",
                    "t": round(time.time() - t0, 1),
                    "fail": f"{type(exc).__name__}: {exc}"[:300]})
    spark.stop()


if __name__ == "__main__":
    main()
