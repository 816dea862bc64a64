#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into text files.

Usage:
  python tools/capture_plans.py --out plans/r12 --suffix _before \
      [--ids id1,id2,...] [--sf-dir /root/testdata/sf0.1]

Writes <out>/<query_id><suffix>.txt for each requested registry id (default:
the bench headline+aux set). Queries whose BUILDERS run eager side effects
(index builds, sink writes, localCheckpoint) still show their final read
plan — for ext_graph_pagerank the pre-checkpoint iteration plan is captured
instead, since the checkpointed frame's plan is a bare scan.

This is a measurement tool (guide §1.1/§7.2): the judge checks plan-shape
claims in OPTIMIZATION_r*.md against these files.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The bench headline + aux set: registry ids keyed by their bench names.
BENCH_IDS = {
    "migrate_full": None,  # special-cased below (multi-collection)
    "q1_pricing": "agg_pricing_summary",
    "nest_one_to_many": "join_nest_one_to_many",
    "m2m_denormalize": "join_denormalize_m2m",
    "dedup_minhash_lsh": "ext_dedup_minhash",
    "similarity_topk": "ext_similarity_topk",
    "session_windows": "ext_session_agg",
    "text_quality": "ext_text_quality",
    "decontaminate": "ext_decontaminate",
    "curation_pipeline": "ext_curation_pipeline",
    "similarity_ivf": "ext_similarity_ivf",
    "mm_frame_sample": "ext_mm_frame_sample",
    "stream_tumbling": None,  # streaming: no batch explain of the final DF
    "events_retention": "ext_events_retention",
    "text_bigram_logprob": "ext_text_bigram_logprob",
    "similarity_ivfpq_indexed": "ext_similarity_ivfpq_indexed",
    "graph_pagerank": "ext_graph_pagerank",
    "similarity_ivfpq_train_full": "ext_similarity_ivfpq",
    "knn_classify_indexed": "ext_knn_classify_indexed",
}


def _explain_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--ids", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from relational_to_doc_oriented_nosql_migrator_spark.session import (
        get_spark,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        all_queries,
    )

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    os.makedirs(args.out, exist_ok=True)

    if args.ids:
        ids = [s.strip() for s in args.ids.split(",") if s.strip()]
    else:
        ids = sorted(
            {v for v in BENCH_IDS.values() if v} | {"ext_graph_pagerank"}
        )

    for qid in ids:
        try:
            if qid == "ext_graph_pagerank":
                # capture the pre-checkpoint iteration plan (the
                # registered query materializes eagerly)
                from relational_to_doc_oriented_nosql_migrator_spark.operators import (  # noqa: E501
                    graph,
                )
                from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (  # noqa: E501
                    footer_rows,
                )

                # persist like the registered query does — the executed
                # plan reads the edge cache, not the raw edge lineage
                # (r13: dst-partitioned below the broadcast gate, so the
                # iteration aggregations reuse the cached partitioning)
                from pyspark.sql import functions as F

                n = footer_rows(args.sf_dir, "customer") + footer_rows(
                    args.sf_dir, "supplier"
                )
                base = graph._edges(spark, args.sf_dir)
                if n <= graph.PAGERANK_BROADCAST_MAX_NODES:
                    base = base.repartition(F.col("dst"))
                e = base.persist()
                df = graph._pagerank_frame(e, n)
            else:
                df = registry[qid](spark, args.sf_dir)
            text = _explain_text(df)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(args.out, f"{qid}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
