"""Profile the warm indexed-kNN pipeline stage by stage at a given SF.

Usage: python tools/prof_indexed.py [sf_dir] [--repeat N]

Times, inside ONE warm JVM (index already built/published):
  assign   -- query-side centroid assignment alone (_assign -> count)
  search   -- full q_ext_similarity_ivfpq_indexed count
  knn      -- full q_ext_knn_classify_indexed count
(Per-stage pipeline prefixes live in tools/prof_indexed_stages.py; the
ADC component isolation in tools/prof_adc.py.)
Each timed AFTER a throwaway warm-up search so JIT/broadcast reuse match
the sweep's warm rows.  Prints one JSON line per stage.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1.0"
    repeat = 3
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("prof_indexed")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from relational_to_doc_oriented_nosql_migrator_spark.operators import similarity as S

    t0 = time.time()
    idx = S.build_ivfpq_index(spark, sf_dir)
    print(json.dumps({"stage": "build_or_load", "sec": round(time.time() - t0, 2),
                      "idx": idx}))
    # warm-up full search once (JIT, parquet footer caches)
    t0 = time.time()
    S.q_ext_similarity_ivfpq_indexed(spark, sf_dir).count()
    print(json.dumps({"stage": "warmup_search", "sec": round(time.time() - t0, 2)}))

    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    emb = S._emb(spark, sf_dir)
    qn = (
        emb.filter(F.col("vec_id") % S.QUERY_STRIDE == 0)
        .select("vec_id", F.expr(S._NORM).alias("nrm"), "v")
        .select("vec_id", F.expr("transform(v, x -> x / nrm)").alias("v"))
    )
    ncents = cents.count()
    nq = qn.count()
    print(json.dumps({"stage": "sizes", "n_centroids": ncents, "n_queries": nq}))

    for name, fn in [
        ("assign", lambda: S._assign(qn, cents, "query_id", "prank", S.N_PROBE)
            .agg(F.count(F.lit(1)), F.sum("cent_id")).collect()),
        ("search", lambda: S.q_ext_similarity_ivfpq_indexed(spark, sf_dir).count()),
        ("knn", lambda: S.q_ext_knn_classify_indexed(spark, sf_dir).count()),
    ]:
        times = []
        for _ in range(repeat):
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 2))
        times.sort()
        print(json.dumps({"stage": name, "runs": times,
                          "median": times[len(times) // 2]}))
    spark.stop()


if __name__ == "__main__":
    main()
