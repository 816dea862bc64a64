"""Cumulative-prefix profile of q_ext_similarity_ivfpq_indexed at one SF.

Times each PREFIX of the search pipeline (warm JVM, index on disk):
  probes   -- query-side centroid assignment
  dtab     -- ADC distance table (independent branch)
  cand     -- probes x inverted candidate dedup
  adc      -- + per-candidate ADC distance
  short    -- + shortlist window
  full     -- + raw-vector rerank + final top-k
The per-stage cost is the delta between consecutive rows.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1.0"
    repeat = int(sys.argv[sys.argv.index("--repeat") + 1]) if "--repeat" in sys.argv else 3
    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql.window import Window

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("prof_indexed_stages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from relational_to_doc_oriented_nosql_migrator_spark.operators import similarity as S

    idx = S.build_ivfpq_index(spark, sf_dir)
    S.q_ext_similarity_ivfpq_indexed(spark, sf_dir).count()  # warm-up

    def pipeline_to(stage):
        cents = spark.read.parquet(os.path.join(idx, "centroids"))
        inverted = spark.read.parquet(os.path.join(idx, "inverted"))
        codebook = spark.read.parquet(os.path.join(idx, "codebook"))
        codes = spark.read.parquet(os.path.join(idx, "codes")) \
            .withColumnRenamed("vec_id", "cand_id")
        emb = S._emb(spark, sf_dir)
        qn = (
            emb.filter(F.col("vec_id") % S.QUERY_STRIDE == 0)
            .select("vec_id", F.expr(S._NORM).alias("nrm"), "v")
            .select("vec_id", F.expr("transform(v, x -> x / nrm)").alias("v"))
        )
        probes = S._assign(qn, cents, "query_id", "prank", S.N_PROBE)
        if stage == "probes":
            return probes
        dtab = (
            S._pq_slices(qn)
            .withColumnRenamed("vec_id", "query_id")
            .join(F.broadcast(codebook),
                  F.col("subspace") == F.col("cb_subspace"))
            .select("query_id", "subspace", "code",
                    F.expr(S._PQ_L2).alias("d"))
        )
        if stage == "dtab":
            return dtab
        cand = S._dedup_candidates(spark, sf_dir, probes, inverted)
        if stage == "cand":
            return cand
        adc = S._adc_wide(cand, codes, dtab)
        if stage == "adc":
            return adc
        ws = Window.partitionBy("query_id").orderBy(
            F.asc("adc_dist"), F.asc("cand_id"))
        short = (
            adc.withColumn("r", F.row_number().over(ws))
            .filter(F.col("r") <= S.ADC_SHORTLIST)
            .select("query_id", "cand_id")
        )
        if stage == "short":
            return short
        return S.q_ext_similarity_ivfpq_indexed(spark, sf_dir)

    for stage in ["probes", "dtab", "cand", "adc", "short", "full"]:
        times = []
        for _ in range(repeat):
            df = pipeline_to(stage)
            t0 = time.time()
            # force all columns via an ungrouped agg over hashes (no plan
            # pruning of children, unlike count())
            df.agg(F.count(F.lit(1)),
                   F.sum(F.xxhash64(*df.columns) % 1000000)).collect()
            times.append(round(time.time() - t0, 2))
        times.sort()
        print(json.dumps({"stage": stage, "runs": times,
                          "median": times[len(times) // 2]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
