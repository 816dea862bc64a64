"""Isolate the ADC stage's component costs at one SF (warm JVM)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1.0"
    repeat = int(sys.argv[sys.argv.index("--repeat") + 1]) if "--repeat" in sys.argv else 3
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("prof_adc")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from relational_to_doc_oriented_nosql_migrator_spark.operators import similarity as S

    idx = S.build_ivfpq_index(spark, sf_dir)
    S.q_ext_similarity_ivfpq_indexed(spark, sf_dir).count()  # warm-up

    def parts():
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
        dtab = (
            S._pq_slices(qn)
            .withColumnRenamed("vec_id", "query_id")
            .join(F.broadcast(codebook),
                  F.col("subspace") == F.col("cb_subspace"))
            .select("query_id", "subspace", "code",
                    F.expr(S._PQ_L2).alias("d"))
        )
        cand = S._dedup_candidates(spark, sf_dir, probes, inverted)
        return codes, dtab, cand

    def t_codes_w():
        codes, dtab, cand = parts()
        codes.groupBy("cand_id").agg(
            F.expr("transform(array_sort(collect_list(struct(subspace, code))),"
                   " p -> p.code)").alias("code_arr")
        ).agg(F.count(F.lit(1)), F.sum(F.size("code_arr"))).collect()

    def t_dtab_w():
        codes, dtab, cand = parts()
        dtab_w = dtab.groupBy("query_id").agg(
            F.map_from_entries(F.collect_list(F.struct(
                (F.col("subspace") * S.IVFPQ_K + F.col("code")).alias("k"),
                F.col("d").alias("v")))).alias("dmap")
        ).select("query_id", F.expr(
            f"transform(sequence(0, {S.PQ_M * S.IVFPQ_K - 1}), k -> dmap[k])"
        ).alias("darr"))
        dtab_w.agg(F.count(F.lit(1)), F.sum(F.size("darr"))).collect()

    def t_join_only():
        codes, dtab, cand = parts()
        codes_w = codes.groupBy("cand_id").agg(
            F.expr("transform(array_sort(collect_list(struct(subspace, code))),"
                   " p -> p.code)").alias("code_arr"))
        dtab_w = dtab.groupBy("query_id").agg(
            F.map_from_entries(F.collect_list(F.struct(
                (F.col("subspace") * S.IVFPQ_K + F.col("code")).alias("k"),
                F.col("d").alias("v")))).alias("dmap")
        ).select("query_id", F.expr(
            f"transform(sequence(0, {S.PQ_M * S.IVFPQ_K - 1}), k -> dmap[k])"
        ).alias("darr"))
        j = (cand.join(codes_w, "cand_id")
             .join(F.broadcast(dtab_w), "query_id")
             .select("query_id", "cand_id",
                     (F.element_at("code_arr", 1)
                      + F.element_at("darr", 1)).alias("x")))
        j.agg(F.count(F.lit(1)), F.sum("x")).collect()

    def t_full_adc():
        codes, dtab, cand = parts()
        adc = S._adc_wide(cand, codes, dtab)
        adc.agg(F.count(F.lit(1)), F.sum("adc_dist")).collect()

    for name, fn in [("codes_w", t_codes_w), ("dtab_w", t_dtab_w),
                     ("join_only", t_join_only), ("full_adc", t_full_adc)]:
        times = []
        for _ in range(repeat):
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 2))
        times.sort()
        print(json.dumps({"stage": name, "runs": times,
                          "median": times[len(times) // 2]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
