"""Measurement-only reference variants for tools/ab_compare.py.

NOT part of the engine: each function here reconstructs a superseded
plan shape so a round's rewrite can be adjudicated with the interleaved
same-JVM protocol instead of cross-run one-shots. Variants must stay
value-equivalent to their registered counterparts (ab_compare refuses on
row-count mismatch).
"""
from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def q_dedup_embedding_lsh_fullkeys(spark, sf_dir):
    """The round-8 shape of ext_dedup_embedding_lsh: both merge-join
    sides ship the FULL key array through the bucket shuffle and slice
    per collision (round 9 ships the explode-time prefix). Same pairs,
    same cosines."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        dedup as D,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        similarity as sim,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        footer_rows,
        t,
    )

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    n = footer_rows(sf_dir, "embeddings")
    k = sim.lsh_k(n)
    thr = D.dedup_cosine_threshold(n)
    keys = emb.withColumn("keys", F.expr(sim.tables_expr(k))).select(
        "vec_id",
        "v",
        F.sqrt(F.expr(sim._unrolled_dot("v", "v"))).alias("nrm"),
        "keys",
        F.posexplode("keys").alias("tbl", "bkey"),
    )
    ka = keys.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("nrm_a"), F.col("keys").alias("keys_a"),
        "tbl", "bkey",
    )
    kb = keys.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nrm_b"), F.col("keys").alias("keys_b"),
        "bkey",
    )
    dot = F.expr(sim._unrolled_dot("va", "vb"))
    return (
        ka.join(kb.hint("merge"), "bkey")
        .filter(
            (F.col("vec_a") < F.col("vec_b"))
            & ~F.expr("arrays_overlap(slice(keys_a, 1, tbl),"
                      " slice(keys_b, 1, tbl))")
        )
        .select(
            "vec_a", "vec_b",
            F.round(dot / (F.col("nrm_a") * F.col("nrm_b")), 6)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= thr)
    )


def q_similarity_lsh_fullkeys(spark, sf_dir):
    """The round-8 shape of ext_similarity_lsh: both collision sides
    carry the FULL 12-int key array and slice it per collision inside
    the join condition (round 9 ships the explode-time prefix instead —
    similarity.collision_prefix). Same pair set, same cosines."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        similarity as sim,
    )

    sim._guard_query_set(
        sf_dir, "ext_similarity_lsh",
        bytes_per_query=sim.LSH_TABLES
        * (sim.VEC_ROW_BYTES + 16 + 8 * sim.LSH_TABLES),
    )
    emb = (
        sim._emb(spark, sf_dir, spread=True)
        .withColumn("nrm", F.sqrt(F.expr(sim._unrolled_dot("v", "v"))))
        .withColumn("keys", F.expr(sim.tables_expr(sim.LSH_K)))
    )
    keys = emb.select(
        "vec_id", "v", "nrm", "keys",
        F.posexplode("keys").alias("tbl", "bkey"),
    )
    queries = keys.filter(
        F.col("vec_id") % sim.QUERY_STRIDE == 0
    ).select(
        F.col("vec_id").alias("query_id"), F.col("bkey").alias("qk"),
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm"),
        F.col("keys").alias("qkeys"),
    )
    scored = (
        keys.select(F.col("vec_id").alias("cand_id"), "bkey", "tbl",
                    F.col("v").alias("cv"), F.col("nrm").alias("cnrm"),
                    F.col("keys").alias("ckeys"))
        .join(F.broadcast(queries),
              (F.col("qk") == F.col("bkey"))
              & (F.col("query_id") != F.col("cand_id"))
              & ~F.expr("arrays_overlap(slice(qkeys, 1, tbl),"
                        " slice(ckeys, 1, tbl))"))
        .select(
            "query_id", "cand_id",
            F.round(
                F.expr(sim._unrolled_dot("qv", "cv"))
                / (F.col("qnrm") * F.col("cnrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


def _nest_forced(df):
    """Collapse a nested (c_custkey, c_name, orders array<struct>) frame
    to ONE checksum row that requires every array element: .count() on
    the nested frame lets Catalyst PRUNE the collect_list (the r11 skew
    A/B first measured 0.5s flat for both sides — nothing was being
    aggregated), so the skew adjudication aggregates over the array
    contents instead."""
    return df.agg(
        F.sum(
            F.expr("aggregate(orders, 0L, (acc, x) -> acc + x.o_orderkey)")
        ).alias("order_key_sum"),
        F.sum(F.size(F.coalesce(F.col("orders"), F.expr("array()"))))
        .alias("n_orders"),
    )


def q_nest_salted_forced(spark, sf_dir):
    """join_nest_salted's real nesting plan (salted two-phase
    collect_list) under the forced-materialization checksum."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.relational import (
        nest_salted_df,
    )

    return _nest_forced(nest_salted_df(spark, sf_dir))


def q_nest_unsalted_forced(spark, sf_dir):
    """join_nest_one_to_many's single-shuffle collect_list under the
    same checksum — the side a planted hot FK should hurt."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.relational import (
        nest_one_to_many_df,
    )

    return _nest_forced(nest_one_to_many_df(spark, sf_dir))


def q_graph_pagerank_r11_shape(spark, sf_dir):
    """The r11 shape of ext_graph_pagerank's iteration body: contrib
    aggregation, then a RE-JOIN with the deg frame plus a 1-row n
    cross-join per iteration — every reference re-plans the deg/n
    lineage (138-Exchange physical plan). Superseded in r12 by the
    fused single-agg iteration (deg(dst) = in-edge count on the
    symmetrized graph; teleport carried as a state column). Same values.
    Replicates the full registered query including edge persist +
    eager localCheckpoint so A/B reps time identical lifecycles."""
    from pyspark.sql import Window  # noqa: F401 (parity import)

    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        graph as G,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        footer_rows,
    )

    e = G._edges(spark, sf_dir).persist()
    try:
        n_nodes = footer_rows(sf_dir, "customer") + footer_rows(
            sf_dir, "supplier"
        )
    except FileNotFoundError:
        n_nodes = e.select("src").distinct().count()
    small = n_nodes <= G.PAGERANK_BROADCAST_MAX_NODES
    hint = F.broadcast if small else (lambda df: df)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    state = (
        deg.crossJoin(F.broadcast(n))
        .select(
            F.col("src").alias("node"), "deg", "n",
            F.expr(f"CAST({G.UNIT} AS BIGINT) DIV n").alias("units"),
        )
    )
    teleport = F.expr(
        f"CAST({G.TELEPORT_NUM} AS BIGINT) * {G.UNIT // 100} DIV n"
    )
    for _ in range(G.ITERS):
        contrib = (
            e.join(hint(state), e.src == state.node)
            .select("dst", F.expr("units DIV deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        state = (
            contrib.join(hint(deg), contrib.dst == deg.src)
            .crossJoin(F.broadcast(n))
            .select(
                F.col("dst").alias("node"), "deg", "n",
                (
                    teleport
                    + F.expr(
                        f"{G.DAMPING_NUM} * s DIV {G.DAMPING_DEN}"
                    )
                ).alias("units"),
            )
        )
    out = state.select(
        G._node_label("node").alias("node"),
        "deg",
        (F.col("units").cast("double") / F.lit(float(G.UNIT)))
        .alias("pagerank"),
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def q_basket_pairs_r11_selfjoin(spark, sf_dir):
    """The r11 shape of ext_basket_pairs: distinct (l_orderkey,
    l_partkey) + within-order self-join + pair rollup (four exchanges).
    Superseded in r12 by the single basket aggregation + in-array pair
    expansion. Same pairs, same counts."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.relational import (
        BASKET_MIN_SUPPORT,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        t,
    )

    items = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= BASKET_MIN_SUPPORT)
    )


def q_curation_r11_shape(spark, sf_dir):
    """The r11 shape of ext_curation_pipeline's flag composition: the
    quality / exact-dup / sampling keep flags each built as a separate
    doc_id-keyed frame and re-joined onto the base projection (6-way
    doc_id join), with exact-dup winners via groupBy(ck) + re-join.
    Superseded in r12 by inline per-row flags + one min-over-ck window
    + a broadcast weights join. Same flags, same rows."""
    from pyspark.storagelevel import StorageLevel

    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        dedup as dedup_ops,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.pipeline import (
        PACK_SEQ_LEN,
        decontaminate_from,
        pack_buckets,
        repetition_filter_from,
        sample_stratified_from,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.text import (
        docs_tokenized,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        footer_rows,
    )

    docs_tk = (
        docs_tokenized(spark, sf_dir, spread=True)
        .withColumn("n_chars_seen", F.length("text"))
        .withColumn(
            "punct", F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
        )
        .withColumn(
            "ck",
            F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
            ),
        )
        .drop("text")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    punct_ratio = F.round(
        F.col("punct").cast("double") / F.col("n_chars_seen"), 6
    )
    qual = docs_tk.select(
        "doc_id",
        (
            (F.col("n_chars_seen") >= 100) & (punct_ratio <= F.lit(0.1))
        ).alias("keep_quality"),
    )
    rept = repetition_filter_from(docs_tk).select(
        "doc_id", F.col("keep").alias("keep_repetition")
    )
    exact = docs_tk.select("doc_id", F.col("ck").alias("ck"))
    winners = exact.groupBy("ck").agg(F.min("doc_id").alias("rep"))
    keepex = exact.join(winners, "ck").select(
        "doc_id", (F.col("doc_id") == F.col("rep")).alias("keep_exact")
    )
    near_losers = (
        dedup_ops.minhash_pairs_from(spark, dedup_ops.shingles_from(docs_tk))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("near_loser", F.lit(True))
    )
    decon = decontaminate_from(docs_tk).select("doc_id", "contaminated")
    samp = sample_stratified_from(docs_tk).select(
        "doc_id", F.col("keep").alias("keep_sample")
    )
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT) % 100"
    )
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    base = docs_tk.select(
        "doc_id",
        split.alias("split"),
        F.size(F.col("tk")).alias("n_tokens"),
    )
    keep = (
        F.col("keep_quality")
        & F.coalesce("keep_repetition", F.lit(True))
        & F.col("keep_exact")
        & ~F.coalesce("near_loser", F.lit(False))
        & ~F.coalesce("contaminated", F.lit(False))
        & F.col("keep_sample")
    )
    joined = (
        base.join(qual, "doc_id")
        .join(rept, "doc_id", "left")
        .join(keepex, "doc_id")
        .join(near_losers, "doc_id", "left")
        .join(decon, "doc_id", "left")
        .join(samp, "doc_id")
        .select("doc_id", "split", "n_tokens", keep.alias("keep"))
    )
    n_buckets = pack_buckets(footer_rows(sf_dir, "documents"))
    train = joined.filter(F.col("keep") & (F.col("split") == "train")).select(
        "doc_id",
        "n_tokens",
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16,"
            f" 10) AS BIGINT) % {n_buckets}"
        ).alias("pack_bucket"),
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = train.select(
        "doc_id",
        "pack_bucket",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start"),
    ).select(
        "doc_id",
        "pack_bucket",
        F.expr(f"start div {PACK_SEQ_LEN}").alias("seq_id"),
    )
    return joined.join(packed, "doc_id", "left").select(
        "doc_id", "split", "keep", "pack_bucket", "seq_id"
    )


def q_ivfpq_indexed_unspread_queries(spark, sf_dir):
    """The pre-r12-fix shape of ext_similarity_ivfpq_indexed: the query
    frame rides the raw scan's row-group layout into the probe BNLJ and
    ADC-table projections (no repartition of the filtered query rows).
    Same values — the spread is plan-shape only."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        similarity as S,
    )

    idx = S.build_ivfpq_index(spark, sf_dir)
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
    adc = S._adc_wide(cand, codes, dtab)
    ws = W.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("cand_id")
    )
    short = (
        adc.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= S.ADC_SHORTLIST)
        .select("query_id", "cand_id")
    )
    qv = emb.filter(F.col("vec_id") % S.QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cv = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select("query_id", "cand_id", S._cosine_expr().alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= S.IVFPQ_TOP_K)
    )


def q_basket_pairs_r12_structpair(spark, sf_dir):
    """r12 shape of ext_basket_pairs: the ordered pair crosses the
    rollup exchange as a two-column struct projection (part_a, part_b)
    instead of the r13 packed BIGINT."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t
    from relational_to_doc_oriented_nosql_migrator_spark.operators.relational import (
        BASKET_MIN_SUPPORT,
    )

    baskets = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ids"))
    )
    pairs_expr = (
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2,"
        " size(ids)), y -> struct(x AS part_a, y AS part_b))))"
    )
    return (
        baskets.select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= BASKET_MIN_SUPPORT)
    )


def q_text_entropy_r12_exploded(spark, sf_dir):
    """r12 shape of ext_text_entropy: one exploded row per character into
    two groupBys (vs the r13 in-array sorted-run histogram)."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t

    docs = (
        t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(F.length("text") > 0)
    )
    ch = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("total"),
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)),"
                " i -> substring(text, i, 1))"
            )
        ).alias("c"),
    )
    counts = ch.groupBy("doc_id", "total", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    p = F.col("cnt").cast("double") / F.col("total")
    term = F.round(-p * F.log(p), 9)
    return counts.groupBy("doc_id", "total").agg(
        F.round(
            F.sum(term.cast("decimal(18,9)"))
            .cast("decimal(28,9)")
            .cast("double"),
            6,
        ).alias("entropy"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
    ).select(
        "doc_id", F.col("total").alias("n_chars"), "entropy",
        "n_distinct_chars",
    )


def q_ivfpq_indexed_roundrobin_spread(spark, sf_dir):
    """The r12 (82f2b2a) shape of ext_similarity_ivfpq_indexed: the
    filtered query rows spread with a KEYLESS round-robin repartition —
    the probe row_number window and the distance-table groupBy then each
    re-shuffle the query frame on query_id (vs the r13 hash-on-vec_id
    spread both reuse). Same values."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        similarity as S,
    )

    idx = S.build_ivfpq_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    inverted = spark.read.parquet(os.path.join(idx, "inverted"))
    codebook = spark.read.parquet(os.path.join(idx, "codebook"))
    codes = spark.read.parquet(os.path.join(idx, "codes")) \
        .withColumnRenamed("vec_id", "cand_id")
    emb = S._emb(spark, sf_dir)
    qf = emb.filter(F.col("vec_id") % S.QUERY_STRIDE == 0).repartition(
        S._parallelism(spark)
    )
    qn = (
        qf.select("vec_id", F.expr(S._NORM).alias("nrm"), "v")
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
    adc = S._adc_wide(cand, codes, dtab)
    ws = W.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("cand_id")
    )
    short = (
        adc.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= S.ADC_SHORTLIST)
        .select("query_id", "cand_id")
    )
    qv = emb.filter(F.col("vec_id") % S.QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cv = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select("query_id", "cand_id", S._cosine_expr().alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= S.IVFPQ_TOP_K)
    )


def q_text_pmi_r12_twopass(spark, sf_dir):
    """r12 shape of ext_text_pmi: the corpus scanned+tokenized TWICE —
    one unigram-count explode and one concat-string bigram-count explode
    (vs the r13 fused single-pass combined count)."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.text import (
        PMI_MIN_COUNT,
        docs_tokenized,
        spread_for,
    )

    docs = docs_tokenized(spark, sf_dir, spread=spread_for(sf_dir))
    bigrams_expr = (
        "transform(slice(tk, 1, greatest(size(tk) - 1, 0)),"
        " (x, i) -> concat(x, ' ', element_at(tk, i + 2)))"
    )
    bg = docs.select(F.explode(F.expr(bigrams_expr)).alias("bigram"))
    uni = docs.select(F.explode("tk").alias("tok"))
    c12 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    c1 = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    t_uni = c1.agg(F.sum("c").alias("t_uni"))
    t_bg = c12.agg(F.sum("c12").alias("t_bg"))
    pairs = (
        c12.filter(F.col("c12") >= PMI_MIN_COUNT)
        .withColumn("w1", F.element_at(F.split("bigram", " "), 1))
        .withColumn("w2", F.element_at(F.split("bigram", " "), 2))
        .join(c1.withColumnRenamed("tok", "w1")
                .withColumnRenamed("c", "c1"), "w1")
        .join(c1.withColumnRenamed("tok", "w2")
                .withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_bg))
    )
    ratio = (
        F.col("c12").cast("double") * F.col("t_uni") * F.col("t_uni")
        / (F.col("t_bg").cast("double") * F.col("c1") * F.col("c2"))
    )
    return pairs.select(
        "bigram", "c12", F.round(F.log(ratio), 6).alias("pmi")
    )


def q_similarity_ivf_r13pre_double_shuffle(spark, sf_dir):
    """The pre-r13 tail of ext_similarity_ivf: bare .distinct() (all-key
    exchange) followed by the query_id window's own exchange — two wide
    shuffles of the scored-candidate frame (vs the shared query_id
    repartition). Same values."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        similarity as S,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        footer_rows,
    )

    S._guard_query_set(sf_dir, "ext_similarity_ivf",
                       bytes_per_query=S.N_PROBE * S.VEC_ROW_BYTES)
    emb = S._emb(spark, sf_dir, spread=True)
    n_vec = footer_rows(sf_dir, "embeddings")
    ncent = S.n_centroids(n_vec)
    cents = emb.filter(F.col("vec_id") < ncent).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    inverted = S._assign(emb, cents, "cand_id", "arank", S.N_ASSIGN,
                         pairs_hint=n_vec * ncent).join(
        emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("v").alias("cv"),
                   F.sqrt(F.expr(S._unrolled_dot("v", "v"))).alias("cnrm")),
        "cand_id",
    )
    queries = emb.filter(F.col("vec_id") % S.QUERY_STRIDE == 0)
    probes = S._assign(queries, cents, "query_id", "prank",
                       S.N_PROBE).join(
        queries.select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv"),
                       F.sqrt(F.expr(S._unrolled_dot("v", "v")))
                       .alias("qnrm")),
        "query_id",
    )
    scored = (
        probes.join(inverted, "cent_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id",
            F.round(
                F.expr(S._unrolled_dot("qv", "cv"))
                / (F.col("qnrm") * F.col("cnrm")),
                6,
            ).alias("cosine"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= S.IVF_TOP_K)
    )


def q_dedup_containment_r12_selfjoin(spark, sf_dir):
    """SUPERSEDED shape (pre-r13): the capped posting SELF-JOIN on the
    shingle key (merge-hinted SMJ sorting both posting sides) that the
    registered query replaced with in-bucket ordered-pair expansion
    (minhash_pairs_from / basket_pairs pattern). Adjudication:
    interleaved A/B, in-array over this shape 1.13x at sf1.0 /
    1.09x at sf10; values bit-identical at sf0.001/0.01/0.1."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        dedup as d,
    )

    sh = (
        d._shingle_df(spark, sf_dir)
        .select("doc_id", F.explode("sh").alias("s"))
        .distinct()
    )
    df_counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(
        df_counts.filter(F.col("df") <= d.CONTAIN_DF_CAP).hint("merge"), "s"
    ).select("doc_id", "s")
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pa = rare.select(F.col("doc_id").alias("doc_a"), "s")
    pb = rare.select(F.col("doc_id").alias("doc_b"), "s")
    overlap = (
        pa.join(pb.hint("merge"), "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    return (
        overlap.join(sa.hint("merge"), "doc_a")
        .join(sb.hint("merge"), "doc_b")
        .select(
            "doc_a", "doc_b", "shared",
            F.round(
                F.col("shared").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= d.CONTAIN_THRESHOLD)
    )


def q_fuzzy_join_names_inarray(spark, sf_dir):
    """REJECTED candidate (r13): the SymSpell deletion-key self-join over
    distinct names replaced by in-bucket ordered-pair expansion (the
    containment/minhash pattern). Measured 1.64x SLOWER than the
    registered self-join at sf1.0 (interleaved A/B, trimmed medians
    7.51 vs 4.58 s): the distinct-name frame is tiny (~|names| x ~20
    deletion keys), so the SMJ sorts it replaces are cheap while
    collect_list + array_sort + nested-transform pair expansion run in
    the INTERPRETED higher-order-function path per micro-bucket. The
    pattern pays off on posting lists (containment), not on small
    blocking frames. Kept for re-adjudication. Values identical: per
    deletion key the (nm, k) rows are unique (keys array_distinct'd per
    name), so the in-array (x, y in slice(i+2..)) pairs are exactly the
    join's na < nb rows and the downstream .distinct() sees the
    identical multiset."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        relational as r,
    )

    cust = (
        r.t(spark, sf_dir, "customer")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("nm"))
    )
    dn = cust.select("nm").distinct()
    keys = dn.select(
        "nm", F.explode(F.array_distinct(F.expr(r._DELETE_KEYS))).alias("k")
    )
    pairs_expr = (
        "flatten(transform(ns, (x, i) -> transform(slice(ns, i + 2,"
        " size(ns)), y -> struct(x AS na, y AS nb))))"
    )
    cross = (
        keys.groupBy("k")
        .agg(F.array_sort(F.collect_list("nm")).alias("ns"))
        .filter(F.size("ns") > 1)
        .select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.na", "p.nb")
        .distinct()
        .withColumn("d", F.levenshtein("na", "nb"))
        .filter(F.col("d") <= r.FUZZY_MAX_DIST)
    )
    both_orders = cross.select(
        F.explode(F.array(
            F.struct(F.col("na"), F.col("nb"), F.col("d")),
            F.struct(F.col("nb").alias("na"), F.col("na").alias("nb"),
                     F.col("d")),
        )).alias("p")
    ).select("p.*")
    ordered = both_orders.unionByName(
        dn.select(F.col("nm").alias("na"), F.col("nm").alias("nb"),
                  F.lit(0).alias("d"))
    )
    a = cust.select(F.col("id").alias("id_a"), F.col("nm").alias("na"))
    b = cust.select(F.col("id").alias("id_b"), F.col("nm").alias("nb"))
    return (
        a.join(ordered, "na")
        .join(b, "nb")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.col("na").alias("name_a"), F.col("nb").alias("name_b"),
            F.col("d").cast("int").alias("distance"),
        )
    )


def q_graph_pagerank_r12_unpartitioned_cache(spark, sf_dir):
    """SUPERSEDED shape (pre-r13-continuation): the edge cache persisted
    in its build layout, so every iteration's partial aggregation sees
    each dst's rows scattered over all partitions and its exchange
    ships up to |nodes| x n_partitions partial rows. The registered
    query now caches the edges hash-partitioned on dst on the broadcast
    branch, collapsing each iteration's partial agg to exactly |nodes|
    rows (the exchange itself stays — Spark 4's AQE-wrapped caches
    never forward partitioning to consumers; see the graph.py comment).
    Adjudication (interleaved A/B, dst-partitioned over this shape):
    1.79x at sf0.1, 1.24x at sf1.0; values bit-identical (exact
    integer aggregation, partitioning-independent)."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        graph as g,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        footer_rows,
    )

    e = g._edges(spark, sf_dir).persist()
    try:
        n_nodes = footer_rows(sf_dir, "customer") + footer_rows(
            sf_dir, "supplier"
        )
    except FileNotFoundError:
        n_nodes = e.select("src").distinct().count()
    out = g._pagerank_frame(e, n_nodes)
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def q_fuzzy_join_names_r12_roundrobin_spread(spark, sf_dir):
    """SUPERSEDED shape (pre-r13-continuation): the customer spread as
    keyless round-robin. The registered query now hashes the spread on
    c_name — every downstream step is name-keyed, so the name-hashed
    layout collapses the distinct's partial dedup per partition and
    feeds the id-expansion joins without a relayout. Adjudication
    (interleaved A/B, nm-spread over this shape): **1.20x at sf1.0,
    1.46x at sf10**, new side won every rep pairwise at both scales.
    Values identical (placement-only)."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        relational as r,
    )

    cust = (
        r.t(spark, sf_dir, "customer")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("nm"))
    )
    dn = cust.select("nm").distinct()
    keys = dn.select(
        "nm", F.explode(F.array_distinct(F.expr(r._DELETE_KEYS))).alias("k")
    )
    ka = keys.select(F.col("nm").alias("na"), "k")
    kb = keys.select(F.col("nm").alias("nb"), "k")
    cross = (
        ka.join(kb.hint("merge"), "k")
        .filter(F.col("na") < F.col("nb"))
        .select("na", "nb")
        .distinct()
        .withColumn("d", F.levenshtein("na", "nb"))
        .filter(F.col("d") <= r.FUZZY_MAX_DIST)
    )
    both_orders = cross.select(
        F.explode(F.array(
            F.struct(F.col("na"), F.col("nb"), F.col("d")),
            F.struct(F.col("nb").alias("na"), F.col("na").alias("nb"),
                     F.col("d")),
        )).alias("p")
    ).select("p.*")
    ordered = both_orders.unionByName(
        dn.select(F.col("nm").alias("na"), F.col("nm").alias("nb"),
                  F.lit(0).alias("d"))
    )
    a = cust.select(F.col("id").alias("id_a"), F.col("nm").alias("na"))
    b = cust.select(F.col("id").alias("id_b"), F.col("nm").alias("nb"))
    return (
        a.join(ordered, "na")
        .join(b, "nb")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.col("na").alias("name_a"), F.col("nb").alias("name_b"),
            F.col("d").cast("int").alias("distance"),
        )
    )


def q_mm_decode_features_keyed_spread(spark, sf_dir):
    """REJECTED candidate (r13 continuation): multimodal._spread hashed
    on the unique doc_id instead of round-robin. Interleaved A/B at
    sf1.0: 0.88 vs 0.835 s trimmed medians — flat within noise on a
    sub-second op; unlike the fuzzy-join swap, nothing downstream is
    doc_id-keyed, so the only candidate saving was round-robin's
    sortBeforeRepartition local sort, which does not measure on these
    blob sizes. Round-robin kept (no change, no risk)."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        multimodal as M,
    )

    orig = M._spread
    M._spread = lambda spark_, df: df.repartition(
        spark_.sparkContext.defaultParallelism, "doc_id"
    )
    try:
        return M.q_ext_mm_decode_features(spark, sf_dir)
    finally:
        M._spread = orig


def q_dedup_minhash_keyed_spread(spark, sf_dir):
    """REJECTED candidate (r13 continuation): dedup._spread hashed on
    the unique doc_id instead of round-robin. Interleaved A/B on
    ext_dedup_minhash at sf1.0: 1.17 vs 1.18 s trimmed medians — FLAT
    (1.009). The downstream shingle/band aggregations key on exploded
    shingle/bucket values (explode preserves row locality either way),
    and the verify join on doc_id cannot reuse a cached layout (Spark
    4's AQE-wrapped caches never forward partitioning — the pagerank
    entry's finding), so only the round-robin pre-sort was in play and
    it does not measure. Round-robin kept."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        dedup as D,
    )

    orig = D._spread
    D._spread = lambda spark_, df: df.repartition(
        spark_.sparkContext.defaultParallelism, "doc_id"
    )
    try:
        return D.q_ext_dedup_minhash(spark, sf_dir)
    finally:
        D._spread = orig


def q_graph_pagerank_deg_by_dst(spark, sf_dir):
    """LANDED (r13 continuation) — kept as the adjudication artifact:
    the deg seed aggregation grouped by dst instead of src, measured
    against the then-registered src-grouped shape (A/B: 1.32x at
    sf0.1, 1.05x at sf1.0; cumulative landed pagerank vs the r12
    unpartitioned-cache shape 3.70 -> 1.75 s = 2.11x at sf0.1). On the
    symmetrized graph every (s, d) has its (d, s) mirror, so
    count-by-dst == count-by-src per node over the identical node set —
    and on the dst-partitioned cache the partial agg collapses to one
    row per node (the src grouping sees each node's rows scattered
    across all partitions). This function now mirrors the registered
    query's shape."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        graph as g,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        footer_rows,
    )

    try:
        n_nodes = footer_rows(sf_dir, "customer") + footer_rows(
            sf_dir, "supplier"
        )
    except FileNotFoundError:
        n_nodes = None
    base = g._edges(spark, sf_dir)
    if n_nodes is not None and n_nodes <= g.PAGERANK_BROADCAST_MAX_NODES:
        base = base.repartition(F.col("dst"))
    e = base.persist()
    if n_nodes is None:
        n_nodes = e.select("src").distinct().count()

    small = n_nodes <= g.PAGERANK_BROADCAST_MAX_NODES
    hint = F.broadcast if small else (lambda df: df)
    deg = (
        e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("dst").alias("src"), "deg")
    )
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    teleport = F.expr(
        f"CAST({g.TELEPORT_NUM} AS BIGINT) * {g.UNIT // 100} DIV n"
    )
    state = (
        deg.crossJoin(F.broadcast(n))
        .select(
            F.col("src").alias("node"), "deg",
            teleport.alias("tel"),
            F.expr(f"CAST({g.UNIT} AS BIGINT) DIV n").alias("units"),
        )
    )
    for _ in range(g.ITERS):
        state = (
            e.join(hint(state), e.src == state.node)
            .groupBy("dst")
            .agg(
                F.sum(F.expr("units DIV deg")).alias("s"),
                F.count(F.lit(1)).alias("deg"),
                F.min("tel").alias("tel"),
            )
            .select(
                F.col("dst").alias("node"), "deg", "tel",
                (
                    F.col("tel")
                    + F.expr(f"{g.DAMPING_NUM} * s DIV {g.DAMPING_DEN}")
                ).alias("units"),
            )
        )
    out = state.select(
        g._node_label("node").alias("node"),
        "deg",
        (F.col("units").cast("double") / F.lit(float(g.UNIT)))
        .alias("pagerank"),
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out
