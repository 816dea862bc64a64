"""Deduplication operators (SURVEY §2.11 / BASELINE north star) over the
`documents` table, with DuckDB oracles.

Design for 100 TB: the brute-force pair ops (`ext_dedup_ngram_jaccard`,
`ext_dedup_embedding`) are the small-corpus baselines/oracles; the scale
paths are `ext_dedup_minhash` (LSH banding: candidates come from a
band-bucket shuffle, never a cross join) and `ext_dedup_simhash`
(constant-size fingerprints). All hashing uses md5-derived integers so the
DuckDB oracle can reproduce the exact same signatures — the LSH pipeline is
hash-checked end to end, not just row-counted.

Everything is built-in JVM expressions (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t
from relational_to_doc_oriented_nosql_migrator_spark.operators.text import (
    SQL_TOKENS,
    tokens_col,
)

N_PERM = 64          # minhash permutations
N_BANDS = 16         # bands of 4 rows each
JACCARD_THRESHOLD = 0.95
COSINE_THRESHOLD = 0.99

SQL_TOKSET = f"list_distinct({SQL_TOKENS})"


def _tokset_df(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    )


def q_ext_dedup_exact(spark, sf_dir):
    """Exact dedup on a canonical content key (md5 of the sorted distinct
    token set): hash-groupBy, representative = min(doc_id)."""
    toksets = _tokset_df(spark, sf_dir)
    key = F.md5(F.array_join(F.array_sort("toks"), " "))
    return (
        toksets.select("doc_id", key.alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def q_ext_dedup_ngram_jaccard(spark, sf_dir):
    """Brute-force token-set Jaccard pairs >= threshold (the exactness
    baseline the LSH path is verified against)."""
    toksets = _tokset_df(spark, sf_dir)
    a = toksets.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")
    )
    b = toksets.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
    )
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# minhash signature: for each permutation j, min over tokens of a 60-bit
# md5-derived hash of (j ':' token). Shared bit-for-bit with the oracle.
_SIGS_EXPR = (
    f"transform(sequence(0, {N_PERM - 1}), j -> array_min(transform(toks,"
    " t -> CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', t)),"
    " 1, 15), 16, 10) AS BIGINT))))"
)
_BANDS_EXPR = (
    f"transform(sequence(0, {N_BANDS - 1}), b -> md5(concat(CAST(b AS"
    " STRING), ':', array_join(transform(slice(sigs, b * 4 + 1, 4),"
    " x -> CAST(x AS STRING)), ','))))"
)


def minhash_bands_df(spark, sf_dir):
    """(doc_id, band_key) — one row per band; the LSH blocking relation."""
    toksets = _tokset_df(spark, sf_dir)
    sigs = toksets.withColumn("sigs", F.expr(_SIGS_EXPR))
    return sigs.select(
        "doc_id", F.explode(F.expr(_BANDS_EXPR)).alias("band_key")
    )


def q_ext_dedup_minhash(spark, sf_dir):
    """MinHash-LSH dedup: signatures -> band buckets -> candidate pairs via
    a band-key join (a shuffle, not a cross join) -> exact-Jaccard verify.

    At scale the candidate join shuffles only O(docs x bands) small rows;
    the quadratic work is confined to same-bucket collisions.
    """
    bands = minhash_bands_df(spark, sf_dir)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_key")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    toksets = _tokset_df(spark, sf_dir)
    ta = toksets.select(F.col("doc_id").alias("doc_a"),
                        F.col("toks").alias("toks_a"))
    tb = toksets.select(F.col("doc_id").alias("doc_b"),
                        F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# simhash: 60-bit fingerprint; bit i set iff more tokens have bit i set in
# their md5-derived hash than not (distinct-token weighting).
_SIMHASH_EXPR = (
    "aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, i) -> acc +"
    " IF(size(filter(toks, t -> (shiftright(CAST(conv(substring(md5(t), 1,"
    " 15), 16, 10) AS BIGINT), i) & 1) = 1)) * 2 > size(toks),"
    " shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
)


def q_ext_dedup_simhash(spark, sf_dir):
    """SimHash content fingerprints (constant-size sketch per doc)."""
    toksets = _tokset_df(spark, sf_dir)
    return toksets.select(
        "doc_id", F.expr(_SIMHASH_EXPR).alias("simhash")
    )


def q_ext_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs >= threshold (brute force baseline;
    the LSH-bucketed scale path is ext_similarity_lsh in similarity.py)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        .alias("v")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0 AS DOUBLE),"
        " (acc, x) -> acc + x)"
    )
    norm_a = F.expr(
        "sqrt(aggregate(zip_with(va, va, (x, y) -> x * y),"
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x))"
    )
    norm_b = F.expr(
        "sqrt(aggregate(zip_with(vb, vb, (x, y) -> x * y),"
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x))"
    )
    cos = F.round(dot / (norm_a * norm_b), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
    )


QUERIES = {
    "ext_dedup_exact": q_ext_dedup_exact,
    "ext_dedup_ngram_jaccard": q_ext_dedup_ngram_jaccard,
    "ext_dedup_minhash": q_ext_dedup_minhash,
    "ext_dedup_simhash": q_ext_dedup_simhash,
    "ext_dedup_embedding": q_ext_dedup_embedding,
}

_SQL_SIGS = (
    f"[list_min([('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || t), 1,"
    f" 15))::BIGINT for t in toks]) for j in generate_series(0, {N_PERM - 1})]"
)
_SQL_BANDS = (
    f"[md5(CAST(b AS VARCHAR) || ':' ||"
    f" array_to_string(sigs[b * 4 + 1 : b * 4 + 4], ','))"
    f" for b in generate_series(0, {N_BANDS - 1})]"
)
_SQL_PAIR_JACCARD = (
    "round(len(list_intersect(a.toks, b.toks))::DOUBLE /"
    " (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6)"
)

ORACLES = {
    "ext_dedup_exact": f"""
WITH toksets AS (SELECT doc_id, {SQL_TOKSET} AS toks FROM documents)
SELECT md5(array_to_string(list_sort(toks), ' ')) AS content_key,
       MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_docs
FROM toksets GROUP BY 1
""",
    "ext_dedup_ngram_jaccard": f"""
WITH toksets AS (SELECT doc_id, {SQL_TOKSET} AS toks FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {_SQL_PAIR_JACCARD} AS jaccard
FROM toksets a JOIN toksets b ON a.doc_id < b.doc_id
WHERE {_SQL_PAIR_JACCARD} >= {JACCARD_THRESHOLD}
""",
    "ext_dedup_minhash": f"""
WITH toksets AS (SELECT doc_id, {SQL_TOKSET} AS toks FROM documents),
sigs AS (SELECT doc_id, {_SQL_SIGS} AS sigs FROM toksets),
bands AS (SELECT doc_id, unnest({_SQL_BANDS}) AS band_key FROM sigs),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y ON x.band_key = y.band_key
  WHERE x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b, {_SQL_PAIR_JACCARD} AS jaccard
FROM cand c
JOIN toksets a ON c.doc_a = a.doc_id
JOIN toksets b ON c.doc_b = b.doc_id
WHERE {_SQL_PAIR_JACCARD} >= {JACCARD_THRESHOLD}
""",
    "ext_dedup_simhash": f"""
WITH toksets AS (SELECT doc_id, {SQL_TOKSET} AS toks FROM documents),
hashed AS (
  SELECT doc_id, len(toks) AS n,
         [('0x' || substr(md5(t), 1, 15))::BIGINT for t in toks] AS hs
  FROM toksets
)
SELECT doc_id,
       list_sum([CASE WHEN len(list_filter(hs, h -> (h >> i) & 1 = 1)) * 2 > n
                      THEN (1::BIGINT << i) ELSE 0::BIGINT END
                 for i in generate_series(0, 59)]) AS simhash
FROM hashed
""",
    "ext_dedup_embedding": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) *
              sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e) /
            (sqrt(list_dot_product(a.e, a.e)) *
             sqrt(list_dot_product(b.e, b.e))), 6) >= {COSINE_THRESHOLD}
""",
}
