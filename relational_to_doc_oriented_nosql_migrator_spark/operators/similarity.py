"""Similarity search over the `embeddings` table (SURVEY §2.11 / BASELINE
north star), with DuckDB oracles.

Two paths:
- `ext_similarity_topk`: brute-force cosine top-k — correctness baseline.
  Queries are broadcast, so the scan of the corpus is a single narrow pass
  (no shuffle of the big side) at any scale.
- `ext_similarity_lsh`: sign-random-projection bucketing (here: signs of the
  leading 8 dimensions — deterministic and engine-independent). Candidates
  come from a bucket equi-join; at 100 TB this is the ANN path: the cross
  product never materializes, only same-bucket collisions do.

Cosines are computed in double with sequential fold order and rounded to 6
digits on both engines, so rankings (with vec_id tiebreak) are identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t

TOP_K = 5
QUERY_STRIDE = 50  # vec_id % stride == 0 -> query vector
N_SIGN_BITS = 8

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE),"
    " (acc, x) -> acc + x)"
)


def _emb(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )


def _cosine_expr():
    dot = _DOT.format(a="qv", b="cv")
    na = _DOT.format(a="qv", b="qv")
    nb = _DOT.format(a="cv", b="cv")
    return F.round(
        F.expr(dot) / (F.sqrt(F.expr(na)) * F.sqrt(F.expr(nb))), 6
    )


def q_ext_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-k for a fixed query set."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    corpus = emb.select(F.col("vec_id").alias("cand_id"),
                        F.col("v").alias("cv"))
    scored = (
        corpus.join(F.broadcast(queries),
                    F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", _cosine_expr().alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


_BUCKET_EXPR = (
    f"aggregate(sequence(1, {N_SIGN_BITS}), 0, (acc, i) -> acc +"
    " IF(element_at(v, i) >= CAST(0 AS DOUBLE), shiftleft(1, i - 1), 0))"
)


def q_ext_similarity_lsh(spark, sf_dir):
    """Sign-projection LSH: search only the query's bucket (top-3)."""
    emb = _emb(spark, sf_dir).withColumn("bucket", F.expr(_BUCKET_EXPR))
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    corpus = emb.select(F.col("vec_id").alias("cand_id"),
                        F.col("v").alias("cv"),
                        F.col("bucket").alias("cb"))
    scored = (
        corpus.join(
            F.broadcast(queries),
            (F.col("qb") == F.col("cb"))
            & (F.col("query_id") != F.col("cand_id")),
        )
        .select("query_id", "cand_id", _cosine_expr().alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


QUERIES = {
    "ext_similarity_topk": q_ext_similarity_topk,
    "ext_similarity_lsh": q_ext_similarity_lsh,
}

_SQL_COS = (
    "round(list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) *"
    " sqrt(list_dot_product(c.v, c.v))), 6)"
)
_SQL_BUCKET = (
    f"list_sum([CASE WHEN e[i] >= 0 THEN (1 << (i - 1)) ELSE 0 END"
    f" for i in generate_series(1, {N_SIGN_BITS})])"
)

ORACLES = {
    "ext_similarity_topk": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_SQL_COS} AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {_SQL_COS} DESC, c.vec_id ASC) AS rank
  FROM v q JOIN v c ON q.vec_id % {QUERY_STRIDE} = 0
                   AND q.vec_id <> c.vec_id
) WHERE rank <= {TOP_K}
""",
    "ext_similarity_lsh": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                  embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {_SQL_BUCKET} AS bucket FROM v)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_SQL_COS} AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {_SQL_COS} DESC, c.vec_id ASC) AS rank
  FROM b q JOIN b c ON q.vec_id % {QUERY_STRIDE} = 0
                   AND q.vec_id <> c.vec_id
                   AND q.bucket = c.bucket
) WHERE rank <= 3
""",
}
