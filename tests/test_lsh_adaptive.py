"""Adaptive-K sign LSH: the bucket-width dial that keeps the LSH
candidate joins linear as the corpus grows (a fixed K=4 left 12.5k
vectors per bucket — ~15e9 in-bucket pairs — at the 100x dataset).

Pins: (1) the K schedule; (2) that the unrolled K=4 expression is
value-identical to the original transform/aggregate construction (the
sf0.01 oracles and measured recall depend on it); (3) Spark/DuckDB key
parity at a K that exercises the coordinate-DIFFERENCE planes (bits past
the 64-dim coordinate budget).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.operators import similarity as sim
from tests.conftest import SF001

# The original fixed-K construction (what shipped before the adaptive
# dial): kept verbatim as the regression reference.
_LEGACY_K4 = (
    f"transform(sequence(0, {sim.LSH_TABLES - 1}), t -> t * {2 ** 4} +"
    f" aggregate(sequence(1, 4), 0, (acc, i) -> acc +"
    f" IF(element_at(v, t * 4 + i) >= CAST(0 AS DOUBLE),"
    " shiftleft(1, i - 1), 0)))"
)


def test_k_schedule():
    # driver (sf0.01) and bench (sf0.1) scales stay at the floor: the
    # oracles' static K=4 SQL and the measured recall@3 remain valid
    assert sim.lsh_k(500) == 4
    assert sim.lsh_k(2000) == 4
    assert sim.lsh_k(2048) == 4
    # past the floor region the THRESHOLD math sets K (see the regime
    # note at LSH_K): the sweep (sf1.0) and 100x probe get full-width
    # tables — intermediate K only multiplies cross-cluster candidates
    # (measured at the 100x dataset: K=11 -> 2.4e9 in-bucket pairs,
    # K=24 -> 51e6)
    assert sim.lsh_k(20_000) == sim.LSH_K_MAX
    assert sim.lsh_k(200_000) == sim.LSH_K_MAX
    assert sim.lsh_k(10**12) == sim.LSH_K_MAX


def test_ivf_centroid_schedule():
    # oracle (sf0.01 = 500) and bench (sf0.1 = 2000) stay at the fixed
    # floor the static oracle SQL and recall floors were measured at
    assert sim.n_centroids(500) == sim.N_CENTROIDS
    assert sim.n_centroids(2000) == sim.N_CENTROIDS
    # FAISS-style 4*sqrt(N) beyond, capped
    assert sim.n_centroids(20_000) == 4 * 141
    assert sim.n_centroids(200_000) == 4 * 447
    assert sim.n_centroids(10**9) == sim.IVF_CENTROIDS_MAX


def test_unrolled_k4_matches_legacy(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    diff = emb.select(
        F.expr(sim.tables_expr(4)).alias("new"),
        F.expr(_LEGACY_K4).alias("old"),
    ).filter("new <> old")
    assert diff.count() == 0


def test_bit_planes_are_valid_indices():
    for k in (4, 8, 16, sim.LSH_K_MAX):
        for t_ in range(sim.LSH_TABLES):
            for i in range(1, k + 1):
                a, b = sim._bit_plane(t_ * k + i)
                assert 1 <= a <= sim.DIMS
                if b is not None:
                    assert 1 <= b <= sim.DIMS
                    assert a != b


@pytest.mark.parametrize("k", [8, sim.LSH_K_MAX])
def test_spark_duckdb_key_parity_with_difference_planes(spark, k):
    assert k * sim.LSH_TABLES > sim.DIMS  # difference planes in play
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    got = {
        (r["vec_id"], r["bkey"])
        for r in emb.select(
            "vec_id", F.explode(F.expr(sim.tables_expr(k))).alias("bkey")
        ).collect()
    }
    want = {
        (r[0], r[1])
        for r in duckdb.sql(
            f"""
            SELECT vec_id, unnest({sim.sql_table_keys(k)}) AS bkey
            FROM (SELECT vec_id, embedding::DOUBLE[] AS e
                  FROM '{SF001}/embeddings.parquet')
            """
        ).fetchall()
    }
    assert got == want


def test_oracle_k_parameterized():
    """r05 ADVICE: the embedding-LSH dedup oracle renders with the SAME
    adaptive K as the engine at every scale — the registered static
    entry is exactly the driver-scale (K=4) rendering, and a
    past-the-floor corpus renders the K_MAX key layout so harnesses
    auditing larger SFs stay exact, not probabilistic."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import dedup

    assert (
        dedup.oracle_embedding_lsh(dedup.ORACLE_SCALE_N_VECTORS)
        == dedup.ORACLES["ext_dedup_embedding_lsh"]
    )
    wide = dedup.oracle_embedding_lsh(1_000_000)
    assert sim.sql_table_keys(sim.LSH_K_MAX) in wide
    assert wide != dedup.ORACLES["ext_dedup_embedding_lsh"]
