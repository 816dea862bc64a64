"""Similarity search over the `embeddings` table (SURVEY §2.11 / BASELINE
north star), with DuckDB oracles.

Three paths:
- `ext_similarity_topk`: brute-force cosine top-k — correctness baseline.
  Queries are broadcast, so the scan of the corpus is a single narrow pass
  (no shuffle of the big side) at any scale.
- `ext_similarity_lsh`: multi-table sign-projection LSH (L tables of K sign
  bits, deterministic and engine-independent). Candidates come from bucket
  equi-joins; at 100 TB this is an ANN path: the cross product never
  materializes, only same-bucket collisions do. Recall is bounded against
  brute force in tests/test_ann_recall.py.
- `ext_similarity_ivf`: inverted-file ANN (sampled coarse centroids,
  nprobe probing, exact re-rank).

Cosines are computed in double with sequential fold order and rounded to 6
digits on both engines, so rankings (with vec_id tiebreak) are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import footer_rows, t

TOP_K = 5
QUERY_STRIDE = 50  # vec_id % stride == 0 -> query vector
DIMS = 64          # embedding dimensionality (fixed by the corpus schema)

# BOUNDED-QUERY-SET CONTRACT (r04 verdict watch item): every ANN probe
# here broadcasts query-side relations (the query keys/vectors, and for
# IVF-PQ the |queries| x PQ_M x K ADC distance table) — correct when the
# query set is an external, bounded workload, which is the production
# seam. The REGISTERED queries stand in a benchmark query set by
# striding the corpus (vec_id % QUERY_STRIDE == 0), which makes the
# broadcast corpus-proportional: linear growth that would eventually
# ship multi-GB tables to every executor. This ceiling turns that into a
# loud refusal instead of a silent scale hazard. Checked from parquet
# footer metadata (no Spark job).
#
# The ceiling is sized PER PATH (r05 ADVICE): explicit F.broadcast hints
# bypass spark.sql.autoBroadcastJoinThreshold, so the guard must bound
# the largest relation each operator actually ships, not just the raw
# query vectors — the LSH path broadcasts the LSH_TABLES-exploded key
# frame carrying full vectors (12x the vector bytes), and the IVF-PQ
# paths broadcast a PQ_M*IVFPQ_K-double dense ADC table per query
# (4 KB/query) alongside the probe vectors. Each call site passes its
# widest per-query row; the effective ceiling is the broadcast budget
# divided by that width, capped at the absolute QUERY_SET_CEILING.
QUERY_SET_CEILING = 50_000
# Budget for a FORCED query-side broadcast: the session's 64 MB
# autoBroadcast threshold is the sanity line the hints would otherwise
# sidestep (executors hold the deserialized relation; multi-hundred-MB
# forced broadcasts are the executor-OOM class the r04 explode fix hit).
QUERY_BCAST_BUDGET_BYTES = 64 << 20
# Deserialized per-query row widths (doubles are 8 B; a DIMS-double
# unsafe array adds ~16 B header; ids/norms/keys ride along):
VEC_ROW_BYTES = DIMS * 8 + 48


def _guard_query_set(
    sf_dir: str, op: str, bytes_per_query: int = VEC_ROW_BYTES
) -> None:
    ceiling = min(
        QUERY_SET_CEILING, QUERY_BCAST_BUDGET_BYTES // bytes_per_query
    )
    n_queries = footer_rows(sf_dir, "embeddings") // QUERY_STRIDE
    if n_queries > ceiling:
        raise ValueError(
            f"{op} refuses a corpus-strided query set of ~{n_queries}"
            f" vectors (> {ceiling} at ~{bytes_per_query} broadcast"
            " bytes/query): the query side is broadcast, so it must be"
            " an external BOUNDED workload at scale — pass a real query"
            " set through the builder seam instead of widening the"
            " stride sample"
        )


def _unrolled_dot(a: str, b: str, n: int = DIMS) -> str:
    """Left-to-right unrolled dot product. Arithmetically IDENTICAL to
    the `aggregate(zip_with(...))` sequential fold (same operand order,
    same rounding), but ~1.3-2.4x faster: higher-order-function lambdas
    are interpreted per element, while this flat expression stays inside
    whole-stage codegen. The DuckDB oracles' list_dot_product/list_sum
    fold in the same order, so parity is unaffected (pinned by the
    value-hash suite)."""
    return "(" + " + ".join(
        f"element_at({a}, {i}) * element_at({b}, {i})"
        for i in range(1, n + 1)
    ) + ")"




def _emb(spark, sf_dir, spread: bool = False):
    emb = t(spark, sf_dir, "embeddings")
    if spread:
        # Cosine scoring is CPU-bound; parallelism must not depend on the
        # input file layout (a single-file corpus reads as one partition).
        # Repartition BEFORE the projection so the cast — and everything
        # downstream — runs post-exchange.
        #
        # HASH on vec_id, not round-robin (r13, guide §2.4 share one
        # exchange): vec_id is unique so the spread is as even, the
        # exchange skips round-robin's sortBeforeRepartition local sort,
        # and hashpartitioning(vec_id) survives the broadcast-join
        # centroid scoring into _assign's row_number window
        # partitionBy(vec_id-alias) — the window (and, on the ivfpq
        # query path, the per-query distance-table groupBy) then reuses
        # THIS exchange instead of adding its own. Values are
        # partitioning-independent everywhere downstream (decimal
        # sums/means, min_by argmins, rank-windows with total
        # orderings).
        emb = emb.repartition(
            spark.sparkContext.defaultParallelism, "vec_id"
        )
    return emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )


def _cosine_expr():
    dot = _unrolled_dot("qv", "cv")
    na = _unrolled_dot("qv", "qv")
    nb = _unrolled_dot("cv", "cv")
    return F.round(
        F.expr(dot) / (F.sqrt(F.expr(na)) * F.sqrt(F.expr(nb))), 6
    )


def q_ext_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-k for a fixed query set. Guarded like the
    dedup all-pairs baselines: it broadcasts the corpus-strided query
    frame and scores |corpus| x |queries| pairs, so it refuses past the
    bounded-query-set ceiling (ext_similarity_lsh / _ivf are the scale
    paths; knn_classify inherits the guard through this builder)."""
    _guard_query_set(sf_dir, "ext_similarity_topk")
    emb = _emb(spark, sf_dir, spread=True)
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


# Multi-table sign LSH: L tables of K sign bits each. For neighbors at
# angle θ the per-table collision probability is (1-θ/π)^K; the L-table
# union lifts recall to 1-(1-(1-θ/π)^K)^L while random pairs stay near
# L/2^K of the corpus — the classic recall/candidate dial (K up = fewer
# candidates, L up = more recall). One table of many bits (the naive
# choice) collapses recall on weakly-clustered embeddings. 4x12 measures
# recall@3 0.90 on the isotropic testdata (4x8: 0.73) at a ~1.3x
# candidate-set cost — see tests/test_ann_recall.py.
#
# Two K regimes, because TOP-K SEARCH and THRESHOLD DEDUP sit at
# opposite ends of the recall/candidate dial:
#
# - q_ext_similarity_lsh (top-k ANN, neighbor angle UNKNOWN — on the
#   isotropic testdata nearest neighbors sit near cos ~ 0.5, per-plane
#   collision ~ 0.6) keeps the FIXED 4x12 layout: K is a recall
#   parameter there (0.6^11 ~ 0.4% per-table recall would silently
#   return garbage at scale), candidate cost L*N/2^K is LINEAR in the
#   corpus with a bounded query set, and the 100 TB path for top-k is
#   IVF / IVF-PQ, not wider sign tables.
# - threshold dedup at COSINE_THRESHOLD >= 0.99 (θ <= 8.1°, per-plane
#   collision 0.9856) uses lsh_k(): at that angle even the K=24 cap
#   keeps per-table collision at 0.9856^24 = 0.71 and the 12-table
#   union misses a true pair with prob 0.29^12 ~ 4e-7 — so past the
#   small-corpus floor the threshold math, not bucket arithmetic, sets
#   K, and lsh_k jumps straight to LSH_K_MAX: candidates only FALL
#   with K, and the uniform-bucket estimate N/2^K is the BEST case —
#   real corpora are clustered (the 100x dataset packs 18k vectors
#   into one K=11 bucket = 2.4e9 in-bucket pairs; K=24 measured 51e6,
#   max bucket 1032 — the residue is true near-dup families, which no
#   sign plane can or should split).
LSH_K = 4          # fixed top-k layout; dedup floor at oracle/bench scale
LSH_TABLES = 12
# The first-collision PREFIX array riding a broadcast row: worst case
# LSH_TABLES - 1 elements (a table-(L-1) collision carries every earlier
# key). Priced at 8 B/element — a deliberate 2x safety margin over the
# 4-byte int width tables_expr actually produces (r08 ADVICE: the
# previous comment claimed 8 B was the true width) — plus the unsafe
# array header.
KEYS_ROW_BYTES = 16 + 8 * (LSH_TABLES - 1)
LSH_TARGET_POP = 128   # floor region bound: N <= TARGET * 2^K keeps K=4
LSH_K_MAX = 24


def lsh_k(n_vectors: int) -> int:
    """Sign bits per table for THRESHOLD-dedup LSH over n_vectors.
    LSH_K while the whole corpus fits LSH_TARGET_POP-sized buckets at
    the floor width (driver sf0.01 = 500 and bench sf0.1 = 2000 both
    do, keeping oracles and recorded results unchanged), LSH_K_MAX
    beyond — see the regime note above for why no intermediate K."""
    if n_vectors <= LSH_TARGET_POP * (2 ** LSH_K):
        return LSH_K
    return LSH_K_MAX


def _bit_plane(j: int) -> tuple[int, int | None]:
    """Hyperplane for GLOBAL bit j (1-based, j = t*K + i): the first DIMS
    bits are axis planes sign(v[j]) — for K=4 that reproduces the
    original fixed layout (table t hashed dims t*4+1..t*4+4) bit for
    bit — and bits past the coordinate budget are deterministic
    coordinate-DIFFERENCE planes sign(v[a]-v[b]) (normals e_a - e_b),
    which extend the family to K*L >> DIMS without an RNG: both engines
    see the same literal (a, b) indices, so oracle parity holds by
    construction."""
    if j <= DIMS:
        return j, None
    a = (j * 2654435761) % DIMS + 1
    b = (j * 40503 + 13) % DIMS + 1
    if b == a:
        b = a % DIMS + 1
    return a, b


def tables_expr(k: int, col: str = "v") -> str:
    """Spark SQL array of LSH_TABLES bucket keys (table id in the high
    bits, k sign bits in the low).

    Deliberately a COMPACT higher-order-function expression, not an
    unrolled sum: the plane indices ride as constant-folded literal int
    arrays (data, not code), so the key computation adds O(1) generated
    code to whatever stage it fuses into. An unrolled version measured
    slightly faster in isolation but blew janino's 64 KB method limit
    when the sf0.01 broadcast plan fused both exploded key sides with
    the 192-term unrolled cosine into one whole-stage method — dropping
    the ENTIRE stage to interpreted mode. Bit values are independent
    integer comparisons summed as ints, so HOF-vs-unrolled parity is
    exact (pinned against the original k=4 layout by test)."""
    a_idx, b_idx = [], []
    for j in range(1, LSH_TABLES * k + 1):
        a, b = _bit_plane(j)
        a_idx.append(a)
        b_idx.append(b or 0)  # 0 = axis plane sign(v[a])
    a_lit = "array(" + ", ".join(map(str, a_idx)) + ")"
    b_lit = "array(" + ", ".join(map(str, b_idx)) + ")"
    plane = (
        f"element_at({col}, element_at({a_lit}, t * {k} + i))"
        f" - IF(element_at({b_lit}, t * {k} + i) = 0, CAST(0 AS DOUBLE),"
        f" element_at({col}, element_at({b_lit}, t * {k} + i)))"
    )
    return (
        f"transform(sequence(0, {LSH_TABLES - 1}), t -> t * {2 ** k} +"
        f" aggregate(sequence(1, {k}), 0, (acc, i) -> acc +"
        f" IF({plane} >= CAST(0 AS DOUBLE), shiftleft(1, i - 1), 0)))"
    )


def collision_prefix(keys_col: str = "keys", tbl_col: str = "tbl") -> str:
    """SQL expression for the first `tbl` keys of a row's LSH key array —
    everything the first-collision check needs downstream of the
    posexplode. Compute it ONCE per exploded row, at explode time, and
    ship THIS through the collision join instead of the full
    LSH_TABLES-int array: the prefix averages (L-1)/2 elements, so the
    dedup merge-join shuffle and the similarity query broadcast move
    roughly half the key bytes (r08 verdict #3)."""
    return f"slice({keys_col}, 1, {tbl_col})"


def first_collision_cond(pfx_a: str, pfx_b: str):
    """Join condition keeping a collision only at the FIRST table where
    the pair agrees. Single owner of the invariant it rides on (r08
    verdict #3): tables_expr puts the table id in each key's HIGH bits,
    so keys from different tables can never be equal and "no agreement
    at any earlier table" collapses to one arrays_overlap over the two
    prefixes (both sides sliced at their own explode-time table index,
    which the bucket-key equi-join forces to be the same table; a
    zero-length slice is empty, so table-0 collisions always pass).
    Consumed by q_ext_similarity_lsh, dedup.q_ext_dedup_embedding_lsh,
    and the planted-corpus reference plan in
    tests/test_embedding_lsh_dedup.py."""
    return ~F.expr(f"arrays_overlap({pfx_a}, {pfx_b})")


def sql_table_keys(k: int, col: str = "e") -> str:
    """DuckDB mirror of tables_expr (1-based list indexing, same literal
    plane indices and bit weights)."""
    keys = []
    for t_ in range(LSH_TABLES):
        bits = []
        for i in range(1, k + 1):
            a, b = _bit_plane(t_ * k + i)
            lhs = f"{col}[{a}]" if b is None else f"({col}[{a}] - {col}[{b}])"
            bits.append(
                f"(CASE WHEN {lhs} >= 0 THEN {1 << (i - 1)} ELSE 0 END)"
            )
        keys.append("(" + " + ".join([str(t_ * (2 ** k))] + bits) + ")")
    return "[" + ", ".join(keys) + "]"


# The K-floor instances: what the sf0.01 oracles and the sf0.1 bench see.
_TABLES_EXPR = tables_expr(LSH_K)


def q_ext_similarity_lsh(spark, sf_dir):
    """Multi-table sign-projection LSH top-3: candidates = union of the
    query's bucket across all tables, then exact cosine re-rank.

    Deliberately FIXED 4x12 (not the dedup path's adaptive lsh_k):
    top-k recall at unknown neighbor angles collapses with wide
    tables, candidate cost L*N/2^K stays linear in the corpus under
    the bounded-query-set guard, and the scale path for top-k ANN is
    IVF / IVF-PQ (see the K-regime note at LSH_K)."""
    # widest broadcast: the LSH_TABLES-exploded key frame — each row
    # carries the full vector PLUS its first-collision prefix (worst
    # case L-1 keys), so the guard prices both
    _guard_query_set(
        sf_dir, "ext_similarity_lsh",
        bytes_per_query=LSH_TABLES * (VEC_ROW_BYTES + KEYS_ROW_BYTES),
    )
    # Scoring is BUCKET-LOCAL (the dedup path's shape): query vectors
    # and norms ride the bounded strided broadcast — filtered BEFORE
    # the hint so it ships |corpus|/QUERY_STRIDE vectors, never the
    # whole corpus — and corpus vectors stream from the scan into the
    # inline cosine, so no join ever shuffles (or broadcasts) a
    # corpus-scale vector relation. The candidates-first plan's
    # post-distinct vector fetch only survived because Spark elected
    # to broadcast the 512-byte-per-row corpus side from its 50 MB
    # parquet estimate — the dup_rate OOM class at real scale.
    #
    # FIRST-COLLISION EMISSION: a pair colliding in m of the L tables
    # used to be cosine-scored m times and deduplicated by a distinct
    # over the query_id shuffle — at the 100x dataset that shuffled and
    # sorted ~600M duplicate-laden scored pairs. Both sides now carry
    # their explode-time collision_prefix (the first `tbl` keys — data
    # not code), and the join keeps a collision only at the FIRST table
    # where the pair agrees (first_collision_cond above owns the
    # high-bits invariant). The 192-term cosine then runs once per UNIQUE pair
    # and pairs are unique by construction — no distinct. With the
    # distinct (and its explicit repartition) gone, Spark plants a
    # PARTIAL WindowGroupLimit below the rank window's exchange: each
    # map task locally sorts its scored pairs and ships at most top-3
    # per query, so the shuffle moves ~3*|queries| rows per task
    # instead of every candidate pair (sf10: 158s vs 301s recorded, at
    # identical output). Values are unchanged: same pair set, same
    # cosines, same ranks.
    #
    # spread=True round-robins the corpus before keying: near-dup
    # clusters are ADJACENT in vec_id order, so file-layout splits give
    # one map task the dense cluster whose bucket-mates (and strided
    # query siblings) dominate pair volume — that task alone generated
    # most of the pair volume and ran 6+ min while eleven finished in
    # seconds; a 110 MB round-robin shuffle of the raw vectors spreads
    # generation evenly.
    emb = (
        _emb(spark, sf_dir, spread=True)
        .withColumn("nrm", F.sqrt(F.expr(_unrolled_dot("v", "v"))))
        .withColumn("keys", F.expr(_TABLES_EXPR))
    )
    # Prefix computed at explode time (collision_prefix): only the
    # first-`tbl` slice rides past this select — the full key array is
    # dropped before anything is broadcast or joined.
    keys = emb.select(
        "vec_id", "v", "nrm", "keys",
        F.posexplode("keys").alias("tbl", "bkey"),
    ).select(
        "vec_id", "v", "nrm", "bkey",
        F.expr(collision_prefix("keys", "tbl")).alias("pfx"),
    )
    queries = keys.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("bkey").alias("qk"),
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm"),
        F.col("pfx").alias("qpfx"),
    )
    scored = (
        keys.select(F.col("vec_id").alias("cand_id"), "bkey",
                    F.col("v").alias("cv"), F.col("nrm").alias("cnrm"),
                    F.col("pfx").alias("cpfx"))
        .join(F.broadcast(queries),
              (F.col("qk") == F.col("bkey"))
              & (F.col("query_id") != F.col("cand_id"))
              & first_collision_cond("qpfx", "cpfx"))
        .select(
            "query_id", "cand_id",
            F.round(
                F.expr(_unrolled_dot("qv", "cv"))
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


N_CENTROIDS = 64    # IVF coarse quantizer floor (sampled, not iterated)
N_PROBE = 16        # clusters probed per query
N_ASSIGN = 2        # lists each corpus vector is indexed into (multi-
                    # assignment: 2x index size, and a candidate is found
                    # if EITHER of its lists is probed). probe=16/assign=2
                    # measures recall@3 0.90 on the isotropic testdata
                    # (8/1: 0.53) — multi-assign buys far more recall per
                    # candidate than probing alone (8/2: 0.70 vs 16/1:
                    # 0.63 at the same scan fraction). Per-query scan
                    # fraction ~= assign*probe/centroids of the corpus.
IVF_TOP_K = 3
IVF_CENTROIDS_MAX = 4096


def n_centroids(n_vectors: int) -> int:
    """IVF coarse-quantizer size: the fixed floor at oracle/bench scale
    (N_CENTROIDS while the corpus is at most the sf0.1 bench corpus, so
    recorded results, recall measurements, and the static oracle SQL
    are unchanged), FAISS-style 4*sqrt(N) beyond — with N_PROBE fixed,
    the per-query scan fraction assign*probe/centroids then SHRINKS as
    the corpus grows instead of each probed list growing linearly (a
    fixed 64 left ~6.2k-vector lists at the 100x dataset: ~100k
    candidates x 4k queries = 4e8 scored pairs, and the query timed
    out). Assignment cost is the standard IVF add cost, N x centroids
    cosines in one shuffle-free broadcast pass, capped by
    IVF_CENTROIDS_MAX."""
    import math

    if n_vectors <= 2000:
        return N_CENTROIDS
    return min(IVF_CENTROIDS_MAX, 4 * math.isqrt(n_vectors))


# Above this many (corpus row x centroid) pairs the exact BNLJ+window
# assignment is structurally infeasible: the window's partial
# WindowGroupLimit still LOCALLY SORTS all N x C scored rows before
# pruning, and the sort spills ~24 bytes/pair to disk. Measured wall
# (r12 sf100 stretch): 2M vectors x 4096 centroids = 8.2G pairs =
# ~200 GB of sort spill — the build died with SPILL_OUT_OF_MEMORY /
# "No space left on device". 1e9 pairs (~24 GB spill) is the hand-off
# point to the mapInPandas path below; every driver/bench/probe scale
# up to sf10 (358M pairs) stays on the bit-exact expression path.
ASSIGN_SORT_PAIRS_MAX = 1_000_000_000


def _assign_pandas(emb, cents, id_col, n_keep):
    """CORPUS-SCALE nearest-centroid assignment: Arrow-batched
    mapInPandas with the centroid matrix held ONCE per task (bounded:
    <= IVF_CENTROIDS_MAX x DIMS doubles = 2 MB) — each batch computes
    its cosines as one BLAS matmul and emits only the top-n_keep
    (id, cent_id) pairs. No N x C row materialization, no window, no
    sort spill: the working set is one Arrow batch x C floats.

    This is the FAISS IVF add shape (per-row running top-k over the
    full centroid scan) and the only assignment form that survives
    ~1e9+ pairs (see ASSIGN_SORT_PAIRS_MAX). Semantics mirror _assign:
    rank by round(cosine, 6) descending with ascending-cent_id
    tie-break (stable argsort over centroids pre-sorted by cent_id).
    DOCUMENTED DIVERGENCE from the expression path: BLAS accumulates
    dot products pairwise/SIMD rather than left-to-right, so a cosine
    within ~1 ulp of a 6-decimal rounding boundary can round
    differently and flip a near-tie rank — invisible to ANN recall,
    never exercised by the driver oracles (all driver/bench scales run
    the exact path), and the price of not sorting 200 GB."""
    import numpy as np
    import pandas as pd

    crows = sorted(
        cents.select("cent_id", "cv").collect(), key=lambda r: r.cent_id
    )
    cent_ids = np.fromiter((r.cent_id for r in crows), dtype=np.int64)
    cmat = np.array([r.cv for r in crows], dtype=np.float64)
    cnrm = np.sqrt((cmat * cmat).sum(axis=1))
    keep = min(n_keep, len(crows))

    def assign_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy()
            vmat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            vnrm = np.sqrt((vmat * vmat).sum(axis=1))
            cos = np.round(
                (vmat @ cmat.T) / (vnrm[:, None] * cnrm[None, :]), 6
            )
            # stable argsort over centroids pre-sorted by cent_id =
            # desc-cosine with asc-cent_id tie-break
            top = np.argsort(-cos, axis=1, kind="stable")[:, :keep]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, keep),
                    "cent_id": cent_ids[top].ravel(),
                }
            )

    return emb.select("vec_id", "v").mapInPandas(
        assign_batches, schema=f"{id_col} bigint, cent_id bigint"
    )


def _assign(emb, cents, id_col, out_rank, n_keep, pairs_hint=None):
    """Nearest-centroid assignment by cosine (centroids broadcast; one
    narrow pass over the corpus, no shuffle of the big side — the
    partial WindowGroupLimit prunes to n_keep rows per vector before
    the window exchange). Returns ONLY (id, cent_id): the window's
    sort must stay on 24-byte rows — carrying the 512-byte vector
    through it turned the assignment into a ~200 GB local sort at the
    100x dataset; callers needing vectors re-attach them with one
    id-keyed equi-join of index-sized frames.

    Norms are factored out PER ROW (corpus side) and per centroid: the
    cosine's operand tree per pair — round(dot / (nrm_q * nrm_c), 6) —
    is unchanged, so values are bit-identical to the per-pair _cosine
    _expr and to the oracles' sqrt(dot)*sqrt(dot) denominators, but the
    N x n_centroids inner loop evaluates 64 element products instead
    of 192 (~3x on the dominant assignment cost at scale).

    Negative result (r12): a window-free query-side variant — the
    centroids collapsed to one broadcast array row, per-query cosines
    + top-n via transform/array_sort/slice/explode — measured ~3s
    SLOWER than this plan at sf1.0 (warm full search 5.6s vs 2.3s):
    Spark's higher-order array lambdas are INTERPRETED, so the same
    14M dot-product flops that whole-stage codegen runs in the BNLJ
    here became boxed interpreter work. The ~1.5s this plan costs on
    a 400-query probe set is fixed stage overhead, not compute; keep
    the codegen'd BNLJ + partial WindowGroupLimit shape.

    pairs_hint (corpus rows x centroids, from parquet footer metadata)
    gates the CORPUS-SIDE scale hand-off: past ASSIGN_SORT_PAIRS_MAX
    the window's local sort of all N x C scored rows exceeds any
    realistic spill volume and the Arrow-batched _assign_pandas path
    takes over. Query-side callers pass no hint — bounded query sets
    never approach the gate."""
    if pairs_hint is not None and pairs_hint >= ASSIGN_SORT_PAIRS_MAX:
        return _assign_pandas(emb, cents, id_col, n_keep)
    cents_n = cents.withColumn(
        "cnrm", F.sqrt(F.expr(_unrolled_dot("cv", "cv")))
    )
    scored = emb.select(
        F.col("vec_id").alias(id_col),
        F.col("v").alias("qv"),
        F.sqrt(F.expr(_unrolled_dot("v", "v"))).alias("nrm"),
    ).join(F.broadcast(cents_n), F.lit(True)).select(
        id_col,
        "cent_id",
        F.round(
            F.expr(_unrolled_dot("qv", "cv"))
            / (F.col("nrm") * F.col("cnrm")),
            6,
        ).alias("cent_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cent_cos"), F.asc("cent_id")
    )
    return (
        scored.withColumn(out_rank, F.row_number().over(w))
        .filter(F.col(out_rank) <= n_keep)
        .select(id_col, "cent_id")
    )


def q_ext_similarity_ivf(spark, sf_dir):
    """IVF ANN: sampled coarse centroids -> inverted lists keyed by nearest
    centroid -> queries probe their N_PROBE nearest lists -> exact cosine
    re-rank of only the probed lists' members.

    At 100 TB the corpus is scanned once for assignment (centroids
    broadcast, n_centroids grows ~4*sqrt(N)), the inverted index is a
    partitioned table keyed by cent_id, and each query touches N_PROBE
    lists instead of the full corpus.

    Scoring is LIST-LOCAL: both the inverted lists and the probes carry
    their vectors through the cent_id join (index-sized rows, one
    bounded shuffle) and every probe-list collision is cosine-scored
    inline on the join output, with distinct() deduping the scored
    multi-assign/multi-probe repeats (same rounded value each time)
    BEFORE ranking. The earlier candidates-first plan re-joined pairs
    back to the vector frame — an exchange of every candidate row
    CARRYING a 512-byte query vector (~200 GB at the 100x dataset; the
    query never finished). Oracle (candidates-first) is unchanged: same
    deduped pair set, same vectors, same rounded cosines, same ranks.
    """
    # probe frame (unhinted, but bound it anyway): N_PROBE rows/query
    _guard_query_set(sf_dir, "ext_similarity_ivf",
                     bytes_per_query=N_PROBE * VEC_ROW_BYTES)
    emb = _emb(spark, sf_dir, spread=True)
    n_vec = footer_rows(sf_dir, "embeddings")
    ncent = n_centroids(n_vec)
    cents = emb.filter(F.col("vec_id") < ncent).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    inverted = _assign(emb, cents, "cand_id", "arank", N_ASSIGN,
                       pairs_hint=n_vec * ncent).join(
        emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("v").alias("cv"),
                   F.sqrt(F.expr(_unrolled_dot("v", "v"))).alias("cnrm")),
        "cand_id",
    )
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    probes = _assign(queries, cents, "query_id", "prank", N_PROBE).join(
        queries.select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv"),
                       F.sqrt(F.expr(_unrolled_dot("v", "v")))
                       .alias("qnrm")),
        "query_id",
    )
    # Unhinted on purpose: AQE broadcasts the probes side when the
    # bounded query set is small (no shuffle of the index at all) and
    # falls back to a cent_id-keyed SMJ when it isn't; the inverted
    # side's cross-join lineage keeps its estimate far above the
    # broadcast threshold at any corpus size. Norms ride as columns —
    # same per-pair operand tree as _cosine_expr, a third of the
    # element products.
    scored = (
        probes.join(inverted, "cent_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id",
            F.round(
                F.expr(_unrolled_dot("qv", "cv"))
                / (F.col("qnrm") * F.col("cnrm")),
                6,
            ).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_TOP_K)
    )


_IVFPQ_INDEX_DIRS: dict[tuple, str] = {}


def _corpus_fingerprint(sf_dir: str) -> tuple:
    """(path, mtime, size) of the embeddings source — the index cache
    key, so in-process data regeneration invalidates instead of serving
    a stale index."""
    import glob as _glob

    # abspath throughout: a relative and an absolute spelling of the
    # same corpus must fingerprint identically, or the publish prune
    # would ping-pong two tags inside one prune scope.
    path = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    files = sorted(_glob.glob(path + "*")) or [path]
    sig = []
    for f in files:
        if os.path.isdir(f):
            for p in sorted(_glob.glob(os.path.join(f, "*"))):
                st = os.stat(p)
                sig.append((p, st.st_mtime_ns, st.st_size))
        elif os.path.exists(f):
            st = os.stat(f)
            sig.append((f, st.st_mtime_ns, st.st_size))
    return (os.path.abspath(sf_dir), tuple(sig))


def _index_tag(sf_dir: str, key: tuple) -> tuple[str, str]:
    """(prune-scope tag, full index tag) for the persistent index
    directory name: ivfpq_{sftag}_{paramtag}_{fptag}. The PRUNE SCOPE
    is (corpus path, build params) — so publishing prunes only the
    stale fingerprints of the SAME corpus built with the SAME training
    constants, and a process running with overridden constants (a test
    monkeypatching TRAIN_SAMPLE_MAX, a tuning experiment) publishes
    under its own paramtag and can neither poison nor be pruned by the
    default-constant index every other process reuses. The fingerprint
    tag covers only the data signature (mtimes + sizes), so a
    regenerated corpus rotates the fptag inside an unchanged prune
    scope."""
    import hashlib

    sftag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    build_params = (PQ_M, IVFPQ_K, IVFPQ_TRAIN_ITERS, TRAIN_SAMPLE_MAX,
                    N_ASSIGN)
    paramtag = hashlib.md5(repr(build_params).encode()).hexdigest()[:8]
    fptag = hashlib.md5(repr(key).encode()).hexdigest()[:16]
    scope = f"{sftag}_{paramtag}"
    return scope, f"{scope}_{fptag}"


def ivfpq_index_present(sf_dir: str) -> bool:
    """True when a COMPLETE persistent IVF-PQ index for this corpus
    fingerprint already exists on disk (same root/tag derivation as
    build_ivfpq_index, stat-only — no Spark). Bench telemetry (r12
    verdict item 9): the *_indexed ids' COLD bench rows measure
    build-or-adopt depending on what survived under the index root, so
    the bench JSON stamps which one it was instead of leaving the cold
    column bimodal and unexplained."""
    import tempfile

    key = _corpus_fingerprint(sf_dir)
    _, tag = _index_tag(sf_dir, key)
    persist_root = os.environ.get("SPARK_GRAFT_INDEX_DIR") or os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_index-{os.getuid() if hasattr(os, 'getuid') else 0}",
    )
    out = os.path.join(persist_root, f"ivfpq_{tag}")
    return all(
        os.path.exists(os.path.join(out, rel, "_SUCCESS"))
        for rel in ("centroids", "inverted", "codebook", "codes")
    )


def build_ivfpq_index(spark, sf_dir: str) -> str:
    """Materialize the IVF-PQ index (centroids, inverted lists, trained
    codebook, PQ codes) to parquet — the one-time TRAIN+BUILD pass whose
    output a production search service reads instead of the raw corpus.
    Cached in-process per full index tag (corpus fingerprint + build
    params) — a regenerated corpus, or a constant override, gets a
    fresh index, never a stale or mismatched one.

    At 100 TB this is the index table a nightly job writes (partitioned
    by cent_id for list pruning); searches then touch only these
    compact relations plus |queries| x ADC_SHORTLIST raw rows.

    Persistence is the DEFAULT (r10 verdict task #2 — without it the
    indexed ids trained per process, costing 5.6x their brute-force
    siblings at the sf1.0 sweep): the index lands under a
    corpus-fingerprint-keyed directory and a LATER PROCESS reuses it
    without rebuilding — searches then pay only search. The root is
    SPARK_GRAFT_INDEX_DIR when set, else a fixed location under the
    system temp dir (the session-scratch analog of a warehouse's index
    tablespace). The fingerprint (file mtimes + sizes) keys the
    directory name, so a regenerated corpus can never be served a stale
    index; a partial build (missing relation dirs) is rebuilt.
    Publication is ATOMIC: the build lands in a process-unique temp
    directory under the same root and is os.rename'd to the fingerprint
    path, so a concurrent reader can never pass the completeness check
    mid-build and two concurrent builders can't interleave writes into
    one directory — the loser of the rename race adopts the winner's
    index. After publish, stale sibling indexes in the same PRUNE SCOPE
    (same corpus path AND build params; different fingerprint — a
    regenerated dataset) are pruned, so the root holds at most one
    index per (corpus, params); differently-parameterized indexes are
    never touched. The root is uid-scoped, and like any local cache it
    trusts its owner: _SUCCESS markers are the completeness check, not
    an integrity proof.
    """
    import shutil
    import tempfile

    key = _corpus_fingerprint(sf_dir)
    scope, tag = _index_tag(sf_dir, key)

    def _complete(d: str) -> bool:
        return all(
            os.path.exists(os.path.join(d, rel, "_SUCCESS"))
            for rel in ("centroids", "inverted", "codebook", "codes")
        )

    # The in-process cache is keyed by the FULL tag (fingerprint +
    # build params), not the fingerprint alone: a same-process constant
    # override must miss the cache and build its own index, mirroring
    # the on-disk identity. The hit RE-CHECKS completeness (one cheap
    # stat per relation): a corpus regeneration in another process
    # prunes this dir from under a long-lived session, and without the
    # re-check every later indexed query died on missing files until
    # restart. On failure, fall through and rebuild.
    if tag in _IVFPQ_INDEX_DIRS:
        cached = _IVFPQ_INDEX_DIRS[tag]
        if _complete(cached):
            return cached
        del _IVFPQ_INDEX_DIRS[tag]
    # uid-scoped default root (like Spark's own /tmp scratch dirs): a
    # fixed world-shared path would hand user B a PermissionError on
    # user A's directory — or user A's index.
    persist_root = os.environ.get("SPARK_GRAFT_INDEX_DIR") or os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_index-{os.getuid() if hasattr(os, 'getuid') else 0}",
    )
    # The root lives under a world-writable temp dir at a predictable
    # name, so it MUST be validated before any index under it is
    # trusted: created 0700, and lstat-verified to be a real directory
    # (no symlink indirection) owned by this uid. A squatter who
    # pre-created the path could otherwise plant a directory carrying
    # _SUCCESS markers and have it silently adopted as a "complete"
    # index, poisoning every search. On any violation fall back to a
    # private mkdtemp root — persistence across processes is lost for
    # this run, correctness isn't.
    try:
        os.makedirs(persist_root, mode=0o700, exist_ok=True)
        st = os.lstat(persist_root)
        import stat as _stat

        uid_ok = (not hasattr(os, "getuid")) or st.st_uid == os.getuid()
        if not _stat.S_ISDIR(st.st_mode) or not uid_ok:
            raise OSError(f"untrusted index root: {persist_root}")
    except OSError:
        persist_root = tempfile.mkdtemp(prefix="spark_graft_index_")

    out = os.path.join(persist_root, f"ivfpq_{tag}")
    if _complete(out):
        _IVFPQ_INDEX_DIRS[tag] = out
        return out
    # Build into a process-unique sibling (same filesystem, so the
    # final rename is atomic), publish below.
    build = tempfile.mkdtemp(prefix=f"ivfpq_{tag}.build_",
                             dir=persist_root)
    try:
        emb = _emb(spark, sf_dir, spread=True)
        embn = emb.select(
            "vec_id", F.expr(_NORM).alias("nrm"), "v"
        ).select(
            "vec_id", F.expr("transform(v, x -> x / nrm)").alias("v")
        )
        n_vec = footer_rows(sf_dir, "embeddings")
        cents = embn.filter(
            F.col("vec_id") < n_centroids(n_vec)
        ).select(
            F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
        )
        inverted = _assign(embn, cents, "cand_id", "arank", N_ASSIGN,
                           pairs_hint=n_vec * n_centroids(n_vec))
        sub = _pq_slices(embn)
        codebook = _lloyd_refine(
            _train_slices(spark, sf_dir, embn, sub),
            _pq_codebook(sub, IVFPQ_K), IVFPQ_TRAIN_ITERS,
        )
        codes = _pq_codes(sub, codebook)
        cents.write.mode("overwrite").parquet(
            os.path.join(build, "centroids"))
        inverted.write.mode("overwrite").parquet(
            os.path.join(build, "inverted"))
        codebook.write.mode("overwrite").parquet(
            os.path.join(build, "codebook"))
        codes.write.mode("overwrite").parquet(
            os.path.join(build, "codes"))
    except BaseException:
        # A failed/cancelled persistent build must not orphan its
        # (potentially GBs) temp dir under the long-lived index root —
        # a timed-out probe row would otherwise leak one per attempt.
        shutil.rmtree(build, ignore_errors=True)
        raise
    # Atomic publish. A pre-existing `out` is either another
    # process's complete index (adopt it, drop ours) or a stale
    # partial from a crashed legacy build (replace it). Every
    # rename-race outcome ends with a complete index at `out`: a
    # loser whose replace retry ALSO loses adopts the winner's.
    try:
        os.rename(build, out)
    except OSError:
        if not _complete(out):
            shutil.rmtree(out, ignore_errors=True)
            try:
                os.rename(build, out)
            except OSError:
                # Another process published between our rmtree and
                # rename; its index is the one at `out` now.
                if not _complete(out):
                    raise
        shutil.rmtree(build, ignore_errors=True)
    # Prune stale siblings in the SAME prune scope (same corpus path,
    # same build params — regenerated data left a different-FINGERPRINT
    # index behind): bounds the persistent root to one index per
    # (corpus, params). Different-param siblings are never touched (the
    # no-poisoning contract of _index_tag). A concurrent reader of a
    # pruned dir was already reading an index of data that no longer
    # exists.
    try:
        import glob as _glob

        # A LATE publisher of a stale fingerprint must not prune the
        # regenerated corpus's index. Publish mtimes can't order this
        # (the stale build that finishes LAST has the NEWER mtime), but
        # the corpus can: re-fingerprint it NOW, and only a publisher
        # whose index still describes the live corpus earns the sweep.
        # A stale publisher skips pruning entirely — its own dir is the
        # stale sibling, and the current-fingerprint builder's sweep
        # will collect it.
        if _corpus_fingerprint(sf_dir) == key:
            for d in _glob.glob(
                os.path.join(persist_root, f"ivfpq_{scope}_*")
            ):
                if d != out and ".build_" not in os.path.basename(d):
                    shutil.rmtree(d, ignore_errors=True)
    except OSError:
        pass
    _IVFPQ_INDEX_DIRS[tag] = out
    return out


def q_ext_similarity_ivfpq_indexed(spark, sf_dir):
    """IVF-PQ search against the MATERIALIZED index: identical results
    to q_ext_similarity_ivfpq (same oracle), but the corpus-scale
    training/assignment work is amortized into build_ivfpq_index — the
    search plan reads only the index relations, the strided query
    vectors, and the |queries| x ADC_SHORTLIST raw rows for the refine
    stage. This is the production shape: index nightly, search cheap.
    """
    _guard_query_set(sf_dir, "ext_similarity_ivfpq_indexed",
                     bytes_per_query=PQ_M * IVFPQ_K * 8 + 48)
    idx = build_ivfpq_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    inverted = spark.read.parquet(os.path.join(idx, "inverted"))
    codebook = spark.read.parquet(os.path.join(idx, "codebook"))
    codes = spark.read.parquet(os.path.join(idx, "codes")) \
        .withColumnRenamed("vec_id", "cand_id")
    emb = _emb(spark, sf_dir)
    # Spread the FILTERED query rows before the probe/dtab projections
    # (r12, guide §2.5 input skew): the corpus scan is deliberately
    # unspread here (search never rescans it), so the |queries| rows
    # inherit the scan's row-group layout — and the probe BNLJ amplifies
    # each input row n_centroids-fold (1,788x at sf10), turning a few
    # uneven row groups into a near-single-task stage (profiled 23.3s of
    # the 93.6s sf10 search; 12s -> 2.2s on the isolated stage once
    # spread). The exchange itself moves only the guard-bounded query
    # set (hundreds of rows). Explicit numPartitions: an AQE-coalesced
    # exchange of a 20 KB frame would funnel straight back to 1 task.
    # HASH on vec_id (r13, guide §2.4): unique key = same spread as
    # round-robin, but hashpartitioning(vec_id) is inherited through
    # the probe BNLJ and the per-query projections, so the probe
    # row_number window (partitionBy query_id = vec_id alias) and the
    # distance-table groupBy(query_id) both reuse THIS exchange instead
    # of re-shuffling the query frame once each.
    qf = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).repartition(
        _parallelism(spark), "vec_id"
    )
    qn = (
        qf.select("vec_id", F.expr(_NORM).alias("nrm"), "v")
        .select("vec_id", F.expr("transform(v, x -> x / nrm)").alias("v"))
    )
    probes = _assign(qn, cents, "query_id", "prank", N_PROBE)
    dtab = (
        _pq_slices(qn)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook),
              F.col("subspace") == F.col("cb_subspace"))
        .select("query_id", "subspace", "code",
                F.expr(_PQ_L2).alias("d"))
    )
    cand = _dedup_candidates(spark, sf_dir, probes, inverted)
    adc = _adc_wide(cand, codes, dtab)
    ws = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("cand_id")
    )
    short = (
        adc.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= ADC_SHORTLIST)
        .select("query_id", "cand_id")
    )
    qv = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cv = emb.select(F.col("vec_id").alias("cand_id"),
                    F.col("v").alias("cv"))
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select("query_id", "cand_id", _cosine_expr().alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVFPQ_TOP_K)
    )


def knn_classify_from(topk, labels):
    """k-NN label prediction from any (query_id, cand_id, ...) neighbor
    frame — exact top-k, LSH, or IVF — majority vote of the neighbors'
    labels, ties broken by smallest label.

    Scale shape: the vote aggregation and argmax window operate on
    |queries| * k rows — index-output-sized, never corpus-sized; the
    label relation joins once per side.
    """
    votes = (
        topk.join(labels.withColumnRenamed("vec_id", "cand_id"), "cand_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("label")
    )
    pred = (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )
    truth = labels.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
    )
    # No broadcast hint: truth is corpus-sized (one row per vector);
    # pred is the small side (one row per query). AQE picks the right
    # strategy at runtime — a forced broadcast of truth would ship the
    # whole label relation to every executor at scale.
    return pred.join(truth, "query_id")


def q_ext_knn_classify(spark, sf_dir):
    """k-NN label prediction over the embedding space via the exact
    TOP_K cosine neighbors — the classic downstream consumer of a
    similarity index. Swap in the LSH/IVF frame via knn_classify_from
    for the ANN-backed variant (tests pin ANN-vs-exact agreement)."""
    labels = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return knn_classify_from(q_ext_similarity_topk(spark, sf_dir), labels)


def q_ext_knn_classify_indexed(spark, sf_dir):
    """k-NN label prediction over the IVF-PQ-INDEXED neighbor frame —
    the SCALE path for q_ext_knn_classify (r08 verdict #6): the
    brute-force variant above votes over the guarded all-pairs topk
    (|corpus| x |queries| cosines), while this one votes over
    q_ext_similarity_ivfpq_indexed's shortlist, whose search plan reads
    only the materialized index relations plus |queries| x ADC_SHORTLIST
    refine rows. Vote/argmax shape is shared (knn_classify_from) and
    runs at index-output size either way; the oracle applies the same
    vote SQL to the IVF-PQ top-k oracle (oracle_knn_from)."""
    labels = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return knn_classify_from(
        q_ext_similarity_ivfpq_indexed(spark, sf_dir), labels
    )


def q_ext_embed_centroids(spark, sf_dir):
    """Per-label embedding centroids (class prototypes for classifier
    init / cluster seeding), projected to scalar outputs: member count,
    centroid L2 norm, and the mean of the first dimension.

    Scale shape: posexplode turns the vector column into (label, dim,
    value) rows — 64x the row count but narrow — then ONE aggregation
    keyed by (label, dim) computes every centroid component map-side-
    combined; the norm reduction runs on the |labels| x dims aggregate.
    Component means round before the norm so both engines square and sum
    identical values; the norm sum runs in decimal (order-independent).
    """
    emb = t(spark, sf_dir, "embeddings").select(
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    comp = (
        emb.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                (F.sum(F.col("x").cast("decimal(18,9)")) / F.count("x"))
                .cast("decimal(28,9)")
                .cast("double"),
                6,
            ).alias("c"),
        )
    )
    return comp.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.round(
            F.sqrt(
                F.sum(
                    (F.col("c") * F.col("c")).cast("decimal(28,12)")
                ).cast("double")
            ),
            6,
        ).alias("centroid_norm"),
        F.round(
            F.max(F.when(F.col("dim") == 0, F.col("c"))), 6
        ).alias("c0"),
    )


def q_ext_embed_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding corpus: per-dimension
    min/max over the corpus define a linear code in [0, 255]; output is
    per-vector code statistics (sum/min/max) — the compression pass an
    ANN index runs before storing vectors.

    Scale shape: pass 1 is a 64-row map-side-combined aggregate (per-dim
    min/max); pass 2 re-scans the corpus once, joining the broadcast
    64-row stats relation by dimension — no shuffle of the corpus, no
    driver collection. Outputs are integers end-to-end, so cross-engine
    parity is exact (the reconstruction-error bound is pinned against
    numpy in tests/test_embed_quantize.py instead of the SQL oracle).
    """
    ex = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        ).alias("dim", "x"),
    )
    stats = ex.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    codes = ex.join(F.broadcast(stats), "dim").select(
        "vec_id",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.round(
                (F.col("x") - F.col("lo")) * 255 / (F.col("hi") - F.col("lo")),
                0,
            ).cast("int")
        )
        .alias("code"),
    )
    return codes.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sum("code").cast("long").alias("code_sum"),
        F.min("code").alias("code_min"),
        F.max("code").alias("code_max"),
    )


PQ_M = 8            # subspaces (64 dims -> 8 slices of 8)
PQ_SUB = 8          # dims per subspace
PQ_K = 16           # codewords per subspace (sampled, like the IVF
                    # coarse quantizer — vec_id < PQ_K)


# Unrolled left-to-right (same fold order as an aggregate/zip_with
# lambda, but codegen-friendly — 2.4x faster on the assignment scans).
_PQ_L2 = "(" + " + ".join(
    f"(element_at(sv, {i}) - element_at(cw, {i}))"
    f" * (element_at(sv, {i}) - element_at(cw, {i}))"
    for i in range(1, PQ_SUB + 1)
) + ")"


def _pq_slices(emb):
    """(vec_id, subspace, sv): each vector exploded into its PQ_M
    contiguous PQ_SUB-dim slices — narrow M-fold row expansion, no
    shuffle."""
    return emb.select(
        "vec_id",
        F.explode(F.expr(
            f"transform(sequence(0, {PQ_M - 1}), s ->"
            f" struct(s AS subspace, slice(v, s * {PQ_SUB} + 1, {PQ_SUB})"
            " AS sv))"
        )).alias("e"),
    ).select("vec_id", "e.subspace", "e.sv")


def _pq_codebook(sub, k=None):
    """PQ_M x k sampled codewords (vec_id < k), broadcastable."""
    if k is None:
        k = PQ_K
    return sub.filter(F.col("vec_id") < k).select(
        F.col("subspace").alias("cb_subspace"),
        F.col("vec_id").alias("code"),
        F.col("sv").alias("cw"),
    )


def _lloyd_refine(sub, codebook, iters):
    """k-means (Lloyd) refinement of a PQ codebook: assign every slice to
    its nearest codeword, recompute each codeword as its members' mean,
    repeat. This is PQ TRAINING — each iteration is one corpus scan
    (broadcast-join assignment) plus a (subspace, code, dim)-keyed
    aggregation to |codebook| x dims rows; no shuffle of the corpus by
    anything but the hash agg. Means run in decimal and round to 6
    digits, so the refined codewords are engine-exact.

    Codewords that attract no members simply drop out of the refined
    book (their rows never appear in the means) — the standard empty-
    cluster shrink; assignment below is against surviving codewords.
    """
    for _ in range(iters):
        assigned = sub.join(
            F.broadcast(codebook),
            F.col("subspace") == F.col("cb_subspace"),
        ).select(
            "vec_id", "subspace", "code", "sv",
            F.expr(_PQ_L2).alias("dist"),
        )
        member = assigned.groupBy("vec_id", "subspace").agg(
            F.min_by(F.struct("code", "sv"), F.struct("dist", "code"))
            .alias("m")
        ).select("subspace", F.col("m.code").alias("code"),
                 F.col("m.sv").alias("sv"))
        means = (
            member.select(
                "subspace", "code", F.posexplode("sv").alias("dim", "x")
            )
            .groupBy("subspace", "code", "dim")
            .agg(
                F.round(
                    (F.sum(F.col("x").cast("decimal(18,9)"))
                     / F.count("x"))
                    .cast("decimal(28,9)")
                    .cast("double"),
                    6,
                ).alias("m")
            )
        )
        codebook = (
            means.groupBy("subspace", "code")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("pairs")
            )
            .select(
                F.col("subspace").alias("cb_subspace"),
                "code",
                F.expr("transform(pairs, p -> p.m)").alias("cw"),
            )
        )
    return codebook


def _pq_codes(sub, codebook):
    """Nearest-codeword assignment: (vec_id, subspace, code)."""
    scored = sub.join(
        F.broadcast(codebook),
        F.col("subspace") == F.col("cb_subspace"),
    ).select("vec_id", "subspace", "code", F.expr(_PQ_L2).alias("dist"))
    # min_by over a (dist, code) struct = argmin with deterministic
    # smallest-code tie-break, as a map-side-combinable hash aggregate —
    # no window sort of the M-times-exploded corpus.
    return scored.groupBy("vec_id", "subspace").agg(
        F.min_by("code", F.struct("dist", "code")).alias("code")
    )


def q_ext_embed_pq(spark, sf_dir):
    """Product quantization: each vector's 64 dims split into PQ_M
    8-dim subspaces, each slice snapped to its nearest of PQ_K sampled
    codewords (L2) — the code layout an IVF-PQ index stores instead of
    raw floats (8 bytes/vector here vs 256).

    Scale shape: the codebook is PQ_M x PQ_K = 128 rows, broadcast; the
    corpus is scanned once, exploded by subspace (M-fold narrow rows),
    and assigned via broadcast join + windowed argmin per (vec_id,
    subspace). No corpus shuffle, no quadratic stage; distances are
    computed in identical fold order on both engines so the integer
    argmin (ties to the smallest code) is engine-exact.
    """
    emb = _emb(spark, sf_dir, spread=True)
    sub = _pq_slices(emb)
    return _pq_codes(sub, _pq_codebook(sub))


IVFPQ_TOP_K = 3
IVFPQ_K = 64         # search-path codewords per subspace (6-bit codes);
                     # sampled then Lloyd-refined — the richer book the
                     # SEARCH path trains, vs the layout op's raw sample
IVFPQ_TRAIN_ITERS = 1
# Lloyd/PQ training runs on a bounded deterministic SAMPLE of the corpus
# (r06 verdict task #4): the standard FAISS practice of ~256 training
# vectors per codeword — min(N, 256 * IVFPQ_K) vectors, chosen as the
# first TRAIN_SAMPLE_MAX vec_ids ordered by md5(vec_id) (content-
# independent, engine-identical string ordering of lowercase hex, vec_id
# tiebreak), so both the Spark plan and the DuckDB oracle train on the
# SAME set. Below the cap the sample is the whole corpus and the plan /
# oracle text are unchanged from the unsampled rounds — at driver scale
# (500 vectors) and bench scale (2k) results are byte-identical.
# Assignment (_pq_codes) and search stay exact over the FULL corpus;
# only the codebook-refinement scans shrink. At the 100x dataset this
# cuts Lloyd's input from 200k to 16.4k vectors (-92%).
TRAIN_SAMPLE_FACTOR = 256
TRAIN_SAMPLE_MAX = TRAIN_SAMPLE_FACTOR * IVFPQ_K   # 16384


def train_sample_n(n_vectors: int) -> int:
    return min(n_vectors, TRAIN_SAMPLE_MAX)


def _train_slices(spark, sf_dir, embn, sub):
    """PQ training input: the full slice frame when the corpus fits the
    training budget, else the slices of the md5-ordered sample. The
    sample id set is a TakeOrderedAndProject (per-partition top-N, tiny
    (vec_id, h) rows) broadcast into one narrow join — no corpus
    shuffle, and slicing happens AFTER the sample filter so the 8x
    explode runs on 16k rows, not the corpus."""
    n = footer_rows(sf_dir, "embeddings")
    if n <= TRAIN_SAMPLE_MAX:
        return sub
    samp = (
        embn.select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy(F.asc("h"), F.asc("vec_id"))
        .limit(train_sample_n(n))
        .select("vec_id")
    )
    return _pq_slices(embn.join(F.broadcast(samp), "vec_id"))
ADC_SHORTLIST = 32   # ADC-ranked candidates kept per query for the exact
                     # refine stage (FAISS's IndexRefineFlat pattern)

# Norm computed ONCE per row as a column (an aggregate inside the
# transform lambda would re-evaluate per element — 64x redundant work).
_NORM = f"sqrt({_unrolled_dot('v', 'v')})"


def _parallelism(spark) -> int:
    """The session's configured reducer width, for explicit repartitions
    that must not be AQE-coalesced (AQE sizes reducers from COMPRESSED
    map bytes, and index-derived frames — skinny delta-encoded int
    pairs — compress so well that corpus-scale fan-outs get funneled
    onto one task; an explicit numPartitions is exempt from coalescing).
    """
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


# Below this corpus size the explicit candidate repartition is pure
# overhead (r05 verdict watch item #2: +23% trimmed at sf0.1, measured
# 3.06s -> 2.19s with the gate) — the 1-partition-fusion pathology it
# prevents needs a large candidate fan-out to bite. Measured crossover:
# at 2k vectors (sf0.1) the extra exchange costs ~0.9s with nothing to
# parallelize; at 20k (sf1.0) the repartitioned tail is already ~25%
# faster (6.7s vs 8.5s warm search) and at 200k (sf10) it is the
# difference between 90s and a single ~15-min spilling task. Same
# footer-metadata gating pattern as lsh_k and n_centroids; plan-shape
# only, the deduped pair set is identical.
CAND_REPARTITION_MIN_VECTORS = 10_000


def _dedup_candidates(spark, sf_dir, probes, inverted):
    """Probe-join candidates, deduped. The explicit repartition before
    the distinct matters at scale: the probe join's output fans out
    ~assign*probe/centroids of the corpus per query from an index-sized
    (or, for the materialized variant, one-small-file) input, so
    without it the plan can run the whole distinct + ADC + shortlist
    tail on ONE partition — a 1-partition child satisfies every
    clustering requirement, so no exchange is ever inserted (observed
    at the 100x dataset: a single spilling 14M-group task, ~15 min).
    HashPartitioning(cand_id) is a subset of the distinct keys, so the
    dedup fuses shuffle-free on the repartitioned frame AND
    pre-co-locates the codes join in _adc_wide. Gated on the corpus
    footer row count below CAND_REPARTITION_MIN_VECTORS."""
    cand = (
        probes.join(inverted, "cent_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
    )
    if footer_rows(sf_dir, "embeddings") >= CAND_REPARTITION_MIN_VECTORS:
        cand = cand.repartition(_parallelism(spark), "cand_id")
    return cand.distinct()


def _adc_wide(cand, codes, dtab):
    """ADC distances as ONE expression per candidate row.

    The row-per-subspace formulation — cand x codes x dtab joined on
    (query_id, subspace, code), then a (query_id, cand_id) decimal-sum
    aggregate — multiplies the candidate set by PQ_M and funnels it
    through a final hash aggregate whose AQE-coalesced reducer count is
    estimated from the compressed partial-agg bytes: at the 100x
    dataset that put ~14M groups on ONE task and the search ran 20+
    minutes. Here codes pivot to an 8-int array per candidate (tiny
    grouped shuffle of the codes table) and the per-query table
    broadcasts as a DENSE array slotted by subspace*K+code, so the ADC
    sum is a chain of PQ_M exact decimal adds inline in the candidate
    scan — no fan-out join, no aggregate. Value-identical to the summed
    formulation (decimal addition is exact, order-free).

    The compact array + slot indirection matters as much as the join
    elimination: Spark's map element_at is an O(|map|) LINEAR SCAN of
    ArrayBasedMapData, so a 512-entry map costs ~256 comparisons per
    lookup — PQ_M lookups x |candidates| made the map-keyed first cut
    ~15 minutes at the 100x dataset. The first fix densified per QUERY
    row via `transform(sequence(0,511), k -> dmap[k])` — which is the
    SAME linear scan, O((M*K)^2) boxed comparisons per query; profiled
    at 4.3s of the 7.2s warm sf1.0 indexed search (r12, tools/
    prof_adc.py). Lloyd's empty-cluster gaps are a property of the
    CODEBOOK, not the query — every query's dtab covers exactly the
    surviving (subspace, code) pairs — so the gap layout is computed
    ONCE as a dense slot -> rank array (one tiny global agg,
    array_position paid M*K times total, not per query) and each
    query keeps its distances as a slot-sorted COMPACT array. The
    candidate-side lookup is then two O(1) array subscripts:
    rank = s2r[slot], d = darr[rank] — the FAISS LUT shape. A
    candidate's slot is always populated because codes are assigned
    FROM the surviving book, so the indirection never yields NULL."""
    codes_w = codes.groupBy("cand_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(subspace, code))),"
            " p -> p.code)"
        ).alias("code_arr")
    )
    # Global slot -> rank indirection (1 row): surviving slots sorted,
    # rank = 1-based position. All queries share it; the crossJoin below
    # replicates one 512-int array per query row (~2 KB) instead of
    # paying an O((M*K)^2) scatter per query.
    s2r = (
        dtab.groupBy()
        .agg(
            F.array_sort(
                F.collect_set(F.col("subspace") * IVFPQ_K + F.col("code"))
            ).alias("slots")
        )
        .select(
            F.expr(
                f"transform(sequence(0, {PQ_M * IVFPQ_K - 1}),"
                " k -> CAST(array_position(slots, k) AS INT))"
            ).alias("s2r")
        )
    )
    dtab_w = (
        dtab.groupBy("query_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (F.col("subspace") * IVFPQ_K + F.col("code"))
                        .alias("k"),
                        F.col("d").alias("v"),
                    )
                )
            ).alias("ent")
        )
        .select(
            "query_id",
            F.expr("transform(ent, p -> p.v)").alias("darr"),
        )
        .crossJoin(F.broadcast(s2r))
        # CONTRACT GUARD: the rank indirection is only sound when every
        # query's dtab covers exactly the global surviving slot set
        # (true for both callers: dtab = queries x broadcast full
        # codebook). A future caller passing a per-query-filtered dtab
        # would silently shift every rank after the gap and emit
        # plausible-but-wrong distances — fail loudly instead. Cost:
        # two array-size folds per QUERY row. (array_position encodes a
        # missing slot as 0, not NULL — count the positive ranks.)
        .filter(F.expr(
            "assert_true(size(darr) = size(filter(s2r, r -> r > 0)),"
            " 'ADC dtab does not cover the surviving codebook; the"
            " slot->rank indirection requires one entry per surviving"
            " (subspace, code) pair per query') IS NULL"
        ))
    )
    terms = " + ".join(
        f"CAST(element_at(darr, element_at(s2r, CAST({s} * {IVFPQ_K} +"
        f" element_at(code_arr, {s + 1}) + 1 AS INT))) AS DECIMAL(28,12))"
        for s in range(PQ_M)
    )
    return (
        cand.join(codes_w, "cand_id")
        .join(F.broadcast(dtab_w), "query_id")
        .select(
            "query_id", "cand_id",
            F.round(F.expr(f"CAST(({terms}) AS DOUBLE)"), 6)
            .alias("adc_dist"),
        )
    )


def q_ext_similarity_ivfpq(spark, sf_dir):
    """IVF-PQ ANN search via asymmetric distance computation (ADC): the
    query keeps its exact slices, candidates are represented ONLY by
    their PQ codes, and the approximate L2 distance is a sum of PQ_M
    table lookups — the storage/search layout a billion-vector index
    actually runs (Jégou et al., "Product Quantization for Nearest
    Neighbor Search"), followed by FAISS-style exact refinement of the
    ADC shortlist.

    Pipeline: (1) L2-normalize so PQ's L2 metric is monotone with the
    cosine truth (||a-b||^2 = 2 - 2cos on the unit sphere — without
    this, raw-L2 ADC ranks a different neighbor set than cosine and
    recall collapses to ~0.07 on this corpus); (2) train the codebook:
    IVFPQ_K sampled codewords per subspace + IVFPQ_TRAIN_ITERS Lloyd
    pass(es); (3) IVF candidate generation (probe join); (4) ADC over
    the codes table; (5) exact cosine re-rank of only the ADC_SHORTLIST
    best per query. Measured recall@3 = 0.90 vs brute force at sf0.01
    (tests/test_ann_recall.py pins >= 0.8) — matching the LSH and IVF
    paths.

    Scale shape: training is one corpus scan per Lloyd iteration;
    search scans the CODES table (PQ_M small ints per vector), never
    the raw corpus; raw vectors are fetched only for |queries| x
    ADC_SHORTLIST rows in the refine join. The per-query distance
    table (|queries| x PQ_M x IVFPQ_K rows) and codebook are broadcast.

    Determinism: per-subspace L2 folds sequentially on both engines;
    Lloyd means and the cross-subspace ADC sum run in decimal; every
    rank breaks ties on cand_id — engine-exact end to end.
    """
    # widest broadcast: the dense per-query ADC table (PQ_M*IVFPQ_K
    # doubles) — the probe-vector frame is smaller
    _guard_query_set(sf_dir, "ext_similarity_ivfpq",
                     bytes_per_query=PQ_M * IVFPQ_K * 8 + 48)
    emb = _emb(spark, sf_dir, spread=True)
    embn = emb.select(
        "vec_id", F.expr(_NORM).alias("nrm"), "v"
    ).select(
        "vec_id", F.expr("transform(v, x -> x / nrm)").alias("v")
    )
    # Adaptive coarse-quantizer width (floor 64 at oracle/bench scale):
    # a fixed 64 left ~6.2k-vector lists at the 100x dataset, and the
    # IVF candidate set — which the ADC join multiplies by PQ_M — grew
    # to ~4e8 pairs (3e9 ADC rows); see n_centroids.
    n_vec = footer_rows(sf_dir, "embeddings")
    cents = embn.filter(
        F.col("vec_id") < n_centroids(n_vec)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    inverted = _assign(embn, cents, "cand_id", "arank", N_ASSIGN,
                       pairs_hint=n_vec * n_centroids(n_vec))
    probes = _assign(
        embn.filter(F.col("vec_id") % QUERY_STRIDE == 0), cents,
        "query_id", "prank", N_PROBE,
    )
    sub = _pq_slices(embn)
    codebook = _lloyd_refine(
        _train_slices(spark, sf_dir, embn, sub),
        _pq_codebook(sub, IVFPQ_K), IVFPQ_TRAIN_ITERS,
    )
    codes = _pq_codes(sub, codebook).withColumnRenamed("vec_id", "cand_id")
    # Per-query ADC distance table: |queries| x PQ_M x IVFPQ_K rows.
    dtab = (
        sub.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook),
              F.col("subspace") == F.col("cb_subspace"))
        .select("query_id", "subspace", "code",
                F.expr(_PQ_L2).alias("d"))
    )
    cand = _dedup_candidates(spark, sf_dir, probes, inverted)
    adc = _adc_wide(cand, codes, dtab)
    ws = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("cand_id")
    )
    short = (
        adc.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= ADC_SHORTLIST)
        .select("query_id", "cand_id")
    )
    # Exact refine on RAW vectors (stride-filtered broadcast — see LSH).
    qv = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cv = emb.select(F.col("vec_id").alias("cand_id"),
                    F.col("v").alias("cv"))
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select("query_id", "cand_id", _cosine_expr().alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVFPQ_TOP_K)
    )


QUERIES = {
    "ext_similarity_topk": q_ext_similarity_topk,
    "ext_similarity_lsh": q_ext_similarity_lsh,
    "ext_similarity_ivf": q_ext_similarity_ivf,
    "ext_similarity_ivfpq": q_ext_similarity_ivfpq,
    "ext_similarity_ivfpq_indexed": q_ext_similarity_ivfpq_indexed,
    "ext_knn_classify": q_ext_knn_classify,
    "ext_knn_classify_indexed": q_ext_knn_classify_indexed,
    "ext_embed_centroids": q_ext_embed_centroids,
    "ext_embed_quantize": q_ext_embed_quantize,
    "ext_embed_pq": q_ext_embed_pq,
}

_SQL_COS = (
    "round(list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) *"
    " sqrt(list_dot_product(c.v, c.v))), 6)"
)
_SQL_TABLE_KEYS = sql_table_keys(LSH_K)

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
}


# Rendered by oracle_ivf(n_vectors): the coarse-quantizer width follows
# n_centroids(N) (engine parity past 2000 vectors); at driver scale it
# renders the N_CENTROIDS literal the driver rows were recorded against.
def oracle_ivf(n_vectors: int = 0) -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cent_id, v FROM v
          WHERE vec_id < {n_centroids(n_vectors)}),
assign AS (
  SELECT cand_id, cent_id FROM (
    SELECT q.vec_id AS cand_id, c.cent_id, {_SQL_COS} AS cent_cos,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS} DESC, c.cent_id ASC) AS r
    FROM v q JOIN cents c ON TRUE
  ) WHERE r <= {N_ASSIGN}
),
probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.vec_id AS query_id, c.cent_id, {_SQL_COS} AS cent_cos,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS} DESC, c.cent_id ASC) AS r
    FROM v q JOIN cents c ON TRUE
    WHERE q.vec_id % {QUERY_STRIDE} = 0
  ) WHERE r <= {N_PROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, a.cand_id
  FROM probes p JOIN assign a ON p.cent_id = a.cent_id
  WHERE p.query_id <> a.cand_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT cd.query_id, cd.cand_id, {_SQL_COS} AS cosine,
         row_number() OVER (PARTITION BY cd.query_id
                            ORDER BY {_SQL_COS} DESC, cd.cand_id ASC) AS rank
  FROM cand cd JOIN v q ON q.vec_id = cd.query_id
               JOIN v c ON c.vec_id = cd.cand_id
) WHERE rank <= {IVF_TOP_K}
"""


ORACLES["ext_similarity_ivf"] = oracle_ivf(0)

ORACLES["ext_similarity_lsh"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                  embedding::DOUBLE[] AS v FROM embeddings),
keys AS (SELECT vec_id, v, unnest({_SQL_TABLE_KEYS}) AS bkey FROM v),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
  FROM keys q JOIN keys c ON q.vec_id % {QUERY_STRIDE} = 0
                         AND q.vec_id <> c.vec_id
                         AND q.bkey = c.bkey
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT cd.query_id, cd.cand_id, {_SQL_COS} AS cosine,
         row_number() OVER (PARTITION BY cd.query_id
                            ORDER BY {_SQL_COS} DESC, cd.cand_id ASC) AS rank
  FROM cand cd JOIN v q ON q.vec_id = cd.query_id
               JOIN v c ON c.vec_id = cd.cand_id
) WHERE rank <= 3
"""

# posexplode's dim is 0-based; the DuckDB indexed lambda is 1-based.
ORACLES["ext_embed_centroids"] = """
WITH ex AS (
  SELECT label,
         unnest(list_transform(embedding,
                (x, i) -> {'dim': i - 1, 'x': CAST(x AS DOUBLE)})) AS u
  FROM embeddings
),
comp AS (
  SELECT label, u.dim AS dim, COUNT(*) AS n,
         round(CAST(CAST(SUM(CAST(u.x AS DECIMAL(18,9))) / COUNT(u.x)
                         AS DECIMAL(28,9)) AS DOUBLE), 6) AS c
  FROM ex GROUP BY label, u.dim
)
SELECT label, MAX(n) AS n_vecs,
       round(sqrt(CAST(SUM(CAST(c * c AS DECIMAL(28,12))) AS DOUBLE)), 6)
         AS centroid_norm,
       round(MAX(CASE WHEN dim = 0 THEN c END), 6) AS c0
FROM comp GROUP BY label
"""

# Integer code statistics: both engines compute the identical double
# expression (x - lo) * 255 / (hi - lo) then round half-away-from-zero
# (values are non-negative, so Spark HALF_UP agrees), keeping the oracle
# byte-exact with no float rounding concerns in the output schema.
ORACLES["ext_embed_quantize"] = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ex AS (
  SELECT vec_id,
         unnest(list_transform(v, (x, i) -> {'dim': i - 1, 'x': x})) AS u
  FROM v
),
stats AS (
  SELECT u.dim AS dim, MIN(u.x) AS lo, MAX(u.x) AS hi FROM ex GROUP BY 1
),
codes AS (
  SELECT e.vec_id,
         CASE WHEN s.hi = s.lo THEN 0
              ELSE CAST(round((e.u.x - s.lo) * 255 / (s.hi - s.lo)) AS INT)
         END AS code
  FROM ex e JOIN stats s ON e.u.dim = s.dim
)
SELECT vec_id, COUNT(*) AS n_dims, SUM(code)::BIGINT AS code_sum,
       MIN(code) AS code_min, MAX(code) AS code_max
FROM codes GROUP BY vec_id
"""

# Same slice/codeword L2 in identical fold order; integer output.
ORACLES["ext_embed_pq"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sub AS (
  SELECT vec_id,
         unnest([{{'subspace': s, 'sv': v[s * {PQ_SUB} + 1 : (s + 1) * {PQ_SUB}]}}
                 for s in generate_series(0, {PQ_M - 1})]) AS e
  FROM v
),
flat AS (SELECT vec_id, e.subspace AS subspace, e.sv AS sv FROM sub),
codebook AS (
  SELECT subspace AS cb_subspace, vec_id AS code, sv AS cw
  FROM flat WHERE vec_id < {PQ_K}
),
scored AS (
  SELECT f.vec_id, f.subspace, c.code,
         list_sum([(f.sv[i] - c.cw[i]) * (f.sv[i] - c.cw[i])
                   for i in generate_series(1, {PQ_SUB})]) AS dist
  FROM flat f JOIN codebook c ON f.subspace = c.cb_subspace
)
SELECT vec_id, subspace, code FROM (
  SELECT vec_id, subspace, code,
         row_number() OVER (PARTITION BY vec_id, subspace
                            ORDER BY dist ASC, code ASC) AS r
  FROM scored
) WHERE r = 1
"""

# IVF-PQ search: IVF candidates on NORMALIZED vectors, Lloyd-refined
# codebook (means in decimal, list(m ORDER BY dim) reconstructs the
# codeword arrays), ADC in decimal, then exact cosine refine on RAW
# vectors — every stage mirrors the Spark plan's fold order and
# tie-breaks, so ranks are engine-exact.
#
# Rendered by oracle_ivfpq(n_vectors): past TRAIN_SAMPLE_MAX the Lloyd
# member scan trains on the md5-ordered sample (samp CTE), mirroring
# _train_slices; at or below it the text is the unsampled rendering the
# driver rows were recorded against. Static ORACLES entry = the
# driver-scale rendering; SCALED_ORACLES re-renders per SF.
_SQL_SLICE_L2 = (
    f"list_sum([(f.sv[i] - c.cw[i]) * (f.sv[i] - c.cw[i])"
    f" for i in generate_series(1, {PQ_SUB})])"
)


def oracle_ivfpq(n_vectors: int) -> str:
    if n_vectors <= TRAIN_SAMPLE_MAX:
        samp_cte = ""
        member_from = "FROM flat f JOIN cb0 c ON f.subspace = c.cb_subspace"
    else:
        samp_cte = f"""samp AS (
  SELECT vec_id FROM vn
  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
  LIMIT {train_sample_n(n_vectors)}
),
"""
        member_from = (
            "FROM flat f JOIN samp s ON f.vec_id = s.vec_id"
            " JOIN cb0 c ON f.subspace = c.cb_subspace"
        )
    return f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
vn AS (
  SELECT vec_id,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
  FROM raw
),
cents AS (SELECT vec_id AS cent_id, v FROM vn
          WHERE vec_id < {n_centroids(n_vectors)}),
assign AS (
  SELECT cand_id, cent_id FROM (
    SELECT q.vec_id AS cand_id, c.cent_id, {_SQL_COS} AS cent_cos,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS} DESC, c.cent_id ASC) AS r
    FROM vn q JOIN cents c ON TRUE
  ) WHERE r <= {N_ASSIGN}
),
probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.vec_id AS query_id, c.cent_id, {_SQL_COS} AS cent_cos,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS} DESC, c.cent_id ASC) AS r
    FROM vn q JOIN cents c ON TRUE
    WHERE q.vec_id % {QUERY_STRIDE} = 0
  ) WHERE r <= {N_PROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, a.cand_id
  FROM probes p JOIN assign a ON p.cent_id = a.cent_id
  WHERE p.query_id <> a.cand_id
),
sub AS (
  SELECT vec_id,
         unnest([{{'subspace': s, 'sv': v[s * {PQ_SUB} + 1 : (s + 1) * {PQ_SUB}]}}
                 for s in generate_series(0, {PQ_M - 1})]) AS e
  FROM vn
),
flat AS (SELECT vec_id, e.subspace AS subspace, e.sv AS sv FROM sub),
cb0 AS (
  SELECT subspace AS cb_subspace, vec_id AS code, sv AS cw
  FROM flat WHERE vec_id < {IVFPQ_K}
),
{samp_cte}member AS (
  SELECT subspace, code, sv FROM (
    SELECT f.subspace, c.code, f.sv,
           row_number() OVER (PARTITION BY f.vec_id, f.subspace
                              ORDER BY {_SQL_SLICE_L2} ASC, c.code ASC) AS r
    {member_from}
  ) WHERE r = 1
),
means AS (
  SELECT subspace, code, u.dim AS dim,
         round(CAST(CAST(SUM(CAST(u.x AS DECIMAL(18,9))) / COUNT(u.x)
                         AS DECIMAL(28,9)) AS DOUBLE), 6) AS m
  FROM (
    SELECT subspace, code,
           unnest(list_transform(sv,
                  (x, i) -> {{'dim': i - 1, 'x': x}})) AS u
    FROM member
  ) GROUP BY subspace, code, u.dim
),
cb1 AS (
  SELECT subspace AS cb_subspace, code, list(m ORDER BY dim) AS cw
  FROM means GROUP BY subspace, code
),
codes AS (
  SELECT vec_id AS cand_id, subspace, code FROM (
    SELECT f.vec_id, f.subspace, c.code,
           row_number() OVER (PARTITION BY f.vec_id, f.subspace
                              ORDER BY {_SQL_SLICE_L2} ASC, c.code ASC) AS r
    FROM flat f JOIN cb1 c ON f.subspace = c.cb_subspace
  ) WHERE r = 1
),
dtab AS (
  SELECT f.vec_id AS query_id, f.subspace, c.code,
         {_SQL_SLICE_L2} AS d
  FROM flat f JOIN cb1 c ON f.subspace = c.cb_subspace
  WHERE f.vec_id % {QUERY_STRIDE} = 0
),
adc AS (
  SELECT cd.query_id, cd.cand_id,
         round(CAST(SUM(CAST(d.d AS DECIMAL(28,12))) AS DOUBLE), 6)
           AS adc_dist
  FROM cand cd
  JOIN codes k ON k.cand_id = cd.cand_id
  JOIN dtab d ON d.query_id = cd.query_id AND d.subspace = k.subspace
             AND d.code = k.code
  GROUP BY cd.query_id, cd.cand_id
),
short AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist ASC, cand_id ASC) AS r
    FROM adc
  ) WHERE r <= {ADC_SHORTLIST}
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT s.query_id, s.cand_id, {_SQL_COS} AS cosine,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY {_SQL_COS} DESC, s.cand_id ASC) AS rank
  FROM short s JOIN raw q ON q.vec_id = s.query_id
               JOIN raw c ON c.vec_id = s.cand_id
) WHERE rank <= {IVFPQ_TOP_K}
"""


# Driver-scale rendering (500 vectors — far under TRAIN_SAMPLE_MAX, so
# the unsampled text the r01-r06 rows were recorded against).
ORACLES["ext_similarity_ivfpq"] = oracle_ivfpq(0)

# The indexed variant is result-identical by construction (same stages,
# index relations round-tripped through parquet losslessly) — same oracle.
ORACLES["ext_similarity_ivfpq_indexed"] = ORACLES["ext_similarity_ivfpq"]

def oracle_knn_from(topk_sql: str) -> str:
    """Vote/argmax SQL over ANY (query_id, cand_id, ...) neighbor-frame
    oracle — the single owner of the kNN oracle shape, rendered over the
    exact top-k oracle for ext_knn_classify and over the IVF-PQ oracle
    for ext_knn_classify_indexed (mirroring knn_classify_from)."""
    return f"""
WITH topk AS ({topk_sql}),
votes AS (
  SELECT t.query_id, e.label, COUNT(*) AS votes
  FROM topk t JOIN embeddings e ON e.vec_id = t.cand_id
  GROUP BY t.query_id, e.label
),
pred AS (
  SELECT query_id, label AS pred_label, votes FROM (
    SELECT query_id, label, votes,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY votes DESC, label ASC) AS r
    FROM votes
  ) WHERE r = 1
)
SELECT p.query_id, p.pred_label, p.votes, e.label AS true_label
FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
"""


ORACLES["ext_knn_classify"] = oracle_knn_from(ORACLES["ext_similarity_topk"])
ORACLES["ext_knn_classify_indexed"] = oracle_knn_from(
    ORACLES["ext_similarity_ivfpq"]
)

SCALED_ORACLES = {
    "ext_similarity_ivf": lambda sf_dir: oracle_ivf(
        footer_rows(sf_dir, "embeddings")
    ),
    "ext_similarity_ivfpq": lambda sf_dir: oracle_ivfpq(
        footer_rows(sf_dir, "embeddings")
    ),
    "ext_similarity_ivfpq_indexed": lambda sf_dir: oracle_ivfpq(
        footer_rows(sf_dir, "embeddings")
    ),
    "ext_knn_classify_indexed": lambda sf_dir: oracle_knn_from(
        oracle_ivfpq(footer_rows(sf_dir, "embeddings"))
    ),
}
