"""Iterative graph analytics over the relational tables (SURVEY §2.11
extension surface — the reference has no graph path; this is the
"iterative algorithms" family alongside dedup's label propagation).

PageRank here runs a FIXED iteration count in FIXED-POINT integer
arithmetic: ranks live in units of 1e-12 as BIGINT, per-edge
contributions are integer divisions, and the damping update is an
integer multiply-divide. Every operation is exact and order-independent,
so the result is bit-identical at any parallelism AND to a sequential
DuckDB computation — iterative ops are usually rows-only checked; the
fixed-point formulation buys the stronger value-hash gate (a double
formulation was measured to diverge on ~0.25% of nodes from
engine-specific round() boundary behavior). Floats appear exactly once,
in the final display projection.

Scale shape per iteration: one src-keyed equi-join (rank frame onto the
edge list) + one dst-keyed map-side-combined BIGINT aggregation — the
classic Pregel step as two shuffles over |edges|. Ranks/degrees ride a
frame of |nodes| rows. With ITERS fixed and small the lineage stays
shallow (no checkpoint needed; dedup's label propagation documents the
localCheckpoint pattern for open-ended loops). The graph is the
customer<->supplier co-transaction bipartite graph, symmetrized so rank
circulates (a pure bipartite direction would drain all rank to one
side). Truncation note: integer division drops < 1e-12 of mass per hop
(both engines truncate identically for non-negative operands), which is
the standard fixed-point PageRank trade — rank ORDER is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
    footer_rows,
    t,
)

DAMPING_NUM, DAMPING_DEN = 85, 100   # damping 0.85 as an exact ratio
TELEPORT_NUM = 15                    # (1 - damping) numerator
ITERS = 3
UNIT = 10**12                        # fixed-point scale: 1.0 == 1e12 units

# The per-iteration rank/degree broadcast is |nodes|-proportional, so the
# hint that wins at sf0.1 becomes a several-hundred-MB per-iteration ship
# on a 100x graph — and a FORCED hint overrides Spark's size checks and
# fails hard instead of degrading. Gate it: below this node count the
# hinted plan runs (measured 3x faster than Catalyst's cached-edge
# broadcast at sf0.1); above it the hints are dropped and the join
# shuffles both sides on the key, with AQE free to re-elect broadcast
# from RUNTIME sizes (which, unlike the hint, cannot OOM). ~50 B/row in
# the rank frame -> 1M nodes is comfortably under the 64 MB threshold
# with JVM hash-relation overhead.
PAGERANK_BROADCAST_MAX_NODES = 1_000_000


def _edges(spark, sf_dir) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Nodes stay BIGINT end-to-end (customer k -> 2k, supplier k ->
    # 2k+1): every per-iteration join/aggregation then hashes and
    # shuffles 8-byte keys instead of strings, and the cached edge frame
    # is an int pair. The display label ('c<k>'/'s<k>') is reconstructed
    # only in the final projection — same output as building labels
    # up front, measured ~25% faster per Pregel iteration at sf0.1.
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _node_label(col: str):
    """BIGINT node id -> the reference label ('c<custkey>'/'s<suppkey>')
    used in the output schema and the DuckDB oracle."""
    return F.when(
        F.col(col) % 2 == 0,
        F.concat(F.lit("c"), F.expr(f"{col} div 2")),
    ).otherwise(
        F.concat(F.lit("s"), F.expr(f"({col} - 1) div 2"))
    )


def _pagerank_frame(e: DataFrame, n_nodes: int) -> DataFrame:
    """The lazy ITERS-step fixed-point plan over a persisted edge frame.
    Separated from the registered query so tests can lint the physical
    plan of BOTH broadcast branches (the checkpointed result in
    q_ext_graph_pagerank erases lineage)."""
    # Conditional broadcast of the |nodes|-sized rank frame (see
    # PAGERANK_BROADCAST_MAX_NODES): hinted below the gate — with the
    # session's 64 MB auto-broadcast threshold, Catalyst otherwise
    # broadcasts the CACHED |edges| side (accurate cache stats make 1.2M
    # rows look broadcastable) and streams the tiny side through a
    # corpus-sized hash table, measured 3x slower per iteration — and
    # unhinted above it, where the join shuffles on the key and AQE may
    # still elect broadcast from runtime sizes.
    #
    # r12 shape (guide §2.4 — remove shuffles outright): ONE join + ONE
    # aggregation per iteration. The symmetrized edge list makes
    # in-degree == out-degree, so the receiving node's degree falls out
    # of the SAME aggregation that sums its contributions (count of
    # in-edge rows), and the teleport term rides the state frame as a
    # carried column (min() of an all-equal BIGINT — exact). The r11
    # shape re-joined deg and cross-joined the 1-row n frame per
    # iteration; each reference re-planned the deg/n lineage, compounding
    # to a 138-Exchange physical plan whose duplicated subtrees AQE
    # scheduled as real stages (~1.8s/iteration of pure overhead at
    # sf0.1). This plan is 9 exchanges; values are bit-identical
    # (same contribution multiset, integer arithmetic throughout,
    # adjudicated A/B + oracle-hash-checked).
    small = n_nodes <= PAGERANK_BROADCAST_MAX_NODES
    hint = F.broadcast if small else (lambda df: df)
    # r13: the deg seed groups by DST, not src. On the symmetrized
    # graph every (s, d) has its (d, s) mirror, so count-by-dst ==
    # count-by-src per node over the identical node set — and on the
    # dst-partitioned edge cache (q_ext_graph_pagerank) the partial
    # aggregation collapses to one row per node, where the src grouping
    # saw each node's rows scattered across every partition
    # (interleaved A/B: 1.32x at sf0.1, 1.05x at sf1.0, never slower;
    # neutral above the gate where the cache is unpartitioned).
    deg = (
        e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("dst").alias("src"), "deg")
    )
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    teleport = F.expr(f"CAST({TELEPORT_NUM} AS BIGINT) * {UNIT // 100} DIV n")
    state = (
        deg.crossJoin(F.broadcast(n))
        .select(
            F.col("src").alias("node"), "deg",
            teleport.alias("tel"),
            F.expr(f"CAST({UNIT} AS BIGINT) DIV n").alias("units"),
        )
    )
    for _ in range(ITERS):
        state = (
            e.join(hint(state), e.src == state.node)
            .groupBy("dst")
            .agg(
                F.sum(F.expr("units DIV deg")).alias("s"),
                # in-degree == out-degree on the symmetrized graph: this
                # IS deg(dst), no re-join with the deg frame needed
                F.count(F.lit(1)).alias("deg"),
                F.min("tel").alias("tel"),
            )
            .select(
                F.col("dst").alias("node"), "deg", "tel",
                (
                    F.col("tel")
                    + F.expr(f"{DAMPING_NUM} * s DIV {DAMPING_DEN}")
                ).alias("units"),
            )
        )
    return state.select(
        _node_label("node").alias("node"),
        "deg",
        (F.col("units").cast("double") / F.lit(float(UNIT)))
        .alias("pagerank"),
    )


def q_ext_graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 3 iterations, exact fixed-point) over the
    symmetrized customer<->supplier co-transaction graph — the
    influence/centrality score behind entity-importance ranking.

    Every node appears in the degree frame (edges are symmetric, so no
    dangling mass) and the teleport term (0.15 * UNIT) DIV N uses the
    node count via a broadcast 1-row cross join, never the driver. The
    broadcast gate needs only an UPPER BOUND on the node count, and
    |customers| + |suppliers| bounds it by construction — read from
    parquet footer metadata, zero Spark jobs (erring toward the unhinted
    branch slightly early is the safe direction).
    Overflow headroom: per-node contribution sums are bounded by the
    total mass ~UNIT=1e12; the damping multiply peaks ~8.5e13 << 2^63.
    """
    # The edge list feeds deg once plus one join PER iteration — without a
    # persist Spark would redo the orders|><|lineitem join + distinct for
    # every consumer (4x scans at ITERS=3). Cached spill-safely; bench
    # clears caches between runs.
    #
    # r13 (guide §2.3 — aggregate before you shuffle, fully): on the
    # BROADCAST branch the per-iteration join preserves the streamed
    # (edge) side's layout, so caching the edges HASH-PARTITIONED ON dst
    # makes every iteration's partial aggregation see ALL rows of a dst
    # in one partition — each iteration exchange then ships exactly
    # |nodes| partial rows instead of up to |nodes| x n_partitions
    # (edge-frame order, not small). The exchanges themselves cannot be
    # ELIDED: Spark 4's AQE wraps cached plans, and InMemoryTableScan
    # does not forward the cached hashpartitioning to consumers even
    # with canChangeCachedPlanOutputPartitioning=false (verified
    # empirically — a cached repartition("k") + groupBy("k") still plans
    # an ENSURE_REQUIREMENTS exchange), so the win is the partial-agg
    # collapse, not a removed shuffle. Gated on the SAME node-count
    # bound as the broadcast hint: above it the join shuffles both sides
    # on src, which would destroy the dst layout and strand the upfront
    # repartition. Interleaved A/B: 1.79x at sf0.1, 1.24x at sf1.0;
    # values partitioning-independent (exact integer aggregation). The
    # footer-less fallback (planted test graphs) keeps the unpartitioned
    # cache — the node count is unknown until after materialization
    # there, and values are identical either way.
    try:
        n_nodes = footer_rows(sf_dir, "customer") + footer_rows(
            sf_dir, "supplier"
        )
    except FileNotFoundError:
        n_nodes = None
    base = _edges(spark, sf_dir)
    if n_nodes is not None and n_nodes <= PAGERANK_BROADCAST_MAX_NODES:
        base = base.repartition(F.col("dst"))
    e = base.persist()
    if n_nodes is None:
        # Planted graphs (tests) ship only orders/lineitem: fall back to
        # the exact metadata-scale count, which doubles as the
        # edge-cache warmer.
        n_nodes = e.select("src").distinct().count()
    out = _pagerank_frame(e, n_nodes)
    # Materialize the |nodes|-sized result, then RELEASE the edge cache —
    # the dedup label-propagation pattern (dedup.py) — so repeated
    # invocations (oracle suites run the whole registry in one session) don't
    # accumulate ~|edges| cache entries until an external clearCache.
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


QUERIES = {
    "ext_graph_pagerank": q_ext_graph_pagerank,
}

_SQL_EDGES = """
edges0 AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS (
  SELECT 'c' || c AS src, 's' || s AS dst FROM edges0
  UNION ALL
  SELECT 's' || s AS src, 'c' || c AS dst FROM edges0
),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM deg)
"""


def _sql_iter(prev: str, out: str) -> str:
    return f"""
{out}_c AS (
  SELECT e.dst AS node, SUM(r.units // r.deg)::BIGINT AS s
  FROM e JOIN {prev} r ON e.src = r.node GROUP BY e.dst
),
{out} AS (
  SELECT c.node, d.deg, n,
         ({TELEPORT_NUM}::BIGINT * {UNIT // 100} // n
          + {DAMPING_NUM} * c.s // {DAMPING_DEN})::BIGINT AS units
  FROM {out}_c c JOIN deg d ON c.node = d.src CROSS JOIN nn
)"""


ORACLES = {
    "ext_graph_pagerank": (
        "WITH " + _SQL_EDGES + ","
        + f"""
r0 AS (
  SELECT src AS node, deg, n, ({UNIT}::BIGINT // n)::BIGINT AS units
  FROM deg CROSS JOIN nn
)"""
        + "".join(
            "," + _sql_iter(f"r{i}", f"r{i + 1}") for i in range(ITERS)
        )
        + f"\nSELECT node, deg, units::DOUBLE / {float(UNIT)} AS pagerank"
        + f" FROM r{ITERS}\n"
    ),
}
