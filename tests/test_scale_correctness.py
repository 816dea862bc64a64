"""Oracle parity at the 10x scale dataset: correctness isn't an sf0.01
artifact. Runs two representative queries (the 6M-row pricing aggregate
and exact dedup over the 50k-doc corpus) against DuckDB on the scaled
parquet. Skips when the scale dataset hasn't been generated
(tools/gen_scale_data.py / first bench run creates it)."""

import glob
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SCALE_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale/sf1.0"
)

TABLES = ("region nation customer supplier part orders lineitem events"
          " documents embeddings").split()


def _con():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SCALE_DIR, f"{t}.parquet")
        files = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{files}')"
        )
    return con


def _cell(v):
    # At sf1.0 decimal sums reach 17 significant digits — past double's
    # 15.95 — where DuckDB's int128->double conversion double-rounds while
    # Spark's BigDecimal rounds once. Quantize floats to 14 significant
    # digits so the comparison tests values, not last-ulp conversion
    # artifacts (the driver's string-exact gate runs at sf0.01 where sums
    # fit a double exactly).
    if isinstance(v, float):
        return f"{v:.14e}"
    return str(v)


@pytest.mark.skipif(
    not glob.glob(os.path.join(SCALE_DIR, "lineitem.parquet*")),
    reason="scale dataset not generated",
)
@pytest.mark.parametrize("qid", [
    "agg_pricing_summary", "ext_dedup_exact",
    # round-4 ops over the big tables: 6M-row histogram profile, 100k-
    # event changelog compaction, range-frame smoothing
    "ext_histogram", "ext_cdc_merge_latest", "ext_moving_avg",
    # 480k-edge fixed-point PageRank: the integer formulation is exact at
    # ANY volume, so the 10x run uses the same string-exact gate
    "ext_graph_pagerank",
    # newest text/dedup/window ops: chunking a 50k-doc corpus, the
    # 7.5M-shingle dup-rate merge join (this is the volume where its
    # would-be broadcast plan OOMed — the merge hint is what this gate
    # proves), and 15k-customer deciles
    # 15k-customer deciles also prove the round-5 distributed-exact-rank
    # construction at 10x, where the range partitioner actually spreads
    # the frame. (Its sibling rewrite ext_text_perplexity_bucket runs on
    # the unigram-LM score, which at 50k docs carries the same
    # int128->double conversion ulp as corr_stats — string-exact only at
    # the sf0.01 driver gate; the 10x sweep still executes it.)
    "ext_text_chunk", "ext_dedup_dup_rate", "ext_window_ntile",
    # merge-hinted train-shingle join (same OOM class as dup_rate; its
    # hint-fixed siblings ext_dedup_containment / ext_dedup_embedding_lsh
    # are proven at sf1.0 too — 39 s / 170 s on a 1g vanilla driver — but
    # are too slow for the per-run gate)
    "ext_decontaminate",
])
def test_oracle_parity_at_sf1(spark, qid):
    sdf = entrymod.queries()[qid](spark, SCALE_DIR)
    cols = sorted(sdf.columns)
    sset = sorted(
        tuple(_cell(r[c]) for c in cols) for r in sdf.collect()
    )
    cur = _con().execute(entrymod.oracle_sql()[qid])
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in cols]
    oset = sorted(tuple(_cell(r[i]) for i in idx) for r in cur.fetchall())
    assert len(sset) == len(oset)
    assert sset == oset


@pytest.mark.skipif(
    not glob.glob(os.path.join(SCALE_DIR, "lineitem.parquet*")),
    reason="scale dataset not generated",
)
def test_corr_stats_at_sf1_within_conversion_ulp(spark):
    """ext_corr_stats at 6M rows: its moment sums exceed double's 15.95
    significant digits, where DuckDB's int128->double conversion
    double-rounds while Spark's BigDecimal rounds once — the derived
    stats can then differ by 1 ulp BEFORE the 6-digit display rounding,
    which the round(6) quantizes into a full 1e-6 step when it straddles
    a boundary (measured: covar -61.374947 vs -61.374946). The sf0.01
    driver gate is string-exact; here the bound is one rounding step
    plus a 1e-9 relative term — far tighter than any statistical use,
    loose enough to absorb the conversion artifact."""
    sdf = {r["l_returnflag"]: r for r in
           entrymod.queries()["ext_corr_stats"](spark, SCALE_DIR).collect()}
    cur = _con().execute(entrymod.oracle_sql()["ext_corr_stats"])
    cols = [d[0] for d in cur.description]
    odf = {row[cols.index("l_returnflag")]: dict(zip(cols, row))
           for row in cur.fetchall()}
    assert set(sdf) == set(odf)
    for flag, srow in sdf.items():
        orow = odf[flag]
        assert srow["n"] == orow["n"]
        for c in ("corr_qty_price", "covar_qty_price", "stddev_qty",
                  "stddev_price"):
            s, o = srow[c], orow[c]
            assert abs(s - o) <= 1.01e-6 + 1e-9 * max(abs(s), abs(o)), (
                f"{flag}.{c}: {s} vs {o}"
            )
