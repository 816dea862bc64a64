"""ANN quality: approximate paths must track the brute-force baseline.

The testdata embeddings are isotropic (no cluster structure), which is the
worst case for ANN — true neighbors sit near cosine 0.4. Bounds are set
below the measured values (LSH ~0.90 at K=4/L=12, IVF ~0.90 at
probe=16/assign=2, both at sf0.01) to allow for driver testdata
regeneration while still catching parameterization regressions like the
single-table sign hash whose recall was 0.03."""

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    similarity as S,
)
from tests.conftest import SF001


def _topk_sets(df, k=3):
    out: dict[int, set[int]] = {}
    for r in df.filter(f"rank <= {k}").collect():
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def _recall(truth, got):
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return hits / sum(len(v) for v in truth.values())


def test_ann_recall_bounds(spark):
    truth = _topk_sets(S.q_ext_similarity_topk(spark, SF001))
    assert truth, "no query vectors found"
    lsh = _recall(truth, _topk_sets(S.q_ext_similarity_lsh(spark, SF001)))
    ivf = _recall(truth, _topk_sets(S.q_ext_similarity_ivf(spark, SF001)))
    assert lsh >= 0.7, f"LSH recall@3 degraded: {lsh:.3f}"
    assert ivf >= 0.7, f"IVF recall@3 degraded: {ivf:.3f}"


def test_ivfpq_recall_bound(spark):
    """IVF-PQ (normalize -> Lloyd-trained codebook -> ADC -> exact
    refine) measures 0.90 recall@3 at sf0.01; floor at 0.8. The
    un-normalized raw-L2 ADC variant measured 0.07 — this test is what
    catches that class of metric-mismatch regression."""
    truth = _topk_sets(S.q_ext_similarity_topk(spark, SF001))
    pq = _recall(truth, _topk_sets(S.q_ext_similarity_ivfpq(spark, SF001)))
    assert pq >= 0.8, f"IVF-PQ recall@3 degraded: {pq:.3f}"


def test_knn_classify_ann_variant_agrees(spark):
    """knn_classify_from composes with the ANN frames; on isotropic
    embeddings (labels carry no cluster signal) exact and LSH-backed
    predictions still agree wherever the candidate sets overlap — pin
    that the plumbing (votes, tie-break, truth join) is index-agnostic
    by checking output shape and determinism across two runs."""
    from pyspark.sql import functions as F

    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t

    labels = t(spark, SF001, "embeddings").select("vec_id", "label")
    exact = S.knn_classify_from(
        S.q_ext_similarity_topk(spark, SF001), labels
    )
    ann = S.knn_classify_from(S.q_ext_similarity_lsh(spark, SF001), labels)
    e = {r.query_id: r for r in exact.collect()}
    a = {r.query_id: r for r in ann.collect()}
    assert set(e) == set(a)  # every query classified under both indexes
    # truth join is identical regardless of index
    assert all(e[q].true_label == a[q].true_label for q in e)
    # deterministic: re-running the ANN variant yields identical rows
    a2 = {r.query_id: r for r in S.knn_classify_from(
        S.q_ext_similarity_lsh(spark, SF001), labels).collect()}
    assert all(
        (a[q].pred_label, a[q].votes) == (a2[q].pred_label, a2[q].votes)
        for q in a
    )
    # votes are bounded by k on the exact path
    assert exact.agg(F.max("votes")).first()[0] <= S.TOP_K


def test_indexed_ivfpq_is_result_identical(spark):
    """The materialized-index search must return row-for-row what the
    train-every-call variant returns (stronger than sharing an oracle:
    this pins the parquet round trip of the index relations)."""
    live = {(r.query_id, r.rank): (r.cand_id, r.cosine)
            for r in S.q_ext_similarity_ivfpq(spark, SF001).collect()}
    idx = {(r.query_id, r.rank): (r.cand_id, r.cosine)
           for r in S.q_ext_similarity_ivfpq_indexed(spark, SF001).collect()}
    assert live == idx
    assert len(live) > 0


def test_knn_indexed_votes_over_ivfpq_shortlist(spark):
    """The registered scale-path kNN (r08 verdict #6) must equal
    knn_classify_from applied to the IVF-PQ-indexed neighbor frame —
    i.e. the same vote/argmax plumbing the exact variant uses, fed by
    the index instead of the guarded all-pairs topk."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t

    labels = t(spark, SF001, "embeddings").select("vec_id", "label")
    want = {
        r.query_id: (r.pred_label, r.votes, r.true_label)
        for r in S.knn_classify_from(
            S.q_ext_similarity_ivfpq_indexed(spark, SF001), labels
        ).collect()
    }
    got = {
        r.query_id: (r.pred_label, r.votes, r.true_label)
        for r in S.q_ext_knn_classify_indexed(spark, SF001).collect()
    }
    assert got == want
    assert len(got) > 0


def test_persistent_index_reused_across_processes(spark, tmp_path,
                                                  monkeypatch):
    """SPARK_GRAFT_INDEX_DIR makes the IVF-PQ index build a NIGHTLY-JOB
    artifact: a later process (simulated by clearing the in-process
    cache) must find the fingerprint-keyed directory complete and reuse
    it without rewriting, and search results must be identical."""
    import os

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    monkeypatch.setattr(S, "_IVFPQ_INDEX_DIRS", {})
    first = S.build_ivfpq_index(spark, SF001)
    assert first.startswith(str(tmp_path))
    marker = os.path.join(first, "codes", "_SUCCESS")
    mtime = os.stat(marker).st_mtime_ns
    rows = {(r.query_id, r.rank): (r.cand_id, r.cosine)
            for r in S.q_ext_similarity_ivfpq_indexed(spark, SF001).collect()}
    # "new process": empty in-process cache, same persistent root
    monkeypatch.setattr(S, "_IVFPQ_INDEX_DIRS", {})
    again = S.build_ivfpq_index(spark, SF001)
    assert again == first
    assert os.stat(marker).st_mtime_ns == mtime, "index was rebuilt"
    rows2 = {(r.query_id, r.rank): (r.cand_id, r.cosine)
             for r in S.q_ext_similarity_ivfpq_indexed(spark, SF001).collect()}
    assert rows2 == rows


def test_persistent_index_publish_is_atomic(spark, tmp_path, monkeypatch):
    """The persistent index is built in a process-unique temp dir and
    os.rename'd into place (r09 advice: no overwrite-in-place races): a
    stale PARTIAL directory at the fingerprint path — a crashed legacy
    build — is replaced by a complete index, and no .build_ temp dirs
    leak after publish."""
    import glob as _glob
    import os

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    monkeypatch.setattr(S, "_IVFPQ_INDEX_DIRS", {})
    key = S._corpus_fingerprint(SF001)
    _sftag, tag = S._index_tag(SF001, key)
    stale = os.path.join(str(tmp_path), f"ivfpq_{tag}")
    # partial: one relation present, three missing
    os.makedirs(os.path.join(stale, "centroids"))
    open(os.path.join(stale, "centroids", "_SUCCESS"), "w").close()
    out = S.build_ivfpq_index(spark, SF001)
    assert out == stale
    for rel in ("centroids", "inverted", "codebook", "codes"):
        assert os.path.exists(os.path.join(out, rel, "_SUCCESS"))
    assert _glob.glob(os.path.join(str(tmp_path), "*.build_*")) == []


def test_persistent_index_failed_build_leaves_no_orphan(spark, tmp_path,
                                                        monkeypatch):
    """A failed (or cancelled) persistent build must remove its .build_
    temp dir — a timed-out probe row would otherwise leak a partial
    index per attempt under the long-lived SPARK_GRAFT_INDEX_DIR."""
    import glob as _glob
    import os

    import pytest

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    monkeypatch.setattr(S, "_IVFPQ_INDEX_DIRS", {})

    def boom(*a, **k):
        raise RuntimeError("synthetic build failure")

    monkeypatch.setattr(S, "_pq_codes", boom)
    with pytest.raises(RuntimeError, match="synthetic build failure"):
        S.build_ivfpq_index(spark, SF001)
    assert _glob.glob(os.path.join(str(tmp_path), "*.build_*")) == []
    assert S._IVFPQ_INDEX_DIRS == {}  # no poisoned cache entry


def test_sampled_training_parity_and_recall(spark, monkeypatch):
    """Lloyd/PQ training runs on a bounded md5-ordered sample past
    TRAIN_SAMPLE_MAX (r06 verdict task #4). At sf0.01 the cap (16384)
    never engages, so force it below the 500-vector corpus and pin:
    (1) the Spark result still hash-matches the SAMPLED oracle
    rendering (oracle_ivfpq mirrors _train_slices exactly — the
    cross-engine md5-ordering contract), (2) the materialized-index
    variant remains row-identical, and (3) recall@3 holds the 0.8
    floor with a 256-vector training set (measured 0.87)."""
    import duckdb

    monkeypatch.setattr(S, "TRAIN_SAMPLE_MAX", 256)
    monkeypatch.setattr(S, "_IVFPQ_INDEX_DIRS", {})
    sampled_sql = S.oracle_ivfpq(500)
    assert "samp AS" in sampled_sql and "LIMIT 256" in sampled_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{SF001}/embeddings.parquet')"
    )
    sdf = S.q_ext_similarity_ivfpq(spark, SF001).toPandas()
    odf = con.execute(sampled_sql).df()
    cols = sorted(sdf.columns)
    assert sorted(odf.columns) == cols
    s = sdf[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    o = odf[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    assert len(s) == len(o) > 0 and s.equals(o)

    live = {(r.query_id, r.rank): (r.cand_id, r.cosine)
            for r in S.q_ext_similarity_ivfpq(spark, SF001).collect()}
    idx = {(r.query_id, r.rank): (r.cand_id, r.cosine)
           for r in S.q_ext_similarity_ivfpq_indexed(spark, SF001).collect()}
    assert live == idx

    truth = _topk_sets(S.q_ext_similarity_topk(spark, SF001))
    pq = _recall(truth, _topk_sets(S.q_ext_similarity_ivfpq(spark, SF001)))
    assert pq >= 0.8, f"sampled-training recall@3 degraded: {pq:.3f}"


def test_default_index_root_persists_and_prunes(spark, tmp_path,
                                                monkeypatch):
    """Persistence is the DEFAULT (r10 verdict task #2): with no
    SPARK_GRAFT_INDEX_DIR the index lands under the fixed system-temp
    root, a 'later process' (cleared in-process cache) reuses it
    without rebuilding, and a stale sibling of the same corpus path —
    a different fingerprint after data regeneration — is pruned on
    publish."""
    import os

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DIR", raising=False)
    # keep the fixed default location out of the shared /tmp for the
    # test by pointing tempfile's notion of tempdir at tmp_path
    monkeypatch.setattr("tempfile.tempdir", str(tmp_path))
    monkeypatch.setattr(S, "_IVFPQ_INDEX_DIRS", {})
    key = S._corpus_fingerprint(SF001)
    scope, _tag = S._index_tag(SF001, key)
    uid = os.getuid() if hasattr(os, "getuid") else 0
    root = os.path.join(str(tmp_path), f"spark_graft_index-{uid}")
    # in prune scope (same corpus + params, stale fingerprint): pruned
    stale = os.path.join(root, f"ivfpq_{scope}_deadbeefdeadbeef")
    # OUT of prune scope (different build params): must survive
    foreign = os.path.join(root, f"ivfpq_{scope[:9]}XXXXXXX_feedface")
    os.makedirs(stale)
    os.makedirs(foreign)
    first = S.build_ivfpq_index(spark, SF001)
    assert first.startswith(root)
    assert not os.path.exists(stale), "stale same-scope index not pruned"
    assert os.path.exists(foreign), "different-param index was pruned"
    marker = os.path.join(first, "codes", "_SUCCESS")
    mtime = os.stat(marker).st_mtime_ns
    monkeypatch.setattr(S, "_IVFPQ_INDEX_DIRS", {})
    again = S.build_ivfpq_index(spark, SF001)
    assert again == first
    assert os.stat(marker).st_mtime_ns == mtime, "index was rebuilt"


def test_overridden_constants_get_their_own_index(monkeypatch):
    """A process with overridden training constants must key a
    DIFFERENT persistent directory AND a different prune scope (it
    would otherwise poison — or be pruned by — the default-constant
    index every other process reuses), and the in-process cache must
    miss too (it is keyed by the full tag, not the fingerprint)."""
    key = S._corpus_fingerprint(SF001)
    scope_default, tag_default = S._index_tag(SF001, key)
    monkeypatch.setattr(S, "TRAIN_SAMPLE_MAX", 256)
    scope_patched, tag_patched = S._index_tag(SF001, key)
    assert tag_patched != tag_default
    assert scope_patched != scope_default
    # a cache entry under the default tag must not serve the patched
    # build (the r11 review's same-process poisoning finding)
    monkeypatch.setattr(S, "_IVFPQ_INDEX_DIRS",
                        {tag_default: "/nonexistent"})
    assert tag_patched not in S._IVFPQ_INDEX_DIRS


def test_relative_and_absolute_sf_dir_share_one_index():
    """A relative and an absolute spelling of the same corpus must
    fingerprint identically (else the publish prune ping-pongs two tags
    inside one scope)."""
    import os

    rel = os.path.relpath(SF001)
    assert S._corpus_fingerprint(rel) == S._corpus_fingerprint(SF001)
    k = S._corpus_fingerprint(SF001)
    assert S._index_tag(rel, k) == S._index_tag(SF001, k)


def test_assign_pandas_parity_with_exact(spark):
    """The corpus-scale mapInPandas assignment (engaged past
    ASSIGN_SORT_PAIRS_MAX pairs, where the exact BNLJ+window path's
    local sort of N x C scored rows exceeds realistic spill volume)
    must produce the SAME (id, cent_id) pairs as the expression path at
    test scale — same rounded-cosine ranking, same asc-cent_id
    tie-break."""
    from pyspark.sql import functions as F

    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        footer_rows,
    )

    emb = S._emb(spark, SF001, spread=True)
    nc = S.n_centroids(footer_rows(SF001, "embeddings"))
    cents = emb.filter(F.col("vec_id") < nc).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    exact = sorted(
        (r.cand_id, r.cent_id)
        for r in S._assign(emb, cents, "cand_id", "arank",
                           S.N_ASSIGN).collect()
    )
    scale = sorted(
        (r.cand_id, r.cent_id)
        for r in S._assign_pandas(emb, cents, "cand_id",
                                  S.N_ASSIGN).collect()
    )
    assert exact == scale
    # the gate itself: a pairs_hint past the cap must route to the
    # pandas plan (visible as a MapInPandas node), below it must not
    big = S._assign(emb, cents, "cand_id", "arank", S.N_ASSIGN,
                    pairs_hint=S.ASSIGN_SORT_PAIRS_MAX)
    small = S._assign(emb, cents, "cand_id", "arank", S.N_ASSIGN,
                      pairs_hint=S.ASSIGN_SORT_PAIRS_MAX - 1)
    assert "MapInPandas" in big._jdf.queryExecution().toString()
    assert "MapInPandas" not in small._jdf.queryExecution().toString()
