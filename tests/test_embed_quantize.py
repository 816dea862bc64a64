"""Quantization quality, pinned against numpy ground truth (the SQL
oracles check engine parity on the integer codes; these tests check the
codes MEAN what they claim).

- int8 scalar quantization: dequantized values must sit within half a
  quantization step of the original in every dimension.
- product quantization: every (vector, subspace) assignment must be the
  true L2 argmin over the sampled codebook.
"""

import numpy as np
import pyarrow.parquet as pq

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    similarity as S,
)
from tests.conftest import SF0001


def _corpus():
    t = pq.read_table(f"{SF0001}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], V[order]


def test_scalar_quantize_reconstruction_bound(spark):
    ids, V = _corpus()
    lo, hi = V.min(axis=0), V.max(axis=0)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    out = {
        r["vec_id"]: r
        for r in S.q_ext_embed_quantize(spark, SF0001).collect()
    }
    assert set(out) == set(ids.tolist())
    # recompute codes from the engine's definition and bound the error.
    # floor(x + 0.5) mirrors the engines' HALF_UP rounding on these
    # non-negative values; np.round is half-to-EVEN and would diverge on
    # exact .5 midpoints.
    codes = np.where(
        hi > lo, np.floor((V - lo) * 255 / (hi - lo) + 0.5), 0.0
    )
    deq = lo + codes * scale
    assert np.abs(V - deq).max() <= scale.max() / 2 + 1e-12
    # engine's integer stats match the numpy codes exactly
    for i, vid in enumerate(ids.tolist()):
        r = out[vid]
        assert r["n_dims"] == V.shape[1]
        assert r["code_sum"] == int(codes[i].sum())
        assert r["code_min"] == int(codes[i].min())
        assert r["code_max"] == int(codes[i].max())


def test_pq_assignment_is_true_argmin(spark):
    ids, V = _corpus()
    rows = S.q_ext_embed_pq(spark, SF0001).collect()
    assert len(rows) == len(ids) * S.PQ_M
    cb_idx = np.where(ids < S.PQ_K)[0]
    got = {(r["vec_id"], r["subspace"]): r["code"] for r in rows}
    for i, vid in enumerate(ids.tolist()):
        for s in range(S.PQ_M):
            sl = slice(s * S.PQ_SUB, (s + 1) * S.PQ_SUB)
            d = ((V[i, sl] - V[cb_idx][:, sl]) ** 2).sum(axis=1)
            # ties to the smallest code id (stable argmin)
            best = int(ids[cb_idx][np.argmin(d)])
            assert got[(vid, s)] == best, (vid, s)
