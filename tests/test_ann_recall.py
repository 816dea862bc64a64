"""ANN quality: approximate paths must track the brute-force baseline.

The testdata embeddings are isotropic (no cluster structure), which is the
worst case for ANN — true neighbors sit near cosine 0.4. Bounds are set
below the measured values (LSH ~0.73, IVF ~0.53 at sf0.01 (12.5% probe fraction)) to allow noise
while still catching parameterization regressions like the single-table
sign hash whose recall was 0.03."""

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
    assert lsh >= 0.6, f"LSH recall@3 degraded: {lsh:.3f}"
    assert ivf >= 0.4, f"IVF recall@3 degraded: {ivf:.3f}"
