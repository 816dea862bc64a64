"""Data-adaptive oracle renderers (r05 verdict watch item #1 + ADVICE):
the few oracles whose SQL embeds a scale-derived constant (LSH key
width, packer bucket count) must render from the SAME footer row counts
the engine uses, so engine-vs-oracle equality stays exact at every SF —
and the static registered entries must be exactly the driver-scale
(sf0.01) renderings so every recorded driver row stays accurate.
"""

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    MODULES,
    all_oracles,
    all_scaled_oracles,
    dedup,
    pipeline,
    similarity,
)
from tests.conftest import SF0001, SF001


def test_driver_scale_renders_static_text():
    # sf0.01: 500 docs / 500 vectors — every adaptive constant sits at
    # its floor, so the re-rendered dict IS the registered static dict.
    assert all_scaled_oracles(SF001) == all_oracles()
    # sf0.001 likewise (floors are wide).
    assert all_scaled_oracles(SF0001) == all_oracles()


def test_pack_buckets_grows_at_probe_scale():
    # floors: driver (500), bench (60k), sweep (600k), probe (6M) all
    # render the recorded 64-bucket layout ...
    for n in (500, 60_000, 600_000, 6_000_000):
        assert pipeline.pack_buckets(n) == pipeline.PACK_BUCKETS_FLOOR
    # ... and past 64 * PACK_DOCS_PER_BUCKET the count grows linearly so
    # each bucket's single-task window stays bounded at 100 TB.
    edge = pipeline.PACK_BUCKETS_FLOOR * pipeline.PACK_DOCS_PER_BUCKET
    assert pipeline.pack_buckets(edge) == pipeline.PACK_BUCKETS_FLOOR
    assert pipeline.pack_buckets(edge + 1) == pipeline.PACK_BUCKETS_FLOOR + 1
    assert pipeline.pack_buckets(10_000_000_000) == 40_000


def test_scaled_oracles_cover_every_adaptive_id():
    # Enumerate over ALL registry modules (r07 ADVICE: a hand-listed
    # module pair silently missed the similarity additions), so a new
    # module's SCALED_ORACLES can't escape this invariant.
    scaled = {}
    for m in MODULES:
        scaled.update(getattr(m, "SCALED_ORACLES", {}))
    assert set(scaled) == {
        "ext_dedup_embedding",
        "ext_dedup_embedding_lsh",
        "ext_pack_sequences",
        "ext_curation_pipeline",
        "ext_similarity_ivf",
        "ext_similarity_ivfpq",
        "ext_similarity_ivfpq_indexed",
        "ext_knn_classify_indexed",
    }
    # Every adaptive id must ALSO have a static registered oracle — the
    # scaled rendering substitutes it, never introduces a new id. (The
    # per-module subset asserts that used to sit here were tautologies:
    # `scaled` is the union of those very modules' dicts.)
    assert set(scaled) <= set(all_oracles())
    # a past-floor corpus renders DIFFERENT SQL than the static entry:
    # LSH key width, IVF centroid width, and the IVF-PQ training sample
    # all scale with the corpus
    statics = all_oracles()
    big = dedup.oracle_embedding_lsh(1_000_000)
    assert big != statics["ext_dedup_embedding_lsh"]
    assert similarity.oracle_ivf(1_000_000) != statics["ext_similarity_ivf"]
    assert (
        similarity.oracle_ivfpq(1_000_000)
        != statics["ext_similarity_ivfpq"]
    )
