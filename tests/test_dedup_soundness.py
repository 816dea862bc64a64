"""Cross-operator dedup soundness: the sketch paths against their own
brute-force baselines (not just against their mirrored SQL oracles).

- MinHash-LSH has precision 1 BY CONSTRUCTION (the verify stage re-checks
  exact Jaccard), so its pairs must be a subset of the brute-force pairs
  with identical scores. On this corpus it is exact-equal: at threshold
  0.95 a qualifying pair agrees on a 4-row band with p >= 0.95^4 per band,
  so missing all 16 bands has probability ~(1-0.815)^16 ~ 2e-12 — and the
  testdata plus md5-derived permutation constants are fixed, so the result
  is deterministic.
- SimHash chunk banding is pigeonhole-COMPLETE for hamming <= 3 over 4
  chunks of 12 bits (3 flipped bits cannot touch all 4 chunks), so its
  pair set must exactly equal the brute-force hamming filter.
"""

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    dedup as D,
)

from tests.conftest import SF0001


def test_minhash_lsh_matches_brute_force_jaccard(spark):
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.q_ext_dedup_minhash(spark, SF0001).collect()
    }
    bf = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.q_ext_dedup_ngram_jaccard(spark, SF0001).collect()
    }
    assert set(lsh) <= set(bf)          # precision 1 (verified pairs)
    assert all(lsh[k] == bf[k] for k in lsh)
    assert lsh == bf                    # recall 1 on this corpus (see above)
    assert len(bf) > 0                  # the corpus does contain near-dups


def test_simhash_banding_is_pigeonhole_complete(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.q_ext_dedup_simhash_pairs(spark, SF0001).collect()
    }
    sims = {
        r.doc_id: r.simhash
        for r in D.q_ext_dedup_simhash(spark, SF0001).collect()
    }
    ids = sorted(sims)
    brute = {
        (a, b): bin(sims[a] ^ sims[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sims[a] ^ sims[b]).count("1") <= D.HAMMING_MAX
    }
    assert pairs == brute


def test_incremental_equals_full_restricted_to_cross_batch(spark):
    """The incremental path must find EXACTLY the full run's pairs that
    cross the old/new batch boundary — nothing lost by indexing only
    the stored side, nothing invented.

    PRECONDITION (asserted, not assumed): the equality holds only while
    no band bucket approaches MINHASH_BUCKET_CAP, because the two paths
    cap differently — full on TOTAL bucket size, incremental on the
    STORED posting. If a testdata regeneration ever plants a mega-
    cluster, the precondition assert below fails with a clear message
    instead of a confusing pair-set mismatch."""
    full_df = D.q_ext_dedup_minhash(spark, SF0001)
    audit = full_df.minhash_audit
    assert audit is not None and audit["skipped_buckets"] == 0 and (
        audit["largest_bucket"] <= D.MINHASH_BUCKET_CAP
    ), (
        "equality precondition broken: a bucket approaches the cap, so "
        f"full-vs-incremental capping may diverge (audit: {audit})"
    )
    full = {
        (r.doc_a, r.doc_b): r.jaccard for r in full_df.collect()
    }
    m = D.INCR_NEW_MOD
    cross = {
        pair: j for pair, j in full.items()
        if (pair[0] % m == m - 1) != (pair[1] % m == m - 1)
    }
    incr = {
        tuple(sorted((r.old_id, r.new_id))): r.jaccard
        for r in D.q_ext_dedup_minhash_incremental(spark, SF0001).collect()
    }
    assert incr == cross
    assert len(incr) > 0   # the corpus does contain a cross-batch pair
