"""Connected components: long-chain convergence with lineage truncation,
and the max-iteration guard.

A path graph of diameter D needs ~D label-propagation rounds — enough to
cross several localCheckpoint boundaries (every CC_CHECKPOINT_EVERY=5
rounds) and prove the truncated plan still converges to the right labels.
"""

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.operators.dedup import (
    connected_components,
)


def _chain_pairs(spark, n):
    # path graph 0-1-2-...-(n-1): one component, diameter n-1
    return spark.createDataFrame(
        [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )


def test_long_chain_converges_across_checkpoints(spark):
    n = 14  # diameter 13 > 10 -> at least two localCheckpoint rounds
    out = connected_components(_chain_pairs(spark, n)).collect()
    assert len(out) == n
    assert {r.rep_doc_id for r in out} == {"d000"}
    assert {r.doc_id for r in out} == {f"d{i:03d}" for i in range(n)}


def test_two_components_and_isolated_pair(spark):
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    got = {
        r.doc_id: r.rep_doc_id for r in connected_components(pairs).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_max_iters_guard_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge in 3"):
        connected_components(_chain_pairs(spark, 14), max_iters=3)


def test_random_graphs_match_union_find(spark):
    """Label propagation must agree with a union-find reference on
    arbitrary graphs (star/chain/cycle mixes, self-loops, duplicates)."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(5, 18)
        pairs = [
            (f"n{rng.randrange(n):02d}", f"n{rng.randrange(n):02d}")
            for _ in range(rng.randint(3, 2 * n))
        ]
        parent: dict[str, str] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in parent}

        got = {
            r.doc_id: r.rep_doc_id
            for r in connected_components(
                spark.createDataFrame(
                    pairs, "doc_a string, doc_b string"
                )
            ).collect()
        }
        assert got == expected, f"trial {trial} diverged"
