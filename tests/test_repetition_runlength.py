"""Property test for the repetition filter.

The max-bigram-multiplicity comes from an explode + co-located
double hash-aggregation keyed on the space-joined bigram string
(operators/pipeline.py:repetition_filter_from). Pin it against a
plain-Python Counter over a deterministic random corpus plus the edge
shapes (empty doc, single token, all-one-token doc) — the vocab's
space-bearing token also pins the historical concat-key semantics
(("b b","b") and ("b","b b") collide as one bigram).
"""

import random
from collections import Counter

from relational_to_doc_oriented_nosql_migrator_spark.operators.pipeline import (
    repetition_filter_from,
)


def _expected(tk):
    bigrams = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
    if not bigrams:
        return None
    counts = Counter(bigrams)
    return {
        "distinct_ratio": round(len(set(tk)) / len(tk), 6),
        "top_bigram_frac": round(max(counts.values()) / len(bigrams), 6),
    }


def test_runlength_max_equals_bigram_multiplicity(spark):
    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "aa", "b b"]  # incl. a space-bearing token
    docs = [
        (0, []),            # no tokens -> absent from output
        (1, ["x"]),         # no bigrams -> absent from output
        (2, ["a"] * 50),    # one bigram repeated 49x
        (3, ["a", "b"] * 20),
    ]
    docs += [
        (i, [rng.choice(vocab) for _ in range(rng.randint(0, 40))])
        for i in range(4, 120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, tk array<string>")
    out = {r["doc_id"]: r for r in repetition_filter_from(df).collect()}
    for doc_id, tk in docs:
        exp = _expected(tk)
        if exp is None:
            assert doc_id not in out
            continue
        row = out[doc_id]
        assert row["distinct_ratio"] == exp["distinct_ratio"], doc_id
        assert row["top_bigram_frac"] == exp["top_bigram_frac"], doc_id
