"""Property proof for the streaming sessionizer's core claim: interval
union over [ts, ts+gap) in ANY arrival order yields exactly the
gaps-and-islands session structure of the sorted stream (count, first
start, last end). The streaming test (test_streaming.py) proves the
Spark wiring across micro-batches; this proves the algorithm itself on
thousands of random multisets, so the batch SQL oracle is valid for any
file-split/arrival order.
"""

from hypothesis import given, strategies as st

GAP = 30 * 60 * 1_000_000  # micros, mirrors streaming.ops.SESSION_GAP_MICROS


def interval_union(stamps):
    """Mirrors the applyInPandasWithState closure's merge."""
    ivals = sorted([t, t + GAP] for t in stamps)
    merged = []
    for s, e in ivals:
        if merged and s < merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return merged


def gaps_and_islands(stamps):
    """The batch/SQL oracle semantics: sorted stream, a gap >= GAP
    starts a new session."""
    ts = sorted(stamps)
    n_sessions = 0
    prev = None
    for t in ts:
        if prev is None or t - prev >= GAP:
            n_sessions += 1
        prev = t
    return n_sessions, ts[0], ts[-1] + GAP


@given(
    st.lists(
        st.integers(min_value=0, max_value=10 * 24 * 3600 * 1_000_000),
        min_size=1,
        max_size=60,
    ),
    st.randoms(),
)
def test_interval_union_equals_gaps_and_islands(stamps, rng):
    shuffled = list(stamps)
    rng.shuffle(shuffled)
    merged = interval_union(shuffled)
    n, first, last_end = gaps_and_islands(stamps)
    assert len(merged) == n
    assert merged[0][0] == first
    assert merged[-1][1] == last_end


@given(
    st.lists(
        st.integers(min_value=0, max_value=10 * 24 * 3600 * 1_000_000),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=39),
)
def test_any_batch_split_converges(stamps, cut):
    """Feeding the same multiset in two arbitrary chunks (state carried
    between them) gives the same final merge as one shot — the
    micro-batch-boundary invariant."""
    cut = min(cut, len(stamps))
    state = interval_union(stamps[:cut])
    # second batch merges into existing state
    ivals = sorted(state + [[t, t + GAP] for t in stamps[cut:]])
    merged = []
    for s, e in ivals:
        if merged and s < merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    assert merged == interval_union(stamps)
