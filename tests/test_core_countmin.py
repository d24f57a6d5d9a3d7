"""Layer-1 unit tests for CM/CMCU (SURVEY.md §5.2 L1).

The load-bearing claims, each tested directly:
  exact <= CMCU <= CM            (conservative update sandwich)
  CM <= exact + eps*N w.p. 1-d   (published Count-Min bound)
  merge(+) is associative/commutative and preserves the sandwich.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketch_spark.core import CountMin, CountMinCU, sketch_from_bytes
from sketch_spark.core.base import unique_with_counts


def zipf_tokens(rng, n, vocab=2000, a=1.3):
    ids = rng.zipf(a, size=n)
    ids = ids[ids <= vocab]
    return np.array([f"tok{i}" for i in ids])


def exact_counts(tokens):
    uniq, cnt = np.unique(tokens, return_counts=True)
    return dict(zip(uniq.tolist(), cnt.tolist()))


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(7)
    return zipf_tokens(rng, 50_000)


def test_cm_never_underestimates(stream):
    cm = CountMin(depth=4, log2_width=14, seed=1)
    cm.update_tokens(stream)
    exact = exact_counts(stream)
    toks = list(exact)
    est = cm.estimate_tokens(toks)
    truth = np.array([exact[t] for t in toks])
    assert (est >= truth).all()


def test_cmcu_sandwich(stream):
    """exact <= CMCU <= CM, counter-wise and estimate-wise."""
    cm = CountMin(depth=4, log2_width=12, seed=1)
    cu = CountMinCU(depth=4, log2_width=12, seed=1)
    # same hash family (same seed/geometry) => comparable tables
    for off in range(0, len(stream), 4096):
        batch = stream[off : off + 4096]
        cm.update_tokens(batch)
        cu.update_tokens(batch)
    assert (cu.table <= cm.table).all()
    exact = exact_counts(stream)
    toks = list(exact)
    truth = np.array([exact[t] for t in toks])
    est_cu = cu.estimate_tokens(toks)
    est_cm = cm.estimate_tokens(toks)
    assert (est_cu >= truth).all(), "CU must never underestimate"
    assert (est_cu <= est_cm).all(), "CU must never exceed plain CM"


def test_epsilon_delta_bound(stream):
    """P[est > exact + eps*N] <= delta for the reference geometry."""
    cm = CountMin(depth=4, log2_width=14, seed=3)
    cm.update_tokens(stream)
    exact = exact_counts(stream)
    toks = list(exact)
    truth = np.array([exact[t] for t in toks])
    est = cm.estimate_tokens(toks)
    violations = (est.astype(float) > truth + cm.epsilon * cm.total).mean()
    assert violations <= cm.delta


def test_merge_equals_single_pass_cm(stream):
    """CM merge is an exact homomorphism: split-merge == one pass."""
    whole = CountMin(depth=4, log2_width=12, seed=5)
    whole.update_tokens(stream)
    parts = []
    for chunk in np.array_split(stream, 7):
        s = CountMin(depth=4, log2_width=12, seed=5)
        s.update_tokens(chunk)
        parts.append(s)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert (merged.table == whole.table).all()
    assert merged.total == whole.total


def test_merged_cmcu_bounds(stream):
    """Merged CMCU partials still satisfy exact <= est <= CM-merged."""
    chunks = np.array_split(stream, 8)
    cm_parts, cu_parts = [], []
    for ch in chunks:
        a = CountMin(depth=4, log2_width=12, seed=9)
        b = CountMinCU(depth=4, log2_width=12, seed=9)
        a.update_tokens(ch)
        b.update_tokens(ch)
        cm_parts.append(a)
        cu_parts.append(b)
    cm = cm_parts[0]
    cu = cu_parts[0]
    for a, b in zip(cm_parts[1:], cu_parts[1:]):
        cm.merge(a)
        cu.merge(b)
    exact = exact_counts(stream)
    toks = list(exact)
    truth = np.array([exact[t] for t in toks])
    assert (cu.estimate_tokens(toks) >= truth).all()
    assert (cu.table <= cm.table).all()


def test_merge_order_invariance(stream):
    """Summed counters are identical under any merge permutation."""
    chunks = np.array_split(stream, 6)

    def build(order):
        parts = []
        for ch in chunks:
            s = CountMinCU(depth=4, log2_width=12, seed=11)
            s.update_tokens(ch)
            parts.append(s)
        acc = parts[order[0]]
        for i in order[1:]:
            acc.merge(parts[i])
        return acc

    a = build([0, 1, 2, 3, 4, 5])
    b = build([5, 3, 1, 0, 2, 4])
    assert (a.table == b.table).all()
    assert a.to_bytes() == b.to_bytes()


def test_serialization_roundtrip(stream):
    cu = CountMinCU(depth=4, log2_width=12, seed=13)
    cu.update_tokens(stream[:10_000])
    blob = cu.to_bytes()
    back = sketch_from_bytes(blob)
    assert isinstance(back, CountMinCU)
    assert (back.table == cu.table).all()
    assert back.total == cu.total
    assert back.to_bytes() == blob
    # deserialized sketch keeps hashing identically
    toks = ["tok1", "tok42", "neverseen"]
    assert (back.estimate_tokens(toks) == cu.estimate_tokens(toks)).all()


def test_weighted_updates_match_repeats():
    cu1 = CountMinCU(depth=4, log2_width=10, seed=17)
    cu2 = CountMinCU(depth=4, log2_width=10, seed=17)
    toks = np.array(["a", "b", "c"])
    counts = np.array([5, 3, 2])
    cu1.update_tokens(toks, counts)
    cu2.update_tokens(np.repeat(toks, counts))
    assert (cu1.table == cu2.table).all()


def test_unique_with_counts():
    keys = np.array([3, 1, 3, 2, 1, 1], dtype=np.uint64)
    uk, c = unique_with_counts(keys)
    assert uk.tolist() == [1, 2, 3]
    assert c.tolist() == [3, 1, 2]
    uk2, c2 = unique_with_counts(keys, np.array([1, 1, 1, 1, 1, 10]))
    assert c2.tolist() == [12, 1, 2]


@settings(max_examples=25, deadline=None)
@given(
    toks=st.lists(st.text(alphabet="abcdef", min_size=0, max_size=12), max_size=200),
    nparts=st.integers(1, 5),
)
def test_property_cm_merge_homomorphism(toks, nparts):
    arr = np.array(toks, dtype=object) if toks else np.empty(0, dtype=object)
    whole = CountMin(depth=3, log2_width=8, seed=23)
    if len(arr):
        whole.update_tokens(arr.astype(str))
    parts = []
    for chunk in np.array_split(arr, nparts):
        s = CountMin(depth=3, log2_width=8, seed=23)
        if len(chunk):
            s.update_tokens(chunk.astype(str))
        parts.append(s)
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert (acc.table == whole.table).all()
