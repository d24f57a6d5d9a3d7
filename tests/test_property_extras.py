"""Property tests for the round-3 session-2 operators: dyadic decay
weights vs pure-python integers, tuner argmin consistency, and RRF
fusion arithmetic — all driver-side math (no Spark session needed), so
hypothesis can hammer them cheaply."""

import numpy as np

from hypothesis import given, settings, strategies as st


# --- decay: the fixed-point weight law ------------------------------------
def _py_weight(age: int, half_life: int, max_exp: int) -> int:
    if age < 0 or age // half_life > max_exp:
        return 0
    return 1 << (max_exp - age // half_life)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-10, max_value=400),
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=1, max_value=30),
)
def test_decay_weight_law(age, half_life, max_exp):
    w = _py_weight(age, half_life, max_exp)
    if age < 0:
        assert w == 0
    elif age // half_life > max_exp:
        assert w == 0
    else:
        # halves exactly every half_life units, never fractional
        assert w == 2 ** (max_exp - age // half_life)
        older = _py_weight(age + half_life, half_life, max_exp)
        assert older in (w // 2, 0)
    # horizon boundary is exact: last weighted age carries weight 1
    edge = half_life * max_exp + half_life - 1
    assert _py_weight(edge, half_life, max_exp) == 1
    assert _py_weight(edge + 1, half_life, max_exp) == 0


# --- tuner: argmin and grid invariants ------------------------------------
@settings(max_examples=40, deadline=None)
@given(
    st.floats(min_value=0.15, max_value=0.9),
    st.sampled_from([16, 32, 64, 128]),
)
def test_tuner_choice_is_grid_argmin(threshold, num_perm):
    from sketch_spark.operators.tuning import (
        choose_lsh_params,
        lsh_param_grid,
    )

    b, r = choose_lsh_params(threshold, num_perm)
    grid = lsh_param_grid(num_perm)
    assert (b, r) in grid
    assert b * r <= num_perm

    # the chosen point's weighted error is minimal over the whole grid
    s = (2.0 * np.arange(1, 257) - 1.0) / 512.0

    def err(bb, rr):
        miss = (1.0 - s**rr) ** bb
        fp = (1.0 - miss)[s < threshold].sum() / 256
        fn = miss[s >= threshold].sum() / 256
        return round(0.5 * fp + 0.5 * fn, 6)

    best = err(b, r)
    assert all(err(bb, rr) >= best for bb, rr in grid)


# --- rrf: fusion arithmetic -----------------------------------------------
@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=12, unique=True),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=12, unique=True),
    st.integers(min_value=1, max_value=100),
)
def test_rrf_score_properties(list_a, list_b, c):
    # rrf(d) = sum over lists of 1/(c + rank_d); ranks are positions+1
    ra = {d: i + 1 for i, d in enumerate(list_a)}
    rb = {d: i + 1 for i, d in enumerate(list_b)}
    score = {
        d: (1.0 / (c + ra[d]) if d in ra else 0.0)
        + (1.0 / (c + rb[d]) if d in rb else 0.0)
        for d in set(ra) | set(rb)
    }
    # membership in both lists strictly beats the same ranks in one
    for d in set(ra) & set(rb):
        assert score[d] > 1.0 / (c + ra[d])
        assert score[d] > 1.0 / (c + rb[d])
    # moving up a list strictly increases the score
    for d in score:
        if d in ra and ra[d] > 1:
            better = (1.0 / (c + ra[d] - 1)) + (
                1.0 / (c + rb[d]) if d in rb else 0.0
            )
            assert better > score[d]
    # the fused score is bounded by the two best possible ranks
    assert all(v <= 2.0 / (c + 1) for v in score.values())
