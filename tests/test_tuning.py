"""LSH parameter auto-tuner: numpy/Catalyst agreement, cross-engine
float-margin guarantees, and wiring into the dedup entry points."""

import numpy as np
import pytest

from sketch_spark.operators.tuning import (
    choose_lsh_params,
    lsh_param_grid,
    lsh_tuning_table,
)

# The contract query's constants plus a spread of realistic settings.
CASES = [(0.6, 64), (0.5, 64), (0.7, 128), (0.4, 128), (0.5, 128)]
GRID = 256


def numpy_table(threshold, num_perm, grid=GRID):
    s = (2.0 * np.arange(1, grid + 1) - 1.0) / (2.0 * grid)
    rows = []
    for b, r in lsh_param_grid(num_perm):
        miss = (1.0 - s**r) ** b
        fp = (1.0 - miss)[s < threshold].sum() / grid
        fn = miss[s >= threshold].sum() / grid
        rows.append((b, r, fp, fn, 0.5 * fp + 0.5 * fn))
    return rows


def test_choose_pinned_values():
    assert choose_lsh_params(0.6, 64) == (10, 6)
    assert choose_lsh_params(0.5, 64) == (16, 4)
    assert choose_lsh_params(0.7, 128) == (14, 9)
    assert choose_lsh_params(0.4, 128) == (32, 4)
    assert choose_lsh_params(0.5, 128) == (25, 5)


def test_selectivity_rises_with_threshold():
    # higher target Jaccard -> longer rows (steeper S-curve knee)
    rs = [choose_lsh_params(t, 128)[1] for t in (0.4, 0.5, 0.7)]
    assert rs == sorted(rs)


@pytest.mark.parametrize("threshold,num_perm", CASES)
def test_rounding_margins(threshold, num_perm):
    """Every exposed 6dp-rounded double must clear its rounding
    boundary by far more than cross-engine pow/summation drift
    (~1e-14), and the argmin must be separated — the precondition for
    putting this table under the DuckDB value-hash gate."""
    rows = numpy_table(threshold, num_perm)
    vals = np.array([[fp, fn, err] for _, _, fp, fn, err in rows]).ravel()
    frac = np.abs((vals * 1e6 % 1.0) - 0.5)
    assert frac.min() > 1e-4  # > 1e-10 absolute distance to a boundary
    errs = np.sort([round(e, 6) for *_, e in rows])
    assert errs[1] - errs[0] > 1e-6  # rounded argmin is unique


def test_dataframe_matches_numpy(spark):
    df = lsh_tuning_table(spark, 0.6, 64, GRID).toPandas()
    expect = {
        (b, r): (round(fp, 6), round(fn, 6), round(err, 6))
        for b, r, fp, fn, err in numpy_table(0.6, 64)
    }
    assert len(df) == len(expect)
    for row in df.itertuples():
        fp, fn, err = expect[(row.b, row.r)]
        assert (row.fp_area, row.fn_area, row.err) == (fp, fn, err)
    chosen = df[df.chosen]
    assert len(chosen) == 1
    assert (chosen.iloc[0].b, chosen.iloc[0].r) == choose_lsh_params(0.6, 64)


def test_grid_matches_band_slicing():
    # the tuner's r must equal what lsh_band_keys actually uses for
    # the tuned b: rows_per_band = num_perm // bands
    for num_perm in (64, 128):
        for b, r in lsh_param_grid(num_perm):
            assert num_perm // b >= r  # slicing never reads past b*r
            assert b * r <= num_perm


def test_auto_bands_matches_explicit(spark):
    from sketch_spark.operators.dedup import minhash_near_duplicates

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(2000)]
    rows = []
    for i in range(20):
        toks = list(rng.choice(vocab, size=120))
        rows.append((i * 10, " ".join(toks)))
        rows.append((i * 10 + 1, " ".join(toks[: 110])))
        rows.append((i * 10 + 2, " ".join(rng.choice(vocab, size=120))))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)

    b, _ = choose_lsh_params(0.5, num_perm=64)
    auto = minhash_near_duplicates(docs, bands="auto", threshold=0.5).toPandas()
    explicit = minhash_near_duplicates(docs, bands=b, threshold=0.5).toPandas()
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b", "jaccard"]].values.tolist()))
    assert key(auto) == key(explicit)
    assert len(auto) >= 20  # the planted twins are found
