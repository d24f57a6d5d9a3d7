"""LSH parameter auto-tuning: pick (bands, rows) from a target Jaccard
threshold by minimizing the weighted false-positive / false-negative
area of the banding S-curve.

For a signature of ``num_perm`` hashes sliced into ``b`` bands of ``r``
rows, a pair with true Jaccard ``s`` lands in a shared bucket with
probability ``p(s) = 1 - (1 - s^r)^b``.  The tuner integrates ``p``
below the threshold (false-positive area) and ``1 - p`` above it
(false-negative area) on a fixed midpoint grid and picks the
``(b, r)`` grid point with minimal weighted error — the standard
datasketch/MMDS ch.3 procedure, here done twice: once in numpy for
driver-side wiring (``choose_lsh_params``) and once as a pure-Catalyst
DataFrame (``lsh_tuning_table``) so the whole table sits under the
DuckDB value-hash gate.

Cross-engine float note: every exposed double is a pure function of
the (threshold, num_perm, grid) constants — NOT data-dependent — so
the rounding-knife-edge hazard for blended scores reduces to a
one-time margin check: tests/test_tuning.py asserts every rounded
value clears its 0.5e-6 rounding boundary by >1e-10 and the argmin gap
is >1e-7, while cross-engine pow/summation drift is ~1e-14.  The grid
midpoints (2i-1)/(2*grid) are exact doubles for power-of-two grids.

The ``(b, r)`` enumeration is ``{(num_perm // r, r)}`` — exactly the
slicing ``lsh_band_keys`` applies (``rows_per_band = num_perm //
bands``; trailing hashes beyond ``b*r`` are unused), so a tuned ``b``
plugs straight into the existing band machinery.

Reference analog: the C++ reference hard-codes its sketch shape
(sketch.cpp:26-34); parameter selection is new surface the Spark
engine needs because LSH recall/cost is corpus-policy, not a constant.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["lsh_param_grid", "choose_lsh_params", "lsh_tuning_table"]


def lsh_param_grid(num_perm: int) -> list[tuple[int, int]]:
    """All (bands, rows_per_band) points the tuner scores: one per
    ``r`` in 1..num_perm with ``b = num_perm // r`` (maximal bands for
    that row count)."""
    return sorted({(num_perm // r, r) for r in range(1, num_perm + 1)})


def _areas(
    threshold: float, b: int, r: int, grid: int
) -> tuple[float, float]:
    s = (2.0 * np.arange(1, grid + 1) - 1.0) / (2.0 * grid)
    miss = (1.0 - s**r) ** b  # P[no bucket collision]
    fp = (1.0 - miss)[s < threshold].sum() / grid
    fn = miss[s >= threshold].sum() / grid
    return float(fp), float(fn)


def choose_lsh_params(
    threshold: float,
    num_perm: int = 64,
    grid: int = 256,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> tuple[int, int]:
    """(bands, rows_per_band) minimizing the weighted S-curve error at
    ``threshold`` — the driver-side twin of ``lsh_tuning_table``
    (asserted equal in tests).  Ties on the 6dp-rounded error break to
    the smallest (b, r)."""
    best = None
    for b, r in lsh_param_grid(num_perm):
        fp, fn = _areas(threshold, b, r, grid)
        err = round(fp_weight * fp + fn_weight * fn, 6)
        key = (err, b, r)
        if best is None or key < best:
            best = key
    return best[1], best[2]


def lsh_tuning_table(
    spark: SparkSession,
    threshold: float,
    num_perm: int = 64,
    grid: int = 256,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> DataFrame:
    """Full tuning table as a DataFrame: (b, r, fp_area, fn_area, err,
    chosen) — one row per grid point, ``chosen`` marking the argmin.

    Pure Catalyst: the parameter grid is a num_perm-row dim table and
    both integrals are ``F.aggregate`` folds over a
    ``sequence(1, grid)`` midpoint lattice (deterministic in-order
    summation, mirrored exactly by the DuckDB oracle's list
    comprehension + list_sum).  ``chosen`` ranks a fixed num_perm-row
    parameter lattice — not a data-scale sort — so it runs through
    bounded_rank (one applyInPandas group, no unpartitioned-window
    WARN)."""
    from .aggregate import bounded_rank

    params = spark.createDataFrame(
        lsh_param_grid(num_perm), "b INT, r INT"
    )
    two_g = float(2 * grid)
    t = float(threshold)

    def mid(i):  # (2i-1)/(2*grid): exact double for power-of-two grids
        return (i * 2 - 1).cast("double") / F.lit(two_g)

    def miss(i):  # (1 - s^r)^b
        return F.pow(F.lit(1.0) - F.pow(mid(i), F.col("r")), F.col("b"))

    seq = F.sequence(F.lit(1), F.lit(grid))
    fp_raw = (
        F.aggregate(
            seq,
            F.lit(0.0),
            lambda acc, i: acc
            + F.when(mid(i) < t, F.lit(1.0) - miss(i)).otherwise(F.lit(0.0)),
        )
        / grid
    )
    fn_raw = (
        F.aggregate(
            seq,
            F.lit(0.0),
            lambda acc, i: acc
            + F.when(mid(i) >= t, miss(i)).otherwise(F.lit(0.0)),
        )
        / grid
    )
    scored = params.select(
        "b",
        "r",
        F.round(fp_raw, 6).alias("fp_area"),
        F.round(fn_raw, 6).alias("fn_area"),
        F.round(
            F.lit(float(fp_weight)) * fp_raw + F.lit(float(fn_weight)) * fn_raw, 6
        ).alias("err"),
    )
    ranked = bounded_rank(scored, [("err", True), ("b", True), ("r", True)])
    return ranked.withColumn("chosen", F.col("rank") == F.lit(1)).drop("rank")
