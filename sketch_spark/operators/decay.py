"""Time-decayed counting: exponentially decayed frequencies and
decayed top-k — the time-aware generalization of the reference's
emerging-heavy-hitter control subtraction (sketch.cpp:179-183 scales
history by a constant GROWTH once per phase; exponential decay applies
the same geometric forgetting continuously), used for trending-item /
freshness-weighted corpus accounting.

Exactness design (fixed-point integers instead of float sums, so
Spark/DuckDB/numpy agree bit-for-bit — taken further here):
decay weights are restricted to DYADIC values 2^e with an INTEGER
exponent e = max_exp - age_units // half_life, so per-row weights are
exact BIGINTs, group sums are exact integer arithmetic (associative,
order-independent, identical in Spark / DuckDB / numpy), and the
reported double ``decayed = decayed_fp / 2^max_exp`` is an exactly
representable rational — both engines produce bit-identical doubles,
no rounding knife-edge exists at all.  Arbitrary-base decay
exp(-lambda*age) would reintroduce cross-engine libm drift for no
modeling gain; half-life granularity is the age-bucket unit.

Scale shape: one map-side projection computes the weight, then the
groupBy is an ordinary partial-aggregated LongType sum — the same
single-shuffle plan as a plain count.  Overflow headroom: sums stay
under 2^63 while rows_per_key * 2^max_exp < 2^63 (2.8e14 rows/key at
the default max_exp=15); the operator rejects max_exp > 30 so the
headroom never drops below ~8.6e9 rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["decayed_counts", "decayed_topk"]


def decayed_counts(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    anchor: str = "2024-01-31",
    half_life: int = 2,
    max_exp: int = 15,
    unit: str = "day",
) -> DataFrame:
    """Per-key exponentially decayed count with half-life
    ``half_life`` age units at anchor time ``anchor``.

    Output per key: ``cnt`` (raw BIGINT count), ``decayed_fp`` (the
    exact fixed-point decayed count in 2^-max_exp units, BIGINT) and
    ``decayed`` (the same value as an exactly-representable DOUBLE).
    Events newer than the anchor or older than
    ``half_life * (max_exp+1)`` units contribute zero weight.
    """
    if not 0 < max_exp <= 30:
        # 2^63 / 2^30 ~ 8.6e9 rows per key of headroom at the cap
        # (2.8e14 at the default 15) — the int64 sum can never wrap on
        # any realistic key cardinality
        raise ValueError(f"max_exp must be in (0, 30], got {max_exp}")
    if unit == "day":
        age = F.datediff(F.lit(anchor).cast("date"), F.to_date(F.col(ts_col)))
    elif unit == "hour":
        age = F.floor(
            (
                F.unix_timestamp(F.lit(anchor + " 00:00:00"))
                - F.unix_timestamp(F.col(ts_col))
            )
            / 3600
        ).cast("int")
    else:
        raise ValueError(f"unit must be day|hour, got {unit}")
    # stage the age as a named column so the SQL shiftleft can see it
    out = (
        df.withColumn("__age", age.cast("int"))
        .withColumn(
            "__w",
            F.when(
                (F.col("__age") < 0)
                | (F.col("__age") > half_life * max_exp + half_life - 1),
                F.lit(0).cast("long"),
            ).otherwise(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"{max_exp} - CAST(floor(__age / {half_life}) AS INT))"
                )
            ),
        )
        .groupBy(*key_cols)
        .agg(
            F.count("*").alias("cnt"),
            F.sum("__w").alias("decayed_fp"),
        )
        .withColumn(
            "decayed", (F.col("decayed_fp") / F.lit(float(2**max_exp))).cast("double")
        )
    )
    return out


def decayed_topk(
    df: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    k: int = 10,
    **decay_kw,
) -> DataFrame:
    """Top-k keys per group by decayed count (rank over the exact
    integer ``decayed_fp``, ties broken by the key columns — fully
    deterministic cross-engine because the ordering values are exact
    integers)."""
    from pyspark.sql import Window

    counts = decayed_counts(df, group_cols + key_cols, **decay_kw)
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("decayed_fp"), *[F.asc(c) for c in key_cols]
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", *key_cols, "cnt", "decayed_fp", "decayed")
    )
