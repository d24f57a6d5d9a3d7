"""Time-decayed counts: dyadic-weight exactness vs python integers,
horizon clamps, half-life semantics, and decayed-rank behavior."""

import datetime

import pytest

from pyspark.sql import functions as F

from sketch_spark.operators.decay import decayed_counts, decayed_topk

ANCHOR = "2024-01-31"
MAX_EXP = 15


def _ev(spark, rows):
    return spark.createDataFrame(
        [(k, datetime.datetime.fromisoformat(ts)) for k, ts in rows],
        "key string, ts timestamp",
    )


def _py_fp(ages, half_life=2, max_exp=MAX_EXP):
    total = 0
    for a in ages:
        if a < 0 or a // half_life > max_exp:
            continue
        total += 1 << (max_exp - a // half_life)
    return total


def test_exact_integer_weights(spark):
    rows = [("a", f"2024-01-{d:02d} 12:00:00") for d in (1, 5, 15, 29, 30, 31)]
    rows += [("b", "2024-01-30 23:59:59"), ("b", "2024-01-02 00:00:01")]
    out = {
        r.key: (r.cnt, r.decayed_fp, r.decayed)
        for r in decayed_counts(_ev(spark, rows), ["key"]).collect()
    }
    ages_a = [30, 26, 16, 2, 1, 0]
    ages_b = [1, 29]
    assert out["a"] == (6, _py_fp(ages_a), _py_fp(ages_a) / 2**MAX_EXP)
    assert out["b"] == (2, _py_fp(ages_b), _py_fp(ages_b) / 2**MAX_EXP)


def test_horizon_and_future_clamp(spark):
    rows = [
        ("old", "2023-12-25 00:00:00"),   # age 37 > 31: weight 0
        ("future", "2024-02-02 00:00:00"),  # age < 0: weight 0
        ("edge", "2023-12-31 00:00:00"),  # age 31: weight 1 (expo 0)
        ("gone", "2023-12-30 00:00:00"),  # age 32: weight 0
    ]
    out = {
        r.key: r.decayed_fp
        for r in decayed_counts(_ev(spark, rows), ["key"]).collect()
    }
    assert out == {"old": 0, "future": 0, "edge": 1, "gone": 0}


def test_half_life_semantics(spark):
    # an event half_life units older carries exactly half the weight
    rows = [("now", "2024-01-31 09:00:00"), ("hl", "2024-01-29 09:00:00")]
    out = {
        r.key: r.decayed_fp
        for r in decayed_counts(_ev(spark, rows), ["key"]).collect()
    }
    assert out["now"] == 2 * out["hl"] == 2**MAX_EXP


def test_hour_unit(spark):
    rows = [
        ("h0", "2024-01-30 23:30:00"),  # 0.5h before anchor midnight -> age 0
        ("h3", "2024-01-30 20:30:00"),  # age 3 -> expo 15 - 1
    ]
    out = {
        r.key: r.decayed_fp
        for r in decayed_counts(
            _ev(spark, rows), ["key"], anchor="2024-01-31", unit="hour", half_life=2
        ).collect()
    }
    assert out["h0"] == 2**MAX_EXP and out["h3"] == 2 ** (MAX_EXP - 1)


def test_recency_beats_volume(spark):
    # 3 fresh events must outrank 20 stale ones
    rows = [("fresh", "2024-01-31 01:00:00")] * 3
    rows += [("stale", "2024-01-03 01:00:00")] * 20
    top = decayed_topk(
        _ev(spark, rows).withColumn("grp", F.lit("g")),
        ["key"],
        ["grp"],
        k=2,
    ).collect()
    assert [(r.rank, r.key) for r in top] == [(1, "fresh"), (2, "stale")]
    by_key = {r.key: r for r in top}
    assert by_key["fresh"].cnt < by_key["stale"].cnt  # raw count disagrees
    assert by_key["fresh"].decayed_fp > by_key["stale"].decayed_fp


def test_matches_events_python(spark, sf001):
    ev = spark.read.parquet(f"{sf001}/events.parquet")
    got = {
        r.event_type: r.decayed_fp
        for r in decayed_counts(ev, ["event_type"]).collect()
    }
    rows = ev.select("event_type", F.col("ts").cast("string")).collect()
    anchor = datetime.date(2024, 1, 31)
    want: dict[str, int] = {}
    ages: dict[str, list[int]] = {}
    for r in rows:
        d = datetime.datetime.fromisoformat(r.ts).date()
        ages.setdefault(r.event_type, []).append((anchor - d).days)
    for k, a in ages.items():
        want[k] = _py_fp(a)
    assert got == want


def test_max_exp_guard(spark):
    rows = [("a", "2024-01-30 00:00:00")]
    with pytest.raises(ValueError, match="max_exp"):
        decayed_counts(_ev(spark, rows), ["key"], max_exp=31)
    with pytest.raises(ValueError, match="unit"):
        decayed_counts(_ev(spark, rows), ["key"], unit="minute")


def test_null_ts_rows_count_but_carry_no_weight(spark):
    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 30, 12, 0, 0)),
        ("a", None),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    out = decayed_counts(df, ["key"]).collect()[0]
    assert out.cnt == 2                      # the row is still a row
    assert out.decayed_fp == 2 ** (MAX_EXP)  # but only the dated one weighs
