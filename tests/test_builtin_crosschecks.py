"""Cross-checks against Spark's OWN sketch implementations
(SURVEY §2.3 / §5.2 L3): our numpy sketches and the JVM built-ins are
independent implementations of the same published algorithms, so their
estimates must agree within the algorithms' tolerance — an oracle that
catches hash-family or register-layout bugs the self-consistent
pytests cannot (reference analog: the cross-implementation HH-count
consistency its harness collects in run_eval.py:136-141).

Checked:
  * CountMin      vs SQL  count_min_sketch (JVM CountMinSketch.readFrom)
  * CountMinCU    vs both (CU <= CM pointwise, both >= truth)
  * HyperLogLog   vs approx_count_distinct AND hll_sketch_agg/estimate
  * KLL           vs percentile_approx
  * t-digest      vs percentile_approx
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def zipf_tokens_df(spark):
    rng = np.random.default_rng(11)
    ids = rng.zipf(1.3, size=60_000)
    ids = ids[ids <= 3000][:50_000]
    toks = pd.DataFrame({"tok": [f"w{t}" for t in ids]})
    return spark.createDataFrame(toks).repartition(8), pd.Series(
        [f"w{t}" for t in ids]
    ).value_counts()


def test_countmin_vs_spark_count_min_sketch(spark, zipf_tokens_df):
    """Same (eps, delta) configuration, same data: both sketches must
    never underestimate and stay within eps*N of the exact counts, and
    their per-key estimates must agree within the combined eps*N slack."""
    from sketch_spark.core.countmin import CountMin, CountMinCU

    df, exact = zipf_tokens_df
    n = int(exact.sum())
    depth, log2_width = 4, 14
    width = 1 << log2_width
    eps = np.e / width
    confidence = 1.0 - np.exp(-depth)

    jbytes = df.agg(
        F.count_min_sketch("tok", F.lit(eps), F.lit(confidence), F.lit(1)).alias("s")
    ).collect()[0]["s"]
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(jbytes)
    )

    ours = CountMin(depth=depth, log2_width=log2_width, seed=1)
    cu = CountMinCU(depth=depth, log2_width=log2_width, seed=1)
    toks = df.toPandas()["tok"].to_numpy(dtype=object)
    ours.update_tokens(toks)
    cu.update_tokens(toks)

    keys = exact.index[:200].to_numpy(dtype=object)
    truth = exact.iloc[:200].to_numpy()
    mine = ours.estimate_tokens(keys)
    mine_cu = cu.estimate_tokens(keys)
    theirs = np.array([jcms.estimateCount(str(k)) for k in keys], dtype=np.int64)

    bound = eps * n
    for est in (mine, mine_cu, theirs):
        assert (est >= truth).all(), "count-min family never underestimates"
        assert (est - truth <= bound).all(), "within eps*N of exact"
    # CU is pointwise sandwiched: truth <= CU <= plain CM
    assert (mine_cu <= mine).all()
    # cross-implementation agreement: both within eps*N of truth means
    # within 2*eps*N of each other; in practice far tighter
    assert (np.abs(mine - theirs) <= 2 * bound).all()


def test_hll_vs_approx_count_distinct_and_datasketches(spark, zipf_tokens_df):
    """Our HLL at precision p has rsd ~ 1.04/sqrt(2^p); Spark's
    approx_count_distinct (HLL++) and hll_sketch_agg (DataSketches HLL)
    at comparable precision must land within the combined 3-sigma band
    of the same truth — and hence of each other."""
    from sketch_spark.core.hll import HyperLogLog

    df, exact = zipf_tokens_df
    truth = len(exact)
    p = 12
    rsd = 1.04 / np.sqrt(1 << p)

    hll = HyperLogLog(p=p, seed=1)
    hll.update_tokens(df.toPandas()["tok"].to_numpy(dtype=object))
    mine = hll.estimate()

    acd = df.agg(F.approx_count_distinct("tok", rsd).alias("c")).collect()[0]["c"]
    dsk = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("tok", F.lit(p))).alias("c")
    ).collect()[0]["c"]

    for est, name in ((mine, "ours"), (acd, "approx_count_distinct"), (dsk, "hll_sketch_agg")):
        assert abs(est - truth) <= 3 * rsd * truth + 2, (name, est, truth)


def test_kll_and_tdigest_vs_percentile_approx(spark):
    """Quantile sketches vs Spark's percentile_approx (Greenwald-Khanna)
    on a skewed lognormal column: every implementation's answer must sit
    within each sketch's rank-error band of the exact quantile."""
    from sketch_spark.core.kll import KLL
    from sketch_spark.core.tdigest import TDigest

    rng = np.random.default_rng(5)
    vals = rng.lognormal(0.0, 1.0, size=40_000)
    df = spark.createDataFrame(pd.DataFrame({"v": vals})).repartition(8)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    srt = np.sort(vals)

    pa_vals = df.agg(
        F.percentile_approx("v", qs, 10_000).alias("p")
    ).collect()[0]["p"]

    kll = KLL(k=200, seed=1)
    kll.update_values(vals)
    td = TDigest(delta=200.0)
    td.update_values(vals)

    def rank_of(x):
        return np.searchsorted(srt, x, side="right") / len(srt)

    for q, pv in zip(qs, pa_vals):
        assert abs(rank_of(pv) - q) <= 0.01 + 2 / len(srt), ("percentile_approx", q)
        assert abs(rank_of(float(kll.quantile(q))) - q) <= 3 * kll.normalized_rank_error() + 2 / len(srt), ("kll", q)
        assert abs(rank_of(float(td.quantile(q))) - q) <= 0.02, ("tdigest", q)
    # cross-implementation: KLL and percentile_approx agree in rank
    for q, pv in zip(qs, pa_vals):
        assert abs(rank_of(float(kll.quantile(q))) - rank_of(pv)) <= 0.03
