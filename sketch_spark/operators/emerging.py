"""Emerging heavy hitters — the reference's flagship query (SURVEY.md §1.2).

Reference semantics (/root/reference/src/sketch.cpp:160-162, 179-245):
report token x iff (1) its CMCU estimate over the *test* stream reaches
``threshold`` and (2) estimate / growth strictly exceeds its exact
occurrence count in the *control* stream; reported frequency is the
pre-scaling estimate.

Distributed shape (two passes; SURVEY.md §7.2 "heavy-hitter emission
timing"):

  pass 1   test_df  -> global merged CMCU            (sketch_aggregate)
  pass 2   test_df  -> per-partition: unique tokens per batch,
           estimate against the *broadcast* merged sketch, keep
           est >= threshold, emit (token, partial_count)   [mapInArrow]
           -> groupBy(token).sum  — shuffles ONLY candidate tokens
  pass 2'  control_df -> same candidate predicate (the broadcast sketch
           itself decides membership; no candidate list ever ships)
           -> exact control counts of candidates
  final    left join (candidates ⨝ control counts)  + filter
           est/growth > control_count               [broadcast join]

Because the final sketch estimate dominates every prefix estimate, the
candidate set is a superset of the reference's streaming upserts; the
control-subtraction filter is applied to exactly the same quantities.
``mode="exact"`` additionally verifies candidates against their exact
test counts — making the result the *exact* answer to
``count_test >= threshold AND count_test/growth > count_control`` with
the sketch acting as a pre-filter (SQL-oracle-checkable end to end).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, functions as F

from ..core import CountMinCU, sketch_from_bytes
from ..functions.text import tokenize_batch
from .aggregate import SketchSpec, sketch_aggregate

__all__ = ["emerging_heavy_hitters", "candidate_token_counts", "estimate_tokens_udf", "estimate_ngrams_udf", "broadcast_sketch"]

# per-executor deserialized sketch cache (uuid -> object); broadcasts
# carry (uuid, blob) so workers deserialize each state exactly once
_SKETCH_CACHE: dict[str, object] = {}


def broadcast_sketch(spark, sketch) -> object:
    """Broadcast a sketch's binary state with a cache key."""
    import uuid

    return spark.sparkContext.broadcast((uuid.uuid4().hex, sketch.to_bytes()))


def _cached_sketch(sketch_bc):
    key, blob = sketch_bc.value
    sk = _SKETCH_CACHE.get(key)
    if sk is None:
        sk = sketch_from_bytes(blob)
        if len(_SKETCH_CACHE) > 8:
            _SKETCH_CACHE.clear()
        _SKETCH_CACHE[key] = sk
    return sk


def candidate_token_counts(
    df: DataFrame,
    text_col: str,
    sketch_bc,
    threshold: int,
    lowercase: bool = False,
    ngram: int = 1,
) -> DataFrame:
    """(token, cnt) exact counts of tokens (or word n-grams) whose
    global-sketch estimate reaches ``threshold`` — map-side combined,
    so the shuffle carries only candidate tokens
    (vocab-of-heavy-hitters scale, not data scale).

    For ``ngram > 1`` the estimates use the same rolling-combined hash
    family the sketch was built with (``token_hashes``), and candidate
    *strings* are materialized only for occurrences that pass the
    sketch filter.
    """
    from ..functions.text import ngram_occurrences

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        sketch = _cached_sketch(sketch_bc)
        acc: dict[str, int] = {}
        for batch in batches:
            col = batch.column(0)
            if ngram <= 1:
                if lowercase:
                    col = pc.utf8_lower(col)
                flat, _ = tokenize_batch(col)
                if len(flat) == 0:
                    continue
                vc = flat.value_counts()
                uniq = vc.field("values")
                cnts = vc.field("counts").to_numpy(zero_copy_only=False)
                est = sketch.estimate_tokens(uniq)
                keep = est >= threshold
                if not keep.any():
                    continue
                kept_tokens = uniq.filter(pa.array(keep)).to_pylist()
                kept_counts = cnts[keep]
            else:
                keys, strs = ngram_occurrences(col, sketch.seed, ngram, lowercase)
                if len(keys) == 0:
                    continue
                uk, inv = np.unique(keys, return_inverse=True)
                cnts = np.bincount(inv, minlength=len(uk)).astype(np.int64)
                est = sketch.estimate_hashed(uk)
                keep = est >= threshold
                if not keep.any():
                    continue
                # representative string per kept hash = first occurrence
                first_idx = np.full(len(uk), len(keys), dtype=np.int64)
                np.minimum.at(first_idx, inv, np.arange(len(keys)))
                kept_counts = cnts[keep]
                kept_tokens = strs.take(pa.array(first_idx[keep])).to_pylist()
            for t, c in zip(kept_tokens, kept_counts):
                acc[t] = acc.get(t, 0) + int(c)
        out = pa.RecordBatch.from_pydict(
            {
                "token": pa.array(list(acc.keys()), type=pa.string()),
                "cnt": pa.array(list(acc.values()), type=pa.int64()),
            }
        )
        yield out

    from .aggregate import ensure_min_partitions

    partial = ensure_min_partitions(df.select(text_col)).mapInArrow(run, "token string, cnt long")
    return partial.groupBy("token").agg(F.sum("cnt").alias("cnt"))


def estimate_ngrams_udf(sketch_bc, ngram: int, lowercase: bool = False):
    """pandas UDF: n-gram string column -> sketch estimate (the string
    is re-tokenized and rolling-hashed exactly like the build path)."""

    @F.pandas_udf("long")
    def est(grams: pd.Series) -> pd.Series:
        from ..functions.text import ngram_occurrences

        sketch = _cached_sketch(sketch_bc)
        arr = pa.array(grams.fillna("").tolist(), type=pa.string())
        keys, _ = ngram_occurrences(arr, sketch.seed, ngram, lowercase)
        # each input row is exactly one n-gram -> one key per row
        vals = sketch.estimate_hashed(keys)
        return pd.Series(np.asarray(vals, dtype=np.int64))

    return est


def estimate_tokens_udf(sketch_bc):
    """pandas UDF: token column -> sketch estimate (broadcast state)."""

    @F.pandas_udf("long")
    def est(tokens: pd.Series) -> pd.Series:
        sketch = _cached_sketch(sketch_bc)
        vals = sketch.estimate_tokens(tokens.fillna("").tolist())
        return pd.Series(np.asarray(vals, dtype=np.int64))

    return est


def bloom_semi_join(
    big_df: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    log2_bits: int = 24,
    k: int = 5,
    seed: int = 1,
    exact: bool = True,
) -> DataFrame:
    """Semi-join acceleration by Bloom pre-filter (A3's sketch-gates-
    the-expensive-operator idea applied to joins).

    Builds a Bloom filter over ``keys_df[key_col]``, broadcasts it, and
    drops big-side rows whose key cannot be present *before* any
    shuffle — the surviving rows (true matches + FPR-rate stragglers)
    then take the exact semi-join.  With ``exact=False`` the exact join
    is skipped entirely: output may contain false positives at the
    filter's FPR, but no shuffle of the big side ever happens — the
    right trade when the key set is huge and approximate membership is
    acceptable (e.g. "drop documents whose url we already crawled").
    """
    from ..operators.aggregate import SketchSpec, sketch_aggregate

    # keys hash as strings on BOTH sides (mode="value" on a numeric
    # column would use a different hash family than the probe)
    spec = SketchSpec(
        "bloom", "bloom", "_key_str", mode="value",
        params={"log2_bits": log2_bits, "k": k, "seed": seed},
    )
    keyed = keys_df.select(F.col(key_col).cast("string").alias("_key_str"))
    bloom = sketch_aggregate(keyed, [spec]).sketch("bloom")
    bc = broadcast_sketch(big_df.sparkSession, bloom)

    @F.pandas_udf("boolean")
    def maybe_member(keys: pd.Series) -> pd.Series:
        sk = _cached_sketch(bc)
        return pd.Series(sk.contains_tokens(keys.fillna("").astype(str).tolist()))

    pre = big_df.filter(maybe_member(F.col(key_col).cast("string")))
    if not exact:
        return pre
    return pre.join(keys_df.select(key_col).distinct(), key_col, "left_semi")


def emerging_heavy_hitters(
    test_df: DataFrame,
    control_df: DataFrame,
    text_col: str = "text",
    threshold: int = 100,
    growth: float = 2.0,
    depth: int = 4,
    log2_width: int = 14,
    seed: int = 1,
    mode: str = "reference",
    fanout: int | None = None,
    lowercase: bool = False,
    ngram: int = 1,
    prebuilt_sketch: CountMinCU | None = None,
) -> DataFrame:
    """Emerging-HH result DataFrame.

    mode="reference": filter on sketch estimate (est >= threshold AND
        est/growth > control_count), report freq = est — the
        reference's exact decision quantities.
    mode="exact": additionally require exact test counts; output is
        (token, freq=exact test count, control_count) — precisely the
        SQL ``HAVING cnt >= threshold AND cnt/growth > control_cnt``.
    """
    spark = test_df.sparkSession
    if prebuilt_sketch is None:
        spec = SketchSpec(
            "cmcu",
            "cmcu",
            text_col,
            mode="tokens",
            lowercase=lowercase,
            ngram=ngram,
            params={"depth": depth, "log2_width": log2_width, "seed": seed},
        )
        result = sketch_aggregate(test_df, [spec], fanout=fanout)
        sketch = result.sketch("cmcu")
    else:
        sketch = prebuilt_sketch
    bc = broadcast_sketch(spark, sketch)

    cand = candidate_token_counts(test_df, text_col, bc, threshold, lowercase, ngram)
    cand = cand.withColumnRenamed("cnt", "test_count")
    est_udf = (
        estimate_tokens_udf(bc) if ngram <= 1 else estimate_ngrams_udf(bc, ngram, lowercase)
    )
    cand = cand.withColumn("est", est_udf(F.col("token")))

    ctrl = candidate_token_counts(control_df, text_col, bc, threshold, lowercase, ngram)
    ctrl = ctrl.withColumnRenamed("cnt", "control_count")

    joined = cand.join(F.broadcast(ctrl), "token", "left").withColumn(
        "control_count", F.coalesce(F.col("control_count"), F.lit(0))
    )
    if mode == "reference":
        # the reference stores est/GROWTH back into an int
        # (sketch.cpp:181 `heavy_hitter.second /= GROWTH`) before the
        # comparison — truncate (floor: est >= 0) to match exactly
        out = joined.filter(
            (F.col("est") >= threshold)
            & (F.floor(F.col("est") / F.lit(growth)) > F.col("control_count"))
        ).select(
            "token",
            F.col("est").alias("freq"),
            "test_count",
            "control_count",
        )
    elif mode == "exact":
        out = joined.filter(
            (F.col("test_count") >= threshold)
            & (F.col("test_count") / F.lit(growth) > F.col("control_count"))
        ).select(
            "token",
            F.col("test_count").alias("freq"),
            "control_count",
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return out
