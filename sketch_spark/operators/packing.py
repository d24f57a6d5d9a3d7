"""Sequence packing for LLM pre-training: concat-and-split accounting.

Training pipelines concatenate the corpus token stream in a canonical
document order and split it into fixed-size context windows; each
document needs its global token offset to know which window(s) it
lands in.  The global offset is a prefix sum over a total order — the
textbook case where the naive Spark plan (one global ``Window.orderBy``)
collapses to a single partition and dies at scale.

This module computes it as the classic two-pass distributed scan:

  1. bucket docs into contiguous id ranges with an *explicit* bucket id
     (``floor(id / ceil((max_id+1)/P))`` — deterministic, no
     RangePartitioner sampling, safe under task re-execution);
  2. per-bucket token totals (tiny: P rows) -> cumulative bucket
     offsets, joined back via broadcast;
  3. in-bucket prefix sum with ``Window.partitionBy(bucket)
     .orderBy(id)`` — sorts only within buckets.

Total cost: one scan + one P-row aggregate + one bucket-local sort; no
global sort, no single-partition stage.  Output is partitioning-
invariant (depends only on the id order), so the DuckDB oracle is a
plain windowed cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.text import tokens_col

__all__ = ["token_chunks", "global_prefix_sum"]


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "prefix",
    n_buckets: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = sum of ``value_col`` over all rows with a
    strictly smaller ``order_col`` (exclusive prefix sum over the total
    order), without a global sort.  ``order_col`` must be numeric,
    non-negative and unique per row."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = max(2, spark.sparkContext.defaultParallelism)
    max_id = df.agg(F.max(order_col).alias("m")).collect()[0]["m"]
    if max_id is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    span = int(max_id) // n_buckets + 1
    b = df.withColumn("_bkt", (F.col(order_col) / F.lit(span)).cast("long"))
    totals = b.groupBy("_bkt").agg(F.sum(value_col).alias("_tot"))
    offsets = totals.select(
        "_bkt",
        (
            F.sum("_tot").over(
                W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
            )
        ).alias("_off"),
    ).fillna(0, ["_off"])
    # offsets is P rows — the broadcast join keeps the big side in place
    local = F.sum(value_col).over(
        W.partitionBy("_bkt").orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            out_col,
            (F.coalesce(local, F.lit(0)) + F.col("_off")).cast("long"),
        )
        .drop("_bkt", "_off")
    )


def token_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 2048,
) -> DataFrame:
    """Per-doc packing accounting for fixed-size context windows:
    (id, n_tokens, start_off, first_chunk, last_chunk, n_chunks) where
    the corpus token stream is the concatenation in ``id_col`` order
    and chunk ``c`` covers token offsets [c*L, (c+1)*L)."""
    counted = df.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    with_off = global_prefix_sum(counted, "n_tokens", id_col, out_col="start_off")
    first = F.floor(F.col("start_off") / chunk_size).cast("long")
    last = F.floor((F.col("start_off") + F.col("n_tokens") - 1) / chunk_size).cast("long")
    return with_off.select(
        id_col,
        "n_tokens",
        "start_off",
        first.alias("first_chunk"),
        F.greatest(last, first).alias("last_chunk"),
        (F.greatest(last, first) - first + 1).alias("n_chunks"),
    )
