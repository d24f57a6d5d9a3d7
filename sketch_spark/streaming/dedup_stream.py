"""Streaming ingest dedup: drop already-seen content as pages arrive.

The streaming half of the training-data dedup battery (operators/dedup
covers the batch side): exact content-hash dedup with watermark-bounded
state, so a continuous crawl ingest keeps one copy of each page without
unbounded state growth — Spark evicts dedup state older than the
watermark horizon (duplicate web content overwhelmingly re-arrives
within a bounded window; the batch `dedup_corpus` pass catches the
long tail across horizons).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["streaming_exact_dedup"]


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    time_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First arrival per content hash within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state table is
    bounded by the horizon instead of growing with the corpus —
    the streaming-safe restatement of ``exact_dedup``'s groupBy.  The
    content hash is ``md5(text)`` (JVM-side), matching the batch
    operator and its DuckDB oracle.
    """
    return (
        stream_df.withColumn("content_md5", F.md5(F.col(text_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )
