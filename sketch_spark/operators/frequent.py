"""Deterministic frequent-items (Misra–Gries) over token streams.

The deterministic sibling of ``operators.emerging``'s CMCU prefilter:
per-partition MG summaries built in one Arrow pass (``build_partials``
with the ``tokens_str`` spec mode), tree-merged executor-side as
binary states (pointwise add + one decrement — Agarwal et al.'s
mergeable formulation), then either

* ``misra_gries_summary`` — the <=k (token, est, err) summary itself
  (est <= true <= est + err, deterministically), materialized
  executor-side from the merged state (no driver collect); or
* ``frequent_tokens_exact`` — the *exact* answer to "every token with
  freq * (k+1) > N", using the MG presence guarantee as the candidate
  pruner and one map-side-combined exact counting pass over the
  candidates (the shuffle carries only candidate tokens).  Integer
  comparison (cnt * (k+1) > N) keeps the threshold float-free, so a
  SQL oracle reproduces it exactly.

At 100 TB both passes scan once and shuffle only candidate-scale data;
the merged MG state is <= k counters regardless of input size.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, functions as F

from ..core import sketch_from_bytes
from ..core.misragries import MisraGries
from ..functions.text import tokenize_batch
from .aggregate import SketchSpec, build_partials, ensure_min_partitions, merge_partials
from .emerging import _cached_sketch, broadcast_sketch

__all__ = ["misra_gries_summary", "frequent_tokens_exact", "build_mg"]


def build_mg(
    df: DataFrame, text_col: str = "text", k: int = 256, lowercase: bool = False
) -> DataFrame:
    """One-row DataFrame holding the merged binary MG state."""
    spec = SketchSpec("mg", "mg", text_col, mode="tokens_str",
                      lowercase=lowercase, params={"k": k})
    partials = build_partials(df.select(text_col), [spec])
    return merge_partials(partials, [])


def misra_gries_summary(
    df: DataFrame, text_col: str = "text", k: int = 256, lowercase: bool = False
) -> DataFrame:
    """(token, est, err) rows from the merged MG state — unpacked
    executor-side via mapInArrow on the one-row state table."""
    merged = build_mg(df, text_col, k, lowercase)

    def unpack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            states = tbl.column("state").to_pylist()
            specs = tbl.column("spec").to_pylist()
            for spec_name, blob in zip(specs, states):
                if spec_name != "mg":
                    continue
                mg = sketch_from_bytes(blob)
                items = mg.items()
                yield pa.RecordBatch.from_pydict(
                    {
                        "token": pa.array([t for t, _ in items], pa.string()),
                        "est": pa.array([c for _, c in items], pa.int64()),
                        "err": pa.array([mg.dec] * len(items), pa.int64()),
                    }
                )

    return merged.mapInArrow(unpack, "token string, est long, err long")


def _exact_candidate_counts(
    df: DataFrame, text_col: str, mg_bc, lowercase: bool
) -> DataFrame:
    """Exact counts of tokens present in the broadcast MG state: per
    batch Arrow value_counts filtered by summary membership, partial
    dicts combined map-side — only candidate tokens ever shuffle."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        mg: MisraGries = _cached_sketch(mg_bc)
        members = pa.array(list(mg.counters), type=pa.string())
        acc: dict[str, int] = {}
        for batch in batches:
            col = batch.column(0)
            if lowercase:
                col = pc.utf8_lower(col)
            flat, _ = tokenize_batch(col)
            if len(flat) == 0:
                continue
            vc = flat.value_counts()
            uniq = vc.field("values")
            cnts = vc.field("counts").to_numpy(zero_copy_only=False)
            keep = pc.is_in(uniq, value_set=members).to_numpy(zero_copy_only=False)
            if not keep.any():
                continue
            for t, c in zip(uniq.filter(pa.array(keep)).to_pylist(), cnts[keep]):
                acc[t] = acc.get(t, 0) + int(c)
        yield pa.RecordBatch.from_pydict(
            {
                "token": pa.array(list(acc.keys()), pa.string()),
                "cnt": pa.array(list(acc.values()), pa.int64()),
            }
        )

    partial = ensure_min_partitions(df.select(text_col)).mapInArrow(
        run, "token string, cnt long"
    )
    return partial.groupBy("token").agg(F.sum("cnt").alias("cnt"))


def frequent_tokens_exact(
    df: DataFrame, text_col: str = "text", k: int = 200, lowercase: bool = False
) -> DataFrame:
    """Exact (token, cnt) for every token with cnt * (k+1) > N, where N
    is the total token count — MG guarantees the summary is a superset
    of that set, so one candidate-count pass finishes the job."""
    spec = SketchSpec("mg", "mg", text_col, mode="tokens_str",
                      lowercase=lowercase, params={"k": k})
    from .aggregate import sketch_aggregate

    mg: MisraGries = sketch_aggregate(df.select(text_col), [spec]).sketch("mg")
    bc = broadcast_sketch(df.sparkSession, mg)
    exact = _exact_candidate_counts(df, text_col, bc, lowercase)
    # integer threshold: cnt * (k+1) > N  <=>  cnt > N/(k+1), float-free
    return exact.filter(F.col("cnt") * F.lit(k + 1) > F.lit(mg.total))
