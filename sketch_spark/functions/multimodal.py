"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this
container — clearly marked below); everything Spark-side is real and
tested: schemas, Arrow batch shapes, partition behavior, and the
deterministic fake feature extractor used to exercise downstream
plumbing (e.g. feeding embedding-near-dup with "decoded" features).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["binary_metadata", "decode_image", "fake_features", "extract_features_df", "resize_images_df", "sample_video_frames_df"]

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<!DO": "html",
    b"%PDF": "pdf",
}


def _sniff(buf: bytes) -> str:
    for magic, kind in _MAGIC.items():
        if buf[: len(magic)] == magic:
            return kind
    return "unknown"


def decode_image(buf: bytes):
    """STUB — image decoding requires PIL/opencv, not present in this
    environment.  The Spark plumbing around it (schema, batching) is
    real; swap this function for a real decoder on a cluster with the
    libraries installed."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in this container); "
        "use fake_features() for plumbing tests"
    )


def fake_features(buf: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a decode->feature-extract step: a
    unit-norm float vector derived from the content digest.  Stable
    across processes/executors (hash-based, no RNG state)."""
    digest = hashlib.sha256(buf).digest()
    raw = np.frombuffer((digest * ((dim * 8) // len(digest) + 1))[: dim * 8], dtype=np.uint64)
    v = (raw % np.uint64(2**53)).astype(np.float64) / float(2**53) - 0.5
    n = np.linalg.norm(v)
    return v / (n if n else 1.0)


def binary_metadata(
    df: DataFrame, bin_col: str = "html", id_col: str = "url", id_type: str = "string"
) -> DataFrame:
    """Typed metadata over an opaque binary column as PURE Catalyst
    expressions — (id, n_bytes, content_md5, format) via ``F.length`` /
    ``F.md5`` / ``F.substring``+CASE, all whole-stage codegen'd
    JVM-side (no Python stage at all; mapInPandas is reserved for real
    decoders, see ``extract_features_df``).  ``id_type`` is retained
    for API compatibility; the id column keeps its input type.
    """
    c = F.col(bin_col)
    fmt = None
    for magic, kind in _MAGIC.items():
        cond = F.substring(c, 1, len(magic)) == F.lit(magic)
        fmt = F.when(cond, kind) if fmt is None else fmt.when(cond, kind)
    fmt = fmt.otherwise("unknown")
    return df.select(
        F.col(id_col),
        F.length(c).cast("long").alias("n_bytes"),
        F.md5(c).alias("content_md5"),
        fmt.alias("format"),
    )


def extract_features_df(
    df: DataFrame, bin_col: str = "html", id_col: str = "url", dim: int = 16
) -> DataFrame:
    """Decode->feature-extract plumbing with the deterministic fake
    extractor (see ``decode_image`` for the real-decoder swap point)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_features(bytes(b), dim).tolist() for b in pdf[bin_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, bin_col).mapInPandas(
        run, f"{id_col} string, features array<double>"
    )


def _fake_pixels(buf: bytes, width: int, height: int) -> bytes:
    """STUB pixel decode — deterministic digest-derived RGB buffer of the
    right size (no PIL/opencv in this container); the Spark plumbing
    around it (schema, batch shape, per-row sizing) is real."""
    need = width * height * 3
    digest = hashlib.sha256(buf).digest()
    return (digest * (need // len(digest) + 1))[:need]


def resize_images_df(
    df: DataFrame,
    bin_col: str = "image",
    id_col: str = "url",
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """Decode+resize plumbing over an opaque image column: one output
    row per image with typed (width, height, pixels:binary) — exactly
    the schema a PIL/opencv decoder would fill.  The decode itself is
    the clearly-marked ``_fake_pixels`` stub (swap for
    ``PIL.Image.open(io.BytesIO(buf)).resize((w, h)).tobytes()`` on a
    cluster with the libraries); everything Spark-side — column
    pruning, Arrow batching, fixed-size binary output — is real and
    tested, and the operator is embarrassingly parallel (mapInPandas,
    no shuffle)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": width,
                    "height": height,
                    "pixels": [_fake_pixels(bytes(b), width, height) for b in pdf[bin_col]],
                }
            )

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        run, f"{id_col} {id_ddl}, width int, height int, pixels binary"
    )


def sample_video_frames_df(
    df: DataFrame,
    bin_col: str = "video",
    id_col: str = "url",
    n_frames: int = 4,
    width: int = 32,
    height: int = 32,
) -> DataFrame:
    """Frame-sampling plumbing over an opaque video column: N output
    rows per input row, (id, frame_idx, frame:binary) — the row
    multiplication a real ffmpeg/av sampler produces, with the decode
    stubbed deterministically (frame i = digest-derived pixels of
    (buf, i)).  Partition behavior matters here: output is N x input
    rows but still shuffle-free; downstream per-frame feature
    extraction parallelizes over the same partitions."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for rid, buf in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(buf)
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(_fake_pixels(b + i.to_bytes(4, "little"), width, height))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        run, f"{id_col} {id_ddl}, frame_idx int, frame binary"
    )
