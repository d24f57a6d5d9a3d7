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

from pyspark.sql import DataFrame

__all__ = ["binary_metadata", "decode_image", "fake_features", "extract_features_df"]

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
    """Typed metadata over an opaque binary column via mapInPandas:
    (id, n_bytes, content_md5, format) — the scan reads only the two
    columns involved; md5 matches SQL ``md5`` for oracle checks."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bufs = pdf[bin_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": bufs.str.len().astype("int64"),
                    "content_md5": bufs.map(lambda b: hashlib.md5(b).hexdigest()),
                    "format": bufs.map(lambda b: _sniff(bytes(b[:8]))),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        run, f"{id_col} {id_type}, n_bytes long, content_md5 string, format string"
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
