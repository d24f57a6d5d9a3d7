"""Spark-free numpy sketch cores (SURVEY.md §7.0).

Every sketch is a mergeable aggregation state with vectorized batch
updates — the algorithmic heart of the library, kept importable without
a SparkSession so the unit-test layer stays fast.
"""

from .base import Sketch, sketch_from_bytes, unique_with_counts
from .bloom import BloomFilter
from .countmin import CountMin, CountMinCU
from .countsketch import CountSketch
from .fd import FrequentDirections
from .misragries import MisraGries
from .hll import HyperLogLog
from .kll import KLL
from .tdigest import TDigest
from . import hashing

__all__ = [
    "Sketch",
    "sketch_from_bytes",
    "unique_with_counts",
    "CountMin",
    "CountMinCU",
    "HyperLogLog",
    "KLL",
    "TDigest",
    "BloomFilter",
    "CountSketch",
    "MisraGries",
    "FrequentDirections",
    "hashing",
]

KINDS = {
    "cm": CountMin,
    "cmcu": CountMinCU,
    "cs": CountSketch,
    "mg": MisraGries,
    "hll": HyperLogLog,
    "kll": KLL,
    "tdigest": TDigest,
    "bloom": BloomFilter,
    "fd": FrequentDirections,
}


def make_sketch(kind: str, **params) -> Sketch:
    """Factory: build an empty sketch by kind name."""
    return KINDS[kind](**params)
