"""Bloom filter (Bloom 1970) over hashed keys.

State: ``m`` bits packed into uint64 words; ``k`` probe positions per
key via Kirsch–Mitzenmacher double hashing ``h1 + i*h2 mod m`` (two
independent splitmix-finalized hashes per key).  Merge is bitwise OR —
an exact homomorphism.  No false negatives by construction (tested);
false-positive rate ~ (1 - e^{-k n / m})^k.

The oracle for membership in tests/driver checks is an exact semi-join
(`IN`), per SURVEY.md §2.3.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from .base import Sketch, register
from .hashing import derive_seeds, hash_strings, mix_u64


@register
class BloomFilter(Sketch):
    kind = "bloom"

    def __init__(self, log2_bits: int = 20, k: int = 5, seed: int = 1):
        if not (6 <= log2_bits <= 36):
            raise ValueError("log2_bits must be in [6, 36]")
        if not (1 <= k <= 16):
            raise ValueError("k must be in [1, 16]")
        self.log2_bits = log2_bits
        self.m = 1 << log2_bits  # power of two -> mod is a mask
        self.k = k
        self.seed = seed
        self.words = np.zeros(self.m >> 6, dtype=np.uint64)
        self.n_items = 0
        s = derive_seeds(seed, "bloom", 2)
        self._s1, self._s2 = np.uint64(s[0]), np.uint64(s[1])

    def _params(self) -> dict[str, Any]:
        return {"log2_bits": self.log2_bits, "k": self.k, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"words": self.words}

    def _extra_state(self) -> dict[str, Any]:
        return {"n_items": int(self.n_items)}

    def _load_extra_state(self, extra: dict[str, Any]) -> None:
        self.n_items = int(extra.get("n_items", 0))

    def hash_tokens(self, tokens) -> np.ndarray:
        return hash_strings(tokens, seed=self.seed)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions by double hashing."""
        mask = np.uint64(self.m - 1)
        h1 = mix_u64(keys, self._s1)
        h2 = mix_u64(keys, self._s2) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) & mask).astype(np.int64)

    def update_hashed(self, keys: np.ndarray, counts=None) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        word = pos >> 6
        bit = np.uint64(1) << (pos & 63).astype(np.uint64)
        np.bitwise_or.at(self.words, word, bit)
        self.n_items += len(keys)

    def update_tokens(self, tokens, counts=None) -> None:
        self.update_hashed(self.hash_tokens(tokens))

    def contains_hashed(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.empty(0, dtype=bool)
        pos = self._positions(keys)  # (k, n)
        word = pos >> 6
        bit = np.uint64(1) << (pos & 63).astype(np.uint64)
        hits = (self.words[word] & bit) != 0
        return hits.all(axis=0)

    def contains_tokens(self, tokens) -> np.ndarray:
        return self.contains_hashed(self.hash_tokens(tokens))

    def merge(self, other: "Sketch") -> "BloomFilter":
        if type(other) is not BloomFilter or other._params() != self._params():
            raise ValueError("can only merge identically-configured sketches")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_items += other.n_items
        return self

    def expected_fpr(self) -> float:
        """Analytic false-positive rate at the current fill."""
        return (1.0 - math.exp(-self.k * self.n_items / self.m)) ** self.k
