"""HyperLogLog distinct-count sketch (Flajolet–Fusy–Gandouet–Meunier 2007).

State: ``m = 2^p`` uint8 registers; update takes register ``max`` with
the rank (leading-zero count + 1) of each hashed key's suffix bits;
merge is element-wise ``max`` — an exact homomorphism, so merged state
is identical regardless of partition order (tested).

Estimator: classic alpha_m * m^2 / sum(2^-M) with the small-range
linear-counting correction; 64-bit hashing makes the large-range
correction unnecessary at any realistic cardinality.  Relative standard
error ~= 1.04 / sqrt(m).

Spark cross-check oracles: ``approx_count_distinct`` (HLL++) and the
exact ``count(DISTINCT ...)`` — both tolerance-based, used in tests.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from .base import Sketch, register
from .hashing import bitlen_u64, derive_seeds, hash_strings, mix_u64


@register
class HyperLogLog(Sketch):
    kind = "hll"

    def __init__(self, p: int = 14, seed: int = 1):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.seed = seed
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self._hash_seed = np.uint64(derive_seeds(seed, "hll", 1)[0])

    def _params(self) -> dict[str, Any]:
        return {"p": self.p, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"registers": self.registers}

    def hash_tokens(self, tokens) -> np.ndarray:
        return hash_strings(tokens, seed=self.seed)

    def update_hashed(self, keys: np.ndarray, counts=None) -> None:
        if len(keys) == 0:
            return
        h = mix_u64(keys, self._hash_seed)
        bucket = (h >> np.uint64(64 - self.p)).astype(np.int64)
        suffix_bits = 64 - self.p
        suffix = h & np.uint64((1 << suffix_bits) - 1)
        rank = (suffix_bits - bitlen_u64(suffix) + 1).astype(np.uint8)
        np.maximum.at(self.registers, bucket, rank)

    def update_tokens(self, tokens, counts=None) -> None:
        self.update_hashed(self.hash_tokens(tokens))

    def merge(self, other: "Sketch") -> "HyperLogLog":
        if type(other) is not HyperLogLog or other._params() != self._params():
            raise ValueError("can only merge identically-configured sketches")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    @property
    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def estimate(self) -> float:
        m = float(self.m)
        if self.m >= 128:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        elif self.m >= 64:
            alpha = 0.709
        elif self.m >= 32:
            alpha = 0.697
        else:
            alpha = 0.673
        regs = self.registers.astype(np.float64)
        est = alpha * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * math.log(m / zeros)
        return float(est)
