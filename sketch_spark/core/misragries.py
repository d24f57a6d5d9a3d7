"""Misra–Gries frequent-items summary (deterministic heavy hitters).

The deterministic counterpart of the reference's CMCU heavy-hitter
prefilter (/root/reference/src/sketch.cpp:160-162): keep at most ``k``
(token, count) counters; when a batch would exceed ``k``, subtract the
(k+1)-th largest counter value from every counter and drop the
non-positives (the batched decrement — Misra & Gries 1982, in the
mergeable formulation of Agarwal et al., PODS 2012: merge = pointwise
add, then one more decrement step).

Exact error accounting: ``dec`` accumulates every decrement applied,
so for any token ``est <= true <= est + dec``, every token with
``true > dec`` is guaranteed present, and ``dec <= (N - M) / (k + 1)``
where ``N`` is the total weight fed and ``M`` the surviving counter
mass (asserted in tests/test_frequent.py).  Unlike CMCU the guarantee
is deterministic — no delta, no hash family.

State is tiny (<= k strings + counts), serialized via the standard
sketch wire format: counts as an int64 array, tokens as a utf-8 blob +
offsets (sorted by token for byte-identical states regardless of
insertion order).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .base import Sketch, register


@register
class MisraGries(Sketch):
    kind = "mg"

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counters: dict[str, int] = {}
        self.total = 0  # exact total weight fed (N)
        self.dec = 0  # exact total decrement applied (per-token error bound)

    # -- serialization ------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"k": self.k}

    def _arrays(self) -> dict[str, np.ndarray]:
        toks = sorted(self.counters)
        blob = "".join(toks).encode("utf-8")
        offsets = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum([len(t.encode("utf-8")) for t in toks], out=offsets[1:])
        counts = np.array([self.counters[t] for t in toks], dtype=np.int64)
        return {
            "tok_blob": np.frombuffer(blob, dtype=np.uint8).copy(),
            "tok_offsets": offsets,
            "counts": counts,
        }

    def _extra_state(self) -> dict[str, Any]:
        return {"total": self.total, "dec": self.dec}

    def _load_extra_state(self, extra: dict[str, Any]) -> None:
        self.total = int(extra.get("total", 0))
        self.dec = int(extra.get("dec", 0))
        blob = getattr(self, "tok_blob", np.empty(0, dtype=np.uint8)).tobytes()
        offs = getattr(self, "tok_offsets", np.zeros(1, dtype=np.int64))
        counts = getattr(self, "counts", np.empty(0, dtype=np.int64))
        self.counters = {
            blob[offs[i] : offs[i + 1]].decode("utf-8"): int(counts[i])
            for i in range(len(counts))
        }
        for name in ("tok_blob", "tok_offsets", "counts"):
            if hasattr(self, name):
                delattr(self, name)

    # -- updates ------------------------------------------------------------
    def update_tokens(self, tokens, counts: np.ndarray | None = None) -> None:
        """Feed pre-aggregated (token, count) pairs (callers batch via
        Arrow ``value_counts``; duplicate tokens in one call are fine)."""
        if counts is None:
            counts = np.ones(len(tokens), dtype=np.int64)
        get = self.counters.get
        for t, c in zip(tokens, counts):
            self.counters[t] = get(t, 0) + int(c)
        self.total += int(np.asarray(counts).sum()) if len(tokens) else 0
        self._compress()

    def _compress(self) -> None:
        m = len(self.counters)
        if m <= self.k:
            return
        vals = np.fromiter(self.counters.values(), dtype=np.int64, count=m)
        # (k+1)-th largest value; subtracting it leaves <= k positives
        delta = int(np.partition(vals, m - self.k - 1)[m - self.k - 1])
        self.dec += delta
        self.counters = {
            t: v - delta for t, v in self.counters.items() if v > delta
        }

    def merge(self, other: "Sketch") -> "MisraGries":
        if not isinstance(other, MisraGries) or other.k != self.k:
            raise ValueError("can only merge MisraGries with equal k")
        get = self.counters.get
        for t, c in other.counters.items():
            self.counters[t] = get(t, 0) + c
        self.total += other.total
        self.dec += other.dec
        self._compress()
        return self

    # -- queries ------------------------------------------------------------
    def estimate_tokens(self, tokens) -> np.ndarray:
        get = self.counters.get
        return np.array([get(t, 0) for t in tokens], dtype=np.int64)

    def items(self) -> list[tuple[str, int]]:
        """(token, est) sorted by est desc, token asc (deterministic)."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))

    def error_bound(self) -> int:
        """Exact upper bound on (true - est) for every token."""
        return self.dec
