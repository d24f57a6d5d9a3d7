"""KLL streaming-quantiles sketch (Karnin–Lang–Liberty 2016).

State: a stack of compactors; level ``h`` holds items each representing
``2^h`` input values.  When total size exceeds the capacity budget the
lowest over-full level is compacted: sort, keep every other item
(deterministic pseudo-coin picks the even/odd phase), promote survivors
one level up.  Merge concatenates levels pairwise then compacts back
under budget — associative up to the sketch's published rank error
``eps ~= O(1/k)`` (states differ across merge orders, estimates agree
within bound; tested).

Coin flips derive from (seed, compaction counter) via splitmix64, so a
single-threaded run is bit-reproducible.

Cross-check oracles: exact ``percentile`` / DuckDB ``quantile_cont``
within rank tolerance (SURVEY.md §2.3 — Spark's ``percentile_approx``
is a Greenwald–Khanna variant, tolerance-based comparison only).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .base import Sketch, register
from .hashing import splitmix64

_C = 2.0 / 3.0


@register
class KLL(Sketch):
    kind = "kll"

    def __init__(self, k: int = 200, seed: int = 1):
        if not (8 <= k <= 50000):
            raise ValueError("k must be in [8, 50000]")
        self.k = k
        self.seed = seed
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.compactions = 0

    # -- serialization ------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"k": self.k, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        concat = (
            np.concatenate(self.levels)
            if any(len(l) for l in self.levels)
            else np.empty(0, dtype=np.float64)
        )
        sizes = np.array([len(l) for l in self.levels], dtype=np.int64)
        return {"items": concat.astype(np.float64), "level_sizes": sizes}

    def _set_array(self, name: str, arr: np.ndarray) -> None:
        setattr(self, "_tmp_" + name, arr)

    def _extra_state(self) -> dict[str, Any]:
        return {"n": int(self.n), "compactions": int(self.compactions)}

    def _load_extra_state(self, extra: dict[str, Any]) -> None:
        self.n = int(extra.get("n", 0))
        self.compactions = int(extra.get("compactions", 0))
        sizes = getattr(self, "_tmp_level_sizes", None)
        items = getattr(self, "_tmp_items", None)
        if sizes is not None and items is not None:
            self.levels = []
            off = 0
            for s in sizes:
                self.levels.append(items[off : off + int(s)].copy())
                off += int(s)
            if not self.levels:
                self.levels = [np.empty(0, dtype=np.float64)]
            del self._tmp_level_sizes, self._tmp_items

    # -- capacity policy ----------------------------------------------------
    def _cap(self, level: int) -> int:
        depth_from_top = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * (_C**depth_from_top))))

    def _budget(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(l) for l in self.levels)

    def _coin(self) -> int:
        self.compactions += 1
        return splitmix64(self.seed ^ (self.compactions * 0x5851F42D4C957F2D)) & 1

    def _compact_once(self) -> None:
        # lowest over-capacity level; fallback lowest with >= 2 items
        target = None
        for h in range(len(self.levels)):
            if len(self.levels[h]) > self._cap(h):
                target = h
                break
        if target is None:
            for h in range(len(self.levels)):
                if len(self.levels[h]) >= 2:
                    target = h
                    break
        if target is None:
            return
        items = np.sort(self.levels[target])
        phase = self._coin()
        keep = np.empty(0, dtype=np.float64)
        if len(items) % 2 == 1:
            # one unpaired item stays behind so total weight is preserved
            if phase == 0:
                keep, items = items[-1:], items[:-1]
            else:
                keep, items = items[:1], items[1:]
        promoted = items[phase::2]
        self.levels[target] = keep
        if target + 1 >= len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[target + 1] = np.concatenate([self.levels[target + 1], promoted])

    def _compress(self) -> None:
        guard = 0
        while self._size() > self._budget() and guard < 64:
            self._compact_once()
            guard += 1

    # -- updates ------------------------------------------------------------
    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        # ingest in chunks so level-0 never wildly overshoots its cap
        chunk = max(self.k, 64)
        for off in range(0, len(v), chunk):
            part = v[off : off + chunk]
            self.levels[0] = np.concatenate([self.levels[0], part])
            self.n += len(part)
            self._compress()

    def update_hashed(self, keys, counts=None):  # pragma: no cover - guard
        raise TypeError(
            "KLL consumes numeric values, not hashed tokens — use "
            "SketchSpec(mode='numeric') on a numeric column"
        )

    def merge(self, other: "Sketch") -> "KLL":
        if type(other) is not KLL or other._params() != self._params():
            raise ValueError("can only merge identically-configured sketches")
        for h in range(len(other.levels)):
            while h >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h] = np.concatenate([self.levels[h], other.levels[h]])
        self.n += other.n
        self._compress()
        return self

    # -- queries ------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, lvl in enumerate(self.levels):
            if len(lvl):
                items.append(lvl)
                weights.append(np.full(len(lvl), 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Approximate quantile(s): value at weighted rank q*(W-1)."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        it, w = self._weighted_items()
        if len(it) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        total = cum[-1]
        targets = np.clip(qs, 0.0, 1.0) * (total - 1)
        pos = np.searchsorted(cum - 1, targets, side="left")
        pos = np.clip(pos, 0, len(it) - 1)
        out = it[pos]
        return float(out[0]) if scalar else out

    def rank(self, value: float) -> float:
        """Approximate normalized rank of ``value`` (fraction <= value)."""
        it, w = self._weighted_items()
        if len(it) == 0:
            return float("nan")
        mask = it <= value
        return float(w[mask].sum() / w.sum())

    def normalized_rank_error(self) -> float:
        """Published single-sided rank error ~ 1.33/k * sqrt(ln(1/0.01))."""
        return min(0.5, 2.0 / self.k * np.sqrt(np.log(1 / 0.01)))
