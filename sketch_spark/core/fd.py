"""Frequent Directions matrix sketch (Liberty 2013; Ghashami, Liberty,
Phillips, Woodruff 2016).

The linear-algebra member of the mergeable family: B is an ``ell x d``
row-space summary of a tall matrix A such that

    0  <=  x^T (A^T A - B^T B) x  <=  ||A||_F^2 / ell      for unit x

i.e. B^T B underestimates the covariance A^T A by at most
``||A||_F^2 / ell`` in spectral norm (Liberty 2013, Thm 1.1; the
mergeable/any-merge-order form is GLPW 2016, Thm 3.1 — the property
that makes it a valid Spark partial-aggregation state).  The sketch is
the deterministic streaming analog of a truncated SVD: dominant
singular directions of A survive in B, noise directions are shrunk to
zero.

Mechanics: maintain a ``2*ell x d`` buffer; append incoming rows; when
full, SVD the buffer, shrink squared singular values by the ell-th one
(``sigma'^2 = max(sigma^2 - sigma_ell^2, 0)``) and keep the top
``ell-1`` shrunken rows (``sqrt(sigma'^2) * V^T``).  ``merge``
concatenates the two buffers and compacts — associative and
commutative WITHIN THE BOUND (states differ across merge orders,
covariance estimates agree within ``||A||_F^2 / ell``; same contract
as KLL).

Pipeline use: corpus-level embedding covariance / principal components
without ever shuffling vectors — each executor folds its partition
into an ``ell x d`` state, states tree-merge, and PCA/whitening/
subspace-drift monitoring read the merged ``B^T B``.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .base import Sketch, register


@register
class FrequentDirections(Sketch):
    kind = "fd"

    def __init__(self, d: int, ell: int = 16):
        if d < 1:
            raise ValueError("d must be >= 1")
        if not (2 <= ell <= 4096):
            raise ValueError("ell must be in [2, 4096]")
        self.d = int(d)
        self.ell = int(ell)
        self.rows = np.zeros((2 * self.ell, self.d), dtype=np.float64)
        self.n_buf = 0  # occupied rows of the buffer
        self.n = 0  # total input rows consumed
        self.sq_frob = 0.0  # exact ||A||_F^2 of everything consumed
        self.shrunk = 0.0  # cumulative shrinkage mass (for diagnostics)

    # -- serialization ------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"d": self.d, "ell": self.ell}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"buf": self.rows[: self.n_buf].astype(np.float64)}

    def _set_array(self, name: str, arr: np.ndarray) -> None:
        if name == "buf":
            arr = arr.reshape(-1, self.d)
            self.rows[: len(arr)] = arr
            self.n_buf = len(arr)

    def _extra_state(self) -> dict[str, Any]:
        return {"n": self.n, "sq_frob": self.sq_frob, "shrunk": self.shrunk}

    def _load_extra_state(self, extra: dict[str, Any]) -> None:
        self.n = int(extra["n"])
        self.sq_frob = float(extra["sq_frob"])
        self.shrunk = float(extra["shrunk"])

    # -- updates ------------------------------------------------------------
    def _compact(self) -> None:
        """SVD-shrink the full buffer down to ell-1 occupied rows."""
        if self.n_buf < 2 * self.ell:
            return
        # economy SVD of the 2ell x d buffer; 2ell << d is fine too
        _, s, vt = np.linalg.svd(self.rows[: self.n_buf], full_matrices=False)
        # shrink by the ell-th singular value ONLY when one exists: with
        # rank < ell (e.g. d < ell) delta must be 0 or the compaction
        # over-shrinks and the ||A||_F^2/ell sandwich breaks (and at
        # rank <= ell-1 zero shrinkage keeps the summary EXACT)
        delta = s[self.ell - 1] ** 2 if len(s) >= self.ell else 0.0
        s2 = np.maximum(s**2 - delta, 0.0)
        nz = int(np.count_nonzero(s2))  # <= ell-1 by construction
        keep = np.sqrt(s2[:nz])[:, None] * vt[:nz]
        self.rows[:] = 0.0
        self.rows[: len(keep)] = keep
        self.n_buf = len(keep)
        self.shrunk += float(delta) * (len(s) - nz)

    def update_values(self, mat: np.ndarray) -> None:
        """Consume a batch of rows (2-D float array, shape (m, d))."""
        mat = np.asarray(mat, dtype=np.float64)
        if mat.ndim == 1:
            mat = mat[None, :]
        if mat.shape[1] != self.d:
            raise ValueError(f"expected d={self.d} columns, got {mat.shape[1]}")
        self.n += len(mat)
        self.sq_frob += float(np.einsum("ij,ij->", mat, mat))
        i = 0
        while i < len(mat):
            room = 2 * self.ell - self.n_buf
            take = min(room, len(mat) - i)
            self.rows[self.n_buf : self.n_buf + take] = mat[i : i + take]
            self.n_buf += take
            i += take
            if self.n_buf >= 2 * self.ell:
                self._compact()

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if not isinstance(other, FrequentDirections):
            raise TypeError("can only merge FrequentDirections")
        if (self.d, self.ell) != (other.d, other.ell):
            raise ValueError("FD geometry mismatch")
        n, sq, sh = self.n + other.n, self.sq_frob + other.sq_frob, self.shrunk + other.shrunk
        ob = other.rows[: other.n_buf]
        i = 0
        while i < len(ob):
            room = 2 * self.ell - self.n_buf
            take = min(room, len(ob) - i)
            self.rows[self.n_buf : self.n_buf + take] = ob[i : i + take]
            self.n_buf += take
            i += take
            if self.n_buf >= 2 * self.ell:
                self._compact()
        self.n, self.sq_frob, self.shrunk = n, sq, sh
        return self

    # -- estimates ----------------------------------------------------------
    @property
    def bound(self) -> float:
        """Published spectral-norm error bound ||A||_F^2 / ell."""
        return self.sq_frob / self.ell

    def covariance(self) -> np.ndarray:
        """B^T B — the covariance estimate (d x d, PSD, underestimates
        A^T A by at most ``bound`` in spectral norm)."""
        b = self.rows[: self.n_buf]
        return b.T @ b

    def singular_values(self) -> np.ndarray:
        """Singular values of B (descending) — sqrt eigenvalues of the
        covariance estimate."""
        if self.n_buf == 0:
            return np.zeros(0, dtype=np.float64)
        return np.linalg.svd(self.rows[: self.n_buf], compute_uv=False)

    def top_directions(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """(singular values, right singular vectors) of the top-k
        surviving directions — the streaming PCA readout."""
        if self.n_buf == 0:
            return np.zeros(0), np.zeros((0, self.d))
        _, s, vt = np.linalg.svd(self.rows[: self.n_buf], full_matrices=False)
        k = min(k, len(s))
        return s[:k], vt[:k]
