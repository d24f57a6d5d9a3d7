"""Golden-parity harness against the C++ reference (SURVEY.md §5.2 L2).

The reference binary is fully deterministic: it never seeds ``rand()``
(glibc seed 1 — /root/reference/src/sketch.cpp:79-84), so its H3 seeds,
CMCU counters, and heavy-hitter output are byte-reproducible.  This
module replicates, in Python/numpy:

* glibc ``rand()`` via ctypes (verified to yield 1804289383, ... );
* seed table layout ``seeds[16*i + 4*symbol + j]`` masked to 14 bits
  (sketch.cpp:80-84, 136-138);
* the exact test/control pipeline semantics (sketch.cpp:98-245):
  sliding multi-length scan, rolling H3 XOR, per-item conservative
  update, threshold upsert of ``min_hits+1``, growth scaling with C
  int truncation, per-occurrence control decrement, positivity prune;
* 2-bit LSB-first key packing + ``reverse=true`` decode
  (PackedArray.hpp:26-38, fasta.cpp:140-160).

Used only by tests (tests/test_reference_parity.py) to pin our
CountMinCU semantics to the reference — the production path hashes
tokens, not k-mers, but shares the conservative-update rule, which the
bridge test proves identical counter-for-counter.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

from .countmin import CountMinCU

N_HASH = 4
HASH_BITS = 14
GROWTH = 2.0

_SYM = {65: 0, 67: 1, 84: 2, 71: 3}  # A C T G


def glibc_rand_sequence(n: int) -> np.ndarray:
    """First ``n`` outputs of glibc rand() from the default seed (1)."""
    libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
    libc.srand(1)
    return np.array([libc.rand() for _ in range(n)], dtype=np.int64)


def reference_seeds(max_length: int) -> np.ndarray:
    """(max_length, 4 symbols, N_HASH) uint16 seed table, layout per
    sketch.cpp:80-84: seeds[4*N_HASH*i + N_HASH*symbol + j]."""
    n = N_HASH * max_length * 4
    raw = glibc_rand_sequence(n) & ((1 << HASH_BITS) - 1)
    return raw.reshape(max_length, 4, N_HASH).astype(np.uint16)


def encode_key(symbols: list[int]) -> int:
    """PackedArray<2,32> LSB-first packing (PackedArray.hpp:26-29)."""
    key = 0
    for i, s in enumerate(symbols):
        key |= s << (2 * i)
    return key


def decode_key(key: int, length: int) -> str:
    """sequenceToString(key, length, reverse=True) (fasta.cpp:140-160)."""
    return "".join("ACTG"[(key >> (2 * i)) & 3] for i in range(length))


class ReferenceCMCU(CountMinCU):
    """Our CountMinCU with the hash family swapped for the reference's
    H3 table — the bridge that proves the conservative-update rule in
    ``sketch_spark.core.countmin`` is the reference's rule.

    Keys are (offset-encoded) symbol tuples; ``_indices`` computes the
    rolling XOR H3 hash exactly as sketch.cpp:136-138.
    """

    kind = "cmcu"  # same serialization kind; parity use only

    def __init__(self, seeds: np.ndarray, length: int):
        super().__init__(depth=N_HASH, log2_width=HASH_BITS, seed=1)
        self._h3_seeds = seeds  # (max_length, 4, N_HASH)
        self._length = length

    def h3(self, symbols: list[int]) -> np.ndarray:
        h = np.zeros(N_HASH, dtype=np.uint16)
        for i, s in enumerate(symbols):
            h ^= self._h3_seeds[i, s]
        return h

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        # keys here are precomputed H3 hash columns: shape (d, n)
        return keys

    def update_symbols(self, symbols: list[int]) -> int:
        """Per-item conservative update; returns min_hits (pre-update)."""
        h = self.h3(symbols).astype(np.int64)[:, None]  # (d, 1)
        cur = self.table[np.arange(self.depth)[:, None], h]
        est = int(cur.min())
        self.update_hashed_indices(h, est + 1)
        self.total += 1
        return est

    def update_hashed_indices(self, idx: np.ndarray, new_val: int) -> None:
        for j in range(self.depth):
            np.maximum.at(self.table[j], idx[j], new_val)

    def estimate_symbols(self, symbols: list[int]) -> int:
        h = self.h3(symbols).astype(np.int64)[:, None]
        return int(self.table[np.arange(self.depth)[:, None], h].min())


def run_reference_pipeline(
    test_bytes: bytes,
    control_bytes: bytes,
    min_length: int,
    max_length: int,
    thresholds: list[int],
) -> dict[int, dict[str, int]]:
    """Faithful reimplementation of sketch.cpp main(); returns
    {length: {kmer_string: reported_frequency}} identical to the
    binary's stdout."""
    seeds = reference_seeds(max_length)
    n_length = max_length - min_length + 1
    sketches = [ReferenceCMCU(seeds, min_length + n) for n in range(n_length)]
    heavy: list[dict[int, int]] = [dict() for _ in range(n_length)]

    def scan(data: bytes, on_kmer) -> None:
        kmer_start = 0
        size = len(data)
        while kmer_start < size:
            sequence_end = False
            symbols: list[int] = []
            i = 0
            while i < max_length:
                b = data[kmer_start + i] if kmer_start + i < size else 0
                sym = _SYM.get(b)
                if sym is None:
                    sequence_end = True
                    break
                symbols.append(sym)
                if i >= min_length - 1:
                    on_kmer(i - min_length + 1, symbols)
                i += 1
            if sequence_end and i < min_length:
                kmer_start += i + 1
                continue
            kmer_start += 1

    # test phase: CU + threshold upsert (sketch.cpp:144-162)
    def test_kmer(n: int, symbols: list[int]) -> None:
        min_hits = sketches[n].update_symbols(symbols)
        if min_hits + 1 >= thresholds[n]:
            heavy[n][encode_key(symbols)] = min_hits + 1

    scan(test_bytes, test_kmer)

    # snapshot + growth scaling (sketch.cpp:175-183; C float-division
    # into int truncates toward zero)
    frequencies = [dict(h) for h in heavy]
    for h in heavy:
        for k in h:
            h[k] = int(h[k] / GROWTH)

    # control phase: exact per-occurrence decrement (sketch.cpp:186-235)
    def control_kmer(n: int, symbols: list[int]) -> None:
        key = encode_key(symbols)
        if key in heavy[n]:
            heavy[n][key] -= 1

    scan(control_bytes, control_kmer)

    # prune + report snapshot frequencies (sketch.cpp:238-284)
    out: dict[int, dict[str, int]] = {}
    for n in range(n_length):
        length = min_length + n
        out[length] = {
            decode_key(k, length): frequencies[n][k]
            for k, v in heavy[n].items()
            if v > 0
        }
    return out
