"""Optional compiled row-scan kernel for the PNG unfilter recurrence.

The decode direction of PNG filters 3 (Average) and 4 (Paeth) is a
true intra-row recurrence — ``recon[x]`` needs ``recon[x - bpp]`` — so
unlike filters 0-2 it cannot be expressed as a numpy whole-array op
(reference decoders run it as a per-pixel SIMD loop for the same
reason; PNG spec §9 / RFC 2083).  Organic-crawl PNGs are Paeth-heavy
(libpng's adaptive default selects it on photographic rows), which
made the pure-python scan the multimodal path's one real scale risk.

Here the same loop is ~40 lines of C compiled once per machine at
first use (``cc -O2 -shared -fPIC``, cached in the system temp dir
keyed by the source md5) and called through ctypes — no dependency
beyond a system compiler, which clusters building native Spark
extensions already carry.  Concurrent python workers race the first
build safely: each compiles to a pid-suffixed temp file and
``os.replace``s it into the cache path atomically.  When no compiler
exists (or ``SKETCH_SPARK_NO_NATIVE=1`` forces it, as the equivalence
tests do) the caller falls back to the python scan in
``functions.multimodal._png_unfilter`` — property-tested byte-equal
to this kernel across all five filters.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile
import threading

import numpy as np

__all__ = ["png_unfilter"]

_SRC = r"""
#include <stdlib.h>
#include <string.h>

/* Reverse the five PNG scanline filters (spec section 9).
   raw: h * (stride + 1) bytes, each row led by its filter byte.
   out: h * stride reconstructed bytes.
   Returns 0 on success, y + 1 when row y carries an unknown filter.

   The first-bpp-bytes boundary (no left neighbor) is peeled out of
   every loop, and Paeth uses the algebraic simplification
   pa=|b-c|, pb=|a-c|, pc=|a+b-2c| (p=a+b-c cancels), which together
   bring the serial recurrence to ~memory speed. */
long png_unfilter(const unsigned char * restrict raw,
                  unsigned char * restrict out,
                  long h, long stride, long bpp) {
    const unsigned char *prev = 0;
    for (long y = 0; y < h; y++) {
        const unsigned char *line = raw + y * (stride + 1) + 1;
        int f = raw[y * (stride + 1)];
        unsigned char *rec = out + y * stride;
        long x;
        if (f == 0) {
            memcpy(rec, line, (size_t)stride);
        } else if (f == 1) { /* Sub */
            for (x = 0; x < bpp && x < stride; x++) rec[x] = line[x];
            for (; x < stride; x++)
                rec[x] = (unsigned char)(line[x] + rec[x - bpp]);
        } else if (f == 2) { /* Up */
            if (!prev) memcpy(rec, line, (size_t)stride);
            else
                for (x = 0; x < stride; x++)
                    rec[x] = (unsigned char)(line[x] + prev[x]);
        } else if (f == 3) { /* Average */
            for (x = 0; x < bpp && x < stride; x++)
                rec[x] = (unsigned char)(line[x] + ((prev ? prev[x] : 0) >> 1));
            for (; x < stride; x++) {
                int up = prev ? prev[x] : 0;
                rec[x] = (unsigned char)(line[x] + ((rec[x - bpp] + up) >> 1));
            }
        } else if (f == 4) { /* Paeth */
            for (x = 0; x < bpp && x < stride; x++)
                rec[x] = (unsigned char)(line[x] + (prev ? prev[x] : 0));
            if (prev) {
                for (; x < stride; x++) {
                    int a = rec[x - bpp], b = prev[x], c = prev[x - bpp];
                    int pa = abs(b - c), pb = abs(a - c);
                    int pc = abs(a + b - 2 * c);
                    int pr = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                    rec[x] = (unsigned char)(line[x] + pr);
                }
            } else { /* first row: b = c = 0, predictor is always a */
                for (; x < stride; x++)
                    rec[x] = (unsigned char)(line[x] + rec[x - bpp]);
            }
        } else {
            return y + 1;
        }
        prev = rec;
    }
    return 0;
}
"""

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> ctypes.CDLL | None:
    if os.environ.get("SKETCH_SPARK_NO_NATIVE"):
        return None
    key = hashlib.md5(_SRC.encode()).hexdigest()[:16]
    so = os.path.join(tempfile.gettempdir(), f"sketch_spark_native_{key}.so")
    if not os.path.exists(so):
        cc = shutil.which("cc") or shutil.which("gcc")
        if cc is None:
            return None
        src = None
        tmp = f"{so}.{os.getpid()}.tmp"
        try:
            with tempfile.NamedTemporaryFile(
                "w", suffix=".c", delete=False
            ) as f:
                f.write(_SRC)
                src = f.name
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so)
        except (OSError, subprocess.SubprocessError):
            return None
        finally:
            for p in (src, tmp):
                if p is not None and os.path.exists(p):
                    try:
                        os.unlink(p)
                    except OSError:
                        pass
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.png_unfilter.restype = ctypes.c_long
    lib.png_unfilter.argtypes = [ctypes.c_void_p, ctypes.c_void_p] + [
        ctypes.c_long
    ] * 3
    return lib


def _get() -> ctypes.CDLL | None:
    global _lib, _tried
    if not _tried:
        with _lock:
            if not _tried:
                _lib = _build()
                _tried = True
    return _lib


def png_unfilter(
    raw: np.ndarray, h: int, stride: int, bpp: int
) -> np.ndarray | None:
    """Reverse all five PNG scanline filters in one compiled pass.

    ``raw`` is the inflated filtered stream (uint8, >= h*(stride+1)
    bytes).  Returns the reconstructed ``(h, stride)`` uint8 array, or
    ``None`` when the native kernel is unavailable (no compiler /
    kill-switched) so the caller can run its python scan.  Raises
    ``ValueError`` on an unknown filter byte — the same contract as
    the python path."""
    lib = _get()
    if lib is None:
        return None
    if len(raw) < h * (stride + 1):
        # enforce the documented precondition BEFORE the C kernel walks
        # raw + y*(stride+1): a short buffer would be a heap overread
        raise ValueError(
            f"png_unfilter: raw has {len(raw)} bytes, need {h * (stride + 1)}"
        )
    raw = np.ascontiguousarray(raw[: h * (stride + 1)], np.uint8)
    out = np.empty(h * stride, np.uint8)
    rc = lib.png_unfilter(
        ctypes.c_void_p(raw.ctypes.data),
        ctypes.c_void_p(out.ctypes.data),
        h,
        stride,
        bpp,
    )
    if rc:
        f = int(raw[(rc - 1) * (stride + 1)])
        raise ValueError(f"bad PNG filter byte {f} on row {rc - 1}")
    return out.reshape(h, stride)
