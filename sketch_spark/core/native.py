"""Optional compiled kernels for the serial decode recurrences.

Two loops in the pure-python decoders are serial by nature and so
cannot be expressed as numpy whole-array ops:

* the PNG unfilter recurrence for filters 3 (Average) and 4 (Paeth) —
  ``recon[x]`` needs ``recon[x - bpp]`` (PNG spec §9 / RFC 2083), and
  organic-crawl PNGs are Paeth-heavy (libpng's adaptive default
  selects it on photographic rows);
* the JPEG entropy scan — Huffman codes are variable-length, so the
  position of symbol k+1 depends on decoding symbol k (ITU-T T.81
  §F.2.2), which made the per-bit python loop ~85% of JPEG decode
  wall.

Both made the pure-python scans the multimodal path's real scale
risks.

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

__all__ = ["jpeg_prog_ac", "jpeg_prog_dc", "jpeg_scan", "png_unfilter"]

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

/* ------------------------------------------------------------------ */
/* Baseline JPEG entropy scan (ITU-T T.81 F.2.2): Huffman decode +
   EXTEND + DC prediction for every block of every MCU, with 0xFF00
   unstuffing, RSTn handling, and the same 1-bit-synthesis-at-marker
   semantics as the python _BitReader (functions/jpegcodec.py).

   Negative return codes map to the python path's ValueErrors:
     -1 truncated scan   -2 invalid Huffman code   -3 bad DC category
     -4 AC run past end  -5 expected RST marker    -6 scan exhausted
   (synthesized-padding cap, see jpegcodec._BitReader._fill). */

typedef struct {
    const unsigned char *buf;
    long len, pos;
    unsigned int acc;
    int n, synth;
} jbits;

static long jb_fill(jbits *r) {
    unsigned int b;
    if (r->pos >= r->len) return -1;
    b = r->buf[r->pos];
    if (b == 0xFF) {
        if (r->pos + 1 < r->len && r->buf[r->pos + 1] == 0x00) {
            r->pos += 2;
        } else { /* a real marker: synthesize the spec's 1-bit padding */
            r->synth += 8;
            if (r->synth > 48) return -6;
            r->acc = 0xFF;
            r->n = 8;
            return 0;
        }
    } else {
        r->pos += 1;
    }
    r->acc = b;
    r->n = 8;
    return 0;
}

static long jb_bit(jbits *r) {
    if (r->n == 0) {
        long e = jb_fill(r);
        if (e) return e;
    }
    r->n -= 1;
    return (r->acc >> r->n) & 1u;
}

static long jb_bits(jbits *r, long k, long *out) {
    long v = 0, b;
    while (k--) {
        b = jb_bit(r);
        if (b < 0) return b;
        v = (v << 1) | b;
    }
    *out = v;
    return 0;
}

/* canonical decode per T.81 F.16: tables are 17-int rows (index 1..16;
   maxcode[l] == -1 means no codes of length l) */
static long jb_huff(jbits *r, const int *mincode, const int *maxcode,
                    const int *valptr, const unsigned char *vals) {
    long code = 0, l, b;
    for (l = 1; l <= 16; l++) {
        b = jb_bit(r);
        if (b < 0) return b;
        code = (code << 1) | b;
        if (maxcode[l] >= 0 && code <= maxcode[l])
            return vals[valptr[l] + code - mincode[l]];
    }
    return -2;
}

#define JB_EXTEND(v, s) (((v) >= (1L << ((s) - 1))) ? (v) : (v) - (1L << (s)) + 1)

/* consume an RSTn marker at a restart boundary (same fill-byte walk
   as jpegcodec._BitReader.align_to_marker); returns 0 or an error */
static long jb_rst(jbits *r) {
    long mk;
    r->acc = 0;
    r->n = 0;
    while (r->pos + 1 < r->len && r->buf[r->pos] == 0xFF &&
           r->buf[r->pos + 1] == 0xFF)
        r->pos++; /* fill bytes */
    if (r->pos + 1 >= r->len || r->buf[r->pos] != 0xFF) return -5;
    mk = r->buf[r->pos + 1];
    r->pos += 2;
    if (mk < 0xD0 || mk > 0xD7) return -5;
    return 0;
}

/* comp_spec: ncomp rows of (blocks_per_mcu, dc_slot, ac_slot); table
   slot t owns mincode/maxcode/valptr[t*17..] and huffval[t*256..].
   out: n_mcus * sum(blocks_per_mcu) blocks of 64 int64 coefficients in
   ZIGZAG order, DC prediction already resolved. */
long jpeg_scan(const unsigned char *buf, long len, long pos,
               const int * restrict mincode, const int * restrict maxcode,
               const int * restrict valptr,
               const unsigned char * restrict huffval,
               const long * restrict comp_spec, long ncomp,
               long n_mcus, long restart_interval,
               long long * restrict out) {
    jbits r = {buf, len, pos, 0, 0, 0};
    long long preds[4] = {0, 0, 0, 0};
    long long *o = out;
    long m, ci, bi, k;
    if (ncomp < 1 || ncomp > 4) return -7;
    for (m = 0; m < n_mcus; m++) {
        if (restart_interval && m && m % restart_interval == 0) {
            long e = jb_rst(&r);
            if (e) return e;
            for (ci = 0; ci < ncomp; ci++) preds[ci] = 0;
        }
        for (ci = 0; ci < ncomp; ci++) {
            long nb = comp_spec[ci * 3];
            const int *dmin = mincode + comp_spec[ci * 3 + 1] * 17;
            const int *dmax = maxcode + comp_spec[ci * 3 + 1] * 17;
            const int *dvp = valptr + comp_spec[ci * 3 + 1] * 17;
            const unsigned char *dvals = huffval + comp_spec[ci * 3 + 1] * 256;
            const int *amin = mincode + comp_spec[ci * 3 + 2] * 17;
            const int *amax = maxcode + comp_spec[ci * 3 + 2] * 17;
            const int *avp = valptr + comp_spec[ci * 3 + 2] * 17;
            const unsigned char *avals = huffval + comp_spec[ci * 3 + 2] * 256;
            for (bi = 0; bi < nb; bi++) {
                long s, v, e, rs, rr, ss;
                memset(o, 0, 64 * sizeof(long long));
                s = jb_huff(&r, dmin, dmax, dvp, dvals);
                if (s < 0) return s;
                if (s > 11) return -3;
                if (s) {
                    e = jb_bits(&r, s, &v);
                    if (e) return e;
                    preds[ci] += JB_EXTEND(v, s);
                }
                o[0] = preds[ci];
                k = 1;
                while (k < 64) {
                    rs = jb_huff(&r, amin, amax, avp, avals);
                    if (rs < 0) return rs;
                    rr = rs >> 4;
                    ss = rs & 15;
                    if (ss == 0) {
                        if (rr == 15) { k += 16; continue; }
                        break; /* EOB */
                    }
                    k += rr;
                    if (k > 63) return -4;
                    e = jb_bits(&r, ss, &v);
                    if (e) return e;
                    o[k] = JB_EXTEND(v, ss);
                    k += 1;
                }
                o += 64;
            }
        }
    }
    return 0;
}

/* Progressive DC scan (T.81 G.2.1-G.2.2): first pass (ah==0) decodes
   point-transformed DC differences, refinement (ah>0) ORs one raw bit
   per block at position al.  dc is the gathered DC column in decode
   order (unit-major, scan-component, block); comp_spec rows are
   (blocks_per_unit, dc_table_slot). */
long jpeg_prog_dc(const unsigned char *buf, long len, long pos,
                  const int * restrict mincode, const int * restrict maxcode,
                  const int * restrict valptr,
                  const unsigned char * restrict huffval,
                  const long * restrict comp_spec, long ncomp,
                  long n_units, long restart_interval, long ah, long al,
                  long long * restrict dc) {
    jbits r = {buf, len, pos, 0, 0, 0};
    long long preds[4] = {0, 0, 0, 0};
    long long *o = dc;
    long m, ci, bi;
    if (ncomp < 1 || ncomp > 4) return -7;
    for (m = 0; m < n_units; m++) {
        if (restart_interval && m && m % restart_interval == 0) {
            long e = jb_rst(&r);
            if (e) return e;
            for (ci = 0; ci < ncomp; ci++) preds[ci] = 0;
        }
        for (ci = 0; ci < ncomp; ci++) {
            long nb = comp_spec[ci * 2];
            long slot = comp_spec[ci * 2 + 1];
            for (bi = 0; bi < nb; bi++) {
                if (ah == 0) {
                    long s = jb_huff(&r, mincode + slot * 17,
                                     maxcode + slot * 17, valptr + slot * 17,
                                     huffval + slot * 256);
                    if (s < 0) return s;
                    if (s > 11) return -3;
                    if (s) {
                        long v, e = jb_bits(&r, s, &v);
                        if (e) return e;
                        preds[ci] += JB_EXTEND(v, s);
                    }
                    *o = preds[ci] << al;
                } else {
                    long b = jb_bit(&r);
                    if (b < 0) return b;
                    if (b) *o |= (1LL << al);
                }
                o++;
            }
        }
    }
    return 0;
}

/* Progressive AC scan (single component, raster order): spectral
   selection first pass (ah==0) with EOB runs, or successive
   approximation refinement (ah>0) with inline correction bits — the
   walks mirror jpegcodec._ac_first_block/_ac_refine_block exactly.
   coef: n_units rows of 64 zigzag coefficients, updated in place;
   the one Huffman table sits at slot 0. */
long jpeg_prog_ac(const unsigned char *buf, long len, long pos,
                  const int * restrict mincode, const int * restrict maxcode,
                  const int * restrict valptr,
                  const unsigned char * restrict huffval,
                  long n_units, long restart_interval,
                  long ss, long se, long ah, long al,
                  long long * restrict coef) {
    jbits r = {buf, len, pos, 0, 0, 0};
    long long eobrun = 0;
    long long p1 = 1LL << al, m1 = -(1LL << al);
    long m, k;
    for (m = 0; m < n_units; m++) {
        long long *row = coef + m * 64;
        if (restart_interval && m && m % restart_interval == 0) {
            long e = jb_rst(&r);
            if (e) return e;
            eobrun = 0;
        }
        if (ah == 0) {
            if (eobrun > 0) {
                eobrun--;
                continue;
            }
            k = ss;
            while (k <= se) {
                long rs = jb_huff(&r, mincode, maxcode, valptr, huffval);
                long run, s, v, e;
                if (rs < 0) return rs;
                run = rs >> 4;
                s = rs & 15;
                if (s == 0) {
                    if (run < 15) {
                        eobrun = (1LL << run) - 1;
                        if (run) {
                            e = jb_bits(&r, run, &v);
                            if (e) return e;
                            eobrun += v;
                        }
                        break;
                    }
                    k += 16; /* ZRL */
                    continue;
                }
                k += run;
                if (k > se) return -4;
                e = jb_bits(&r, s, &v);
                if (e) return e;
                row[k] = (long long)JB_EXTEND(v, s) << al;
                k++;
            }
        } else {
            k = ss;
            if (eobrun == 0) {
                while (k <= se) {
                    long rs = jb_huff(&r, mincode, maxcode, valptr, huffval);
                    long run, s, v, e, b;
                    long long val = 0;
                    if (rs < 0) return rs;
                    run = rs >> 4;
                    s = rs & 15;
                    if (s == 0) {
                        if (run < 15) {
                            eobrun = 1LL << run;
                            if (run) {
                                e = jb_bits(&r, run, &v);
                                if (e) return e;
                                eobrun += v;
                            }
                            break; /* rest of block via the EOB tail */
                        }
                        /* run == 15: ZRL, skip 16 zero-history coefs */
                    } else {
                        if (s != 1) return -8;
                        b = jb_bit(&r);
                        if (b < 0) return b;
                        val = b ? p1 : m1;
                    }
                    while (k <= se) {
                        if (row[k]) {
                            b = jb_bit(&r);
                            if (b < 0) return b;
                            if (b && !(row[k] & p1))
                                row[k] += (row[k] >= 0) ? p1 : m1;
                        } else {
                            if (run == 0) break;
                            run--;
                        }
                        k++;
                    }
                    if (val && k <= se) row[k] = val;
                    k++;
                }
            }
            if (eobrun > 0) {
                for (; k <= se; k++) {
                    if (row[k]) {
                        long b = jb_bit(&r);
                        if (b < 0) return b;
                        if (b && !(row[k] & p1))
                            row[k] += (row[k] >= 0) ? p1 : m1;
                    }
                }
                eobrun--;
            }
        }
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
    lib.jpeg_scan.restype = ctypes.c_long
    lib.jpeg_scan.argtypes = (
        [ctypes.c_void_p, ctypes.c_long, ctypes.c_long]
        + [ctypes.c_void_p] * 5
        + [ctypes.c_long] * 3
        + [ctypes.c_void_p]
    )
    lib.jpeg_prog_dc.restype = ctypes.c_long
    lib.jpeg_prog_dc.argtypes = (
        [ctypes.c_void_p, ctypes.c_long, ctypes.c_long]
        + [ctypes.c_void_p] * 5
        + [ctypes.c_long] * 5
        + [ctypes.c_void_p]
    )
    lib.jpeg_prog_ac.restype = ctypes.c_long
    lib.jpeg_prog_ac.argtypes = (
        [ctypes.c_void_p, ctypes.c_long, ctypes.c_long]
        + [ctypes.c_void_p] * 4
        + [ctypes.c_long] * 6
        + [ctypes.c_void_p]
    )
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


_JPEG_SCAN_ERRORS = {
    -1: "truncated JPEG scan data",
    -2: "invalid JPEG Huffman code",
    -3: "bad DC category",
    -4: "JPEG AC run past block end",
    -5: "expected RST marker in JPEG scan",
    -6: "JPEG scan data exhausted before all MCUs",
    -7: "unsupported JPEG component count",
    -8: "bad JPEG AC refinement magnitude",
}


def _jpeg_check(rc: int) -> None:
    if rc:
        raise ValueError(_JPEG_SCAN_ERRORS.get(int(rc), f"JPEG scan error {rc}"))


def jpeg_scan(
    buf: bytes,
    pos: int,
    mincode: np.ndarray,
    maxcode: np.ndarray,
    valptr: np.ndarray,
    huffval: np.ndarray,
    comp_spec: np.ndarray,
    n_mcus: int,
    restart_interval: int,
) -> np.ndarray | None:
    """Entropy-decode a whole baseline JPEG scan in one compiled pass.

    ``mincode``/``maxcode``/``valptr`` are int32 ``(n_tables, 17)``
    canonical-code rows and ``huffval`` the matching uint8
    ``(n_tables, 256)`` symbol rows (built by
    ``jpegcodec._huff_flat``); ``comp_spec`` is int64 ``(ncomp, 3)``
    rows of (blocks_per_mcu, dc_table_slot, ac_table_slot).  Returns
    the ``(n_mcus * sum(blocks_per_mcu), 64)`` int64 coefficient
    blocks in zigzag order with DC prediction applied, or ``None``
    when the native kernel is unavailable so the caller runs the
    python bit loop.  Raises ``ValueError`` on malformed scans — the
    same contract as the python path."""
    lib = _get()
    if lib is None:
        return None
    mincode = np.ascontiguousarray(mincode, np.int32)
    maxcode = np.ascontiguousarray(maxcode, np.int32)
    valptr = np.ascontiguousarray(valptr, np.int32)
    huffval = np.ascontiguousarray(huffval, np.uint8)
    comp_spec = np.ascontiguousarray(comp_spec, np.int64)
    n_tables = mincode.shape[0]
    if not (
        mincode.shape == maxcode.shape == valptr.shape == (n_tables, 17)
        and huffval.shape == (n_tables, 256)
        and comp_spec.ndim == 2
        and comp_spec.shape[1] == 3
    ):
        raise ValueError("jpeg_scan: malformed table arrays")
    if comp_spec[:, 1:].min() < 0 or comp_spec[:, 1:].max() >= n_tables:
        raise ValueError("jpeg_scan: table slot out of range")
    total_blocks = int(n_mcus) * int(comp_spec[:, 0].sum())
    out = np.empty((total_blocks, 64), np.int64)
    raw = np.frombuffer(buf, np.uint8)
    rc = lib.jpeg_scan(
        ctypes.c_void_p(raw.ctypes.data),
        len(raw),
        int(pos),
        ctypes.c_void_p(mincode.ctypes.data),
        ctypes.c_void_p(maxcode.ctypes.data),
        ctypes.c_void_p(valptr.ctypes.data),
        ctypes.c_void_p(huffval.ctypes.data),
        ctypes.c_void_p(comp_spec.ctypes.data),
        comp_spec.shape[0],
        int(n_mcus),
        int(restart_interval),
        ctypes.c_void_p(out.ctypes.data),
    )
    _jpeg_check(rc)
    return out


def jpeg_prog_dc(
    buf: bytes,
    pos: int,
    mincode: np.ndarray,
    maxcode: np.ndarray,
    valptr: np.ndarray,
    huffval: np.ndarray,
    comp_spec: np.ndarray,
    n_units: int,
    restart_interval: int,
    ah: int,
    al: int,
    dc: np.ndarray,
) -> np.ndarray | None:
    """Progressive DC scan over the gathered DC column ``dc`` (int64,
    decode order), updated in place; ``comp_spec`` is int64
    ``(ncomp, 2)`` rows of (blocks_per_unit, dc_table_slot).  Returns
    ``dc`` or ``None`` when the kernel is unavailable."""
    lib = _get()
    if lib is None:
        return None
    mincode = np.ascontiguousarray(mincode, np.int32)
    maxcode = np.ascontiguousarray(maxcode, np.int32)
    valptr = np.ascontiguousarray(valptr, np.int32)
    huffval = np.ascontiguousarray(huffval, np.uint8)
    comp_spec = np.ascontiguousarray(comp_spec, np.int64)
    n_tables = mincode.shape[0]
    if not (
        mincode.shape == maxcode.shape == valptr.shape == (n_tables, 17)
        and huffval.shape == (n_tables, 256)
        and comp_spec.ndim == 2
        and comp_spec.shape[1] == 2
    ):
        raise ValueError("jpeg_prog_dc: malformed table arrays")
    if comp_spec[:, 1].min() < 0 or comp_spec[:, 1].max() >= n_tables:
        raise ValueError("jpeg_prog_dc: table slot out of range")
    if not (dc.dtype == np.int64 and dc.flags.c_contiguous):
        raise ValueError("jpeg_prog_dc: dc must be contiguous int64")
    if len(dc) != int(n_units) * int(comp_spec[:, 0].sum()):
        raise ValueError("jpeg_prog_dc: dc length mismatch")
    raw = np.frombuffer(buf, np.uint8)
    rc = lib.jpeg_prog_dc(
        ctypes.c_void_p(raw.ctypes.data),
        len(raw),
        int(pos),
        ctypes.c_void_p(mincode.ctypes.data),
        ctypes.c_void_p(maxcode.ctypes.data),
        ctypes.c_void_p(valptr.ctypes.data),
        ctypes.c_void_p(huffval.ctypes.data),
        ctypes.c_void_p(comp_spec.ctypes.data),
        comp_spec.shape[0],
        int(n_units),
        int(restart_interval),
        int(ah),
        int(al),
        ctypes.c_void_p(dc.ctypes.data),
    )
    _jpeg_check(rc)
    return dc


def jpeg_prog_ac(
    buf: bytes,
    pos: int,
    mincode: np.ndarray,
    maxcode: np.ndarray,
    valptr: np.ndarray,
    huffval: np.ndarray,
    n_units: int,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
    coef: np.ndarray,
) -> np.ndarray | None:
    """Progressive AC scan (single component) over ``coef`` —
    contiguous int64 ``(n_units, 64)`` zigzag rows updated in place
    (spectral-selection first pass or refinement per ``ah``).  The one
    Huffman table sits at flat-table slot 0.  Returns ``coef`` or
    ``None`` when the kernel is unavailable."""
    lib = _get()
    if lib is None:
        return None
    mincode = np.ascontiguousarray(mincode, np.int32)
    maxcode = np.ascontiguousarray(maxcode, np.int32)
    valptr = np.ascontiguousarray(valptr, np.int32)
    huffval = np.ascontiguousarray(huffval, np.uint8)
    if not (
        mincode.shape == maxcode.shape == valptr.shape == (1, 17)
        and huffval.shape == (1, 256)
    ):
        raise ValueError("jpeg_prog_ac: malformed table arrays")
    if not (
        coef.dtype == np.int64
        and coef.flags.c_contiguous
        and coef.shape == (int(n_units), 64)
    ):
        raise ValueError("jpeg_prog_ac: coef must be contiguous (n_units, 64) int64")
    if not 0 <= ss <= se <= 63:
        raise ValueError("jpeg_prog_ac: bad spectral band")
    raw = np.frombuffer(buf, np.uint8)
    rc = lib.jpeg_prog_ac(
        ctypes.c_void_p(raw.ctypes.data),
        len(raw),
        int(pos),
        ctypes.c_void_p(mincode.ctypes.data),
        ctypes.c_void_p(maxcode.ctypes.data),
        ctypes.c_void_p(valptr.ctypes.data),
        ctypes.c_void_p(huffval.ctypes.data),
        int(n_units),
        int(restart_interval),
        int(ss),
        int(se),
        int(ah),
        int(al),
        ctypes.c_void_p(coef.ctypes.data),
    )
    _jpeg_check(rc)
    return coef
