"""JPEG codec in pure python + numpy — no PIL, no libjpeg.

Closes the last sniff-only image format: ``decode_jpeg`` handles
baseline/extended-sequential Huffman JPEG (SOF0/SOF1, including
sequential multi-scan) AND progressive JPEG (SOF2: spectral
selection, successive approximation, EOB runs per T.81 G.2) —
grayscale and 3-component YCbCr with 4:4:4 / 4:2:2 / 4:2:0
subsampling (replicated upsample), DQT/DHT/DRI/RSTn, byte stuffing —
and ``encode_jpeg`` is its fixture dual (grayscale or 4:4:4 color,
Annex K quantization; ``progressive=True`` emits the full SOF2
successive-approximation script, so every progressive decode path has
an encoder twin to differentially test against).  Arithmetic coding,
12-bit precision, and hierarchical modes raise
``NotImplementedError``: they are rare in crawls and the documented
PIL/libjpeg swap (``PIL.Image.open``) remains the production answer
for them.

Oracle-ability (the md5-hex pattern from CLAUDE.md, adapted to a LOSSY
codec): quantization makes general pixels unpredictable in SQL, but a
block that is a SOLID value ``v`` has exactly one nonzero coefficient
— DC — and this codec keeps that path in exact integer arithmetic end
to end.  The encoder computes the DC coefficient from the exact
integer block sum and quantizes with round-half-away integer division;
the decoder's dequantized DC is ``16 * Fq`` (Annex K luma q[0,0] = 16),
whose constant IDCT is the exact integer ``2 * Fq``.  So a fixture of
solid 8x8 tiles decodes to ``clamp(2 * round_half_away((v-128)/2) +
128)`` per tile — plain CASE/div arithmetic any SQL oracle can
reproduce, while the bitstream still exercises real Huffman coding,
byte stuffing, zigzag, and the marker walk.

Hot-path note: the Huffman entropy scan is serial by nature (each
code's position depends on decoding the previous one), so every scan
type runs in a compiled kernel when a system compiler exists
(``core/native.py``: ``jpeg_scan`` for sequential scans,
``jpeg_prog_dc``/``jpeg_prog_ac`` for progressive passes), with the
per-bit python loops as the property-tested byte-equal fallbacks;
everything after the scans — un-zigzag, dequantize, IDCT (batched
matmuls), plane assembly, upsample, color convert — is whole-array
numpy.  A megapixel progressive color JPEG decodes in ~140 ms.  Same hardening contract as every
decoder here: struct errors normalize to ValueError, scan bounds are
checked, fuzzed by tests/test_jpeg.py (truncation + bitflip, zero
escapes).
"""

from __future__ import annotations

import struct

import numpy as np

from sketch_spark.core import native

__all__ = ["decode_jpeg", "encode_jpeg"]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 — the tables every camera/libjpeg default rides on
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_canonical(bits: list[int], vals: list[int]):
    """Canonical JPEG Huffman codes: {(length, code) -> symbol} for
    decode and {symbol -> (code, length)} for encode."""
    dec: dict[tuple[int, int], int] = {}
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            dec[(length, code)] = sym
            enc[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return dec, enc


def _huff_flat(bits: list[int], vals: list[int]):
    """Same canonical codes as T.81 F.16 tables for the native kernel:
    int32 mincode/maxcode/valptr rows indexed by code length 1..16
    (slot 0 unused, maxcode == -1 marks an empty length) plus the
    uint8 symbol row."""
    mincode = np.zeros(17, np.int32)
    maxcode = np.full(17, -1, np.int32)
    valptr = np.zeros(17, np.int32)
    huffval = np.zeros(256, np.uint8)
    huffval[: len(vals)] = vals
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            k += n
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, huffval


# 8x8 DCT-II basis: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_B = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) float samples
    (level-shifted domain).  Two batched matmuls for every block of a
    component (B^T C B) — the broadcast matmul kernel runs ~10x the
    naive einsum contraction, and the solid-tile oracle path stays
    exact because a DC-only block gives every output sum exactly one
    nonzero term (no accumulation-order sensitivity)."""
    return _B.T @ coeffs.astype(np.float64) @ _B


def _dct_blocks(samples: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients
    (B S B^T), the encode dual of ``_idct_blocks``."""
    return _B @ samples.astype(np.float64) @ _B.T


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any real marker (left for the caller to inspect)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.synth = 0  # 1-bits synthesized at a marker boundary

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("truncated JPEG scan data")
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: the spec pads the final byte with 1-bits,
                # so synthesize 1s rather than consuming the marker.  A
                # well-formed stream needs at most one code + extend run
                # of padding; needing more means the scan ran dry (a
                # corrupt DHT could otherwise decode synthesized 1s as
                # valid symbols forever)
                self.synth += 8
                if self.synth > 48:
                    raise ValueError("JPEG scan data exhausted before all MCUs")
                # mask consumed bits so acc stays <= n+8 bits wide —
                # unmasked it grows 8 bits per scan byte and every
                # shift copies the whole bigint (quadratic decode)
                self.acc = ((self.acc & ((1 << self.n) - 1)) << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = ((self.acc & ((1 << self.n) - 1)) << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Drop partial bits, expect and consume an RST/other marker;
        returns the marker's second byte."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.buf) and self.buf[self.pos] == 0xFF and self.buf[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if self.pos + 1 >= len(self.buf) or self.buf[self.pos] != 0xFF:
            raise ValueError("expected JPEG marker in scan")
        m = self.buf[self.pos + 1]
        self.pos += 2
        return m


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: s-bit magnitude to signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(buf: bytes, max_pixels: int = 1 << 26) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, n_components,
    rgb_bytes)`` — grayscale expands to RGB like every decoder in
    ``multimodal.py``.  ``max_pixels`` (default 64M) bounds the raster
    a corrupt/hostile header can claim before any allocation.  Raises
    ValueError on malformed input, NotImplementedError on
    valid-but-unsupported modes (progressive, arithmetic, 12-bit) —
    both skip-routable."""
    buf = bytes(buf)
    try:
        return _decode_jpeg_inner(buf, max_pixels)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG: {e}") from None


def _decode_jpeg_inner(buf: bytes, max_pixels: int) -> tuple[int, int, int, bytes]:
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (w, h, [(cid, hf, vf, tq)])
    progressive = False
    restart_interval = 0
    # per-component zigzag coefficient grids (bh, bw, 64), filled by
    # one scan (baseline) or accumulated across scans (progressive /
    # sequential multi-scan); eobrun state is scan-local
    coefs: list[np.ndarray] | None = None
    n_scans = 0
    while True:
        if pos + 2 > len(buf):
            if coefs is not None:
                # EOF after >= 1 completed scan: implicit EOI (crawl
                # files are routinely cut after the scan tail)
                return _finish_jpeg(frame, quant, coefs)
            raise ValueError("truncated JPEG before SOS")
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:  # EOI
            if coefs is None:
                raise ValueError("JPEG EOI before SOS")
            return _finish_jpeg(frame, quant, coefs)
        if marker in (0xC0, 0xC1, 0xC2, 0xC4, 0xDB, 0xDD, 0xDA, 0xFE) or 0xE0 <= marker <= 0xEF:
            (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
            if seglen < 2 or pos + seglen > len(buf):
                raise ValueError("truncated JPEG segment")
            seg = buf[pos + 2 : pos + seglen]
            pos += seglen
        elif marker == 0xC3 or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/hierarchical/lossless): "
                "swap in PIL (SOF0/SOF1/SOF2 supported)"
            )
        else:
            raise ValueError(f"unexpected JPEG marker 0xFF{marker:02X}")

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    if i + 64 > len(seg):
                        raise ValueError("truncated DQT")
                    quant[tq] = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
                elif pq == 1:
                    if i + 128 > len(seg):
                        raise ValueError("truncated DQT")
                    quant[tq] = np.frombuffer(seg[i : i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (baseline), SOF2 (progressive)
            if frame is not None:
                raise ValueError("multiple JPEG SOF markers")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG: swap in PIL")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG (CMYK?): swap in PIL")
            if w == 0 or h == 0:
                raise ValueError("zero JPEG dimension")
            if w * h > max_pixels:
                raise ValueError(f"JPEG claims {w}x{h} > max_pixels cap")
            comps = []
            for k in range(nc):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                hf, vf = hv >> 4, hv & 15
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise NotImplementedError(f"sampling {hf}x{vf}: swap in PIL")
                comps.append((cid, hf, vf, tq))
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated DHT")
                # keep the raw spec: the scan decoder builds whichever
                # form it needs (flat arrays for the native kernel,
                # the dict for the python bit loop)
                (huff_dc if tc == 0 else huff_ac)[th] = (counts, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            n_scans += 1
            if n_scans > 64:
                # progressive scripts top out around a dozen scans;
                # hundreds means a hostile file milking O(blocks) work
                # per scan
                raise ValueError("too many JPEG scans")
            ns = seg[0]
            if not 1 <= ns <= len(frame[2]) or len(seg) < 4 + 2 * ns:
                raise ValueError("bad JPEG scan header")
            scan_tables = {}
            scan_cids = []
            for k in range(ns):
                cs, tt = seg[1 + 2 * k : 3 + 2 * k]
                if cs in scan_tables:
                    raise ValueError("duplicate component in JPEG scan")
                scan_tables[cs] = (tt >> 4, tt & 15)
                scan_cids.append(cs)
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if coefs is None:
                coefs = _alloc_coef_grids(frame)
            pos = _decode_scan_pass(
                buf, pos, frame, huff_dc, huff_ac, scan_tables,
                scan_cids, restart_interval, coefs, progressive,
                ss, se, ah, al,
            )


def _entropy_decode_py(buf, pos, comps, scan_tables, huff_dc, huff_ac,
                       n_mcus, restart_interval, total_blocks):
    """Pure-python fallback for ``native.jpeg_scan``: the same
    ``(total_blocks, 64)`` int64 zigzag-order coefficient blocks with
    DC prediction applied — property-tested byte-equal to the kernel
    (tests/test_jpeg.py)."""
    tables = {}
    for cid, hf, vf, tq in comps:
        td, ta = scan_tables[cid]
        if ("dc", td) not in tables:
            tables[("dc", td)] = _huff_canonical(*huff_dc[td])[0]
        if ("ac", ta) not in tables:
            tables[("ac", ta)] = _huff_canonical(*huff_ac[ta])[0]
    out = np.zeros((total_blocks, 64), np.int64)
    r = _BitReader(buf, pos)
    preds = [0] * len(comps)
    bi = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            mk = r.align_to_marker()
            if not 0xD0 <= mk <= 0xD7:
                raise ValueError(f"expected RST marker, got 0xFF{mk:02X}")
            preds = [0] * len(comps)
        for ci, (cid, hf, vf, tq) in enumerate(comps):
            td, ta = scan_tables[cid]
            dct, act = tables[("dc", td)], tables[("ac", ta)]
            for _ in range(hf * vf):
                row = out[bi]
                bi += 1
                s = _decode_huff(r, dct)
                if s > 11:
                    raise ValueError("bad DC category")
                diff = _extend(r.bits(s), s) if s else 0
                preds[ci] += diff
                row[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _decode_huff(r, act)
                    rr, ss = rs >> 4, rs & 15
                    if ss == 0:
                        if rr == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += rr
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    row[k] = _extend(r.bits(ss), ss)
                    k += 1
    return out


def _entropy_decode_native(buf, pos, comps, scan_tables, huff_dc, huff_ac,
                           n_mcus, restart_interval):
    """Route the scan through ``native.jpeg_scan`` when available.
    Returns ``None`` (caller falls back to the python bit loop) when
    the kernel is missing or a hostile DHT overflows the fixed-width
    symbol rows the kernel indexes."""
    slots: dict[tuple[str, int], int] = {}
    flats = []
    for cid, hf, vf, tq in comps:
        td, ta = scan_tables[cid]
        for key, spec in ((("dc", td), huff_dc[td]), (("ac", ta), huff_ac[ta])):
            if key not in slots:
                if len(spec[1]) > 256:
                    return None  # hostile DHT: keep python semantics
                slots[key] = len(flats)
                flats.append(_huff_flat(*spec))
    comp_spec = np.array(
        [
            [hf * vf, slots[("dc", scan_tables[cid][0])],
             slots[("ac", scan_tables[cid][1])]]
            for cid, hf, vf, tq in comps
        ],
        np.int64,
    )
    return native.jpeg_scan(
        buf,
        pos,
        np.stack([f[0] for f in flats]),
        np.stack([f[1] for f in flats]),
        np.stack([f[2] for f in flats]),
        np.stack([f[3] for f in flats]),
        comp_spec,
        n_mcus,
        restart_interval,
    )


def _frame_geometry(frame):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _comp_blocks(w, h, hf, vf, hmax, vmax):
    """Block grid of one component for a NON-interleaved scan (T.81
    A.2.2): ceil over the component's own downsampled dims, not over
    MCU multiples."""
    cw = -(-(w * hf) // hmax)
    ch = -(-(h * vf) // vmax)
    return -(-cw // 8), -(-ch // 8)


def _alloc_coef_grids(frame):
    """Per-component zigzag coefficient grids, padded to MCU multiples
    (interleaved scans write the padding blocks; non-interleaved scans
    touch only the real top-left sub-grid)."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    return [
        np.zeros((mcuy * vf, mcux * hf, 64), np.int64)
        for cid, hf, vf, tq in comps
    ]


def _skip_entropy(buf, pos):
    """Advance past a scan's entropy-coded bytes to the next real
    marker (stepping over 0xFF00 stuffing, 0xFF fill bytes, and RSTn).
    Returns ``len(buf)`` when the buffer ends first — the caller
    treats EOF after a completed scan as an implicit EOI, because
    crawl JPEGs are routinely cut right after the scan tail and every
    coefficient has already been decoded."""
    while True:
        i = buf.find(b"\xff", pos)
        if i < 0 or i + 1 >= len(buf):
            return len(buf)
        m = buf[i + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            pos = i + 2
        elif m == 0xFF:
            pos = i + 1  # fill byte
        else:
            return i


def _decode_scan_pass(buf, pos, frame, huff_dc, huff_ac, scan_tables,
                      scan_cids, restart_interval, coefs, progressive,
                      ss, se, ah, al):
    """Decode ONE scan's entropy data into the coefficient grids and
    return the buffer position of the next marker.  Baseline scans
    (and sequential multi-scan) ride the native kernel; progressive
    scans (T.81 G.2) run the python reference loops."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    by_cid = {c[0]: ci for ci, c in enumerate(comps)}
    scan = []  # (ci, cid, hf, vf, tq) in scan order
    needs_dc = (not progressive) or (ss == 0 and ah == 0)
    needs_ac = (not progressive) or ss > 0
    for cs in scan_cids:
        if cs not in by_cid:
            raise ValueError(f"scan names unknown component {cs}")
        ci = by_cid[cs]
        td, ta = scan_tables[cs]
        if needs_dc and td not in huff_dc:
            raise ValueError("missing DHT table")
        if needs_ac and ta not in huff_ac:
            raise ValueError("missing DHT table")
        scan.append((ci,) + comps[ci])
    if not progressive:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("bad baseline scan spectral selection")
        return _baseline_scan_pass(
            buf, pos, frame, huff_dc, huff_ac, scan, scan_tables,
            restart_interval, coefs,
        )
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        return _prog_dc_scan(
            buf, pos, frame, huff_dc, scan, scan_tables, restart_interval,
            coefs, ah, al,
        )
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not ss <= se <= 63:
        raise ValueError("bad progressive spectral band")
    return _prog_ac_scan(
        buf, pos, frame, huff_ac, scan[0], scan_tables, restart_interval,
        coefs, ss, se, ah, al,
    )


def _baseline_scan_pass(buf, pos, frame, huff_dc, huff_ac, scan, scan_tables,
                        restart_interval, coefs):
    """Full-spectrum sequential scan: interleaved when it carries >1
    component, else raster order over the component's own block grid.
    Both shapes reduce to the same (n_units x blocks_per_unit) decode
    the native kernel / python loop already implement."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    interleaved = len(scan) > 1
    if interleaved:
        n_units = mcux * mcuy
        ecomps = [(cid, hf, vf, tq) for _, cid, hf, vf, tq in scan]
    else:
        ci, cid, hf, vf, tq = scan[0]
        cbx, cby = _comp_blocks(w, h, hf, vf, hmax, vmax)
        n_units = cbx * cby
        ecomps = [(cid, 1, 1, tq)]
    total_blocks = n_units * sum(c[1] * c[2] for c in ecomps)
    zz = _entropy_decode_native(
        buf, pos, ecomps, scan_tables, huff_dc, huff_ac, n_units,
        restart_interval,
    )
    if zz is None:
        zz = _entropy_decode_py(
            buf, pos, ecomps, scan_tables, huff_dc, huff_ac, n_units,
            restart_interval, total_blocks,
        )
    if interleaved:
        zz3 = zz.reshape(n_units, -1, 64)
        off = 0
        for ci, cid, hf, vf, tq in scan:
            cnt = hf * vf
            coefs[ci][:, :, :] = (
                zz3[:, off : off + cnt, :]
                .reshape(mcuy, mcux, vf, hf, 64)
                .transpose(0, 2, 1, 3, 4)
                .reshape(mcuy * vf, mcux * hf, 64)
            )
            off += cnt
    else:
        coefs[ci][:cby, :cbx, :] = zz.reshape(cby, cbx, 64)
    return _skip_entropy(buf, pos)


def _expect_rst(r):
    mk = r.align_to_marker()
    if not 0xD0 <= mk <= 0xD7:
        raise ValueError(f"expected RST marker, got 0xFF{mk:02X}")


def _dc_block_index(frame, scan):
    """Per scan component: (rows, cols) int arrays of shape
    ``(n_units, blocks_per_unit)`` mapping decode order into the
    component's coefficient grid, plus ``n_units``."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    if len(scan) > 1:  # interleaved: MCU geometry
        n_units = mcux * mcuy
        my, mx = np.divmod(np.arange(n_units), mcux)
        idx = []
        for ci, cid, hf, vf, tq in scan:
            by, bx = np.divmod(np.arange(hf * vf), hf)
            idx.append((my[:, None] * vf + by, mx[:, None] * hf + bx))
        return idx, n_units
    ci, cid, hf, vf, tq = scan[0]
    cbx, cby = _comp_blocks(w, h, hf, vf, hmax, vmax)
    n_units = cbx * cby
    m = np.arange(n_units)
    return [((m // cbx)[:, None], (m % cbx)[:, None])], n_units


def _prog_dc_native(buf, pos, frame, huff_dc, scan, scan_tables,
                    restart_interval, coefs, ah, al):
    """Gather the DC column, run ``native.jpeg_prog_dc``, scatter back.
    Returns False (caller runs the python loop) when the kernel is
    missing or a hostile DHT overflows the flat symbol rows."""
    slots: dict[int, int] = {}
    flats = []
    if ah == 0:
        for _, cid, hf, vf, tq in scan:
            td = scan_tables[cid][0]
            if td not in slots:
                spec = huff_dc[td]
                if len(spec[1]) > 256:
                    return False
                slots[td] = len(flats)
                flats.append(_huff_flat(*spec))
    if not flats:  # refinement reads raw bits; tables never indexed
        flats.append(_huff_flat([0] * 16, []))
    idx, n_units = _dc_block_index(frame, scan)
    comp_spec = np.array(
        [
            [hf * vf if len(scan) > 1 else 1,
             slots.get(scan_tables[cid][0], 0)]
            for _, cid, hf, vf, tq in scan
        ],
        np.int64,
    )
    parts = [coefs[c[0]][rows, cols, 0] for c, (rows, cols) in zip(scan, idx)]
    dc = np.ascontiguousarray(np.concatenate(parts, axis=1).reshape(-1))
    res = native.jpeg_prog_dc(
        buf, pos,
        np.stack([f[0] for f in flats]),
        np.stack([f[1] for f in flats]),
        np.stack([f[2] for f in flats]),
        np.stack([f[3] for f in flats]),
        comp_spec, n_units, restart_interval, ah, al, dc,
    )
    if res is None:
        return False
    res = res.reshape(n_units, -1)
    off = 0
    for c, (rows, cols) in zip(scan, idx):
        nb = rows.shape[1]
        coefs[c[0]][rows, cols, 0] = res[:, off : off + nb]
        off += nb
    return True


def _prog_dc_scan(buf, pos, frame, huff_dc, scan, scan_tables,
                  restart_interval, coefs, ah, al):
    """Progressive DC scan (T.81 G.2.1-G.2.2): first pass (Ah=0)
    Huffman-codes the point-transformed DC differences; refinement
    passes (Ah>0) append one raw bit per block at position Al.  Runs
    in the compiled kernel when available; the python loop below is
    the property-tested byte-equal fallback."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    if _prog_dc_native(buf, pos, frame, huff_dc, scan, scan_tables,
                       restart_interval, coefs, ah, al):
        return _skip_entropy(buf, pos)
    r = _BitReader(buf, pos)
    tables = {}
    if ah == 0:
        for _, cid, hf, vf, tq in scan:
            tables[cid] = _huff_canonical(*huff_dc[scan_tables[cid][0]])[0]
    preds = [0] * len(scan)

    def unit(si, cid, row):
        if ah == 0:
            s = _decode_huff(r, tables[cid])
            if s > 11:
                raise ValueError("bad DC category")
            diff = _extend(r.bits(s), s) if s else 0
            preds[si] += diff
            row[0] = preds[si] << al
        elif r.bit():
            row[0] |= 1 << al

    if len(scan) > 1:  # interleaved
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                _expect_rst(r)
                preds = [0] * len(scan)
            my, mx = divmod(m, mcux)
            for si, (ci, cid, hf, vf, tq) in enumerate(scan):
                grid = coefs[ci]
                for b in range(hf * vf):
                    by, bx = divmod(b, hf)
                    unit(si, cid, grid[my * vf + by, mx * hf + bx])
    else:
        ci, cid, hf, vf, tq = scan[0]
        cbx, cby = _comp_blocks(w, h, hf, vf, hmax, vmax)
        grid = coefs[ci]
        for m in range(cbx * cby):
            if restart_interval and m and m % restart_interval == 0:
                _expect_rst(r)
                preds = [0]
            unit(0, cid, grid[m // cbx, m % cbx])
    return _skip_entropy(buf, pos)


def _prog_ac_scan(buf, pos, frame, huff_ac, comp, scan_tables,
                  restart_interval, coefs, ss, se, ah, al):
    """Progressive AC scan (always single-component, raster order over
    the component's own block grid): spectral-selection first pass
    (Ah=0) with EOB runs, or successive-approximation refinement
    (Ah>0) with inline correction bits — the walks mirror T.81
    G.2.2/libjpeg semantics exactly."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    ci, cid, hf, vf, tq = comp
    spec = huff_ac[scan_tables[cid][1]]
    cbx, cby = _comp_blocks(w, h, hf, vf, hmax, vmax)
    grid = coefs[ci]
    if len(spec[1]) <= 256:
        flats = _huff_flat(*spec)
        sub = np.ascontiguousarray(grid[:cby, :cbx].reshape(-1, 64))
        res = native.jpeg_prog_ac(
            buf, pos,
            flats[0][None], flats[1][None], flats[2][None], flats[3][None],
            cbx * cby, restart_interval, ss, se, ah, al, sub,
        )
        if res is not None:
            grid[:cby, :cbx] = res.reshape(cby, cbx, 64)
            return _skip_entropy(buf, pos)
    act = _huff_canonical(*spec)[0]
    r = _BitReader(buf, pos)
    block = _ac_first_block if ah == 0 else _ac_refine_block
    eobrun = 0
    for m in range(cbx * cby):
        if restart_interval and m and m % restart_interval == 0:
            _expect_rst(r)
            eobrun = 0
        eobrun = block(r, act, grid[m // cbx, m % cbx], ss, se, al, eobrun)
    return _skip_entropy(buf, pos)


def _ac_first_block(r, act, row, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(r, act)
        run, s = rs >> 4, rs & 15
        if s == 0:
            if run < 15:
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.bits(run)
                break
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("JPEG AC run past band end")
        row[k] = _extend(r.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(r, act, row, ss, se, al, eobrun):
    p1 = 1 << al
    m1 = -p1

    def correct(k):
        c = int(row[k])
        if c and r.bit() and not (c & p1):
            row[k] = c + (p1 if c >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(r, act)
            run, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if run < 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.bits(run)
                    break  # rest of block via the EOB tail below
                # run == 15: ZRL, skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad JPEG AC refinement magnitude")
                val = p1 if r.bit() else m1
            # advance over `run` zero-history coefficients, appending
            # correction bits to already-nonzero ones along the way
            while k <= se:
                if row[k]:
                    correct(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                row[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB tail: corrections for the remaining band
            correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _finish_jpeg(frame, quant, coefs):
    """Dequantize + batch IDCT every component grid and assemble the
    RGB raster — all whole-array ops."""
    w, h, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    planes = []
    for ci, (cid, hf, vf, tq) in enumerate(comps):
        if tq not in quant:
            raise ValueError(f"missing DQT table {tq}")
        grid = coefs[ci]
        bh, bw = grid.shape[:2]
        czz = grid.reshape(-1, 64)
        nat = np.zeros_like(czz)
        nat[:, _ZIGZAG] = czz  # un-zigzag every block at once
        qm = np.zeros(64, np.int64)
        qm[_ZIGZAG] = quant[tq]  # DQT is in zigzag order in the file
        arr = (nat * qm).reshape(-1, 8, 8)
        sam = _idct_blocks(arr) + 128.0
        plane = (
            sam.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # replicate-upsample to full resolution, crop to (h, w)
        if hf < hmax:
            plane = np.repeat(plane, hmax // hf, axis=1)
        if vf < vmax:
            plane = np.repeat(plane, vmax // vf, axis=0)
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        gray = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        rgb = np.repeat(gray[..., None], 3, axis=2)
        return w, h, 1, rgb.tobytes()
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgbf = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    rgb = np.clip(np.rint(rgbf), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)


def _quantize_blocks(coef: np.ndarray, qm: np.ndarray,
                     sums: np.ndarray) -> np.ndarray:
    """Round-half-away quantization of ``(n, 8, 8)`` coefficient
    blocks; DC comes from the EXACT integer block sums (``sums[i] =
    sum of level-shifted samples``, so the true DC is ``sums[i] / 8``)
    — float DCT noise on a half-integer DC would otherwise make
    solid-block fixtures knife-edge."""
    q = np.where(
        coef >= 0,
        np.floor(coef / qm + 0.5),
        -np.floor(-coef / qm + 0.5),
    ).astype(np.int64)
    q0 = int(qm[0, 0])
    q[:, 0, 0] = np.where(
        sums >= 0,
        (2 * sums + 8 * q0) // (16 * q0),
        -((-2 * sums + 8 * q0) // (16 * q0)),
    )
    return q


def _encode_component_block(w: _BitWriter, zz: np.ndarray, pred: int,
                            dc_enc, ac_enc) -> int:
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    code, ln = dc_enc[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    # AC with run-lengths
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            w.write(code, ln)
            run -= 16
        mag = abs(v)
        ss = mag.bit_length()
        code, ln = ac_enc[(run << 4) | ss]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << ss) - 1, ss)
        run = 0
    if run:
        code, ln = ac_enc[0x00]
        w.write(code, ln)
    return dc


# AC table for progressive scans: the Annex K sequential tables lack
# the EOBn symbols (0x10..0xE0 never occur in sequential data), so
# progressive files carry this custom-but-fixed canonical table
# covering ALL 256 run/size symbols (255 codes of 8 bits + one of 9;
# Kraft-valid, all-ones codes unassigned).  Suboptimal compression,
# full coverage — fixtures don't care about size.
_FLAT_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


class _ScanWriter:
    """One scan's entropy stream: a _BitWriter plus RSTn segmentation
    every ``restart_interval`` units.  Callers check ``at_boundary()``
    BEFORE each unit (flushing any pending EOB run first) and then call
    ``restart()``."""

    def __init__(self, restart_interval: int):
        self.ri = restart_interval
        self.parts: list[bytes] = []
        self.w = _BitWriter()
        self.m = 0

    def at_boundary(self) -> bool:
        return bool(self.ri) and self.m > 0 and self.m % self.ri == 0

    def restart(self) -> None:
        self.parts.append(self.w.flush())
        self.parts.append(bytes([0xFF, 0xD0 + (self.m // self.ri - 1) % 8]))
        self.w = _BitWriter()

    def done(self) -> bytes:
        self.parts.append(self.w.flush())
        return b"".join(self.parts)


def _flush_eobrun(wtr: _BitWriter, ac_enc, eobrun: int) -> int:
    """Emit a pending EOB run as EOBn codes (T.81 G.1.2.2: EOBn spans
    2^n..2^(n+1)-1 blocks via n appended bits)."""
    while eobrun > 0:
        r = min(14, eobrun.bit_length() - 1)
        cnt = min(eobrun, (1 << (r + 1)) - 1)
        code, ln = ac_enc[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(cnt - (1 << r), r)
        eobrun -= cnt
    return 0


def _emit_dc_scan(grids, dc_encs, ah, al, restart_interval) -> bytes:
    """Progressive DC scan: first pass (ah=0) codes point-transformed
    differences; refinement (ah>0) emits one raw bit per block."""
    sw = _ScanWriter(restart_interval)
    preds = [0] * len(grids)
    bh, bw = grids[0].shape[:2]
    for by in range(bh):
        for bx in range(bw):
            if sw.at_boundary():
                sw.restart()
                preds = [0] * len(grids)
            sw.m += 1
            for ci, g in enumerate(grids):
                dc = int(g[by, bx, 0])
                if ah == 0:
                    t = dc >> al  # arithmetic shift per T.81 G.1.2.1
                    diff = t - preds[ci]
                    preds[ci] = t
                    s = abs(diff).bit_length()
                    code, ln = dc_encs[ci][s]
                    sw.w.write(code, ln)
                    if s:
                        sw.w.write(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
                else:
                    sw.w.write((dc >> al) & 1, 1)
    return sw.done()


def _emit_ac_first_scan(grid, ac_enc, ss, se, al, restart_interval) -> bytes:
    """Progressive AC spectral-selection scan for one component, with
    cross-block EOB runs (the decoder's EOBRUN path needs real runs)."""
    sw = _ScanWriter(restart_interval)
    eobrun = 0
    bh, bw = grid.shape[:2]
    for by in range(bh):
        for bx in range(bw):
            if sw.at_boundary():
                eobrun = _flush_eobrun(sw.w, ac_enc, eobrun)
                sw.restart()
            sw.m += 1
            row = grid[by, bx]
            vals = [
                (int(v), abs(int(v)) >> al) for v in row[ss : se + 1]
            ]
            nz = [i for i, (_, av) in enumerate(vals) if av]
            if not nz:
                eobrun += 1
                continue
            eobrun = _flush_eobrun(sw.w, ac_enc, eobrun)
            run = 0
            for i in range(nz[-1] + 1):
                v, av = vals[i]
                if av == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_enc[0xF0]
                    sw.w.write(code, ln)
                    run -= 16
                s = av.bit_length()
                code, ln = ac_enc[(run << 4) | s]
                sw.w.write(code, ln)
                sw.w.write(av if v >= 0 else (1 << s) - 1 - av, s)
                run = 0
            if nz[-1] < len(vals) - 1:
                eobrun += 1  # trailing zeros close the band via EOB
    _flush_eobrun(sw.w, ac_enc, eobrun)
    return sw.done()


def _emit_ac_refine_scan(grid, ac_enc, ss, se, al, restart_interval) -> bytes:
    """Progressive AC successive-approximation refinement for one
    component, mirroring the decoder walk exactly: newly-significant
    coefficients as (run,1)+sign, correction bits inline in position
    order, ZRL splits at the 16th zero, blocks owing nothing extend the
    EOB run."""
    sw = _ScanWriter(restart_interval)
    eobrun = 0
    bh, bw = grid.shape[:2]
    for by in range(bh):
        for bx in range(bw):
            if sw.at_boundary():
                eobrun = _flush_eobrun(sw.w, ac_enc, eobrun)
                sw.restart()
            sw.m += 1
            row = grid[by, bx]
            # per position: 'z' not yet significant, 'n' newly
            # significant (sign bit), 'c' history (correction bit)
            events = []
            for k in range(ss, se + 1):
                v = int(row[k])
                av = abs(v) >> al
                if av == 0:
                    events.append(("z", 0))
                elif av == 1:
                    events.append(("n", 1 if v >= 0 else 0))
                else:
                    events.append(("c", av & 1))
            if all(t == "z" for t, _ in events):
                eobrun += 1
                continue
            eobrun = _flush_eobrun(sw.w, ac_enc, eobrun)
            gap: list[tuple[str, int]] = []
            for t, b in events:
                if t != "n":
                    gap.append((t, b))
                    continue
                zeros = sum(1 for tt, _ in gap if tt == "z")
                while zeros > 15:
                    # ZRL consumes the first 16 zeros; corrections
                    # positioned before its 16th zero ride with it
                    cnt = 0
                    for j, (tt, _) in enumerate(gap):
                        if tt == "z":
                            cnt += 1
                            if cnt == 16:
                                break
                    code, ln = ac_enc[0xF0]
                    sw.w.write(code, ln)
                    for tt, bb in gap[: j + 1]:
                        if tt == "c":
                            sw.w.write(bb, 1)
                    gap = gap[j + 1 :]
                    zeros -= 16
                code, ln = ac_enc[(zeros << 4) | 1]
                sw.w.write(code, ln)
                sw.w.write(b, 1)  # sign: 1 positive
                for tt, bb in gap:
                    if tt == "c":
                        sw.w.write(bb, 1)
                gap = []
            if gap:
                if any(tt == "c" for tt, _ in gap):
                    # corrections owed past the last new coefficient:
                    # close with an explicit EOB(1) + the bits now
                    code, ln = ac_enc[0x00]
                    sw.w.write(code, ln)
                    for tt, bb in gap:
                        if tt == "c":
                            sw.w.write(bb, 1)
                else:
                    eobrun += 1  # zeros only: extendable EOB run
    _flush_eobrun(sw.w, ac_enc, eobrun)
    return sw.done()


def _quantized_grids(planes, w, h):
    """Pad, level-shift, batch-DCT and quantize every plane into a
    ``(bh, bw, 64)`` zigzag coefficient grid per component."""
    bw_, bh_ = -(-w // 8), -(-h // 8)
    qms = [_QUANT_LUMA.reshape(8, 8), _QUANT_CHROMA.reshape(8, 8)]
    grids = []
    for ci, p in enumerate(planes):
        pp = np.pad(p, ((0, bh_ * 8 - h), (0, bw_ * 8 - w)), mode="edge")
        blocks = (
            (pp.astype(np.int64) - 128)
            .reshape(bh_, 8, bw_, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        q = _quantize_blocks(
            _dct_blocks(blocks), qms[min(ci, 1)], blocks.reshape(-1, 64).sum(1)
        )
        grids.append(q.reshape(-1, 64)[:, _ZIGZAG].reshape(bh_, bw_, 64))
    return grids


def encode_jpeg(data: bytes, w: int, h: int, gray: bool = False,
                restart_interval: int = 0, progressive: bool = False) -> bytes:
    """JPEG encoder: grayscale (``gray=True``, ``data`` = ``w*h`` luma
    bytes) or 4:4:4 YCbCr color (``data`` = ``w*h*3`` RGB), Annex K
    quantization, no subsampling.  ``progressive=True`` emits an SOF2
    file with the full successive-approximation script (interleaved DC
    first+refine, then per-component AC spectral bands at Al=2 refined
    down to 0) — the decode dual for every progressive path.  Both
    modes produce IDENTICAL quantized coefficients, so a progressive
    re-encode decodes byte-equal to its baseline twin.  The DC path is
    exact-integer (see ``_quantize_blocks``), which is what makes
    solid-tile fixtures SQL-oracle-able through a lossy codec."""
    n = w * h * (1 if gray else 3)
    if len(data) != n:
        raise ValueError(f"expected {n} bytes, got {len(data)}")
    px = np.frombuffer(data, np.uint8).astype(np.int64)
    if gray:
        planes = [px.reshape(h, w)]
    else:
        rgb = px.reshape(h, w, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [
            np.clip(np.rint(p), 0, 255).astype(np.int64) for p in (y, cb, cr)
        ]
    nc = len(planes)
    grids = _quantized_grids(planes, w, h)
    _, dc_l_enc = _huff_canonical(*_DC_LUMA_SPEC)
    _, dc_c_enc = _huff_canonical(*_DC_CHROMA_SPEC)
    dc_encs = [dc_l_enc] + [dc_c_enc] * (nc - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (zigzag order per spec)
    out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([0x00]) + bytes(
        int(v) for v in _QUANT_LUMA[_ZIGZAG]
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([0x01]) + bytes(
            int(v) for v in _QUANT_CHROMA[_ZIGZAG]
        )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += bytes([0xFF, 0xC2 if progressive else 0xC0])
    out += struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th: int, spec) -> bytes:
        counts, vals = spec
        body = bytes([tc << 4 | th]) + bytes(counts) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(scan_comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(scan_comps)])
        for cid, td, ta in scan_comps:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    if not progressive:
        out += dht(0, 0, _DC_LUMA_SPEC) + dht(1, 0, _AC_LUMA_SPEC)
        if not gray:
            out += dht(0, 1, _DC_CHROMA_SPEC) + dht(1, 1, _AC_CHROMA_SPEC)
        _, ac_l_enc = _huff_canonical(*_AC_LUMA_SPEC)
        _, ac_c_enc = _huff_canonical(*_AC_CHROMA_SPEC)
        ac_encs = [ac_l_enc] + [ac_c_enc] * (nc - 1)
        sw = _ScanWriter(restart_interval)
        preds = [0] * nc
        bh_, bw_ = grids[0].shape[:2]
        for by in range(bh_):
            for bx in range(bw_):
                if sw.at_boundary():
                    sw.restart()
                    preds = [0] * nc
                sw.m += 1
                for ci, g in enumerate(grids):
                    preds[ci] = _encode_component_block(
                        sw.w, g[by, bx], preds[ci], dc_encs[ci], ac_encs[ci]
                    )
        out += sos([(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1)
                    for ci in range(nc)], 0, 63, 0, 0)
        out += sw.done()
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # progressive: DC tables as baseline, one flat AC table for all
    # components (the EOBn symbols aren't in the Annex K tables)
    out += dht(0, 0, _DC_LUMA_SPEC)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_SPEC)
    out += dht(1, 0, _FLAT_AC_SPEC)
    _, flat_ac_enc = _huff_canonical(*_FLAT_AC_SPEC)
    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(nc)]
    out += sos(all_comps, 0, 0, 0, 1)
    out += _emit_dc_scan(grids, dc_encs, 0, 1, restart_interval)
    out += sos(all_comps, 0, 0, 1, 0)
    out += _emit_dc_scan(grids, dc_encs, 1, 0, restart_interval)
    for ci in range(nc):
        comp = [(ci + 1, 0, 0)]
        for ss, se, ah, al in ((1, 5, 0, 2), (6, 63, 0, 2),
                               (1, 63, 2, 1), (1, 63, 1, 0)):
            out += sos(comp, ss, se, ah, al)
            if ah == 0:
                out += _emit_ac_first_scan(
                    grids[ci], flat_ac_enc, ss, se, al, restart_interval
                )
            else:
                out += _emit_ac_refine_scan(
                    grids[ci], flat_ac_enc, ss, se, al, restart_interval
                )
    out += b"\xff\xd9"  # EOI
    return bytes(out)
