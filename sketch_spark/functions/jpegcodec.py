"""Baseline JPEG codec in pure python + numpy — no PIL, no libjpeg.

Closes the last sniff-only image format: ``decode_jpeg`` handles
baseline/extended-sequential Huffman JPEG (SOF0/SOF1) — grayscale and
3-component YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling (replicated
upsample), DQT/DHT/DRI/RSTn, byte stuffing — and ``encode_jpeg`` is
its fixture dual (grayscale or 4:4:4 color, Annex K quantization and
Huffman tables).  Progressive (SOF2), arithmetic coding, 12-bit
precision, and hierarchical modes raise ``NotImplementedError``: they
exist in crawls but rarely, and the documented PIL/libjpeg swap
(``PIL.Image.open``) remains the production answer for them.

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
code's position depends on decoding the previous one), so it runs in
the compiled kernel (``core/native.py jpeg_scan``) when a system
compiler exists, with the per-bit python loop as the property-tested
byte-equal fallback; everything after the scan — un-zigzag,
dequantize, IDCT (batched matmuls), plane assembly, upsample, color
convert — is whole-array numpy.  Same hardening contract as every
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
    restart_interval = 0
    while True:
        if pos + 4 > len(buf):
            raise ValueError("truncated JPEG before SOS")
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker in (0xC0, 0xC1, 0xC4, 0xDB, 0xDD, 0xDA, 0xFE) or 0xE0 <= marker <= 0xEF:
            (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
            if seglen < 2 or pos + seglen > len(buf):
                raise ValueError("truncated JPEG segment")
            seg = buf[pos + 2 : pos + seglen]
            pos += seglen
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/arithmetic/hierarchical): "
                "swap in PIL (baseline SOF0/SOF1 supported)"
            )
        elif marker == 0xD9:
            raise ValueError("JPEG EOI before SOS")
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
        elif marker in (0xC0, 0xC1):  # SOF0/1
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
            ns = seg[0]
            if ns != len(frame[2]):
                raise NotImplementedError("multi-scan JPEG: swap in PIL")
            scan_tables = {}
            for k in range(ns):
                cs, tt = seg[1 + 2 * k : 3 + 2 * k]
                scan_tables[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                buf, pos, frame, quant, huff_dc, huff_ac, scan_tables,
                restart_interval,
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


def _decode_scan(buf, pos, frame, quant, huff_dc, huff_ac, scan_tables,
                 restart_interval):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcus = mcux * mcuy
    for ci, (cid, hf, vf, tq) in enumerate(comps):
        if tq not in quant:
            raise ValueError(f"missing DQT table {tq}")
        if cid not in scan_tables:
            raise ValueError(f"scan omits component {cid}")
        td, ta = scan_tables[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("missing DHT table")
    blocks_per_mcu = sum(hf * vf for _, hf, vf, _ in comps)
    total_blocks = n_mcus * blocks_per_mcu
    zz = _entropy_decode_native(
        buf, pos, comps, scan_tables, huff_dc, huff_ac, n_mcus,
        restart_interval,
    )
    if zz is None:
        zz = _entropy_decode_py(
            buf, pos, comps, scan_tables, huff_dc, huff_ac, n_mcus,
            restart_interval, total_blocks,
        )
    # dequantize + batch IDCT per component, assemble planes — all
    # whole-array ops; the per-MCU block order is (comp0's hf*vf
    # blocks row-major, comp1's, ...) per T.81 interleave
    zz3 = zz.reshape(n_mcus, blocks_per_mcu, 64)
    planes = []
    offset = 0
    for ci, (cid, hf, vf, tq) in enumerate(comps):
        cnt = hf * vf
        czz = zz3[:, offset : offset + cnt, :].reshape(-1, 64)
        offset += cnt
        nat = np.zeros_like(czz)
        nat[:, _ZIGZAG] = czz  # un-zigzag every block at once
        q = quant[tq]
        qm = np.zeros(64, np.int64)
        qm[_ZIGZAG] = q  # q is in zigzag order in the file
        arr = (nat * qm).reshape(-1, 8, 8)
        sam = _idct_blocks(arr) + 128.0
        # MCU-major blocks -> raster: (my, mx, by, bx, 8, 8) with the
        # row dims interleaved as (my, by, row) x (mx, bx, col)
        plane = (
            sam.reshape(mcuy, mcux, vf, hf, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * vf * 8, mcux * hf * 8)
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


def _quantize_block(coef: np.ndarray, qm: np.ndarray, exact_dc_num: int) -> np.ndarray:
    """Round-half-away quantization; DC comes from the EXACT integer
    block sum (``exact_dc_num = sum of level-shifted samples``, so the
    true DC is ``exact_dc_num / 8``) — float DCT noise on a half-integer
    DC would otherwise make solid-block fixtures knife-edge."""
    q = np.where(
        coef >= 0,
        np.floor(coef / qm + 0.5),
        -np.floor(-coef / qm + 0.5),
    ).astype(np.int64)
    q0 = int(qm[0, 0])
    num = exact_dc_num  # DC * 8
    if num >= 0:
        q[0, 0] = (2 * num + 8 * q0) // (16 * q0)
    else:
        q[0, 0] = -((-2 * num + 8 * q0) // (16 * q0))
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


def encode_jpeg(data: bytes, w: int, h: int, gray: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder: grayscale (``gray=True``, ``data`` =
    ``w*h`` luma bytes) or 4:4:4 YCbCr color (``data`` = ``w*h*3`` RGB),
    Annex K quantization + Huffman tables, no subsampling.  The DC path
    is exact-integer (see ``_quantize_block``), which is what makes
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
    _, dc_l_enc = _huff_canonical(*_DC_LUMA_SPEC)
    _, ac_l_enc = _huff_canonical(*_AC_LUMA_SPEC)
    _, dc_c_enc = _huff_canonical(*_DC_CHROMA_SPEC)
    _, ac_c_enc = _huff_canonical(*_AC_CHROMA_SPEC)
    # the table constants are in NATURAL (row-major) order; the file
    # stores DQT in zigzag order, so reshape here and permute on write
    qm_l = _QUANT_LUMA.reshape(8, 8)
    qm_c = _QUANT_CHROMA.reshape(8, 8)

    bw_, bh_ = -(-w // 8), -(-h // 8)
    writer = _BitWriter()
    scan_parts: list[bytes] = []
    preds = [0] * len(planes)
    # pad planes to block multiples by edge replication
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, bh_ * 8 - h), (0, bw_ * 8 - w)), mode="edge")
        padded.append(pp.astype(np.int64) - 128)
    mcu = 0
    for by in range(bh_):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                scan_parts.append(writer.flush())
                scan_parts.append(
                    bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                )
                writer = _BitWriter()
                preds = [0] * len(planes)
            mcu += 1
            for ci, p in enumerate(padded):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _dct_blocks(blk[None])[0]
                qm = qm_l if ci == 0 else qm_c
                q = _quantize_block(coef, qm, int(blk.sum()))
                zz = q.reshape(-1)[_ZIGZAG]
                dc_enc = dc_l_enc if ci == 0 else dc_c_enc
                ac_enc = ac_l_enc if ci == 0 else ac_c_enc
                preds[ci] = _encode_component_block(
                    writer, zz, preds[ci], dc_enc, ac_enc
                )
    scan_parts.append(writer.flush())
    scan = b"".join(scan_parts)

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
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th: int, spec) -> bytes:
        counts, vals = spec
        body = bytes([tc << 4 | th]) + bytes(counts) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _DC_LUMA_SPEC) + dht(1, 0, _AC_LUMA_SPEC)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_SPEC) + dht(1, 1, _AC_CHROMA_SPEC)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)
