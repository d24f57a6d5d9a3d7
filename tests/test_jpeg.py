"""Baseline JPEG codec: solid-tile integer exactness (the oracle
contract), lossy roundtrip bounds, subsampled decode, restart markers,
and the mandatory byte-parser fuzz (truncation + bitflip)."""

import random
import struct

import numpy as np
import pytest

from sketch_spark.functions.jpegcodec import (
    _AC_CHROMA_SPEC,
    _AC_LUMA_SPEC,
    _DC_CHROMA_SPEC,
    _DC_LUMA_SPEC,
    _BitWriter,
    _huff_canonical,
    decode_jpeg,
    encode_jpeg,
)
from sketch_spark.functions.multimodal import _decode_image_full


def _pred(v: int) -> int:
    """The SQL-oracle formula: decoded value of a solid-v luma tile
    through Annex K q[0,0]=16 with round-half-away DC quantization."""
    s = v - 128
    fq = (s + 1) // 2 if s >= 0 else -((1 - s) // 2)
    return max(0, min(255, 2 * fq + 128))


def test_solid_tiles_exact_all_values():
    """EVERY luma value 0..255 as a solid 8x8 tile decodes to exactly
    the integer formula — no float knife-edges anywhere in the range."""
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    w, h, nc, rgb = decode_jpeg(encode_jpeg(img.tobytes(), 128, 128, gray=True))
    assert (w, h, nc) == (128, 128, 1)
    dec = np.frombuffer(rgb, np.uint8).reshape(128, 128, 3)
    exp = np.repeat(np.repeat(np.vectorize(_pred)(vals), 8, 0), 8, 1)
    assert (dec == exp[..., None]).all()


def test_gradient_roundtrip_bounded():
    y, x = np.mgrid[0:32, 0:40]
    gray = ((x * 3 + y * 2) % 256).astype(np.uint8)
    w, h, nc, rgb = decode_jpeg(encode_jpeg(gray.tobytes(), 40, 32, gray=True))
    dec = np.frombuffer(rgb, np.uint8).reshape(32, 40, 3)[..., 0].astype(int)
    assert np.abs(dec - gray.astype(int)).max() <= 8

    col = np.stack([(x * 5) % 256, (y * 7) % 256, ((x + y) * 3) % 256], -1)
    col = col.astype(np.uint8)
    w, h, nc, rgb = decode_jpeg(encode_jpeg(col.tobytes(), 40, 32))
    assert nc == 3
    dec = np.frombuffer(rgb, np.uint8).reshape(32, 40, 3).astype(int)
    assert np.abs(dec - col.astype(int)).max() <= 24  # chroma table is coarse


def test_odd_dims_and_restart_markers():
    y, x = np.mgrid[0:30, 0:37]
    gray = ((x + 2 * y) % 256).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(np.ascontiguousarray(gray).tobytes(), 37, 30, gray=True))
    for ri in (1, 2, 5):
        blob = encode_jpeg(
            np.ascontiguousarray(gray).tobytes(), 37, 30, gray=True,
            restart_interval=ri,
        )
        assert b"\xff\xdd" in blob  # DRI present
        assert decode_jpeg(blob) == base


def test_420_subsampled_decode():
    """Hand-built one-MCU 4:2:0 JPEG (4 Y blocks + Cb + Cr, neutral
    chroma): the replicated upsample + color conversion must return the
    solid luma prediction on all 16x16 pixels."""
    v = 200
    s = v - 128
    fq = (s + 1) // 2
    _, dc_l = _huff_canonical(*_DC_LUMA_SPEC)
    _, ac_l = _huff_canonical(*_AC_LUMA_SPEC)
    _, dc_c = _huff_canonical(*_DC_CHROMA_SPEC)
    _, ac_c = _huff_canonical(*_AC_CHROMA_SPEC)
    wtr = _BitWriter()

    def put_dc(diff, enc):
        ss = abs(diff).bit_length()
        code, ln = enc[ss]
        wtr.write(code, ln)
        if ss:
            wtr.write(diff if diff >= 0 else diff + (1 << ss) - 1, ss)

    def put_eob(enc):
        code, ln = enc[0x00]
        wtr.write(code, ln)

    # 4 Y blocks: first carries the DC, the rest diff 0; Cb/Cr are 0
    put_dc(fq, dc_l); put_eob(ac_l)
    for _ in range(3):
        put_dc(0, dc_l); put_eob(ac_l)
    put_dc(0, dc_c); put_eob(ac_c)
    put_dc(0, dc_c); put_eob(ac_c)
    scan = wtr.flush()

    from sketch_spark.functions.jpegcodec import _QUANT_CHROMA, _QUANT_LUMA, _ZIGZAG

    blob = bytearray(b"\xff\xd8")
    blob += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in _QUANT_LUMA[_ZIGZAG]
    )
    blob += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
        int(x) for x in _QUANT_CHROMA[_ZIGZAG]
    )
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    blob += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, spec):
        counts, vals = spec
        body = bytes([tc << 4 | th]) + bytes(counts) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    blob += dht(0, 0, _DC_LUMA_SPEC) + dht(1, 0, _AC_LUMA_SPEC)
    blob += dht(0, 1, _DC_CHROMA_SPEC) + dht(1, 1, _AC_CHROMA_SPEC)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    blob += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    blob += scan + b"\xff\xd9"

    w, h, nc, rgb = decode_jpeg(bytes(blob))
    assert (w, h, nc) == (16, 16, 3)
    dec = np.frombuffer(rgb, np.uint8).reshape(16, 16, 3)
    assert (dec == _pred(v)).all()


def test_dispatch_and_unsupported_modes():
    y, x = np.mgrid[0:16, 0:16]
    gray = ((x * 7 + y) % 256).astype(np.uint8)
    blob = encode_jpeg(gray.tobytes(), 16, 16, gray=True)
    fmt, w, h, rgb = _decode_image_full(blob)
    assert (fmt, w, h) == ("jpeg", 16, 16)
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(blob.replace(b"\xff\xc0", b"\xff\xc9"))  # arithmetic
    with pytest.raises(ValueError, match="Se=0"):
        # baseline scan params inside a frame relabeled progressive:
        # a progressive DC scan must carry Se=0
        decode_jpeg(blob.replace(b"\xff\xc0", b"\xff\xc2"))
    with pytest.raises(ValueError, match="max_pixels"):
        big = bytearray(blob)
        i = big.index(b"\xff\xc0") + 5
        big[i : i + 4] = struct.pack(">HH", 60000, 60000)
        decode_jpeg(bytes(big))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_truncation_and_bitflip_never_escape():
    y, x = np.mgrid[0:24, 0:24]
    col = np.stack([(x * 9) % 256, (y * 5) % 256, ((x * y) + 3) % 256], -1)
    blob = encode_jpeg(col.astype(np.uint8).tobytes(), 24, 24)
    for cut in range(0, len(blob), 7):
        try:
            decode_jpeg(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    rng = random.Random(11)
    for _ in range(1200):
        mutated = bytearray(blob)
        i = rng.randrange(len(mutated))
        mutated[i] ^= 1 << rng.randrange(8)
        try:
            decode_jpeg(bytes(mutated))
        except (ValueError, NotImplementedError):
            pass


def test_bitreader_acc_stays_bounded():
    """Review r5: acc was never masked after bits were consumed, so it
    grew 8 bits per scan byte and every refill shift copied the whole
    bigint — quadratic decode time on marker-free megapixel scans.
    Pin: after consuming a 64 KiB stream bit-by-bit the accumulator
    must stay word-sized."""
    from sketch_spark.functions.jpegcodec import _BitReader

    r = _BitReader(bytes([0xAB] * 65536), 0)
    for _ in range(65536 * 8):
        r.bit()
    assert r.acc.bit_length() <= 16


# ------------------------------------------- native scan kernel

from hypothesis import given, settings
from hypothesis import strategies as st

from sketch_spark.core import native


def _force_python_path():
    import os

    os.environ["SKETCH_SPARK_NO_NATIVE"] = "1"
    native._tried, native._lib = False, None


def _restore_native_path():
    import os

    os.environ.pop("SKETCH_SPARK_NO_NATIVE", None)
    native._tried, native._lib = False, None


def _both_paths(blob):
    """decode_jpeg through the native kernel and the python bit loop;
    each outcome is ('ok', result) or ('err', exception type)."""

    def run():
        try:
            return ("ok", decode_jpeg(blob))
        except (ValueError, NotImplementedError) as e:
            return ("err", type(e))

    nat = run()
    try:
        _force_python_path()
        py = run()
    finally:
        _restore_native_path()
    return nat, py


@given(
    seed=st.integers(0, 2**31),
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    gray=st.booleans(),
    ri=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=25, deadline=None)
def test_native_scan_equals_python(seed, w, h, gray, ri):
    """The compiled entropy scan and the python bit loop must produce
    byte-identical rasters across dims, color, and restart markers."""
    if native._get() is None:
        pytest.skip("no system compiler in this environment")
    rng = np.random.default_rng(seed)
    ch = 1 if gray else 3
    raw = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    blob = encode_jpeg(raw, w, h, gray=gray, restart_interval=ri)
    nat, py = _both_paths(blob)
    assert nat == py


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_native_scan_mutation_differential(data):
    """Truncated/bitflipped scans must fail (or succeed) IDENTICALLY on
    both paths — a divergence means the kernel's marker/padding/EOB
    semantics drifted from the python reference."""
    if native._get() is None:
        pytest.skip("no system compiler in this environment")
    y, x = np.mgrid[0:24, 0:24]
    col = np.stack([(x * 9) % 256, (y * 5) % 256, ((x * y) + 3) % 256], -1)
    blob = encode_jpeg(
        col.astype(np.uint8).tobytes(), 24, 24,
        restart_interval=data.draw(st.sampled_from([0, 2])),
    )
    mutated = bytearray(blob)
    if data.draw(st.booleans()):
        mutated = mutated[: data.draw(st.integers(0, len(mutated)))]
    else:
        i = data.draw(st.integers(0, len(mutated) - 1))
        mutated[i] ^= 1 << data.draw(st.integers(0, 7))
    nat, py = _both_paths(bytes(mutated))
    assert nat == py


def test_native_scan_kernel_is_fast():
    """Regression pin: the compiled scan must beat the python bit loop
    by a wide margin on photographic data (measured ~10x at 256x256;
    pinned at 3x to survive VM steal).  Relative timing only."""
    import time

    if native._get() is None:
        pytest.skip("no system compiler in this environment")
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:256, 0:256]
    base = x[..., None] * [1.1, 0.7, 0.3] + y[..., None] * [0.4, 1.3, 0.8]
    img = ((base + rng.normal(0, 6, (256, 256, 3))) % 256).astype(np.uint8)
    blob = encode_jpeg(img.tobytes(), 256, 256)
    decode_jpeg(blob)  # warm the kernel cache

    def best_of(n):
        b = 9e9
        for _ in range(n):
            t0 = time.perf_counter()
            decode_jpeg(blob)
            b = min(b, time.perf_counter() - t0)
        return b

    t_native = best_of(5)
    try:
        _force_python_path()
        t_python = best_of(3)
    finally:
        _restore_native_path()
    assert t_python / t_native >= 3, (t_native, t_python)


# ------------------------------------------- progressive (SOF2)


@given(
    seed=st.integers(0, 2**31),
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    gray=st.booleans(),
    ri=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=25, deadline=None)
def test_progressive_equals_baseline(seed, w, h, gray, ri):
    """A progressive re-encode of the same quantized coefficients must
    decode byte-identical to its baseline twin — this exercises every
    progressive path: interleaved DC first+refine, AC spectral bands,
    successive approximation down to Al=0, EOB runs, and RSTn."""
    rng = np.random.default_rng(seed)
    ch = 1 if gray else 3
    raw = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    base = decode_jpeg(encode_jpeg(raw, w, h, gray=gray))
    prog = decode_jpeg(
        encode_jpeg(raw, w, h, gray=gray, progressive=True,
                    restart_interval=ri)
    )
    assert base == prog


def test_progressive_smooth_eob_runs_and_solid_exactness():
    """Smooth/solid rasters produce multi-block EOB runs in every AC
    scan (the EOBn decode path), and the solid-tile integer oracle
    formula must hold through the progressive pipeline too."""
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    w, h, nc, rgb = decode_jpeg(
        encode_jpeg(img.tobytes(), 128, 128, gray=True, progressive=True)
    )
    assert (w, h, nc) == (128, 128, 1)
    dec = np.frombuffer(rgb, np.uint8).reshape(128, 128, 3)
    exp = np.repeat(np.repeat(np.vectorize(_pred)(vals), 8, 0), 8, 1)
    assert (dec == exp[..., None]).all()


def test_progressive_420_dc_only_decode():
    """Hand-built progressive 4:2:0 file with ONLY an interleaved DC
    scan (AC never transmitted): subsampled progressive geometry +
    partial-script tolerance."""
    from sketch_spark.functions.jpegcodec import (
        _QUANT_CHROMA,
        _QUANT_LUMA,
        _ZIGZAG,
    )

    v = 200
    s = v - 128
    fq = (s + 1) // 2
    _, dc_l = _huff_canonical(*_DC_LUMA_SPEC)
    _, dc_c = _huff_canonical(*_DC_CHROMA_SPEC)
    wtr = _BitWriter()

    def put_dc(diff, enc):
        ss = abs(diff).bit_length()
        code, ln = enc[ss]
        wtr.write(code, ln)
        if ss:
            wtr.write(diff if diff >= 0 else diff + (1 << ss) - 1, ss)

    put_dc(fq, dc_l)
    for _ in range(3):
        put_dc(0, dc_l)
    put_dc(0, dc_c)
    put_dc(0, dc_c)
    scan = wtr.flush()

    blob = bytearray(b"\xff\xd8")
    blob += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in _QUANT_LUMA[_ZIGZAG]
    )
    blob += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
        int(x) for x in _QUANT_CHROMA[_ZIGZAG]
    )
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    blob += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def dht(tc, th, spec):
        counts, vals = spec
        body = bytes([tc << 4 | th]) + bytes(counts) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    blob += dht(0, 0, _DC_LUMA_SPEC) + dht(0, 1, _DC_CHROMA_SPEC)
    sos = bytes([3, 1, 0x00, 2, 0x10, 3, 0x10]) + bytes([0, 0, 0x00])
    blob += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    blob += scan + b"\xff\xd9"

    w, h, nc, rgb = decode_jpeg(bytes(blob))
    assert (w, h, nc) == (16, 16, 3)
    dec = np.frombuffer(rgb, np.uint8).reshape(16, 16, 3)
    assert (dec == _pred(v)).all()


def test_progressive_truncation_and_bitflip_never_escape():
    y, x = np.mgrid[0:24, 0:24]
    col = np.stack([(x * 9) % 256, (y * 5) % 256, ((x * y) + 3) % 256], -1)
    blob = encode_jpeg(
        col.astype(np.uint8).tobytes(), 24, 24, progressive=True,
        restart_interval=2,
    )
    for cut in range(0, len(blob), 11):
        try:
            decode_jpeg(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    rng = random.Random(23)
    for _ in range(1200):
        mutated = bytearray(blob)
        i = rng.randrange(len(mutated))
        mutated[i] ^= 1 << rng.randrange(8)
        try:
            decode_jpeg(bytes(mutated))
        except (ValueError, NotImplementedError):
            pass


@given(
    seed=st.integers(0, 2**31),
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    gray=st.booleans(),
    ri=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=20, deadline=None)
def test_native_prog_scans_equal_python(seed, w, h, gray, ri):
    """The compiled progressive kernels (jpeg_prog_dc/jpeg_prog_ac)
    and the python reference loops must produce byte-identical
    rasters across dims, color, restart markers, and every scan kind
    in the SOF2 script."""
    if native._get() is None:
        pytest.skip("no system compiler in this environment")
    rng = np.random.default_rng(seed)
    ch = 1 if gray else 3
    raw = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    blob = encode_jpeg(raw, w, h, gray=gray, progressive=True,
                       restart_interval=ri)
    nat, py = _both_paths(blob)
    assert nat == py


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_native_prog_mutation_differential(data):
    """Truncated/bitflipped progressive streams must fail (or succeed)
    identically on the kernels and the python loops."""
    if native._get() is None:
        pytest.skip("no system compiler in this environment")
    y, x = np.mgrid[0:24, 0:24]
    col = np.stack([(x * 9) % 256, (y * 5) % 256, ((x * y) + 3) % 256], -1)
    blob = encode_jpeg(
        col.astype(np.uint8).tobytes(), 24, 24, progressive=True,
        restart_interval=data.draw(st.sampled_from([0, 2])),
    )
    mutated = bytearray(blob)
    if data.draw(st.booleans()):
        mutated = mutated[: data.draw(st.integers(0, len(mutated)))]
    else:
        i = data.draw(st.integers(0, len(mutated) - 1))
        mutated[i] ^= 1 << data.draw(st.integers(0, 7))
    nat, py = _both_paths(bytes(mutated))
    assert nat == py


def test_eof_after_scan_is_implicit_eoi():
    """Review r5-2: crawl JPEGs are routinely cut right after the scan
    tail; once every coefficient decoded, missing EOI (or EOI plus
    trailing bytes stripped) must not fail the blob.  Truncation INSIDE
    the entropy data must still raise."""
    y, x = np.mgrid[0:16, 0:16]
    gray = ((x * 7 + y) % 256).astype(np.uint8)
    blob = encode_jpeg(gray.tobytes(), 16, 16, gray=True)
    full = decode_jpeg(blob)
    assert decode_jpeg(blob[:-2]) == full  # EOI stripped
    prog = encode_jpeg(gray.tobytes(), 16, 16, gray=True, progressive=True)
    assert decode_jpeg(prog[:-2]) == decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])  # mid-scan cut still fails
