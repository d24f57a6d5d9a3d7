"""Property tests for the real multimodal decoders (hypothesis).

Two invariants a web-corpus decode stage must hold:
1. Round trip: encode(pixels) -> decode == pixels, for every format,
   filter, palette size, and dimension the encoders can produce.
2. Robustness: a truncated or bit-flipped blob NEVER crashes with a
   raw IndexError/struct.error or returns silently-wrong dimensions —
   it either decodes (flip landed in pixel data, dims intact) or
   raises the clean ValueError/NotImplementedError that
   ``on_error='skip'`` filters at scale.
"""

import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketch_spark.functions.multimodal import (
    decode_avi_frames,
    decode_image,
    encode_avi,
    encode_gif,
    encode_png,
)

CLEAN = (ValueError, NotImplementedError, zlib.error)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    ft=st.integers(0, 4),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, ft, gray, seed):
    rng = np.random.default_rng(seed)
    ch = 1 if gray else 3
    raw = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    got_w, got_h, rgb = decode_image(encode_png(raw, w, h, filter_type=ft, gray=gray))
    want = np.repeat(np.frombuffer(raw, np.uint8), 3).tobytes() if gray else raw
    assert (got_w, got_h) == (w, h)
    assert rgb == want


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    ncolors=st.integers(1, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(w, h, ncolors, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=ncolors * 3, dtype=np.uint8).tobytes()
    idx = rng.integers(0, ncolors, size=w * h, dtype=np.uint8).tobytes()
    got_w, got_h, rgb = decode_image(encode_gif(idx, w, h, pal, interlace=interlace))
    p = np.frombuffer(pal, np.uint8).reshape(ncolors, 3)
    assert (got_w, got_h) == (w, h)
    assert rgb == p[np.frombuffer(idx, np.uint8)].tobytes()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    n=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(w, h, n, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes() for _ in range(n)]
    got_w, got_h, got = decode_avi_frames(encode_avi(frames, w, h))
    assert (got_w, got_h) == (w, h)
    assert got == frames


def _palette_png(idx: bytes, w: int, h: int, plte: bytes) -> bytes:
    import struct

    from sketch_spark.functions.multimodal import _png_chunk

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    rows = np.frombuffer(idx, np.uint8).reshape(h, w)
    scan = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )


def _blobs():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=6 * 4 * 3, dtype=np.uint8).tobytes()
    idx = rng.integers(0, 16, size=6 * 4, dtype=np.uint8).tobytes()
    pal = rng.integers(0, 256, size=16 * 3, dtype=np.uint8).tobytes()
    return {
        "png": encode_png(rgb, 6, 4, filter_type=4),
        "png_pal": _palette_png(idx, 6, 4, pal),
        "gif": encode_gif(idx, 6, 4, pal),
        "ppm": b"P6\n6 4\n255\n" + rgb,
        "avi": encode_avi([rgb, rgb], 6, 4),
    }


BLOBS = _blobs()


@settings(max_examples=150, deadline=None)
@given(
    kind=st.sampled_from(sorted(BLOBS)),
    cut=st.integers(1, 10_000),
)
def test_truncation_raises_cleanly(kind, cut):
    """Any prefix of a valid blob either still decodes (cut inside
    trailing padding) or raises a clean, catchable error."""
    blob = BLOBS[kind]
    prefix = blob[: max(0, len(blob) - (cut % len(blob)) - 1)]
    try:
        if kind == "avi":
            decode_avi_frames(prefix)
        else:
            decode_image(prefix)
    except CLEAN:
        pass  # the contract: clean error, on_error='skip' handles it


@settings(max_examples=200, deadline=None)
@given(
    kind=st.sampled_from(sorted(BLOBS)),
    pos=st.integers(0, 10_000),
    bit=st.integers(0, 7),
)
def test_bitflip_never_crashes_raw(kind, pos, bit):
    """A single flipped bit anywhere in the blob must never escape as
    IndexError/struct.error/reshape garbage — decode returns or raises
    one of the clean error types; when it returns, the dimensions stay
    parseable ints (flip landed in pixel data or an ignored field)."""
    blob = bytearray(BLOBS[kind])
    blob[pos % len(blob)] ^= 1 << bit
    try:
        if kind == "avi":
            w, h, frames = decode_avi_frames(bytes(blob))
            assert w >= 0 and h >= 0
        else:
            w, h, rgb = decode_image(bytes(blob))
            assert w >= 0 and h >= 0 and len(rgb) == w * h * 3
    except CLEAN:
        pass


def test_review_regressions_raise_cleanly():
    """Pin the exact corrupt-blob shapes a review pass found escaping as
    raw IndexError/RecursionError/struct.error (all must now surface as
    the clean error types on_error='skip' filters)."""
    import struct

    from sketch_spark.functions.multimodal import _png_chunk

    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, size=16 * 3, dtype=np.uint8).tobytes()
    idx = rng.integers(0, 16, size=24, dtype=np.uint8).tobytes()
    gif = encode_gif(idx, 6, 4, pal)

    # 1. GIF truncated right where the LZW minimum-code-size byte goes
    desc_end = gif.find(b"\x2c") + 10  # image descriptor is 10 bytes
    with pytest.raises(CLEAN):
        decode_image(gif[:desc_end])
    # 2. bit-flipped first LZW code after the initial clear
    for bit in range(8):
        flipped = bytearray(gif)
        flipped[desc_end + 1 + 1] ^= 1 << bit  # first data byte of first sub-block
        try:
            decode_image(bytes(flipped))
        except CLEAN:
            pass
    # 3. palette PNG whose pixel index exceeds the PLTE
    bad_idx = bytes([5] * 4)  # 2-entry palette, index 5
    blob = _palette_png(bad_idx, 2, 2, bytes(6))
    with pytest.raises(ValueError, match="palette"):
        decode_image(blob)
    # 4. AVI LIST-nesting bomb must not hit the recursion limit
    bomb = b"LIST" + struct.pack("<I", 60_000) + b"bomb"
    blob = b"RIFF" + struct.pack("<I", 60_012) + b"AVI " + bomb * 5000
    with pytest.raises(ValueError, match="nesting"):
        decode_avi_frames(blob)
    # 5. PNG decompression bomb: tiny blob, IDAT inflates to ~64 MB —
    # the inflate is capped at the declared raster size, so this must
    # fail fast on the length check, never materialize the 64 MB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb_idat = zlib.compress(bytes(64 * 1024 * 1024), 9)  # ~64 KB compressed
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", bomb_idat)
        + _png_chunk(b"IEND", b"")
    )
    w, h, rgb = decode_image(blob)  # inflates only (2*3+1)*2 bytes of it
    assert (w, h) == (2, 2) and rgb == bytes(12)
    # 6. LZW minimum code size out of spec range
    bad = bytearray(gif)
    bad[desc_end] = 200
    with pytest.raises(ValueError, match="code size"):
        decode_image(bytes(bad))


def test_wav_features_all_pcm_widths(spark):
    """wav_features_df handles 8/16/24/32-bit PCM on one common 16-bit
    scale (VERDICT r4 #6): features across widths must match the
    reference numpy normalization exactly, a truncated final sample
    drops, and an out-of-family width (40-bit) still skips."""
    import struct

    from sketch_spark.functions.multimodal import _pcm_to_i16, wav_features_df

    def wav(bits: int, payload: bytes) -> bytes:
        hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        hdr += b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, 1, 8000, 8000 * bits // 8, bits // 8, bits
        )
        return hdr + b"data" + struct.pack("<I", len(payload)) + payload

    rng = np.random.default_rng(11)
    payloads = {
        8: bytes([0, 255, 128, 127, 129]) + bytes(rng.integers(0, 256, 9, dtype=np.uint8)),
        16: struct.pack("<6h", -32768, 32767, 0, -1, 1, 0),
        # 24-bit extremes: min (-2^23), max (2^23-1), -1, 0, then noise
        24: (b"\x00\x00\x80" + b"\xff\xff\x7f" + b"\xff\xff\xff" + b"\x00\x00\x00"
             + bytes(rng.integers(0, 256, 12, dtype=np.uint8)) + b"\xab"),  # +1 orphan byte
        32: struct.pack("<5i", -(2**31), 2**31 - 1, -1, 0, 65536) + b"\x01\x02",
    }
    expected = {}
    for bits, payload in payloads.items():
        w = bits // 8
        s = _pcm_to_i16(payload, w)
        assert len(s) == len(payload) // w  # orphan tail bytes dropped
        assert s.min() >= -32768 and s.max() <= 32767
        neg = s < 0
        expected[f"b{bits}"] = (
            len(s), int((s * s).sum()), int(np.abs(s).max()),
            int((neg[1:] != neg[:-1]).sum()),
        )
    # hand-check the normalization algebra on the planted extremes
    assert list(_pcm_to_i16(payloads[8][:5], 1)) == [-32768, 32512, 0, -256, 256]
    assert list(_pcm_to_i16(payloads[24][:12], 3)) == [-32768, 32767, -1, 0]
    assert list(_pcm_to_i16(payloads[32][:20], 4)) == [-32768, 32767, -1, 0, 1]
    rows = [(f"b{bits}", bytearray(wav(bits, p))) for bits, p in payloads.items()]
    rows.append(("wide", bytearray(wav(40, bytes(10)))))
    df = spark.createDataFrame(rows, "url string, audio binary")
    out = wav_features_df(df, "audio", "url", on_error="skip").toPandas()
    got = {
        r.url: (r.n_samples, r.sumsq, r.peak, r.zero_crossings)
        for r in out.itertuples()
    }
    assert got == expected  # 40-bit skipped, every supported width exact
    with pytest.raises(Exception, match="width"):
        wav_features_df(df, "audio", "url", on_error="raise").toPandas()


def test_null_blobs_are_skippable_everywhere(spark):
    """A NULL binary cell (routine in web-corpus joins) must be
    skippable in every decode operator, never a TypeError."""
    import pandas as pdl

    from sketch_spark.functions.multimodal import (
        corpus_luma_histogram,
        decode_images_df,
        decode_avi_frames_df,
        decode_wavs_df,
        resize_images_df,
        sample_video_frames_df,
        wav_features_df,
    )

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=2 * 2 * 3, dtype=np.uint8).tobytes()
    ppm = b"P6\n2 2\n255\n" + rgb
    df = spark.createDataFrame(
        pdl.DataFrame({"url": ["ok", "null"], "blob": [ppm, None]}),
        "url string, blob binary",
    )
    assert list(decode_images_df(df, "blob", "url", on_error="skip").toPandas().url) == ["ok"]
    # the ok image has 4 pixels; the null row contributes none
    luma = corpus_luma_histogram(df, "blob", "url", on_error="skip").toPandas()
    assert int(luma.n_pixels.sum()) == 4
    # audio/video operators: the ok row is undecodable audio too -> both skip
    assert len(decode_wavs_df(df, "blob", "url", on_error="skip").toPandas()) == 0
    assert len(wav_features_df(df, "blob", "url", on_error="skip").toPandas()) == 0
    assert len(decode_avi_frames_df(df, "blob", "url", on_error="skip").toPandas()) == 0
    # total operators fall back to the stub for the null row
    r = resize_images_df(df, "blob", "url", width=2, height=2).toPandas()
    assert len(r) == 2
    f = sample_video_frames_df(df, "blob", "url", n_frames=2, width=2, height=2).toPandas()
    assert len(f) == 4


def test_image_dups_key_includes_dimensions(spark):
    """Identical raster bytes in different shapes are NOT duplicates."""
    from sketch_spark.functions.multimodal import image_exact_duplicates

    solid = bytes([7, 8, 9]) * 12  # 36 px worth of one color
    rows = [
        ("a6x2", bytearray(b"P6\n6 2\n255\n" + solid)),
        ("b6x2", bytearray(b"P6\n6 2\n255\n" + solid)),
        ("c3x4", bytearray(b"P6\n3 4\n255\n" + solid)),  # same bytes, new shape
    ]
    df = spark.createDataFrame(rows, "url string, image binary")
    out = image_exact_duplicates(df, "image", "url").toPandas()
    assert len(out) == 1  # only the 6x2 pair; the 3x4 is distinct
    assert (int(out.width[0]), int(out.height[0]), int(out.n_copies[0])) == (6, 2, 2)
    assert out.survivor[0] == "a6x2"


def test_avi_frame_indices_lazy_selection():
    """frame_indices converts only the selected frames; a callable
    receives the total count; out-of-range raises the clean error."""
    from sketch_spark.functions.multimodal import decode_avi_frames, encode_avi

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, size=4 * 3 * 3, dtype=np.uint8).tobytes() for _ in range(6)]
    blob = encode_avi(frames, 4, 3)
    _, _, got = decode_avi_frames(blob, frame_indices=[0, 5])
    assert got == [frames[0], frames[5]]
    _, _, got = decode_avi_frames(blob, frame_indices=lambda n: [n - 1])
    assert got == [frames[5]]
    with pytest.raises(ValueError, match="out of range"):
        decode_avi_frames(blob, frame_indices=[6])
    # the callable path validates identically (no silent negative wrap)
    with pytest.raises(ValueError, match="out of range"):
        decode_avi_frames(blob, frame_indices=lambda n: [n])
    with pytest.raises(ValueError, match="out of range"):
        decode_avi_frames(blob, frame_indices=lambda n: [-1])


def test_luma_histogram_partials_per_partition_and_bins_validation(spark):
    from sketch_spark.functions.multimodal import corpus_luma_histogram

    with pytest.raises(ValueError, match="bins"):
        corpus_luma_histogram(spark.range(1).selectExpr("cast(null as binary) b"), "b", "id", bins=0)
    # semantic check across multiple partitions/batches: exact counts
    rng = np.random.default_rng(5)
    rows = []
    import collections

    ref = collections.Counter()
    for i in range(40):
        px = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
        rows.append((f"u{i}", bytearray(b"P6\n3 2\n255\n" + px.tobytes())))
        for v in px.reshape(-1, 3).astype(int).sum(axis=1):
            ref[v * 8 // 766] += 1
    df = spark.createDataFrame(rows, "url string, image binary").repartition(7)
    out = corpus_luma_histogram(df, "image", "url", bins=8).toPandas()
    got = dict(zip(out.bin, out.n_pixels))
    assert got == dict(ref)
