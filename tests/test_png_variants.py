"""Adam7 + 16-bit + sub-byte PNG paths (round 5: no PIL seam left in
PNG): roundtrips across every filter/depth/interlace combination and
the mandatory byte-parser fuzz on the new code paths."""

import random

import numpy as np
import pytest

from sketch_spark.functions.multimodal import decode_image, encode_png


@pytest.mark.parametrize("dims", [(1, 1), (3, 2), (7, 9), (13, 5), (16, 16)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_adam7_rgb_roundtrip(dims, filter_type):
    w, h = dims
    rng = np.random.default_rng(w * 100 + filter_type)
    rgb = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    gw, gh, out = decode_image(
        encode_png(rgb, w, h, filter_type=filter_type, interlace=True)
    )
    assert (gw, gh) == (w, h)
    assert out == rgb


@pytest.mark.parametrize("interlace", [False, True])
def test_16bit_high_byte_strip(interlace):
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, 11 * 6 * 3, dtype=np.uint8).tobytes()
    _, _, out = decode_image(
        encode_png(rgb, 11, 6, filter_type=4, interlace=interlace, bit_depth=16)
    )
    assert out == rgb  # encoder writes v*257, decoder strips high byte


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_subbyte_gray_scaling(depth, interlace):
    rng = np.random.default_rng(depth)
    q = rng.integers(0, 1 << depth, 9 * 7, dtype=np.uint8)
    _, _, out = decode_image(
        encode_png(q.tobytes(), 9, 7, gray=True, interlace=interlace,
                   bit_depth=depth)
    )
    exp = np.repeat(
        (q.astype(np.int64) * 255 // ((1 << depth) - 1)).astype(np.uint8), 3
    ).tobytes()
    assert out == exp


def test_depth_colortype_legality():
    with pytest.raises(ValueError, match="bit depth"):
        encode_png(b"\x00" * 12, 2, 2, bit_depth=4)  # sub-byte RGB
    with pytest.raises(ValueError, match="range"):
        encode_png(bytes([16] * 4), 2, 2, gray=True, bit_depth=4)
    # decoder rejects illegal depth/color-type combos in IHDR
    blob = bytearray(encode_png(b"\x00" * 12, 2, 2))
    blob[24] = 3  # bit depth 3 is never legal
    with pytest.raises(ValueError, match="bit depth"):
        decode_image(bytes(blob))


def test_new_paths_fuzz_never_escape():
    rng = np.random.default_rng(5)
    blobs = [
        encode_png(rng.integers(0, 256, 8 * 8 * 3, dtype=np.uint8).tobytes(),
                   8, 8, filter_type=3, interlace=True),
        encode_png(rng.integers(0, 256, 8 * 8 * 3, dtype=np.uint8).tobytes(),
                   8, 8, filter_type=4, bit_depth=16),
        encode_png(rng.integers(0, 16, 8 * 8, dtype=np.uint8).tobytes(),
                   8, 8, gray=True, bit_depth=4, interlace=True),
    ]
    r = random.Random(13)
    for blob in blobs:
        for cut in range(0, len(blob), 3):
            try:
                decode_image(blob[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(800):
            m = bytearray(blob)
            i = r.randrange(len(m))
            m[i] ^= 1 << r.randrange(8)
            try:
                decode_image(bytes(m))
            except (ValueError, NotImplementedError):
                pass
