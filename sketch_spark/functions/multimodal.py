"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

Decode is REAL for self-describing uncompressed formats — PPM/PGM
(netpbm binary), 24-bit BMP, and PCM WAV — implemented in pure
python/numpy (no image library in this container) and hash-oracle-able
end-to-end (``pixel_md5`` is md5 over the RGB buffer's lowercase hex,
reproducible in ANSI SQL from the same bytes).  Compressed formats
(JPEG/PNG/GIF) keep a clearly-marked PIL/opencv swap point
(``NotImplementedError``) for clusters that have the libraries; the
deterministic fake feature extractor remains for plumbing tests over
arbitrary blobs.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "binary_metadata",
    "decode_image",
    "decode_images_df",
    "decode_wav",
    "decode_wavs_df",
    "resize_rgb",
    "fake_features",
    "extract_features_df",
    "resize_images_df",
    "sample_video_frames_df",
]

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<!DO": "html",
    b"%PDF": "pdf",
}


def _sniff(buf: bytes) -> str:
    for magic, kind in _MAGIC.items():
        if buf[: len(magic)] == magic:
            return kind
    return "unknown"


_PNM_WS = b" \t\r\n\x0b\x0c"


def _pnm_tokens(buf: bytes, pos: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens from a netpbm
    header starting at ``pos``; ``#`` comments run to end-of-line and
    count as whitespace (netpbm spec)."""
    out: list[int] = []
    while len(out) < n:
        while pos < len(buf) and (buf[pos : pos + 1] in (b"#",) or buf[pos] in _PNM_WS):
            if buf[pos : pos + 1] == b"#":
                nl = buf.find(b"\n", pos)
                pos = len(buf) if nl < 0 else nl + 1
            else:
                pos += 1
        start = pos
        while pos < len(buf) and buf[pos] not in _PNM_WS:
            pos += 1
        if pos == start:
            raise ValueError("truncated netpbm header")
        out.append(int(buf[start:pos]))
    return out, pos


def _decode_pnm(buf: bytes) -> tuple[str, int, int, bytes]:
    kind = "ppm" if buf[:2] == b"P6" else "pgm"
    (w, h, maxval), pos = _pnm_tokens(buf, 2, 3)
    if not (0 < maxval <= 255):
        raise ValueError(f"netpbm maxval {maxval} out of supported range (1-255)")
    pos += 1  # exactly ONE whitespace byte separates header from raster
    need = w * h * (3 if kind == "ppm" else 1)
    raster = buf[pos : pos + need]
    if len(raster) < need:
        raise ValueError(f"truncated {kind} raster: need {need} bytes, have {len(raster)}")
    if kind == "pgm":  # expand gray to RGB so every decoder yields one layout
        raster = np.repeat(np.frombuffer(raster, np.uint8), 3).tobytes()
    return kind, w, h, raster


def _decode_bmp(buf: bytes) -> tuple[str, int, int, bytes]:
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    w, h_raw = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got {bpp}-bit, "
            f"compression={compression}); swap in PIL for other variants"
        )
    top_down, h = h_raw < 0, abs(h_raw)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    body = buf[data_off : data_off + need]
    if len(body) < need:
        raise ValueError(f"truncated BMP body: need {need} bytes, have {len(body)}")
    rows = np.frombuffer(body, np.uint8).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        px = px[::-1]
    return "bmp", w, h, np.ascontiguousarray(px).tobytes()


def decode_image(buf: bytes) -> tuple[int, int, bytes]:
    """Decode an image blob to ``(width, height, rgb_bytes)`` — REAL
    pure-python/numpy decode for PPM (P6), PGM (P5), and uncompressed
    24-bit BMP.  JPEG/PNG/GIF are compressed formats whose decoders
    aren't in this container: they raise ``NotImplementedError`` with
    the documented PIL swap point (``PIL.Image.open(io.BytesIO(buf))``)
    so a cluster with the libraries can drop one in."""
    _, w, h, rgb = _decode_image_full(bytes(buf))
    return w, h, rgb


def _decode_image_full(buf: bytes) -> tuple[str, int, int, bytes]:
    if buf[:2] in (b"P6", b"P5"):
        return _decode_pnm(buf)
    if buf[:2] == b"BM":
        return _decode_bmp(buf)
    if buf[:3] == b"\xff\xd8\xff" or buf[:4] == b"\x89PNG" or buf[:4] == b"GIF8":
        raise NotImplementedError(
            "compressed image decode (jpeg/png/gif) requires PIL/opencv "
            "(not in this container); PPM/PGM/BMP decode natively"
        )
    raise ValueError(f"unrecognized image format (magic {buf[:4]!r})")


def decode_wav(buf: bytes) -> tuple[int, int, int, bytes]:
    """Parse a PCM WAV blob to ``(channels, sample_rate,
    bytes_per_sample, pcm_data)`` by walking RIFF chunks (word-aligned,
    unknown chunks skipped) — pure python, no audio library."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    channels = rate = bits = None
    data = None
    pos = 12
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", buf, pos + 8)
        elif cid == b"data":
            data = buf[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or data is None:
        raise ValueError("missing fmt/data chunk in WAVE buffer")
    return channels, rate, bits // 8, data


def resize_rgb(rgb: bytes, src_w: int, src_h: int, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a packed RGB buffer (floor index map
    ``src_i = (out_i * src) // out``) — deterministic integer-only
    sampling, so byte-reproducible across engines; identity dims are a
    byte-exact no-op."""
    if (src_w, src_h) == (out_w, out_h):
        return bytes(rgb)
    px = np.frombuffer(rgb, np.uint8).reshape(src_h, src_w, 3)
    ri = (np.arange(out_h) * src_h) // out_h
    ci = (np.arange(out_w) * src_w) // out_w
    return np.ascontiguousarray(px[ri][:, ci]).tobytes()


def decode_images_df(
    df: DataFrame,
    bin_col: str = "image",
    id_col: str = "url",
    resize_to: tuple[int, int] | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """REAL decode over an opaque image column (PPM/PGM/BMP): one row
    per image with parsed ``(width, height, format)`` and ``pixel_md5``
    = md5 over the decoded RGB buffer's lowercase hex.  Hex (not raw
    bytes) is hashed so an ANSI-SQL oracle can reproduce the value from
    the same source bytes without blob support.  ``resize_to=(w, h)``
    applies :func:`resize_rgb` before hashing (reported dims stay the
    SOURCE dims).  Embarrassingly parallel mapInPandas — no shuffle; at
    100 TB the cost is the scan + python decode, scaling with
    partitions.  ``on_error='skip'`` drops undecodable blobs instead of
    failing the job (corrupt blobs are a fact of life in web corpora)."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, fmts, md5s = [], [], [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                try:
                    fmt, w, h, rgb = _decode_image_full(bytes(b))
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                if resize_to is not None:
                    rgb = resize_rgb(rgb, w, h, *resize_to)
                ids.append(rid)
                ws.append(w)
                hs.append(h)
                fmts.append(fmt)
                md5s.append(hashlib.md5(rgb.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "format": fmts, "pixel_md5": md5s}
            )

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        run, f"{id_col} {id_ddl}, width int, height int, format string, pixel_md5 string"
    )


def decode_wavs_df(
    df: DataFrame, bin_col: str = "audio", id_col: str = "url", on_error: str = "raise"
) -> DataFrame:
    """REAL PCM WAV decode over an opaque audio column: per blob the
    parsed ``(channels, sample_rate, bytes_per_sample, n_pcm_bytes)``
    and ``pcm_md5`` = md5 over the PCM payload's lowercase hex (ANSI-SQL
    reproducible, same convention as :func:`decode_images_df`).
    Map-only, no shuffle."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, chs, rates, widths, nbytes, md5s = [], [], [], [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                try:
                    ch, rate, width, data = decode_wav(bytes(b))
                except ValueError:
                    if on_error == "raise":
                        raise
                    continue
                ids.append(rid)
                chs.append(ch)
                rates.append(rate)
                widths.append(width)
                nbytes.append(len(data))
                md5s.append(hashlib.md5(data.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "channels": chs,
                    "sample_rate": rates,
                    "bytes_per_sample": widths,
                    "n_pcm_bytes": nbytes,
                    "pcm_md5": md5s,
                }
            )

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        run,
        f"{id_col} {id_ddl}, channels int, sample_rate int, "
        "bytes_per_sample int, n_pcm_bytes int, pcm_md5 string",
    )


def fake_features(buf: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a decode->feature-extract step: a
    unit-norm float vector derived from the content digest.  Stable
    across processes/executors (hash-based, no RNG state)."""
    digest = hashlib.sha256(buf).digest()
    raw = np.frombuffer((digest * ((dim * 8) // len(digest) + 1))[: dim * 8], dtype=np.uint64)
    v = (raw % np.uint64(2**53)).astype(np.float64) / float(2**53) - 0.5
    n = np.linalg.norm(v)
    return v / (n if n else 1.0)


def binary_metadata(
    df: DataFrame, bin_col: str = "html", id_col: str = "url", id_type: str = "string"
) -> DataFrame:
    """Typed metadata over an opaque binary column as PURE Catalyst
    expressions — (id, n_bytes, content_md5, format) via ``F.length`` /
    ``F.md5`` / ``F.substring``+CASE, all whole-stage codegen'd
    JVM-side (no Python stage at all; mapInPandas is reserved for real
    decoders, see ``extract_features_df``).  ``id_type`` is retained
    for API compatibility; the id column keeps its input type.
    """
    c = F.col(bin_col)
    fmt = None
    for magic, kind in _MAGIC.items():
        cond = F.substring(c, 1, len(magic)) == F.lit(magic)
        fmt = F.when(cond, kind) if fmt is None else fmt.when(cond, kind)
    fmt = fmt.otherwise("unknown")
    return df.select(
        F.col(id_col),
        F.length(c).cast("long").alias("n_bytes"),
        F.md5(c).alias("content_md5"),
        fmt.alias("format"),
    )


def extract_features_df(
    df: DataFrame, bin_col: str = "html", id_col: str = "url", dim: int = 16
) -> DataFrame:
    """Decode->feature-extract plumbing with the deterministic fake
    extractor (see ``decode_image`` for the real-decoder swap point)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_features(bytes(b), dim).tolist() for b in pdf[bin_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, bin_col).mapInPandas(
        run, f"{id_col} string, features array<double>"
    )


def _fake_pixels(buf: bytes, width: int, height: int) -> bytes:
    """STUB pixel decode — deterministic digest-derived RGB buffer of the
    right size (no PIL/opencv in this container); the Spark plumbing
    around it (schema, batch shape, per-row sizing) is real."""
    need = width * height * 3
    digest = hashlib.sha256(buf).digest()
    return (digest * (need // len(digest) + 1))[:need]


def resize_images_df(
    df: DataFrame,
    bin_col: str = "image",
    id_col: str = "url",
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """Decode+resize plumbing over an opaque image column: one output
    row per image with typed (width, height, pixels:binary) — exactly
    the schema a PIL/opencv decoder would fill.  The decode itself is
    the clearly-marked ``_fake_pixels`` stub (swap for
    ``PIL.Image.open(io.BytesIO(buf)).resize((w, h)).tobytes()`` on a
    cluster with the libraries); everything Spark-side — column
    pruning, Arrow batching, fixed-size binary output — is real and
    tested, and the operator is embarrassingly parallel (mapInPandas,
    no shuffle)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": width,
                    "height": height,
                    "pixels": [_fake_pixels(bytes(b), width, height) for b in pdf[bin_col]],
                }
            )

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        run, f"{id_col} {id_ddl}, width int, height int, pixels binary"
    )


def sample_video_frames_df(
    df: DataFrame,
    bin_col: str = "video",
    id_col: str = "url",
    n_frames: int = 4,
    width: int = 32,
    height: int = 32,
) -> DataFrame:
    """Frame-sampling plumbing over an opaque video column: N output
    rows per input row, (id, frame_idx, frame:binary) — the row
    multiplication a real ffmpeg/av sampler produces, with the decode
    stubbed deterministically (frame i = digest-derived pixels of
    (buf, i)).  Partition behavior matters here: output is N x input
    rows but still shuffle-free; downstream per-frame feature
    extraction parallelizes over the same partitions."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for rid, buf in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(buf)
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(_fake_pixels(b + i.to_bytes(4, "little"), width, height))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        run, f"{id_col} {id_ddl}, frame_idx int, frame binary"
    )
