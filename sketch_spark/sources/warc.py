"""WARC ingest: Common Crawl's native archive format as a Spark source.

The reference consumes pre-extracted FASTA files; a Common-Crawl-style
pipeline starts one step earlier, at WARC archives.  This adapter turns
a directory of ``.warc`` / ``.warc.gz`` files into the pages-table
schema (url, warc_ts, html:binary) so everything downstream (metadata,
extraction, sketches, dedup) runs unchanged.

Execution shape: ``binaryFile`` rows (one per archive file) are parsed
per-file inside ``mapInArrow`` — record parsing is sequential within a
file (WARC is a concatenated-record format), so the unit of parallelism
is the archive file, exactly how Common Crawl ships data (~1 GB
segments, tens of thousands per crawl: ample parallelism).  For
archives larger than executor memory, point the reader at CC's
per-record offset indexes (cdx) instead and fetch ranges; this adapter
covers the self-contained-file case the sandbox can test.

Writer note: ``write_warc`` emits minimal spec-conformant WARC/1.0
response records (used by tests and local fixtures); gzip output is
whole-file (python gzip decompresses multi-member streams too, so
per-record-member CC files also parse).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

import numpy as np
import pyarrow as pa

__all__ = ["write_warc", "parse_warc_bytes", "read_warc"]

_CRLF = b"\r\n"


def write_warc(
    path: str,
    records: Iterable[tuple[str, str, bytes]],
    compress: bool = False,
) -> str:
    """Write (url, iso8601_date, payload) records as WARC/1.0 responses."""
    buf = io.BytesIO()
    for url, date, payload in records:
        headers = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + url.encode(),
            b"WARC-Date: " + date.encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        buf.write(_CRLF.join(headers) + _CRLF + _CRLF)
        buf.write(payload)
        buf.write(_CRLF + _CRLF)
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
    return path


def parse_warc_bytes(data: bytes) -> list[tuple[str, str, bytes]]:
    """(url, date, payload) per response record; tolerant of extra
    headers, LF-only separators, and multi-member gzip input."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        # take the NEARER of the two separator conventions: searching
        # CRLFCRLF first across the whole buffer would mis-split an
        # LF-separated record whose payload happens to contain CRLFCRLF
        crlf_end = data.find(_CRLF + _CRLF, start)
        lf_end = data.find(b"\n\n", start)
        if crlf_end < 0 and lf_end < 0:
            break
        if lf_end < 0 or (0 <= crlf_end <= lf_end):
            hdr_end, sep_len = crlf_end, 4
        else:
            hdr_end, sep_len = lf_end, 2
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].splitlines()[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + sep_len
        payload = data[body_start : body_start + length]
        if headers.get("warc-type", "response") == "response":
            out.append(
                (headers.get("warc-target-uri", ""), headers.get("warc-date", ""), payload)
            )
        pos = body_start + length
    return out


def read_warc(spark, path: str):
    """DataFrame (url, warc_ts, html:binary) from .warc/.warc.gz files.

    One ``binaryFile`` row per archive; records parsed per file in a
    single Arrow pass.  Only ``content`` is read (binaryFile prunes the
    path/length columns at the scan)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls, dates, payloads = [], [], []
            for blob in batch.column(0):
                for url, date, payload in parse_warc_bytes(blob.as_py()):
                    urls.append(url)
                    dates.append(date)
                    payloads.append(payload)
            # WARC-Date is UTC with a trailing Z; numpy deprecates
            # timezone-aware datetime64 parsing, so strip the suffix
            clean = [d[:-1] if d.endswith("Z") else d for d in dates]
            ts = np.array(clean, dtype="datetime64[us]") if clean else np.array([], dtype="datetime64[us]")
            yield pa.RecordBatch.from_pydict(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(ts, pa.timestamp("us")),
                    "html": pa.array(payloads, pa.binary()),
                }
            )

    return files.mapInArrow(run, "url string, warc_ts timestamp, html binary")
