"""WARC ingest adapter: write -> read roundtrip, gzip handling, and
integration with the downstream html pipeline."""

import os

from pyspark.sql import functions as F


def _mk_records(pages, n):
    from sketch_spark.sources.pages import wrap_html

    recs = []
    for i, row in pages.head(n).iterrows():
        date = str(row.warc_ts).replace(" ", "T") + "Z"
        recs.append((row.url, date, wrap_html(row.url, row.text)))
    return recs


def test_warc_roundtrip_and_extraction(spark, pages_pdf, tmp_path):
    from sketch_spark.sources.warc import read_warc, write_warc
    from sketch_spark.sources.pages import extract_text_col

    pages, _ = pages_pdf
    recs = _mk_records(pages, 120)
    # three archives, one gzipped — the unit of parallelism is the file
    write_warc(str(tmp_path / "a.warc"), recs[:40])
    write_warc(str(tmp_path / "b.warc"), recs[40:80])
    write_warc(str(tmp_path / "c.warc.gz"), recs[80:], compress=True)

    df = read_warc(spark, str(tmp_path) + "/*.warc*")
    got = df.toPandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 120
    by_url = {r[0]: r[2] for r in recs}
    for _, row in got.head(20).iterrows():
        assert bytes(row.html) == by_url[row.url]
    assert got.warc_ts.notna().all()

    # downstream pipeline runs unchanged on the ingested table
    ext = df.select(
        "url", F.decode(extract_text_col("html"), "UTF-8").alias("text")
    ).toPandas()
    src_text = dict(zip(pages.url, pages.text))
    for _, row in ext.head(20).iterrows():
        assert row.text == src_text[row.url]


def test_parse_warc_tolerates_lf_and_extra_headers():
    from sketch_spark.sources.warc import parse_warc_bytes

    raw = (
        b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://x/\n"
        b"WARC-Date: 2025-07-01T00:00:00Z\nX-Extra: 1\nContent-Length: 5\n\n"
        b"hello\n\n"
        b"WARC/1.0\nWARC-Type: request\nContent-Length: 3\n\nGET\n\n"
        b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://y/\n"
        b"WARC-Date: 2025-07-02T00:00:00Z\nContent-Length: 2\n\nhi\n\n"
    )
    recs = parse_warc_bytes(raw)
    # request records skipped; responses parsed with exact payloads
    assert [(u, p) for u, _, p in recs] == [("http://x/", b"hello"), ("http://y/", b"hi")]


def test_parse_lf_record_with_crlfcrlf_in_payload():
    """An LF-separated record whose payload contains CRLFCRLF must not
    be split at the payload bytes."""
    from sketch_spark.sources.warc import parse_warc_bytes

    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>x</html>"
    raw = (
        b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://a/\n"
        b"WARC-Date: 2025-07-01T00:00:00Z\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\n\n"
        + payload + b"\n\n"
        b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://b/\n"
        b"WARC-Date: 2025-07-02T00:00:00Z\nContent-Length: 2\n\nhi\n\n"
    )
    recs = parse_warc_bytes(raw)
    assert [(u, p) for u, _, p in recs] == [("http://a/", payload), ("http://b/", b"hi")]
