"""Catalyst html wrap/extract byte-identity and the Iceberg adapter seam."""

import pytest

from pyspark.sql import functions as F


NASTY = [
    "plain text",
    "amp & lt < gt > mixed",
    "&amp; pre-escaped &lt;tag&gt; stays distinct",
    "unicode éß中文 mixed & <b>bold</b>",
    "</p></body></html> marker inside text &",
    "",
]


def test_extract_text_col_inverts_wrap_python(spark):
    from sketch_spark.sources.pages import extract_text_bytes, wrap_html

    rows = [(i, f"https://h{i}.example.com/&<>", t) for i, t in enumerate(NASTY)]
    # Python wrap (the generator's exact bytes) -> Catalyst extract
    wrapped = [(i, bytearray(wrap_html(u, t)), t) for i, u, t in rows]
    df = spark.createDataFrame(wrapped, "doc_id long, html binary, text string")
    from sketch_spark.sources.pages import extract_text_col

    out = df.select(
        "doc_id",
        F.decode(extract_text_col("html"), "UTF-8").alias("extracted"),
        "text",
    ).collect()
    for r in out:
        assert r.extracted == r.text
    # and the Python extractor agrees bytewise
    for i, html, t in wrapped:
        assert extract_text_bytes(bytes(html)) == t.encode()


def test_wrap_html_col_matches_python(spark):
    from sketch_spark.sources.pages import wrap_html, wrap_html_col

    rows = [(f"https://h{i}.example.com/&<>", t) for i, t in enumerate(NASTY)]
    df = spark.createDataFrame(rows, "url string, text string")
    got = df.select(wrap_html_col("url", "text").alias("html"), "url", "text").collect()
    for r in got:
        assert bytes(r.html) == wrap_html(r.url, r.text)


def test_extract_text_col_on_generated_pages(spark, pages_dir):
    from sketch_spark.sources.pages import extract_text_col, load_pages

    df = load_pages(spark, pages_dir).limit(200)
    mism = df.select(
        (F.md5(extract_text_col("html")) == F.md5(F.encode("text", "UTF-8"))).alias("ok")
    ).filter(~F.col("ok"))
    assert mism.count() == 0


def test_iceberg_adapter_dispatch(spark, pages_dir):
    from sketch_spark.sources.pages import iceberg_available, load_pages, write_pages_table

    # sandbox has no Iceberg runtime jar: the seam must fail loudly, not
    # with a ClassNotFound deep inside a scan
    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        load_pages(spark, "cat.db.pages", catalog="iceberg")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_pages_table(spark, load_pages(spark, pages_dir), "cat.db.pages", catalog="iceberg")
    with pytest.raises(ValueError, match="unknown catalog"):
        load_pages(spark, pages_dir, catalog="delta")
    # default path unchanged
    assert load_pages(spark, pages_dir, catalog="parquet").count() > 0


def test_dedup_corpus_accepts_precomputed_pairs(spark):
    from sketch_spark.operators.dedup import dedup_corpus

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    # chain 0-1-2 plus pair 4-5: survivors are 0, 3, 4
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = dedup_corpus(docs, "doc_id", "text", pairs=pairs)
    assert sorted(r.doc_id for r in out.collect()) == [0, 3, 4]
