"""End-to-end emerging heavy hitters vs brute force (SURVEY.md §5.2 L3)
plus the input_hint byte-identical text-extraction invariant."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sketch_spark.operators.emerging import emerging_heavy_hitters
from sketch_spark.sources.pages import extract_text_bytes, load_pages

from tests.conftest import exact_token_counts

THRESHOLD = 150
GROWTH = 2.0


def brute_force(pages: pd.DataFrame, mode: str):
    test = exact_token_counts(pages[pages.window == "test"]["text"])
    ctrl = exact_token_counts(pages[pages.window == "control"]["text"])
    out = {}
    for tok, cnt in test.items():
        if cnt >= THRESHOLD and cnt / GROWTH > ctrl.get(tok, 0):
            out[tok] = cnt
    return out


@pytest.fixture(scope="module")
def split(spark, pages_dir):
    df = load_pages(spark, pages_dir)
    return (
        df.filter(F.col("window") == "test"),
        df.filter(F.col("window") == "control"),
    )


def test_exact_mode_matches_brute_force(spark, split, pages_pdf):
    pages, sidecar = pages_pdf
    test_df, ctrl_df = split
    result = emerging_heavy_hitters(
        test_df, ctrl_df, "text", threshold=THRESHOLD, growth=GROWTH, mode="exact"
    ).toPandas()
    expected = brute_force(pages, "exact")
    got = dict(zip(result["token"], result["freq"]))
    assert got == expected
    # every planted emerging token above threshold must appear;
    # every planted stable token must be filtered by control subtraction
    for _, row in sidecar.iterrows():
        tok = row["token"]
        should = row["test_count"] >= THRESHOLD and row["test_count"] / GROWTH > row["control_count"]
        # organic zipf noise can add occurrences on top of planted counts
        if should:
            assert tok in got, f"planted emerging token {tok} missing"
            assert got[tok] >= row["test_count"]
        if row["test_count"] == row["control_count"]:
            assert tok not in got, f"stable token {tok} must not emerge"


def test_reference_mode_superset_and_bounds(spark, split, pages_pdf):
    """Reference semantics: freq is the sketch estimate — never below
    the exact count, and the result set contains every exact-mode row
    whose estimate passes the same predicates."""
    pages, _ = pages_pdf
    test_df, ctrl_df = split
    result = emerging_heavy_hitters(
        test_df, ctrl_df, "text", threshold=THRESHOLD, growth=GROWTH, mode="reference"
    ).toPandas()
    test_counts = exact_token_counts(pages[pages.window == "test"]["text"])
    for _, r in result.iterrows():
        assert r["freq"] >= test_counts.get(r["token"], 0)
        assert r["freq"] >= THRESHOLD
        assert r["freq"] / GROWTH > r["control_count"]
    # with w=2^14 over this tiny vocab the estimates are near-exact:
    # reference mode should equal brute force here
    expected = brute_force(pages, "exact")
    assert set(result["token"]) == set(expected)


def test_extract_text_byte_identical(pages_pdf):
    """input_hint invariant: extract_text(html) == text, byte for byte."""
    pages, _ = pages_pdf
    for html, text in zip(pages["html"], pages["text"]):
        assert extract_text_bytes(html) == text.encode()


def test_extract_text_spark_side(spark, pages_dir):
    """Same invariant exercised through the Spark plan (Arrow UDF)."""
    import pyarrow as pa
    from typing import Iterator

    from sketch_spark.sources.pages import extract_text_bytes as ext

    df = load_pages(spark, pages_dir)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            html = b.column(0).to_pylist()
            text = b.column(1).to_pylist()
            ok = [ext(h) == t.encode() for h, t in zip(html, text)]
            yield pa.RecordBatch.from_pydict({"ok": pa.array(ok)})

    res = df.select("html", "text").mapInArrow(run, "ok boolean").agg(
        F.min("ok").alias("all_ok")
    ).collect()
    assert res[0]["all_ok"] is True


def test_emerging_bigrams_exact_matches_brute_force(spark, split, pages_pdf):
    """Multi-length analogue (reference k-mer lengths -> word n-grams):
    emerging bigram detection, exact mode vs pandas brute force."""
    pages, _ = pages_pdf
    test_df, ctrl_df = split
    thr = 60
    result = emerging_heavy_hitters(
        test_df, ctrl_df, "text", threshold=thr, growth=GROWTH, mode="exact", ngram=2
    ).toPandas()

    def bigram_counts(texts):
        from collections import Counter

        c = Counter()
        for t in texts:
            toks = t.split()
            c.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
        return c

    tc = bigram_counts(pages[pages.window == "test"]["text"])
    cc = bigram_counts(pages[pages.window == "control"]["text"])
    expected = {
        g: n for g, n in tc.items() if n >= thr and n / GROWTH > cc.get(g, 0)
    }
    got = dict(zip(result["token"], result["freq"]))
    assert got == expected
    assert len(expected) > 0, "fixture produced no emerging bigrams; lower thr"


def test_bloom_semi_join(spark, sf01):
    """Bloom pre-filter + exact semi-join == plain semi-join; approximate
    mode is a superset with FPR-bounded extras."""
    import os

    from sketch_spark.operators.emerging import bloom_semi_join

    li = spark.read.parquet(os.path.join(sf01, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf01, "orders.parquet")).filter(
        F.col("o_totalprice") > 150000
    )
    keys = orders.select(F.col("o_orderkey").alias("l_orderkey"))

    exact = li.join(keys.distinct(), "l_orderkey", "left_semi")
    via_bloom = bloom_semi_join(li, keys, "l_orderkey", log2_bits=20)
    a = sorted(r.l_orderkey for r in exact.select("l_orderkey").collect())
    b = sorted(r.l_orderkey for r in via_bloom.select("l_orderkey").collect())
    assert a == b and len(a) > 0

    approx = bloom_semi_join(li, keys, "l_orderkey", log2_bits=20, exact=False)
    n_approx = approx.count()
    assert n_approx >= len(a)
    assert n_approx <= len(a) * 1.01 + 50  # FPR-bounded superset
