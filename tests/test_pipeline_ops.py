"""Round-3 pipeline operators: repetition metrics, PII scan/redaction,
URL normalization (hand-computed fixtures; the DuckDB contract oracles
cover the corpus-scale equivalence)."""

import pytest
from pyspark.sql import functions as F


def test_repetition_columns_hand_computed(spark):
    from sketch_spark.functions.text import repetition_columns

    df = spark.createDataFrame(
        [
            # 6 tokens, 3 distinct -> dup_token 0.5; bigrams: "a b","b a","a b","b c","c a"
            # distinct 4 of 5 -> dup_2gram 1/5; trigrams all distinct -> 0;
            # top token "a" x3 of 6
            (1, "a b a b c a"),
            # all distinct
            (2, "x y z"),
            # single token: no bigrams (guard branch), top ratio 1.0
            (3, "solo"),
            # fully repeated
            (4, "w w w w"),
        ],
        ["doc_id", "text"],
    )
    rc = repetition_columns("text")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(k) for k, c in rc.items()]
        ).collect()
    }
    r1 = rows[1]
    assert r1["dup_token_ratio"] == pytest.approx(0.5)
    assert r1["dup_2gram_ratio"] == pytest.approx(round(1 - 4 / 5, 4))
    assert r1["dup_3gram_ratio"] == 0.0
    assert r1["top_token_ratio"] == pytest.approx(0.5)
    assert rows[2]["dup_token_ratio"] == 0.0
    assert rows[2]["top_token_ratio"] == pytest.approx(round(1 / 3, 4))
    assert rows[3]["dup_2gram_ratio"] == 0.0
    assert rows[3]["top_token_ratio"] == 1.0
    r4 = rows[4]
    assert r4["dup_token_ratio"] == 0.75
    assert r4["dup_2gram_ratio"] == pytest.approx(round(1 - 1 / 3, 4))
    assert r4["top_token_ratio"] == 1.0


def test_pii_scan_and_redact(spark):
    from sketch_spark.functions.pii import pii_columns, redact_pii_col

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@foo.co.uk or bob@x.io, call +1-555-0199"),
            (2, "server 192.168.1.1 and 10.0.0.2 no contacts"),
            (3, "clean text only"),
        ],
        ["doc_id", "text"],
    )
    pc = pii_columns("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[c.alias(k) for k, c in pc.items()],
            redact_pii_col("text").alias("red"),
        ).collect()
    }
    assert out[1]["n_emails"] == 2
    assert out[1]["first_email"] == "a.b+c@foo.co.uk"
    assert out[1]["n_phones"] == 1
    assert out[1]["red"] == "mail me at <EMAIL> or <EMAIL>, call <PHONE>"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["red"] == "server <IP> and <IP> no contacts"
    assert out[3]["n_emails"] == out[3]["n_phones"] == out[3]["n_ipv4"] == 0
    assert out[3]["first_email"] is None
    assert out[3]["red"] == "clean text only"


def test_url_normalize_branches(spark):
    from sketch_spark.functions.urls import (
        host_col,
        normalize_url_col,
        registered_domain_col,
    )

    cases = [
        # case-fold, default port, fragment, tracking strip, param sort
        (1, "HTTPS://WWW.News.Example.COM:443/a/B?z=1&utm_source=x&a=2#top",
         "https://www.news.example.com/a/B?a=2&z=1",
         "www.news.example.com", "example.com"),
        # empty path -> "/", all params tracked -> no query
        (2, "http://Foo.IO?utm_campaign=c&ref=rss",
         "http://foo.io/", "foo.io", "foo.io"),
        # non-default port kept
        (3, "https://h.example.org:8443/x", "https://h.example.org:8443/x",
         "h.example.org", "example.org"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, *_ in cases], ["doc_id", "url"])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            normalize_url_col("url").alias("norm"),
            host_col("url").alias("host"),
            registered_domain_col("url").alias("dom"),
        ).collect()
    }
    for i, _, norm, host, dom in cases:
        assert out[i]["norm"] == norm, (i, out[i]["norm"])
        assert out[i]["host"] == host
        assert out[i]["dom"] == dom


def test_token_chunks_matches_bruteforce_and_partitioning_invariant(spark):
    import numpy as np

    from sketch_spark.operators.packing import token_chunks

    rng = np.random.default_rng(3)
    docs = [
        (int(i), " ".join(f"t{rng.integers(0, 50)}" for _ in range(int(rng.integers(1, 40)))))
        for i in rng.permutation(80)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    L = 64

    # brute force in python over doc_id order
    by_id = sorted((i, len(t.split())) for i, t in docs)
    off, want = 0, {}
    for i, n in by_id:
        want[i] = (n, off, off // L, max((off + n - 1) // L, off // L))
        off += n

    for variant in (df, df.repartition(7), df.coalesce(1)):
        rows = {
            r["doc_id"]: r
            for r in token_chunks(variant, "text", "doc_id", chunk_size=L).collect()
        }
        assert len(rows) == len(want)
        for i, (n, so, fc, lc) in want.items():
            r = rows[i]
            assert (r["n_tokens"], r["start_off"], r["first_chunk"], r["last_chunk"]) == (
                n, so, fc, lc,
            )
            assert r["n_chunks"] == lc - fc + 1


def test_global_prefix_sum_no_global_window_on_data(spark):
    """The doc-scale window must be bucket-partitioned; only the P-row
    totals side may use an unpartitioned window."""
    from sketch_spark.operators.packing import global_prefix_sum

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit(3).alias("n")
    )
    out = global_prefix_sum(df, "n", "doc_id", n_buckets=8)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data-side window partitions by bucket and orders by id:
    # Window [...], [_bkt#..], [doc_id#.. ASC ...]
    assert re.search(r"\[_bkt#\d+L?\], \[doc_id#\d+L? ASC", plan), plan
    assert out.filter(F.col("doc_id") == 999).collect()[0]["prefix"] == 999 * 3


def test_pipeline_columns_stay_catalyst(spark):
    """Repetition / PII / URL columns must stay whole-stage-codegen
    Catalyst expressions — no Python eval node anywhere in the plan."""
    from sketch_spark.functions.pii import pii_columns, redact_pii_col
    from sketch_spark.functions.text import repetition_columns
    from sketch_spark.functions.urls import normalize_url_col

    df = spark.createDataFrame([(1, "a b", "http://x.io/p?a=1")],
                               ["doc_id", "text", "url"])
    sel = df.select(
        *[c.alias(k) for k, c in repetition_columns("text").items()],
        *[c.alias(k) for k, c in pii_columns("text").items()],
        redact_pii_col("text").alias("red"),
        normalize_url_col("url").alias("norm"),
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "FlatMapGroupsInPandas"):
        assert marker not in plan, plan


def test_contamination_report_matches_bruteforce(spark):
    """Decontamination scan equals the brute-force python n-gram
    overlap; plan broadcasts the eval grams and keeps everything in
    codegen (no Python eval node)."""
    import numpy as np

    from sketch_spark.operators.dedup import contamination_report

    rng = np.random.default_rng(11)
    docs = [
        (int(i), " ".join(f"w{rng.integers(0, 30)}" for _ in range(int(rng.integers(2, 25)))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    train = df.filter(F.col("doc_id") % 10 != 0)
    test = df.filter(F.col("doc_id") % 10 == 0)

    def grams(t, n=4):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    eval_grams = set().union(*(grams(t) for i, t in docs if i % 10 == 0))
    want = {
        i: len(grams(t) & eval_grams)
        for i, t in docs
        if i % 10 != 0 and grams(t) & eval_grams
    }

    out = contamination_report(train, test, "text", "doc_id", n=4)
    got = {r["doc_id"]: r["n_shared"] for r in out.collect()}
    assert got == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, plan


def test_kmv_set_similarity_exact_and_estimated(spark):
    """Small unions (< k) are EXACT: est_jaccard == true Jaccard and
    est_union == |A u B|.  With k capped below the union size the
    estimate must land within the sketch's RSE envelope."""
    from pyspark.sql import functions as F

    from sketch_spark.operators.sampling import kmv_set_similarity

    # A = 0..599, B = 300..899  ->  |A u B| = 900, J = 300/900 = 1/3
    rows = [("a", f"v{i}") for i in range(600)] + [
        ("b", f"v{i}") for i in range(300, 900)
    ]
    df = spark.createDataFrame(rows, "g string, v string")

    exact = kmv_set_similarity(df, "v", "g", k=2048, seed=1).collect()[0]
    assert exact["ga"] == "a" and exact["gb"] == "b"
    assert exact["est_union"] == 900.0
    assert exact["est_jaccard"] == round(300 / 900, 4)
    assert exact["n_both"] == 300

    est = kmv_set_similarity(df, "v", "g", k=256, seed=1).collect()[0]
    # RSE ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est["est_union"] - 900) / 900 < 0.25
    assert abs(est["est_jaccard"] - 1 / 3) < 4 * (1 / 3) / (256 - 2) ** 0.5 + 0.05


def test_kmv_set_similarity_disjoint_and_identical(spark):
    from sketch_spark.operators.sampling import kmv_set_similarity

    rows = (
        [("a", f"x{i}") for i in range(200)]
        + [("b", f"y{i}") for i in range(200)]
        + [("c", f"x{i}") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = {(r["ga"], r["gb"]): r for r in kmv_set_similarity(df, "v", "g", k=512).collect()}
    assert got[("a", "b")]["est_jaccard"] == 0.0
    assert got[("a", "c")]["est_jaccard"] == 1.0  # identical sets
    assert got[("a", "c")]["est_union"] == 200.0
    assert ("b", "a") not in got  # ordered pairs only
