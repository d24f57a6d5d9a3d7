"""Composed corpus filter (operators/filtering.py): every gate fires on
a crafted doc, reasons order is rule order, keep iff no gate fails."""

import pytest

from sketch_spark.operators.filtering import corpus_filter, default_web_rules


@pytest.fixture(scope="module")
def crafted(spark):
    long_ok = " ".join(f"w{i}" for i in range(30))            # 30 distinct tokens
    too_long = " ".join(f"w{i}" for i in range(120))          # > 100 tokens
    low_distinct = " ".join(["a b c d e f g h i j"] * 3)      # 30 toks, 10 distinct
    top_heavy = "spam " * 9 + " ".join(f"u{i}" for i in range(21))  # 30 toks, 9 spam
    short = " ".join(f"s{i}" for i in range(10))  # 10 distinct: only length fails
    rows = [
        (0, long_ok),
        (1, too_long),
        (2, low_distinct),
        (3, top_heavy),
        (4, short),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_each_gate_fires(spark, crafted):
    got = {r["doc_id"]: r for r in corpus_filter(crafted).collect()}
    assert got[0]["keep"] and got[0]["reasons"] == ""
    assert got[1]["reasons"] == "too_long"
    assert got[2]["reasons"] == "low_distinct"
    assert got[3]["reasons"] == "top_token"
    assert got[4]["reasons"] == "too_short"
    assert not any(got[i]["keep"] for i in (1, 2, 3, 4))


def test_combined_reasons_in_rule_order(spark):
    # 10 tokens, all identical: too_short + low_distinct + top_token,
    # joined in rule (insertion) order
    df = spark.createDataFrame([(0, "x " * 9 + "x")], "doc_id long, text string")
    r = corpus_filter(df).collect()[0]
    assert r["reasons"] == "too_short,low_distinct,top_token"
    assert not r["keep"]


def test_custom_rules(spark, crafted):
    from pyspark.sql import functions as F

    rules = {"has_spam": F.array_contains(F.split(F.col("text"), " "), "spam")}
    got = {r["doc_id"]: r for r in corpus_filter(crafted, rules=rules).collect()}
    assert got[3]["reasons"] == "has_spam"
    assert all(got[i]["keep"] for i in (0, 1, 2, 4))


def test_clean_corpus_filters_then_dedups(spark):
    from sketch_spark.operators.filtering import clean_corpus

    ok = " ".join(f"w{i}" for i in range(30))
    ok2 = " ".join(f"v{i}" for i in range(30))
    bad = "x " * 29 + "x"  # low_distinct + top_token
    rows = [(0, ok), (1, ok), (2, ok2), (3, bad), (4, bad), (5, ok)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in clean_corpus(df).collect())
    # bad docs gated out; dup content keeps the lowest id only
    assert got == [0, 2]


def test_clean_corpus_dedups_after_gates_not_before(spark):
    from sketch_spark.operators.filtering import clean_corpus

    # doc 0 (bad) shares content with nothing kept; doc 1 and 2 share
    # content where the lower id is GATED — survivor must be doc 2,
    # i.e. dedup runs on the post-filter stream
    ok = " ".join(f"w{i}" for i in range(30))
    rows = [(1, "x " * 29 + "x"), (2, ok), (3, ok)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in clean_corpus(df).collect())
    assert got == [2]


def test_rules_are_pure_catalyst(spark, crafted):
    plan = corpus_filter(crafted)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "FlatMapGroupsInPandas"):
        assert marker not in plan
    assert "Exchange" not in plan  # map-only: no shuffle anywhere


def test_normalize_text_col(spark):
    from sketch_spark.functions.text import normalize_text_col

    rows = [
        (0, "  Élan \t CAFÉ  über  "),
        (1, "Ñoño\n\nýÿ  ç"),
        (2, "plain ascii"),
        (3, "ßharp"),  # ß is not an accent — must survive the fold
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["norm"]
        for r in df.select("doc_id", normalize_text_col("text").alias("norm")).collect()
    }
    assert got[0] == "elan cafe uber"
    assert got[1] == "nono yy c"
    assert got[2] == "plain ascii"
    assert got[3] == "ßharp"
    # idempotent: normalizing a normalized string is a no-op
    df2 = spark.createDataFrame([(0, got[0])], "doc_id long, text string")
    assert df2.select(normalize_text_col("text").alias("n")).collect()[0]["n"] == got[0]


def test_passage_duplicates_planted_and_banded(spark):
    """A copied >=k+window-1-word passage pairs its two hosts; the same
    span pasted into MANY docs (boilerplate) is df-banded out; unique
    spans never pair."""
    from sketch_spark.operators.dedup import passage_duplicates

    # comfortably past k+window-1 = 12 words so the shared span yields
    # >= min_shared distinct fingerprints under any window alignment
    passage = " ".join(f"p{i}" for i in range(30))
    boiler = " ".join(f"b{i}" for i in range(30))
    def filler(tag, n=20):
        return " ".join(f"{tag}{i}" for i in range(n))

    rows = [
        (0, filler("a") + " " + passage + " " + filler("c")),
        (1, filler("d") + " " + passage + " " + filler("e")),
        (2, filler("f")),
    ]
    # boilerplate span in 6 docs, max_df=5 -> banded out entirely
    rows += [(10 + i, filler(f"g{i}") + " " + boiler) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = passage_duplicates(df, k=5, window=8, min_shared=2, max_df=5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (0, 1) in pairs
    assert all(a < 10 and b < 10 for a, b in pairs), pairs  # no boiler pairs
    n_shared = {(r["id_a"], r["id_b"]): r["n_shared"] for r in got}[(0, 1)]
    assert n_shared >= 2
    # raising the band admits the boilerplate cluster
    wide = passage_duplicates(df, k=5, window=8, min_shared=2, max_df=20).collect()
    wide_pairs = {(r["id_a"], r["id_b"]) for r in wide}
    assert (10, 11) in wide_pairs and len(wide_pairs) > len(pairs)


def test_winnow_df_form_equals_column_form(spark, sf001):
    """The staged winnow_fingerprints_df must emit exactly the Column
    form's (id, fp) multiset for both window shapes (power-of-two and
    not)."""
    import os

    from pyspark.sql import functions as F

    from sketch_spark.functions.text import (
        winnow_fingerprints_col,
        winnow_fingerprints_df,
    )

    docs = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    for k, w in ((5, 8), (3, 4), (2, 5)):
        a = docs.select(
            F.col("doc_id").alias("id"),
            F.explode(winnow_fingerprints_col("text", k, w)).alias("fp"),
        )
        b = winnow_fingerprints_df(docs, "text", "doc_id", k, w)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (k, w)


def test_normalize_matches_python_reference_randomized(spark):
    """One Spark job over 300 seeded-random strings vs an exact Python
    reference of the same pipeline (ASCII whitespace only: Java's \\s is
    ASCII where Python's is Unicode)."""
    import random
    import re

    from sketch_spark.functions.text import (
        _ACCENT_FROM,
        _ACCENT_TO,
        normalize_text_col,
    )

    table = str.maketrans(_ACCENT_FROM, _ACCENT_TO)

    def ref(s: str) -> str:
        return re.sub(r"[ \t\n\x0b\f\r]+", " ", s.lower().translate(table)).strip()

    rng = random.Random(7)
    alphabet = "aBcZ09.,!ÉéÀàÑñÇçÜüÝý ß\t\n\r "
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", normalize_text_col("text").alias("n")).collect()
    }
    for i, s in rows:
        assert got[i] == ref(s), (i, repr(s), repr(got[i]), repr(ref(s)))
        assert ref(ref(s)) == ref(s)  # idempotent reference


def test_source_quality_report(spark):
    from sketch_spark.operators.filtering import source_quality_report

    ok = " ".join(f"w{i}" for i in range(30))
    bad = "x " * 29 + "x"
    rows = [
        (0, "A", ok), (1, "A", ok), (2, "A", bad),   # 1 dup, 2/3 keep
        (3, "B", bad), (4, "B", bad),                 # all fail, 1 dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in source_quality_report(df).collect()}
    a, b = got["A"], got["B"]
    assert a["n_docs"] == 3 and a["n_keep"] == 2 and a["keep_rate"] == round(2 / 3, 4)
    assert a["n_exact_dups"] == 1 and a["avg_tokens"] == 30.0
    assert b["n_docs"] == 2 and b["n_keep"] == 0 and b["keep_rate"] == 0.0
    # dup flags are corpus-wide, not per-source: the canonical copy of
    # the shared text is doc 2 (source A), so BOTH B docs count as dups
    assert b["n_exact_dups"] == 2
