"""Hashed naive-Bayes classifier (operators/classifier.py).

Engine equality (Spark score == DuckDB replay) is the contract query
`nb_classifier`; here we test what the oracle can't: that the model
actually LEARNS (separable synthetic corpus -> ~perfect accuracy),
that scoring is a map-only plan, and weight-table invariants.
"""

import pyspark.sql.functions as F
import pytest

from sketch_spark.operators.classifier import nb_score, nb_train


@pytest.fixture(scope="module")
def toy(spark):
    """Separable two-class corpus: class 1 speaks {alpha..delta},
    class 0 speaks {zeta..theta}, with a shared stopword."""
    rows = []
    pos_v = ["alpha", "beta", "gamma", "delta"]
    neg_v = ["zeta", "eta", "theta", "iota"]
    for i in range(200):
        v = pos_v if i % 2 == 0 else neg_v
        toks = ["the"] + [v[(i * 7 + j) % 4] for j in range(12)]
        rows.append((i, " ".join(toks), i % 2 == 0))
    return spark.createDataFrame(rows, ["doc_id", "text", "y"])


def test_learns_separable_corpus(toy):
    w, b = nb_train(toy, F.col("y"), n_buckets=64)
    scored = nb_score(toy, w, b).select("doc_id", "pred", "y").toPandas()
    acc = (scored["pred"] == scored["y"].astype(int)).mean()
    assert acc == 1.0


def test_score_is_map_only(toy):
    w, b = nb_train(toy, F.col("y"), n_buckets=64)
    plan = nb_score(toy, w, b)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weights_shape_and_balance(toy):
    w, b = nb_train(toy, F.col("y"), n_buckets=32)
    assert len(w) == 32
    # weights/bias are fixed-point integers in 1e-6 log-odds units
    assert all(isinstance(x, int) for x in w)
    # balanced classes -> prior exactly 0
    assert b == 0
    # positive-vocab buckets must carry positive weight and vice versa
    assert max(w) > 500_000 and min(w) < -500_000


def test_train_counts_partitioning_invariant(toy):
    w1, b1 = nb_train(toy, F.col("y"))
    w2, b2 = nb_train(toy.repartition(7), F.col("y"))
    assert w1 == w2 and b1 == b2


def test_arrow_and_sql_engines_bit_identical(spark):
    """The Arrow scale path (dictionary-encode md5 per unique token)
    must reproduce the Catalyst per-occurrence form EXACTLY — weights,
    bias, scores, preds — including empty / whitespace-only rows
    (where Catalyst split() would emit a '' token if not filtered)."""
    rows = [
        (0, "alpha beta alpha", True),
        (1, "zeta  eta   zeta", False),  # multi-space
        (2, "", True),                   # empty text
        (3, "   ", False),               # whitespace only
        (4, "alpha zeta the", True),
        (5, "beta beta beta eta", False),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    w_sql, b_sql = nb_train(df, F.col("y"), n_buckets=16, engine="sql")
    w_ar, b_ar = nb_train(df, F.col("y"), n_buckets=16, engine="arrow")
    assert w_sql == w_ar and b_sql == b_ar

    s_sql = (
        nb_score(df, w_sql, b_sql, engine="sql")
        .select("doc_id", "score", "pred")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    s_ar = (
        nb_score(df, w_ar, b_ar, engine="arrow")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert s_sql["score"].tolist() == s_ar["score"].tolist()
    assert s_sql["pred"].tolist() == s_ar["pred"].tolist()


def test_arrow_engine_null_labels_count_neither_class(spark):
    rows = [(0, "alpha alpha", True), (1, "alpha", None), (2, "alpha beta", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    w_sql, _ = nb_train(df, F.col("y"), n_buckets=8, engine="sql")
    w_ar, _ = nb_train(df, F.col("y"), n_buckets=8, engine="arrow")
    assert w_sql == w_ar


def test_single_class_corpus_raises(spark):
    df = spark.createDataFrame(
        [(0, "alpha", True), (1, "beta", True)], "doc_id long, text string, y boolean"
    )
    with pytest.raises(ValueError, match="both classes"):
        nb_train(df, F.col("y"), n_buckets=8)


def test_oracle_matches_spark_on_degenerate_corpus(spark):
    """The DuckDB oracle must mirror Spark on the edge cases the sf
    fixtures never contain: zero-token docs (scored raw=bias by Spark,
    formerly dropped by the oracle's inner join) and NULL labels
    (neither class in Spark, formerly negatives in the oracle's CASE)."""
    import duckdb
    import pandas as pd

    from sketch_spark.operators.classifier import nb_classifier_sql

    rows = [
        (0, "alpha beta alpha", "en"),
        (1, "zeta eta zeta", "de"),
        (2, "", "en"),            # zero tokens, positive label
        (3, "   ", "de"),         # zero tokens, negative label
        (4, "alpha zeta", None),  # NULL label: trains neither class
        (5, "beta eta beta", "en"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    df = spark.createDataFrame(pdf)

    w, b = nb_train(df, F.col("lang") == "en", n_buckets=16)
    got = (
        nb_score(df, w, b)
        .select("doc_id", "score", "pred")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(nb_classifier_sql("lang = 'en'", n_buckets=16))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(want) == len(rows), "oracle must score EVERY doc incl. empty ones"
    assert got["score"].tolist() == want["score"].tolist()
    assert got["pred"].tolist() == want["pred"].tolist()
