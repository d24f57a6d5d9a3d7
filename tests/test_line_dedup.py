"""Line-level boilerplate dedup (CCNet / C4 "line appears in >= N
documents"): hand-computed fixtures, hash-vs-string key equivalence,
randomized DuckDB parity, and a no-Python plan guard."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from sketch_spark.operators.dedup import (
    boilerplate_lines,
    boilerplate_lines_sql,
    remove_boilerplate_lines,
    remove_boilerplate_lines_sql,
)

BP = "please accept our cookie policy"
FIXTURE = [
    (0, f"{BP}\nalpha beta gamma\nunique zero line content"),
    (1, f"{BP}\n  {BP}  \ndelta epsilon omega\n\nshort"),  # in-doc repeat + padding trim
    (2, "unrelated page text here\nalpha beta gamma"),
    (3, f"{BP}\nalpha beta gamma\n"),  # trailing newline -> trailing empty line
    (4, ""),  # empty doc: one empty line, never a candidate
]


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


@pytest.mark.parametrize("key", ["hash", "gram"])
def test_line_fixture_hand_computed(spark, key):
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    rep = boilerplate_lines(df, min_docs=3, min_chars=10, key=key)
    if key == "gram":
        got = sorted((r["line_key"], r["n_docs"]) for r in rep.collect())
        # df counts DISTINCT docs: doc 1's two copies count once
        assert got == [("alpha beta gamma", 3), (BP, 3)]
    else:
        assert sorted(r["n_docs"] for r in rep.collect()) == [3, 3]
    out = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df, min_docs=3, min_chars=10, key=key).collect()
    }
    assert out[0] == ("unique zero line content", 3, 2)
    # BOTH in-doc copies cut (the padded one trims to the same key);
    # the empty separator line and the short line survive
    assert out[1] == ("delta epsilon omega\n\nshort", 5, 2)
    assert out[2] == ("unrelated page text here", 2, 1)
    # trailing empty line survives the cut and is all that remains
    assert out[3] == ("", 3, 2)
    assert out[4] == ("", 1, 0)


def test_min_chars_protects_short_common_lines(spark):
    # 'short' appears in every doc but is under min_chars: never removed
    rows = [(i, f"short\nfiller line number {i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert boilerplate_lines(df, min_docs=2, min_chars=10).count() == 0
    out = remove_boilerplate_lines(df, min_docs=2, min_chars=10)
    assert out.filter(F.col("n_removed") > 0).count() == 0
    # with min_chars low enough the same line IS boilerplate
    assert boilerplate_lines(df, min_docs=2, min_chars=3).count() == 1


def test_min_docs_is_distinct_documents(spark):
    # one doc repeating a line 10x must not clear a min_docs=2 bar alone
    rows = [(1, "\n".join(["the repeated banner line"] * 10)), (2, "unique page")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert boilerplate_lines(df, min_docs=2, min_chars=10).count() == 0
    rows.append((3, "intro\nthe repeated banner line\noutro text here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = boilerplate_lines(df, min_docs=2, min_chars=10, key="gram").collect()
    assert [(r["line_key"], r["n_docs"]) for r in rep] == [
        ("the repeated banner line", 2)
    ]
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_boilerplate_lines(df, min_docs=2, min_chars=10).collect()
    }
    assert out[1] == ("", 10)
    assert out[3] == ("intro\noutro text here", 1)


def test_min_docs_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_lines(df, min_docs=1)


def _random_corpus(seed: int, n_docs: int = 60):
    """Multi-line corpus with planted boilerplate at several dfs."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    banners = [
        "all rights reserved by the site operator",
        "click here to subscribe to the newsletter",
        "terms of service apply to this page",
    ]
    rows = []
    for i in range(n_docs):
        lines = []
        for _ in range(rng.integers(1, 6)):
            lines.append(" ".join(rng.choice(vocab, size=rng.integers(0, 8))))
        for b, mod in zip(banners, (2, 3, 7)):
            if i % mod == 0:
                lines.insert(int(rng.integers(0, len(lines) + 1)), b)
        rows.append((i, "\n".join(lines)))
    return rows


@pytest.mark.parametrize("seed", [11, 12])
def test_randomized_duckdb_parity(spark, seed):
    rows = _random_corpus(seed)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = _duck(rows)
    for min_docs, min_chars in ((3, 10), (8, 5)):
        want_rep = sorted(
            tuple(r)
            for r in con.execute(
                boilerplate_lines_sql(min_docs=min_docs, min_chars=min_chars)
            ).fetchall()
        )
        want_rm = sorted(
            tuple(r)
            for r in con.execute(
                remove_boilerplate_lines_sql(min_docs=min_docs, min_chars=min_chars)
            ).fetchall()
        )
        got_rep = sorted(
            tuple(r)
            for r in boilerplate_lines(
                df, min_docs=min_docs, min_chars=min_chars, key="gram"
            ).collect()
        )
        assert got_rep == want_rep, f"report diverges seed={seed} md={min_docs}"
        for key in ("hash", "gram"):
            got_rm = sorted(
                tuple(r)
                for r in remove_boilerplate_lines(
                    df, min_docs=min_docs, min_chars=min_chars, key=key
                ).collect()
            )
            assert got_rm == want_rm, f"removal diverges seed={seed} key={key}"


def test_no_python_in_plan(spark):
    """Both stages are pure Catalyst: no Python/Arrow eval nodes, and the
    df exchange in hash mode carries xxhash64 keys (no line strings)."""
    rows = _random_corpus(13)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for frame in (
        boilerplate_lines(df, min_docs=3, min_chars=10, key="hash"),
        remove_boilerplate_lines(df, min_docs=3, min_chars=10, key="hash"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan


def test_null_text_docs_keep_their_row(spark):
    """NULL-text documents must survive BOTH engines with
    (NULL clean_text, NULL n_lines, 0 removed) — review finding: the
    oracle's GROUP BY dropped them while Spark's left join kept them."""
    rows = [(1, "the shared banner line\nalpha"),
            (2, "the shared banner line\nbeta"),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in remove_boilerplate_lines(df, min_docs=2, min_chars=10).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3] == (None, None, 0)
    con = _duck(rows)
    want = {r[0]: tuple(r[1:]) for r in con.execute(
        remove_boilerplate_lines_sql(min_docs=2, min_chars=10)).fetchall()}
    assert want == out


def test_paragraph_unit_dedup(spark):
    """sep='\\n\\n' dedups at CCNet's paragraph granularity: a repeated
    multi-line paragraph is removed whole, single-newline breaks inside
    paragraphs survive, and the DuckDB oracle agrees byte-for-byte."""
    para = "first line of the footer\nsecond line of the footer"
    rows = [
        (1, f"intro text one\n\n{para}"),
        (2, f"different body two\n\n{para}\n\ntrailer two"),
        (3, "no shared paragraphs here\nat all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(
            df, min_docs=2, min_chars=10, sep="\n\n"
        ).collect()
    }
    assert got[1] == ("intro text one", 2, 1)
    assert got[2] == ("different body two\n\ntrailer two", 3, 1)
    assert got[3] == ("no shared paragraphs here\nat all", 1, 0)
    con = _duck(rows)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            remove_boilerplate_lines_sql(min_docs=2, min_chars=10, sep="\n\n")
        ).fetchall()
    }
    assert want == got
    rep = boilerplate_lines(df, min_docs=2, min_chars=10, key="gram", sep="\n\n")
    assert [(r["line_key"], r["n_docs"]) for r in rep.collect()] == [(para, 2)]


def test_sep_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for bad in ("", ".", "a|b", "'"):
        with pytest.raises(ValueError, match="sep"):
            boilerplate_lines(df, min_docs=2, sep=bad)


def test_null_doc_id_parity(spark):
    """NULL-id docs never receive cuts (Spark's cut join is
    null-unsafe) but their LINES still count toward df — both engines
    must agree, including with MULTIPLE NULL-id docs (review finding:
    the oracle's outer join dropped their text; the shared agg NULL
    group would have interleaved them)."""
    rows = [
        (1, "the shared banner line\nalpha"),
        (None, "the shared banner line\nbeta text"),
        (None, "the shared banner line\nmore gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        [
            (r["doc_id"], r["clean_text"], r["n_lines"], r["n_removed"])
            for r in remove_boilerplate_lines(df, min_docs=2, min_chars=10).collect()
        ],
        key=str,
    )
    # doc 1 loses the banner (df=3 >= 2); NULL-id docs keep full text
    assert (1, "alpha", 2, 1) in got
    assert (None, "the shared banner line\nbeta text", 2, 0) in got
    assert (None, "the shared banner line\nmore gamma", 2, 0) in got
    con = _duck(rows)
    want = sorted(
        [
            tuple(r)
            for r in con.execute(
                remove_boilerplate_lines_sql(min_docs=2, min_chars=10)
            ).fetchall()
        ],
        key=str,
    )
    assert want == got


def test_sql_builders_validate_sep():
    with pytest.raises(ValueError, match="sep"):
        boilerplate_lines_sql(sep=".")
    with pytest.raises(ValueError, match="sep"):
        remove_boilerplate_lines_sql(sep="'")
