"""Lexical retrieval (operators/retrieval.py): BM25 vs a hand-rolled
reference, inverted-index properties, and the no-data-shuffle plan."""

import math

import pytest

from sketch_spark.operators.retrieval import bm25_topk, inverted_index


DOCS = [
    (0, "spark join join fast"),
    (1, "slow scan table"),
    (2, "join"),
    (3, "spark spark spark join dup"),
    (4, "the a of"),
]


def _bm25_reference(terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            df = sum(1 for v in toks.values() if t in v)
            tf = tk.count(t)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        out[i] = s
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_reference(spark, docs_df):
    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs_df, ["spark", "join", "dup"], k=5).collect()}
    want = _bm25_reference(["spark", "join", "dup"])
    assert set(got) == set(want)
    for i, s in want.items():
        assert got[i] == pytest.approx(round(s, 6), abs=2e-6)
    # doc 3 (3x spark + dup, the only dup doc) must rank first
    top = bm25_topk(docs_df, ["spark", "join", "dup"], k=1).collect()[0]
    assert top["doc_id"] == 3


def test_bm25_k_cut_and_tie_order(spark, docs_df):
    rows = bm25_topk(docs_df, ["join"], k=3).collect()
    assert len(rows) == 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_no_data_scale_shuffle(spark, docs_df):
    """The only exchange feeds the 1-row stats aggregate; the scored
    stream goes straight to TakeOrderedAndProject."""
    plan = bm25_topk(docs_df, ["spark"], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan or "CartesianProduct" not in plan


def test_inverted_index_postings(spark, docs_df):
    rows = {r["token"]: r for r in inverted_index(docs_df, max_postings=2).collect()}
    assert rows["join"]["df"] == 3
    assert rows["join"]["postings"] == "0,2"  # capped at 2 lowest ids
    assert rows["dup"]["df"] == 1 and rows["dup"]["postings"] == "3"
    assert rows["spark"]["df"] == 2 and rows["spark"]["postings"] == "0,3"
    # df counts documents, not occurrences (doc 0 has join twice)
    assert all(r["df"] <= len(DOCS) for r in rows.values())


def test_inverted_index_min_df(spark, docs_df):
    rows = inverted_index(docs_df, min_df=2).collect()
    assert all(r["df"] >= 2 for r in rows)
    assert {"join", "spark"} <= {r["token"] for r in rows}


EMB = [
    # doc 2 wins pure BM25 for "join" (tf=1 but dl=1 beats doc 0's
    # tf=2/dl=4 under length normalization); giving doc 0 the
    # near-parallel vector forces the cosine leg to rerank it on top
    (0, [1.0, 0.05, 0.0]),
    (1, [0.5, 0.5, 0.0]),
    (2, [0.1, 1.0, 0.0]),
    (3, [0.0, 0.0, 1.0]),
    (4, [-1.0, 0.0, 0.0]),
]
QUERY_VEC = [1.0, 0.0, 0.0]


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(EMB, "vec_id long, embedding array<double>")


def test_hybrid_reranks_by_cosine(spark, docs_df, emb_df):
    from sketch_spark.operators.retrieval import hybrid_topk

    lex = bm25_topk(docs_df, ["join"], k=5).collect()
    hyb = hybrid_topk(
        docs_df, emb_df, ["join"], QUERY_VEC, k=5, n_candidates=5, alpha=0.2
    ).collect()
    # doc 2 wins pure BM25 (short doc), but with cosine dominating the
    # blend the near-parallel doc 0 must outrank it
    assert lex[0]["doc_id"] == 2
    assert hyb[0]["doc_id"] == 0
    # cosine column is the true cosine (rounded)
    by_id = {r["doc_id"]: r for r in hyb}
    assert by_id[0]["cos"] == pytest.approx(1.0, abs=2e-3)
    assert by_id[4]["cos"] == pytest.approx(-1.0, abs=1e-6)
    # blend endpoints: alpha=1 reduces to normalized bm25 order
    pure = hybrid_topk(
        docs_df, emb_df, ["join"], QUERY_VEC, k=5, n_candidates=5, alpha=1.0
    ).collect()
    assert [r["doc_id"] for r in pure][0] == 2


def test_hybrid_join_is_broadcast(spark, docs_df, emb_df):
    """The embeddings side must join against a BROADCAST candidate set —
    a sort-merge join here would shuffle the corpus-scale table."""
    from sketch_spark.operators.retrieval import hybrid_topk

    plan = (
        hybrid_topk(docs_df, emb_df, ["join"], QUERY_VEC, k=3, n_candidates=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rrf_fusion_matches_python(spark, docs_df, emb_df):
    """Fused scores must equal the pure-python RRF over independently
    computed BM25 and cosine rankings, including docs present in only
    one list (the other list contributes zero)."""
    import numpy as np

    from sketch_spark.operators.retrieval import rrf_topk

    terms = ["spark", "join"]
    qv = QUERY_VEC
    got = rrf_topk(
        docs_df, emb_df, terms, qv, k=10, n_candidates=3
    ).collect()

    # python reference: bm25 ranks from the hand-rolled scorer
    ref = _bm25_reference(terms)
    b_order = sorted(ref, key=lambda i: (-round(ref[i], 6), i))[:3]
    b_rank = {d: r + 1 for r, d in enumerate(b_order)}
    emb_rows = {r.vec_id: np.asarray(r.embedding) for r in emb_df.collect()}
    q = np.asarray(qv) / np.linalg.norm(qv)
    cos = {
        i: round(float(v / np.linalg.norm(v) @ q), 6) for i, v in emb_rows.items()
    }
    c_order = sorted(cos, key=lambda i: (-cos[i], i))[:3]
    c_rank = {d: r + 1 for r, d in enumerate(c_order)}
    want = {}
    for d in set(b_rank) | set(c_rank):
        want[d] = round(
            (1.0 / (60 + b_rank[d]) if d in b_rank else 0.0)
            + (1.0 / (60 + c_rank[d]) if d in c_rank else 0.0),
            6,
        )
    got_map = {r.doc_id: (r.bm25_rank, r.cos_rank, r.rrf) for r in got}
    assert set(got_map) == set(want)
    for d, (br, cr, score) in got_map.items():
        assert score == want[d]
        assert br == b_rank.get(d) and cr == c_rank.get(d)
    # ordering: rrf desc, id asc
    ids = [r.doc_id for r in got]
    assert ids == sorted(got_map, key=lambda d: (-got_map[d][2], d))
    # at least one doc must come from a single list on this fixture
    assert any(
        (d in b_rank) != (d in c_rank) for d in want
    ), "fixture should exercise the one-list case"


def test_hybrid_all_terms_miss_corpus(spark, docs_df, emb_df):
    """A query whose terms never occur must not raise (ANSI 0/0 on the
    bm25 normalization — found by the organic-corpus bench) and must
    rank purely by the cosine leg."""
    from sketch_spark.operators.retrieval import hybrid_topk

    out = hybrid_topk(
        docs_df, emb_df, ["zzzznope"], QUERY_VEC, k=5, n_candidates=5, alpha=0.5
    ).collect()
    assert [r.doc_id for r in out][0] == 0  # pure cosine order
    for r in out:
        assert r.bm25 == 0.0
        assert r.hybrid == round(0.5 * r.cos, 6)
