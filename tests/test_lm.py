"""Bigram-LM perplexity (operators/lm.py) vs a hand-rolled Python
reference, plus the ranking property the filter relies on."""

import math

import pytest

from sketch_spark.operators.lm import bigram_lm_perplexity


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the mat"),
    (2, "mat the on sat zzz qqq"),  # off-distribution order + OOV-ish
    (3, "one"),                     # no bigram -> absent from output
]


def _ref_ppl(add_k=0.5):
    toks = {i: t.split() for i, t in DOCS}
    bigrams = [(w[j], w[j + 1]) for w in toks.values() for j in range(len(w) - 1)]
    c2 = {}
    c1 = {}
    for a, b in bigrams:
        c2[(a, b)] = c2.get((a, b), 0) + 1
        c1[a] = c1.get(a, 0) + 1
    vocab = {t for w in toks.values() for t in w}
    v = len(vocab)
    out = {}
    for i, w in toks.items():
        lps = [
            math.log((c2[(w[j], w[j + 1])] + add_k) / (c1[w[j]] + add_k * v))
            for j in range(len(w) - 1)
        ]
        if lps:
            out[i] = (len(lps), math.exp(-sum(lps) / len(lps)))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lm_perplexity_matches_reference(spark, docs_df):
    got = {r["doc_id"]: (r["n_bigrams"], r["ppl"]) for r in bigram_lm_perplexity(docs_df).collect()}
    want = _ref_ppl()
    assert set(got) == set(want) == {0, 1, 2}  # doc 3 has no bigram
    for i, (n, p) in want.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(round(p, 4), abs=2e-4)


def test_lm_perplexity_ranks_off_distribution_higher(spark, docs_df):
    got = {r["doc_id"]: r["ppl"] for r in bigram_lm_perplexity(docs_df).collect()}
    # the scrambled doc must score strictly worse than both fluent ones
    assert got[2] > got[0] and got[2] > got[1]
