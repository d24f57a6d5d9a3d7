"""BPE tokenizer training + encoding (operators/bpe.py).

No SQL oracle exists for the iterative merge loop, so correctness is
carried here: equality with the transparent pure-Python reference,
the textbook corpus, encode/merge-priority semantics, the roundtrip
invariant, and partition invariance of the distributed count pass.
"""

import pyspark.sql.functions as F
import pytest

from sketch_spark.operators.bpe import (
    bpe_encode,
    bpe_reference_merges,
    bpe_train,
    encode_word,
)


def test_textbook_corpus_merges():
    """The classic low/lower/newest/widest example (Sennrich et al.):
    with 'newest' dominant, 'es' then 'est' merge first."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_reference_merges(counts, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # 'lo' (count 7) beats everything left after est
    assert ("l", "o") in merges[2:]


def test_spark_train_equals_reference(spark):
    rows = [(i, "low low lower newest newest newest widest") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bpe_train(df, n_merges=6)
    want = bpe_reference_merges(
        {"low": 40, "lower": 20, "newest": 60, "widest": 20}, 6
    )
    assert got == want


def test_train_partitioning_invariant(spark):
    rows = [(i, f"alpha beta gamma w{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m1 = bpe_train(df, n_merges=10)
    m2 = bpe_train(df.repartition(13), n_merges=10)
    assert m1 == m2


def test_encode_word_merge_priority():
    # rank 0 = (a,b); rank 1 = (b,c).  'abc' must merge ab first,
    # leaving ('ab','c') — NOT ('a','bc')
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    assert encode_word("abc", ranks) == ["ab", "c"]
    # with the priorities flipped, bc wins
    ranks = {("a", "b"): 1, ("b", "c"): 0}
    assert encode_word("abc", ranks) == ["a", "bc"]
    # cascade: ab then ab+c
    ranks = {("a", "b"): 0, ("ab", "c"): 1}
    assert encode_word("abc", ranks) == ["abc"]


def test_encode_roundtrip_and_counts(spark):
    rows = [
        (0, "newest newest lowest"),
        (1, "low lower"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_train(df, n_merges=8)
    enc = bpe_encode(df, merges).toPandas().set_index("doc_id").sort_index()
    # roundtrip: subwords concat back to the original words, in order
    for doc_id, text in rows:
        words = text.split()
        subs = list(enc.loc[doc_id, "subwords"])
        rebuilt, cur = [], ""
        for s in subs:
            cur += s
            if words and cur == words[len(rebuilt)]:
                rebuilt.append(cur)
                cur = ""
        assert rebuilt == words and cur == ""
        assert enc.loc[doc_id, "n_subwords"] == len(subs)
    # trained merges compress: fewer subwords than characters
    assert enc.loc[0, "n_subwords"] < len("newestnewestlowest")


def test_encode_memo_consistency(spark):
    """Same word occurring across batches/rows encodes identically
    (the per-task memo must be a pure cache)."""
    rows = [(i, "sharedword sharedword") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)
    merges = bpe_train(df, n_merges=5)
    enc = bpe_encode(df, merges).select("n_subwords").distinct().collect()
    assert len(enc) == 1


def test_train_cap_is_deterministic(spark):
    rows = [(i, f"w{i % 50} common common") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m_full = bpe_train(df, n_merges=5, max_words=1000)
    m_capped = bpe_train(df, n_merges=5, max_words=10)
    # capped table keeps the highest-count words -> 'common' merges
    # must still lead, and repeated runs agree exactly
    assert m_capped == bpe_train(df.repartition(7), n_merges=5, max_words=10)
    assert m_full[0] in {("c", "o"), ("o", "m"), ("m", "m"), ("o", "n"), ("co", "m"), ("om", "m")}


def test_fast_merges_equal_reference():
    from sketch_spark.operators.bpe import bpe_fast_merges

    cases = [
        {"low": 5, "lower": 2, "newest": 6, "widest": 3},
        # overlapping self-pairs: 'aaa' stresses retract/re-add
        {"aaa": 7, "aab": 3, "baa": 2},
        {"x": 1},  # single char: no pairs at all
        {},
    ]
    # randomized Zipf-ish corpus, deterministic seed
    import random

    rng = random.Random(7)
    vocab = {}
    for _ in range(300):
        w = "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 9)))
        vocab[w] = vocab.get(w, 0) + rng.randint(1, 50)
    cases.append(vocab)

    for counts in cases:
        for n in (1, 5, 40):
            assert bpe_fast_merges(dict(counts), n) == bpe_reference_merges(
                dict(counts), n
            ), (len(counts), n)
