"""Misra–Gries and Count-Sketch: deterministic guarantees, merge laws,
serialization, and the Spark exact-verified frequent-items operator."""

import numpy as np

from tests.conftest import exact_token_counts


def _zipf_tokens(n, vocab=400, seed=7):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n) % vocab
    return [f"w{r}" for r in ranks]


def test_mg_compress_hand_case():
    from sketch_spark.core import MisraGries

    mg = MisraGries(k=2)
    mg.update_tokens(["a"] * 5 + ["b"] * 3 + ["c"] * 1 + ["d"] * 1)
    # m=4 > k=2: delta = 3rd largest = 1 -> a:4, b:2 survive, dec=1
    assert mg.counters == {"a": 4, "b": 2}
    assert mg.dec == 1 and mg.total == 10
    assert mg.error_bound() == 1


def test_mg_guarantees_and_merge():
    from sketch_spark.core import MisraGries

    toks = _zipf_tokens(60_000)
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    k = 50

    # single-shot, chunked, and merged-out-of-order variants
    variants = []
    one = MisraGries(k)
    one.update_tokens(toks)
    variants.append(one)
    parts = [MisraGries(k) for _ in range(7)]
    for i, chunk in enumerate(np.array_split(np.array(toks), 7)):
        parts[i].update_tokens(chunk.tolist())
    m = parts[3]
    for p in (parts[6], parts[0], parts[5], parts[1], parts[2], parts[4]):
        m = m.merge(p)
    variants.append(m)

    n = len(toks)
    for mg in variants:
        assert mg.total == n
        assert len(mg.counters) <= k
        mass = sum(mg.counters.values())
        assert mg.dec <= (n - mass) / (k + 1)
        for t, est in mg.counters.items():
            assert est <= exact[t] <= est + mg.dec
        # presence guarantee: true count above the decrement -> in summary
        for t, c in exact.items():
            if c > mg.dec:
                assert t in mg.counters, (t, c, mg.dec)


def test_mg_serialization_roundtrip():
    from sketch_spark.core import MisraGries, sketch_from_bytes

    mg = MisraGries(k=8)
    mg.update_tokens(_zipf_tokens(5000, vocab=30))
    back = sketch_from_bytes(mg.to_bytes())
    assert back.counters == mg.counters
    assert back.total == mg.total and back.dec == mg.dec
    assert back.to_bytes() == mg.to_bytes()


def test_countsketch_bound_and_linearity():
    from sketch_spark.core import CountSketch

    toks = _zipf_tokens(80_000, vocab=1000, seed=11)
    exact = exact_token_counts([" ".join(toks)])
    cs = CountSketch(depth=5, log2_width=12, seed=3)
    cs.update_tokens(toks)

    keys = list(exact.index)
    est = cs.estimate_tokens(keys)
    f2 = float((exact.to_numpy().astype(np.float64) ** 2).sum())
    bound = cs.error_bound(f2)
    errs = np.abs(est - exact.to_numpy())
    # per-key failure prob <= 2^-depth; allow that fraction + slack
    assert (errs <= bound).mean() >= 1 - 2 * 2.0 ** -cs.depth
    # median estimate should be near-unbiased on the heavy keys
    heavy = exact[exact >= 100]
    est_h = cs.estimate_tokens(list(heavy.index))
    assert np.abs(est_h - heavy.to_numpy()).max() <= bound

    # linearity: table(A) + table(B) == table(A+B) exactly
    a, b = CountSketch(5, 12, 3), CountSketch(5, 12, 3)
    a.update_tokens(toks[:40_000])
    b.update_tokens(toks[40_000:])
    merged = a.merge(b)
    assert np.array_equal(merged.table, cs.table)
    assert merged.to_bytes() == cs.to_bytes()


def test_frequent_tokens_exact_matches_bruteforce(spark):
    from sketch_spark.operators.frequent import frequent_tokens_exact

    docs = [
        (i, " ".join(_zipf_tokens(200, vocab=300, seed=100 + i)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    k = 30
    got = {
        r["token"]: r["cnt"]
        for r in frequent_tokens_exact(df, "text", k=k).collect()
    }
    exact = exact_token_counts([t for _, t in docs])
    n = int(exact.sum())
    want = {t: int(c) for t, c in exact.items() if c * (k + 1) > n}
    assert got == want and len(want) > 0


def test_misra_gries_summary_rows(spark):
    from sketch_spark.operators.frequent import misra_gries_summary

    docs = [(i, " ".join(_zipf_tokens(300, vocab=200, seed=i))) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = misra_gries_summary(df, "text", k=25).collect()
    assert 0 < len(rows) <= 25
    exact = exact_token_counts([t for _, t in docs])
    err = rows[0]["err"]
    assert all(r["err"] == err for r in rows)
    for r in rows:
        true = int(exact.get(r["token"], 0))
        assert r["est"] <= true <= r["est"] + err


# ---------------------------------------------------------------------------
# vocab_coverage: minimal-vocab coverage curve


def _coverage_brute(freqs, ppm):
    """Greedy python reference: take types highest-frequency-first until
    ceil(total*ppm/1e6) occurrences are covered."""
    total = sum(freqs)
    need = -(-(total * ppm) // 1_000_000)
    cum = taken = 0
    for f in sorted(freqs, reverse=True):
        if cum >= need:
            break
        cum += f
        taken += 1
    return taken, cum


def test_vocab_coverage_hand_computed(spark):
    # counts: a=6, b=3, c=1 -> total 10
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a a b b c")], "doc_id long, text string"
    )
    from sketch_spark.operators.frequent import vocab_coverage

    got = {
        r["coverage_ppm"]: (r["vocab_size"], r["cutoff_count"], r["covered_occ"])
        for r in vocab_coverage(df, coverages_ppm=(500000, 600000, 900000, 1000000)).collect()
    }
    # 50% needs 5 -> 'a' alone (6 covered); 60% needs 6 -> 'a' exactly;
    # 90% needs 9 -> a+b; 100% needs all 10 -> a+b+c
    assert got == {
        500000: (1, 6, 6),
        600000: (1, 6, 6),
        900000: (2, 3, 9),
        1000000: (3, 1, 10),
    }


def test_vocab_coverage_matches_greedy_reference(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choice(vocab, p=None, size=rng.integers(1, 40))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from collections import Counter

    freqs = list(Counter(t for _, s in rows for t in s.split()).values())
    from sketch_spark.operators.frequent import vocab_coverage

    ppms = (250000, 500000, 750000, 990000, 1000000)
    got = {
        r["coverage_ppm"]: (r["vocab_size"], r["covered_occ"])
        for r in vocab_coverage(df, coverages_ppm=ppms).collect()
    }
    for ppm in ppms:
        assert got[ppm] == _coverage_brute(freqs, ppm), f"ppm={ppm}"


def test_vocab_coverage_duckdb_parity(spark):
    import duckdb
    import numpy as np

    from sketch_spark.operators.frequent import vocab_coverage, vocab_coverage_sql

    rng = np.random.default_rng(6)
    vocab = [f"t{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(0, 25)))) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = sorted(tuple(r) for r in vocab_coverage(df).collect())
    want = sorted(tuple(r) for r in con.execute(vocab_coverage_sql()).fetchall())
    assert got == want


def test_vocab_coverage_validates_ppm(spark):
    import pytest as _pytest

    from sketch_spark.operators.frequent import vocab_coverage

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for bad in (0, -5, 1_000_001):
        with _pytest.raises(ValueError, match="coverage_ppm"):
            vocab_coverage(df, coverages_ppm=(bad,))
