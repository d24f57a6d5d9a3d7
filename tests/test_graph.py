"""Fixed-point PageRank (operators/graph.py): exact-integer differential
vs the pure-python twin, partition invariance, graph edge cases."""

import random

import pytest

from sketch_spark.operators.graph import pagerank_fixed_point, pagerank_reference


def _run(spark, edge_list, partitions=None, **kw):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    if partitions:
        df = df.repartition(partitions)
    out = pagerank_fixed_point(df, **kw)
    return {r["node"]: r["rank_units"] for r in out.collect()}


def test_matches_python_reference_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    got = _run(spark, edges, n_iter=8)
    want = pagerank_reference(edges, n_iter=8)
    assert got == want


def test_partition_invariance(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(120)]
    a = _run(spark, edges, partitions=1, n_iter=6)
    b = _run(spark, edges, partitions=13, n_iter=6)
    assert a == b


def test_dangling_and_sink_nodes(spark):
    # 0 -> 1 -> 2; 2 has no out-edges (dangling: its mass evaporates);
    # 0 has no in-edges (rank decays toward the teleport base term)
    edges = [(0, 1), (1, 2)]
    got = _run(spark, edges, n_iter=10)
    want = pagerank_reference(edges, n_iter=10)
    assert got == want
    # sink keeps receiving, source only keeps the base term
    assert got[2] > got[0]
    base0 = 10**12 // 3
    assert got[0] == (100 - 85) * base0 // 100  # no in-edges: pure teleport


def test_self_loops_and_parallel_edges(spark):
    edges = [(0, 0), (0, 1), (0, 1), (1, 0)]
    got = _run(spark, edges, n_iter=7)
    assert got == pagerank_reference(edges, n_iter=7)


def test_mass_never_created(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(60)]
    got = _run(spark, edges, n_iter=5)
    # floor division only loses units; total mass can never exceed start
    assert sum(got.values()) <= 10**12


def test_hub_authority_ordering(spark):
    # bidirectional star: every spoke links to the hub, the hub links
    # back to every spoke — the hub aggregates 11 whole ranks while
    # each spoke gets 1/11 of the hub's, so the hub must dominate
    edges = [(i, 0) for i in range(1, 12)] + [(0, i) for i in range(1, 12)]
    got = _run(spark, edges, n_iter=10)
    assert got == pagerank_reference(edges, n_iter=10)
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(1, 12))


def test_teleport_matches_reference(spark):
    rng = random.Random(19)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    seeds = {v for v in range(30) if v % 5 == 0}
    df = spark.createDataFrame(edges, "src long, dst long")
    seed_df = spark.createDataFrame([(v,) for v in seeds], "doc_id long")
    from sketch_spark.operators.graph import pagerank_fixed_point

    out = pagerank_fixed_point(df, n_iter=7, teleport=seed_df)
    got = {r["node"]: r["rank_units"] for r in out.collect()}
    assert got == pagerank_reference(edges, n_iter=7, teleport=seeds)


def test_teleport_starves_disconnected_island(spark):
    # trusted component 0-1-2 (seed 0) vs an island 10-11 with no
    # in-link from the trusted side: the island's rank must decay to 0
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)]
    from sketch_spark.operators.graph import pagerank_fixed_point

    df = spark.createDataFrame(edges, "src long, dst long")
    seed_df = spark.createDataFrame([(0,)], "doc_id long")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank_fixed_point(df, n_iter=12, teleport=seed_df).collect()
    }
    assert got == pagerank_reference(edges, n_iter=12, teleport={0})
    assert got[10] == 0 and got[11] == 0  # link farm starved
    assert min(got[0], got[1], got[2]) > 0


def test_teleport_disjoint_seed_raises(spark):
    from sketch_spark.operators.graph import pagerank_fixed_point

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    seed_df = spark.createDataFrame([(99,)], "doc_id long")
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, teleport=seed_df)


def test_param_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, damping_pct=101)
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, unit_total=2**60, damping_pct=85)
    # the guard must not be defeated by damping_pct=0 (the base-term
    # side multiplies by 100-damping_pct)
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, unit_total=2**60, damping_pct=0)


def test_empty_graph_both_paths(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    seed_df = spark.createDataFrame([(0,)], "doc_id long")
    assert pagerank_fixed_point(empty, n_iter=3).count() == 0
    # teleport over an empty graph: same empty frame, not a seed error
    assert pagerank_fixed_point(empty, n_iter=3, teleport=seed_df).count() == 0


def test_hits_matches_python_reference(spark):
    from sketch_spark.operators.graph import hits_fixed_point, hits_reference

    rng = random.Random(23)
    edges = [(rng.randrange(35), rng.randrange(35)) for _ in range(180)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["authority_units"], r["hub_units"])
        for r in hits_fixed_point(df, n_iter=5).collect()
    }
    assert got == hits_reference(edges, n_iter=5)


def test_hits_partition_invariance(spark):
    from sketch_spark.operators.graph import hits_fixed_point

    rng = random.Random(29)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(90)]
    outs = []
    for parts in (1, 11):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
        outs.append({
            r["node"]: (r["authority_units"], r["hub_units"])
            for r in hits_fixed_point(df, n_iter=4).collect()
        })
    assert outs[0] == outs[1]


def test_hits_star_semantics(spark):
    # spokes all link to the hub: the hub is the top AUTHORITY with
    # zero hub score, the spokes are the top HUBS with zero authority
    from sketch_spark.operators.graph import hits_fixed_point, hits_reference

    edges = [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["authority_units"], r["hub_units"])
        for r in hits_fixed_point(df, n_iter=5).collect()
    }
    assert got == hits_reference(edges, n_iter=5)
    a0, h0 = got[0]
    assert a0 == max(a for a, _ in got.values()) and h0 == 0
    for i in range(1, 9):
        ai, hi = got[i]
        assert ai == 0 and hi > 0
