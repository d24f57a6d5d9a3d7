"""Iterative link-graph scoring: fixed-point PageRank power iteration.

Link authority (PageRank over the host/page graph) is a standard
web-corpus curation signal — Common-Crawl-scale pipelines rank hosts by
it to weight sampling and to gate low-authority boilerplate farms.  The
engine already covers one iterative-graph class (pointer-jumping
connected components, operators/dedup.py); this adds the other one a
curation stack needs, the damped power iteration, with the same
per-round lineage discipline.

Exactness across engines (the repo's fixed-point rule, CLAUDE.md): all
rank mass is carried as BIGINT units.  Floating-point PageRank sums are
order-dependent and would eventually land on a rounding knife-edge
under the driver's value hash; instead

- every node starts with ``unit_total // n_nodes`` units,
- an edge's contribution is ``rank DIV out_degree`` (floor division),
- the damped update is ``(100 - damping_pct) * base DIV 100 +
  damping_pct * inflow DIV 100`` — all integer multiply/floor-divide,

so partition order, merge order, and engine (Spark, DuckDB, numpy) all
produce bit-identical ranks.  Truncation loses a bounded trickle of
mass per round (< 1 unit per edge + 1 per node); with
``unit_total = 10**12`` the relative quantization is ~1e-9 per hop —
far below any ranking-relevant difference.  Dangling nodes (no
out-edges) simply evaporate their mass, the standard simplification
when the redistribution term isn't needed for ranking.

Scale story (the 100-TB question): the edge table — the only
corpus-scale side — is joined on ``src`` every round but NEVER changes,
so it is hash-repartitioned on src ONCE and persisted; each iteration
then costs (a) one node-scale exchange of the (node, rank) table to the
src partitioning, (b) an edge-local join + projection, and (c) one
groupBy(dst) whose map-side combine reduces the wire volume to
O(nodes-per-partition x partitions) rows of two BIGINTs.  Ranks are one
row per node — never corpus-scale text, never arrays.  Lineage is cut
with an eager localCheckpoint per round (the pointer-jumping pattern),
so the plan does not grow with ``n_iter``.

Reference analog: none — the C++ reference (HansLehnert/sketch) is a
k-mer frequency engine with no graph surface; this belongs to the
training-data battery built alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "pagerank_fixed_point",
    "pagerank_reference",
    "hits_fixed_point",
    "hits_reference",
]


def pagerank_fixed_point(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping_pct: int = 85,
    unit_total: int = 10**12,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """Damped PageRank power iteration in exact BIGINT arithmetic.

    ``edges`` is one row per directed edge (parallel edges count once
    each; self-loops are legal).  Returns (node, rank_units) for every
    node that appears as a src or dst, after ``n_iter`` rounds.

    rank_0(v)   = unit_total DIV n
    contrib(e)  = rank(src(e)) DIV out_deg(src(e))      -- per edge row
    rank_i+1(v) = (100-damping_pct) * (unit_total DIV n) DIV 100
                  + damping_pct * sum(contrib(e) : dst(e)=v) DIV 100

    ``teleport`` (a one-column DataFrame of node ids) switches the
    uniform teleport term to a personalized one — TrustRank when the
    set is trusted seed hosts (Gyongyi et al., VLDB 2004), the standard
    crawl spam-demotion signal: authority can then only flow OUT of the
    seed neighborhood, so link-farm islands starve.  With a seed set S:

    rank_0(v)   = unit_total DIV |S|  if v in S else 0
    rank_i+1(v) = [v in S] * (100-damping_pct) * (unit_total DIV |S|) DIV 100
                  + damping_pct * sum(contrib(e) : dst(e)=v) DIV 100

    Every operation is integer multiply / floor division, so the result
    is independent of partitioning, join order, and engine; overflow is
    impossible for unit_total <= ~9.2e16 (the guard bounds
    100 * unit_total to int64, which covers every product in the
    recurrence: damping_pct and 100-damping_pct are both <= 100, and
    inflow never exceeds the starting mass).
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    if 100 * unit_total >= 2**63:
        raise ValueError("unit_total too large: 100 * unit_total must fit in int64")

    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if teleport is not None:
        # flag seed membership; a seed outside the graph is a caller
        # error surfaced by the count below
        seed_ids = teleport.select(
            F.col(teleport.columns[0]).alias("node")
        ).distinct()
        nodes = nodes.join(
            seed_ids.withColumn("_seed", F.lit(True)), "node", "left"
        ).select("node", F.coalesce("_seed", F.lit(False)).alias("_seed"))
    else:
        nodes = nodes.withColumn("_seed", F.lit(True))
    # node-scale table, re-read every round (base term + left join):
    # ONE checkpoint, placed after the seed flag so the teleport path
    # doesn't materialize a throwaway intermediate
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.filter("_seed").count()
    if n == 0:
        if teleport is not None and nodes.count() > 0:
            raise ValueError("teleport set shares no node with the edge list")
        # empty graph: same empty (node, rank_units) frame on both paths
        return nodes.select("node", F.lit(0).cast("long").alias("rank_units"))
    base0 = unit_total // n  # per-seed start AND teleport base term
    base_term = (100 - damping_pct) * base0 // 100

    # the corpus-scale side: attach out-degree once, pin the src
    # partitioning once, reuse it every round (edges never re-shuffle)
    outdeg = e.groupBy("src").agg(F.count("*").alias("_od"))
    edges_w = e.join(outdeg, "src").repartition(shuffle_n, "src").persist()
    edges_w.count()  # materialize: referenced once per round below

    node_base = F.when(F.col("_seed"), F.lit(base_term)).otherwise(F.lit(0))
    ranks = nodes.select(
        "node",
        F.when(F.col("_seed"), F.lit(base0))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_units"),
    )
    try:
        for _ in range(n_iter):
            inflow = (
                edges_w.join(
                    ranks.withColumnRenamed("node", "src"), "src"
                )
                .select(
                    "dst", F.expr("rank_units DIV _od").alias("_contrib")
                )
                .groupBy("dst")
                .agg(F.sum("_contrib").alias("_inflow"))
            )
            ranks = (
                nodes.join(
                    inflow.withColumnRenamed("dst", "node"), "node", "left"
                )
                .select(
                    "node",
                    (
                        node_base.cast("long")
                        + F.expr(
                            f"{damping_pct} * coalesce(_inflow, 0L) DIV 100"
                        )
                    ).alias("rank_units"),
                )
                # cut lineage per round or the plan grows with n_iter
                .localCheckpoint(eager=True)
            )
    finally:
        edges_w.unpersist()
    return ranks


def hits_fixed_point(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    unit: int = 10**9,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) in exact BIGINT units —
    the other classic link-authority signal beside PageRank: a page is
    a good AUTHORITY if good hubs link to it, a good HUB if it links
    to good authorities (directory/link-farm pages score as hubs, not
    authorities — useful for separating the two in crawl curation).

    Integer recurrence per iteration (replacing HITS' float L2
    normalization with an integer rescale — same fixed point ordering):

        a_raw(v) = sum(h(u) : u->v)
        a(v)     = a_raw(v) DIV (1 + max(a_raw) DIV unit)
        h_raw(u) = sum(a(v) : u->v)
        h(u)     = h_raw(u) DIV (1 + max(h_raw) DIV unit)

    The rescale bounds every post-scale score below ``unit`` (proof in
    source), so sums stay under n_nodes * unit — int64-safe for
    n_nodes * unit < 2**63 (~9.2e9 nodes at the default unit).  The
    two max() scalars per iteration are bounded driver collects of one
    row each.  All arithmetic is integer: results are bit-identical
    across engines and partitionings.

    Scale shape: TWO persisted layouts of the edge table — one
    partitioned by src (the hub-sum join), one by dst (the authority-
    sum join) — so the corpus-scale side never re-shuffles across
    iterations; each round exchanges only node-scale score tables, and
    both groupBys map-side combine.  Returns (node, authority_units,
    hub_units).
    """
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.count() == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("authority_units"),
            F.lit(0).cast("long").alias("hub_units"),
        )

    e_by_src = e.repartition(shuffle_n, "src").persist()
    e_by_dst = e.repartition(shuffle_n, "dst").persist()
    e_by_src.count()
    e_by_dst.count()

    def _rescale(raw: DataFrame, col: str) -> DataFrame:
        # raw is checkpointed, so the max scan and the projection both
        # read materialized rows; the scale is a bounded 1-row collect.
        # Bound: scale = 1 + floor(mx/unit) > mx/unit, so every
        # rescaled score < raw * unit / mx <= unit.
        mx = raw.agg(F.max(col)).collect()[0][0] or 0
        scale = 1 + mx // unit
        return raw.select("node", F.expr(f"{col} DIV {scale}").alias(col))

    hub = nodes.withColumn("h", F.lit(unit).cast("long"))
    auth = None
    for _ in range(n_iter):
        a_raw = (
            nodes.join(
                e_by_src.join(hub.withColumnRenamed("node", "src"), "src")
                .groupBy("dst")
                .agg(F.sum("h").alias("a"))
                .withColumnRenamed("dst", "node"),
                "node",
                "left",
            )
            .select("node", F.coalesce("a", F.lit(0)).cast("long").alias("a"))
            .localCheckpoint(eager=True)
        )
        auth = _rescale(a_raw, "a")
        h_raw = (
            nodes.join(
                e_by_dst.join(auth.withColumnRenamed("node", "dst"), "dst")
                .groupBy("src")
                .agg(F.sum("a").alias("h"))
                .withColumnRenamed("src", "node"),
                "node",
                "left",
            )
            .select("node", F.coalesce("h", F.lit(0)).cast("long").alias("h"))
            .localCheckpoint(eager=True)
        )
        hub = _rescale(h_raw, "h")
    out = (
        nodes.join(auth, "node")
        .join(hub, "node")
        .select(
            "node",
            F.col("a").alias("authority_units"),
            F.col("h").alias("hub_units"),
        )
    )
    e_by_src.unpersist()
    e_by_dst.unpersist()
    return out


def hits_reference(
    edge_list: list[tuple[int, int]],
    n_iter: int = 5,
    unit: int = 10**9,
) -> dict[int, tuple[int, int]]:
    """Pure-python twin of ``hits_fixed_point`` — same integer
    recurrence; returns {node: (authority_units, hub_units)}."""
    nodes = sorted({s for s, _ in edge_list} | {d for _, d in edge_list})
    if not nodes:
        return {}
    hub = {v: unit for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(n_iter):
        a_raw = {v: 0 for v in nodes}
        for s, d in edge_list:
            a_raw[d] += hub[s]
        scale_a = 1 + max(a_raw.values()) // unit
        auth = {v: a_raw[v] // scale_a for v in nodes}
        h_raw = {v: 0 for v in nodes}
        for s, d in edge_list:
            h_raw[s] += auth[d]
        scale_h = 1 + max(h_raw.values()) // unit
        hub = {v: h_raw[v] // scale_h for v in nodes}
    return {v: (auth[v], hub[v]) for v in nodes}


def pagerank_reference(
    edge_list: list[tuple[int, int]],
    n_iter: int = 10,
    damping_pct: int = 85,
    unit_total: int = 10**12,
    teleport: set[int] | None = None,
) -> dict[int, int]:
    """Pure-python twin of ``pagerank_fixed_point`` for differential
    tests — same integer recurrence, exact python ints."""
    nodes = sorted({s for s, _ in edge_list} | {d for _, d in edge_list})
    if not nodes:
        return {}
    seeds = set(nodes) if teleport is None else teleport & set(nodes)
    n = len(seeds)
    base0 = unit_total // n
    base_term = (100 - damping_pct) * base0 // 100
    od: dict[int, int] = {}
    for s, _ in edge_list:
        od[s] = od.get(s, 0) + 1
    rank = {v: base0 if v in seeds else 0 for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, d in edge_list:
            inflow[d] += rank[s] // od[s]
        rank = {
            v: (base_term if v in seeds else 0)
            + damping_pct * inflow[v] // 100
            for v in nodes
        }
    return rank
