"""Iterative graph computation on DataFrames: weighted PageRank.

Complements the connected-components labeling in operators/dedup.py
(the other iterative graph op): PR is the canonical "loop of join +
aggregate" workload. Each iteration is one shuffle-join of ranks onto
edges plus one groupBy(dst) sum — both partition on the same node key,
so Spark reuses the exchange layout across iterations. For a fixed
small iteration count nothing is checkpointed; long chains should
``localCheckpoint`` every few rounds (see dedup.label_clusters for the
measured reasoning).

Determinism contract (mirrored by the DuckDB oracle in
queries/extras_q.py): ranks are rounded to 6 decimals after every
iteration, so float summation order — Spark partial aggregation vs a
sequential engine — cannot drift a boundary; the oracle unrolls the
same number of iterations as plain CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank over an edge list; returns (node, rank).

    Nodes are the union of src/dst endpoints. rank_{t+1}(v) =
    (1-d)/N + d * Σ_{u→v} rank_t(u) · w(u,v) / outw(u). Dangling
    nodes (no out-edges) contribute nothing — acceptable for the
    symmetric co-occurrence graphs this engine builds, where every
    node has out-degree ≥ 1.

    The edge list is persisted for the loop: it is consumed by the
    node count, the out-weight normalization, and every iteration's
    join — without the persist each iteration re-executes the full
    (possibly corpus-sized) edge-building lineage.
    """
    from hw_kafka_streams_spark.cache import managed_persist

    edges = managed_persist(edges)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()  # one small job; N is a plan literal afterwards
    outw = edges.groupBy(src).agg(F.sum(weight).alias("outw"))
    norm_edges = edges.join(outw, src).select(
        F.col(src).alias("e_src"),
        F.col(dst).alias("e_dst"),
        (F.col(weight) / F.col("outw")).alias("share"),
    )
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), 6).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            norm_edges.join(ranks, norm_edges.e_src == ranks.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("share")).alias("inflow"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.round(
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)),
                6,
            ).alias("rank"),
        )
    return ranks


def triangle_counts(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle membership counts over an UNDIRECTED edge list
    (rows must satisfy a < b, deduplicated).

    Enumerates each triangle exactly once as a < b < c via two hash
    joins on the ordered edge list — the standard distributed scheme.
    Both joins key on a node column, so the edge list's hash
    partitioning is reused; no node ever sees more than its
    neighborhood squared (degree-ordered enumeration bounds the skew a
    hub node causes: its triangles enumerate from its LOWER-id
    endpoints). Returns (node, n_triangles).
    """
    e1 = edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
    e2 = edges.select(F.col(a).alias("y"), F.col(b).alias("z"))
    e3 = edges.select(F.col(a).alias("x"), F.col(b).alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])  # x < y < z by construction
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    edge list; returns (node, label) after ``iters`` rounds.

    Every node starts labeled with itself; each round it adopts the
    most frequent label among its neighbors, ties broken by the
    SMALLEST label — the deterministic variant of LPA (the classic
    randomized tie-break would be un-oracle-able), so the whole
    trajectory replays exactly in the unrolled-CTE oracle.

    Scale shape: one round = join labels onto edges [shuffle on node
    key, layout reused across rounds like pagerank] + count per
    (node, candidate) + a PER-NODE row_number window (keyed — never
    global). Labels are small longs; state is one row per node.
    Expects a symmetric edge list (add reversed edges first for
    directed input); isolated nodes keep their own label by
    construction of the node set (endpoints of edges).
    """
    from pyspark.sql import Window

    labels = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), "lbl")
    for _ in range(iters):
        votes = (
            e.join(labels, e.e_dst == labels.node)
            .groupBy(F.col("e_src").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("node", "lbl")
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    source_nodes: list[int],
    hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS hop distances: ``(node, dist)`` for every node
    reachable from ``source_nodes`` within ``hops`` edge traversals
    (dist 0 = a source itself). The fourth iterative graph algorithm
    beside PageRank, connected components, and label propagation.

    Scale shape: each hop is ONE equi-join of the frontier onto the
    edge list (both shuffle-partitioned on the node key, so the
    exchange layout is reused round to round) plus one distinct and one
    left-anti against the settled set — frontier-sized, not graph-
    sized. Hop count is a fixed unroll (the oracle mirrors it as
    CTEs); for diameter-scale sweeps, localCheckpoint every few rounds
    exactly like label_clusters. No collect: sources enter as a tiny
    broadcast-able literal frame.
    """
    from hw_kafka_streams_spark.cache import managed_persist

    spark = edges.sparkSession
    # the edge list feeds every hop's join — persist once or the
    # upstream build (often an expensive distinct self-join) recomputes
    # per hop (same multi-consumer rationale as pagerank above)
    e = managed_persist(
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    )
    frontier = spark.createDataFrame(
        [(int(n),) for n in source_nodes], "node bigint"
    )
    settled = frontier.select("node", F.lit(0).alias("dist"))
    for h in range(1, hops + 1):
        nxt = (
            e.join(
                F.broadcast(frontier) if h == 1 else frontier,
                e.e_src == F.col("node"),
            )
            .select(F.col("e_dst").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
        )
        frontier = nxt
        settled = settled.unionByName(
            nxt.select("node", F.lit(h).alias("dist"))
        )
    return settled


def kcore(
    edges: DataFrame,
    k: int,
    max_iters: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop
    nodes of degree < k until the residual subgraph is stable; returns
    ``(node, degree)`` for the surviving core (degree = within-core).
    The fifth iterative graph algorithm here — the standard
    web/citation-graph density filter (Seidman 1983, "Network
    structure and minimum degree"): a page that survives the k-core
    sits in a densely interlinked cluster, a strong crawl-quality
    prior, and the same peeling is the first stage of community/spam
    analyses at web scale.

    Expects a SYMMETRIC deduplicated edge list (both directions
    present), so degree = count of rows per ``src``.

    Scale shape: one round = a degree count [shuffle on the node key,
    layout reused round to round] + two hash semi-joins filtering the
    edge list against surviving nodes. State is the shrinking edge
    list itself — persisted per round, previous round released, so
    lineage never compounds and each round's input is materialized
    (peeling is monotone: the edge list only shrinks). Convergence is
    detected from a 1-row count action per round (bounded driver
    traffic); ``max_iters`` hard-caps the loop and a loud ValueError —
    not a silent partial core — reports non-convergence, mirroring
    the oracle's error() guard on the same unroll depth.
    """
    from hw_kafka_streams_spark.cache import managed_persist

    e = managed_persist(
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    )
    n_edges = e.count()
    for _ in range(max_iters):
        if n_edges == 0:
            break
        deg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("e_src").alias("node"))
        nxt = managed_persist(
            e.join(keep, e.e_src == keep.node, "left_semi").join(
                keep, F.col("e_dst") == keep.node, "left_semi"
            )
        )
        n_nxt = nxt.count()
        e.unpersist()
        e = nxt
        if n_nxt == n_edges:  # no node fell below k: stable core
            break
        n_edges = n_nxt
    else:
        raise ValueError(
            f"k-core peeling did not converge within {max_iters} rounds"
        )
    return (
        e.groupBy(F.col("e_src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def hits(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, "Authoritative
    sources in a hyperlinked environment") over a DIRECTED edge list;
    returns ``(node, hub, authority)`` after ``iters`` mutual-update
    rounds — the classic complement of PageRank for crawl frontiers:
    hubs are link pages, authorities are linked-to content pages.

    Update: a(v) = Σ_{u→v} h(u), then h(u) = Σ_{u→v} a(v), each
    followed by SUM-normalization (scores sum to 1) — the L1 variant,
    chosen over L2 because it keeps the whole trajectory in +,/ only.

    Determinism contract (the pagerank policy): scores round to 9
    decimals after each normalization, so Spark's partial-agg
    summation order cannot drift a value vs the sequential
    unrolled-CTE oracle. Scale shape: each half-round is one
    shuffle-join of scores onto edges plus one node-keyed aggregate —
    the same exchange layout round to round; the normalizer is a 1-row
    aggregate broadcast back, never a driver collect.
    """
    from hw_kafka_streams_spark.cache import managed_persist

    e = managed_persist(
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .union(e.select(F.col("e_dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        # Empty edge list: no nodes, hence an empty result — mirrors
        # kcore's n_edges==0 short-circuit instead of a driver-side
        # ZeroDivisionError on 1.0 / n. Built from the typed nodes
        # frame so the node column keeps the INPUT edge column's type
        # (an int-keyed edge list must not flip to string when empty —
        # ADVICE r8).
        return nodes.select(
            "node",
            F.lit(0.0).alias("hub"),
            F.lit(0.0).alias("authority"),
        ).limit(0)
    nodes = managed_persist(nodes)
    hubs = nodes.select("node", F.round(F.lit(1.0 / n), 9).alias("score"))
    auths = hubs
    for _ in range(iters):
        raw_a = (
            e.join(hubs, e.e_src == hubs.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum("score").alias("raw"))
        )
        # localCheckpoint each half-round: the mutual recursion doubles
        # the LOGICAL plan per half-round (normalizer total + next
        # half-round both consume it), so after 2*iters rounds the
        # lineage is 2^(2*iters) x the base plan — measured as an AQE
        # stage storm and a plan-stringification OOM. Truncating
        # lineage (not just caching) is the standard fix for iterative
        # graph loops; eager, so each round materializes once.
        auths = _l1_normalize(nodes, raw_a).localCheckpoint(eager=True)
        raw_h = (
            e.join(auths, e.e_dst == auths.node)
            .groupBy(F.col("e_src").alias("node"))
            .agg(F.sum("score").alias("raw"))
        )
        hubs = _l1_normalize(nodes, raw_h).localCheckpoint(eager=True)
    return (
        nodes.join(hubs.withColumnRenamed("score", "hub"), "node", "left")
        .join(auths.withColumnRenamed("score", "authority"), "node", "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )


def _l1_normalize(nodes: DataFrame, raw: DataFrame) -> DataFrame:
    """(node, raw) -> (node, score) with scores summing to 1, 9 dp;
    nodes missing from ``raw`` score 0. The total is a 1-row aggregate
    cross-joined back (broadcast), mirroring the oracle exactly."""
    tot = raw.agg(F.sum("raw").alias("tot"))
    return (
        nodes.join(raw, "node", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            F.round(
                F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("tot"), 9
            ).alias("score"),
        )
    )
