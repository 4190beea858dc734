"""Unit tests for the PageRank operator."""

from __future__ import annotations

from hw_kafka_streams_spark.operators.graph import pagerank


def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    # triangle (symmetric, dangling-free): mass stays ~1, symmetry
    # means the uniform distribution is stationary.
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a in (1, 2, 3) for b in (1, 2, 3) if a != b],
        "src int, dst int, w double",
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iters=5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-4
    for v in ranks.values():
        assert abs(v - 1 / 3) < 1e-4


def test_pagerank_favors_high_indegree(spark):
    # star: everyone points at hub 0 (and hub points back so nothing
    # dangles); the hub must outrank the leaves.
    leaves = [1, 2, 3, 4]
    edges = spark.createDataFrame(
        [(leaf, 0, 1.0) for leaf in leaves] + [(0, leaf, 1.0) for leaf in leaves],
        "src int, dst int, w double",
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iters=5).collect()}
    assert all(ranks[0] > ranks[leaf] for leaf in leaves)
    assert abs(sum(ranks.values()) - 1.0) < 1e-4


def test_label_propagation_two_cliques(spark):
    """Two 3-cliques joined by one bridge edge: after 3 deterministic
    rounds each clique converges to its minimum label; the bridge is
    outvoted by within-clique majorities."""
    from hw_kafka_streams_spark.operators.graph import label_propagation

    cliq1 = [(1, 2), (2, 3), (1, 3)]
    cliq2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    und = cliq1 + cliq2 + bridge
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r.node: r.lbl for r in label_propagation(edges, iters=3).collect()
    }
    # each clique converges to ONE label and the cliques differ
    # (exact labels depend on the synchronous trajectory: label 3
    # crosses the bridge and wins clique 2 — deterministic, and the
    # oracle replays the same trajectory)
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_kcore_peels_tail_into_clique(spark):
    """A 4-clique with a pendant path attached: the 2-core must peel
    the path in cascading rounds (each removal drops the next node
    below degree 2) and keep exactly the clique, with degree 3 each."""
    from hw_kafka_streams_spark.operators.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(4) if a != b]
    path = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(
        clique + path + [(b, a) for a, b in path], "src long, dst long"
    )
    got = {r.node: r.degree for r in kcore(edges, k=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_empty_and_full(spark):
    from hw_kafka_streams_spark.operators.graph import kcore

    tri = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(
        tri + [(b, a) for a, b in tri], "src long, dst long"
    )
    # k=2: the triangle IS a 2-core, nothing peels
    assert kcore(edges, k=2).count() == 3
    # k=3: everything peels away to an empty core
    assert kcore(edges, k=3).count() == 0


def test_kcore_nonconvergence_raises(spark):
    """A long pendant chain forces one peel round per node; max_iters
    below the chain length must raise, not return a partial core."""
    import pytest

    from hw_kafka_streams_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    with pytest.raises(ValueError, match="did not converge"):
        kcore(edges, k=2, max_iters=2)


def test_hits_hub_and_authority_structure(spark):
    """1,2,3 all cite 10; only 1 also cites 11: node 10 must dominate
    authorities, node 1 must dominate hubs, and each score vector must
    L1-normalize to ~1 over its side."""
    from hw_kafka_streams_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 11)], "src long, dst long"
    )
    got = {r.node: (r.hub, r.authority) for r in hits(edges, iters=3).collect()}
    hubs = {n: h for n, (h, _) in got.items()}
    auths = {n: a for n, (_, a) in got.items()}
    assert auths[10] > auths[11] > 0
    assert hubs[1] > hubs[2] == hubs[3] > 0
    # pure sources have 0 authority; pure sinks have 0 hub score
    assert auths[1] == auths[2] == auths[3] == 0.0
    assert hubs[10] == hubs[11] == 0.0
    assert abs(sum(hubs.values()) - 1.0) < 1e-6
    assert abs(sum(auths.values()) - 1.0) < 1e-6


def test_hits_empty_graph(spark):
    """ADVICE r7: hits() on an empty edge list returns an empty typed
    frame instead of ZeroDivisionError on the driver."""
    from hw_kafka_streams_spark.operators.graph import hits

    e = spark.createDataFrame([], "src string, dst string")
    out = hits(e, iters=2)
    assert out.columns == ["node", "hub", "authority"]
    assert out.count() == 0


def test_hits_empty_graph_preserves_key_type(spark):
    """ADVICE r8: an INT-keyed empty edge list must return an int node
    column — the empty short-circuit builds from the typed nodes frame,
    so empty vs non-empty schemas never diverge."""
    from hw_kafka_streams_spark.operators.graph import hits

    e_int = spark.createDataFrame([], "src long, dst long")
    out = hits(e_int, iters=2)
    assert dict(out.dtypes)["node"] == "bigint"
    assert out.count() == 0
    nonempty = hits(
        spark.createDataFrame([(1, 2)], "src long, dst long"), iters=1
    )
    assert out.dtypes == nonempty.dtypes
