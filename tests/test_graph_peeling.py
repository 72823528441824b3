"""k-core / k-truss peeling verified against brute-force reference
implementations on synthetic graphs (the same strategy as
test_connected_components): the distributed round-based peel must agree
with sequential peeling run to the same number of rounds, and converge
to the true core/truss when the graph stabilizes within the round
budget."""

import random

from pyspark.sql import functions as F

from flink_connector_http_spark.operators.similarity import (
    edge_degrees,
    edge_support,
    kcore_peel,
    ktruss_peel,
)


def brute_kcore_rounds(edges, k, rounds):
    """Sequential reference: per round drop nodes with degree < k, keep
    survivor-survivor edges. Returns (edge set, survivor set)."""
    edges = set(edges)
    survivors = set()
    for _ in range(rounds):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        survivors = {n for n, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in survivors and b in survivors}
    return edges, survivors


def brute_ktruss_rounds(edges, k, rounds):
    edges = set(edges)
    for _ in range(rounds):
        nodes = {}
        for a, b in edges:
            nodes.setdefault(a, set()).add(b)
            nodes.setdefault(b, set()).add(a)
        support = {
            (a, b): len(nodes[a] & nodes[b])
            for a, b in edges
        }
        edges = {e for e in edges if support[e] >= k - 2}
    return edges


def random_graph(rng, n_nodes, n_edges):
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.sample(range(n_nodes), 2)
        edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def to_df(spark, edges):
    return spark.createDataFrame(edges, "a long, b long")


def test_kcore_matches_bruteforce_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        edges = random_graph(rng, 20, 40)
        for k in (2, 3):
            got_edges, got_surv = kcore_peel(to_df(spark, edges), k, 3)
            want_edges, want_surv = brute_kcore_rounds(edges, k, 3)
            assert {(r.a, r.b) for r in got_edges.collect()} == want_edges
            assert {r.node for r in got_surv.collect()} == want_surv


def test_kcore_converges_on_clique_plus_tail(spark):
    # a 5-clique keeps every node at degree 4; the pendant tail peels off
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 5), (5, 6), (6, 7)]
    edges, surv = kcore_peel(to_df(spark, clique + tail), 3, 3)
    assert {r.node for r in surv.collect()} == {0, 1, 2, 3, 4}
    assert {(r.a, r.b) for r in edges.collect()} == set(clique)


def test_edge_degrees_and_support_basics(spark):
    tri = [(1, 2), (1, 3), (2, 3), (3, 4)]
    df = to_df(spark, tri)
    deg = {r.node: r.deg for r in edge_degrees(df).collect()}
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}
    sup = {(r.a, r.b): r.cnt for r in edge_support(df).collect()}
    assert sup == {(1, 2): 1, (1, 3): 1, (2, 3): 1}  # (3,4) in no triangle


def test_ktruss_matches_bruteforce_on_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(2):
        edges = random_graph(rng, 15, 35)
        got = ktruss_peel(to_df(spark, edges), 3, 2)
        want = brute_ktruss_rounds(edges, 3, 2)
        assert {(r.a, r.b) for r in got.collect()} == want


def test_ktruss_strips_bridge_between_cliques(spark):
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    bridge = [(3, 10)]
    got = ktruss_peel(to_df(spark, c1 + c2 + bridge), 4, 2)
    assert {(r.a, r.b) for r in got.collect()} == set(c1) | set(c2)
