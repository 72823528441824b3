"""Connected-components contract: star contraction (default) and label
propagation agree with a union-find oracle, and star contraction meets its
O(log n) round bound on the pathological chain graph (the case diameter-
bound propagation can't handle at scale).
"""

import math
import random

import pytest

from flink_connector_http_spark.operators.dedup import connected_components


def union_find(pairs_list):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in pairs_list:
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((n, find(n)) for n in nodes)


def run(spark, pairs_list, method):
    df = spark.createDataFrame(pairs_list, "a_id long, b_id long")
    out = connected_components(df, method=method)
    res = sorted((r.doc_id, r.cluster_id) for r in out.collect())
    out.unpersist()
    return res


def test_star_chain_converges_in_log_rounds(spark):
    """256-node chain: the worst case for diameter-bound propagation.
    Star contraction must converge in <= log2(n) productive rounds (+1
    fixpoint-confirmation round)."""
    n = 256
    chain = [(i, i + 1) for i in range(n - 1)]
    assert run(spark, chain, "star") == union_find(chain)
    assert connected_components.last_iterations <= int(math.log2(n)) + 2


def test_star_matches_union_find_on_random_graph(spark):
    random.seed(7)
    pairs = [
        (random.randrange(200), random.randrange(200)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert run(spark, pairs, "star") == union_find(pairs)


def test_both_methods_agree_on_cliques_and_isolated(spark):
    cl = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(100 + i, 100 + j) for i in range(4) for j in range(i + 1, 4)]
        + [(999, 999)]  # self-pair: isolated node, labels itself
    )
    expected = union_find(cl)
    assert run(spark, cl, "star") == expected
    assert run(spark, cl, "propagate") == expected
    # quasi-clique graphs: propagation converges in a couple of rounds
    assert connected_components.last_iterations <= 3


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(df, method="star").count() == 0


def test_unknown_method_rejected(spark):
    df = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    with pytest.raises(ValueError, match="star"):
        connected_components(df, method="bogus")
