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


class TestIncrementalMerge:
    """merge_cluster_labels: union-find-style batch merge equals full
    recompute, and untouched components keep their labels byte-stable
    (round-9 verdict item 6)."""

    def _merge(self, spark, labels_list, edges_list):
        from flink_connector_http_spark.operators.dedup import (
            merge_cluster_labels,
        )

        labels = spark.createDataFrame(
            labels_list, "doc_id long, cluster_id long")
        edges = spark.createDataFrame(edges_list, "a_id long, b_id long")
        out = merge_cluster_labels(labels, edges)
        return sorted((r.doc_id, r.cluster_id) for r in out.collect())

    def test_equals_full_recompute(self, spark):
        # existing components {1,2,3} (rep 1), {5,7} (rep 5), {10} (rep 10)
        labels = [(1, 1), (2, 1), (3, 1), (5, 5), (7, 5), (10, 10)]
        existing_pairs = [(1, 2), (2, 3), (5, 7)]
        # batch: new doc 20 bridges components 1 and 5; new docs 21,22
        # pair up alone; new doc 30 attaches to singleton-state doc 10
        new_edges = [(2, 20), (7, 20), (21, 22), (10, 30)]
        got = self._merge(spark, labels, new_edges)
        want = union_find(existing_pairs + new_edges)
        assert got == want
        # the bridge merged 1 and 5 under rep 1
        merged = dict(got)
        assert merged[5] == merged[7] == merged[20] == 1

    def test_untouched_components_byte_stable(self, spark):
        labels = [(1, 1), (2, 1), (3, 3), (4, 3), (9, 9)]
        # batch touches ONLY component 9
        got = dict(self._merge(spark, labels, [(9, 50)]))
        for doc, cl in labels:
            if doc != 9:
                assert got[doc] == cl
        assert got[9] == 9 and got[50] == 9

    def test_new_only_batch(self, spark):
        # no existing state at all: pure new-vs-new batch
        got = self._merge(spark, [], [(100, 101), (101, 102)])
        assert got == [(100, 100), (101, 100), (102, 100)]

    def test_sf0001_matches_full_and_untouched_stable(self, spark):
        """End-to-end at sf0.001: incremental merge == dedup_clusters'
        full recompute, and every component with no incident new edge
        keeps its state label exactly."""
        import pyspark.sql.functions as F

        from flink_connector_http_spark.operators.dedup import (
            INCR_SPLIT,
            _existing_cluster_labels,
            _incremental_new_edges,
            dedup_clusters,
            merge_cluster_labels,
        )

        sf = "/root/testdata/sf0.001"
        state = _existing_cluster_labels(spark, sf)
        edges = _incremental_new_edges(spark, sf).persist()
        merged = merge_cluster_labels(state, edges)
        got = sorted((r.doc_id, r.cluster_id) for r in merged.collect())
        full = sorted(
            (r.doc_id, r.cluster_id)
            for r in dedup_clusters(spark, sf).collect()
        )
        assert got == full and len(got) > 0
        # untouched = state components whose representative never appears
        # as a projected endpoint of any new edge
        state_rows = {r.doc_id: r.cluster_id for r in state.collect()}
        touched_reps = set()
        for r in edges.collect():
            touched_reps.add(state_rows.get(r.a_id, r.a_id))
            touched_reps.add(state_rows.get(r.b_id, r.b_id))
        got_map = dict(got)
        untouched = [
            (d, c) for d, c in state_rows.items() if c not in touched_reps
        ]
        assert untouched, "fixture should leave some components untouched"
        for d, c in untouched:
            assert got_map[d] == c
        edges.unpersist()
