"""Cross-checks for the round-8 retrieval/diversification operators.

The DuckDB oracle gate already pins engine parity; these tests pin the
SEMANTICS against independent reference implementations (a naive Python
greedy for MMR) and internal invariants that an oracle running the same
formula could not catch if both sides shared a bug.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_mmr_matches_naive_greedy(spark):
    """The distributed K-iteration MMR loop must select exactly the
    same documents, in the same order, as a literal single-machine
    greedy over the same (rel, sim) inputs."""
    from flink_connector_http_spark.operators.pipeline import (
        MMR_K,
        MMR_POOL,
        search_bm25_topk,
        search_mmr_rerank,
    )
    from flink_connector_http_spark.plans.registry import load
    import pyspark.sql.functions as F
    from flink_connector_http_spark.operators.dedup import _DOT_AB, _NORM

    got = [
        (r["step"], r["doc_id"], r["mmr_score"])
        for r in search_mmr_rerank(spark, SF).orderBy("step").collect()
    ]

    # independent inputs: pool rel scores + pairwise 6dp cosines
    emb = load(spark, SF, "embeddings")["embeddings"]
    pool = (
        search_bm25_topk(spark, SF)
        .filter(F.col("rk") <= MMR_POOL)
        .select("doc_id", F.col("score").alias("rel"))
        .join(emb, F.col("doc_id") == F.col("vec_id"))
        .select("doc_id", "rel", "embedding")
    )
    rows = pool.collect()
    rel = {r["doc_id"]: r["rel"] for r in rows}
    a = pool.selectExpr(
        "doc_id AS ai", "embedding AS a_emb",
        _NORM.format(col="embedding") + " AS a_norm")
    b = pool.selectExpr(
        "doc_id AS bi", "embedding AS b_emb",
        _NORM.format(col="embedding") + " AS b_norm")
    sims = {
        (r["ai"], r["bi"]): r["sim"]
        for r in a.crossJoin(b).filter("ai <> bi").selectExpr(
            "ai", "bi", f"round({_DOT_AB} / (a_norm * b_norm), 6) AS sim"
        ).collect()
    }

    # naive greedy
    selected: list[tuple[int, int, float]] = []
    chosen: list[int] = []
    for step in range(1, MMR_K + 1):
        best = None
        for d in sorted(rel):
            if d in chosen:
                continue
            if not chosen:
                score = round(0.5 * rel[d], 6)
            else:
                ms = max(sims[(d, c)] for c in chosen)
                score = round(0.5 * rel[d] - 0.5 * ms, 6)
            if best is None or score > best[1]:
                best = (d, score)
        chosen.append(best[0])
        selected.append((step, best[0], best[1]))

    assert got == selected


def test_snippet_hit_counts_self_consistent(spark):
    """The reported n_hits must equal the number of query-term tokens
    actually present in the emitted snippet string."""
    from flink_connector_http_spark.operators.pipeline import (
        BM25_TERMS,
        SNIPPET_DOCS,
        search_snippet_windows,
    )

    rows = search_snippet_windows(spark, SF).collect()
    assert len(rows) == SNIPPET_DOCS
    for r in rows:
        toks = r["snippet"].split(" ")
        n = sum(1 for t in toks if t in BM25_TERMS)
        assert n == r["n_hits"], (r["doc_id"], r["snippet"], r["n_hits"])
        assert r["n_hits"] >= 1
        assert r["best_start"] >= 1


def test_t_closeness_bounds_and_k_eligibility(spark):
    """TVD is a metric on distributions: every reported value must lie
    in [0, 1], and only groups passing the k-anonymity size gate may
    appear."""
    from flink_connector_http_spark.plans.relational import (
        K_ANON,
        T_CLOSE_K,
        q_t_closeness_audit,
    )

    rows = q_t_closeness_audit(spark, SF).collect()
    assert 0 < len(rows) <= T_CLOSE_K
    for r in rows:
        assert 0.0 <= r["tvd"] <= 1.0
        assert r["group_size"] >= K_ANON
    # ranked by tvd descending
    tvds = [r["tvd"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert tvds == sorted(tvds, reverse=True)


def test_ndcg_in_unit_interval_and_ideal_consistent(spark):
    """nDCG must land in (0, 1]; the ideal is reached exactly when the
    BM25 and QL rankings agree on the graded prefix."""
    from flink_connector_http_spark.operators.pipeline import (
        search_ndcg_eval,
    )

    row = search_ndcg_eval(spark, SF).collect()[0]
    assert 0 < row["ndcg"] <= 1.0
    assert 0 < row["dcg_scaled"] <= row["ideal_scaled"]


def test_term_contributions_sum_to_score(spark):
    """Per-doc BM25 term contributions must reassemble the ranker's own
    6dp score (shared-helper identity), and shares must sum to ~1."""
    from flink_connector_http_spark.operators.pipeline import (
        search_bm25_topk,
        search_term_contribution,
    )

    scores = {
        r["doc_id"]: r["score"]
        for r in search_bm25_topk(spark, SF).filter("rk <= 5").collect()
    }
    rows = search_term_contribution(spark, SF).collect()
    assert len(rows) == 3 * len(scores)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(scores)
    for doc_id, terms in by_doc.items():
        total = sum(t["contribution"] for t in terms)
        # each contribution is independently 6dp-rounded; the scorer
        # rounds the unrounded sum — agreement within 3 ulps of 1e-6
        assert abs(total - scores[doc_id]) < 3e-6
        assert abs(sum(t["share"] for t in terms) - 1.0) < 1e-4
        assert all(t["contribution"] >= 0 for t in terms)
