"""Cross-checks for the round-8 eval/stats operators (second wave).

The DuckDB oracle gate pins engine parity; these tests pin the SEMANTICS
against independent brute-force implementations — a shared-formula bug
(wrong AP definition, wrong pairwise identity, wrong expected-count
algebra) would pass the oracle on both sides and only fail here.
"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

SF = "/root/testdata/sf0.001"


def test_map_eval_matches_naive(spark):
    """AP / P@k from the integer-scaled plan must equal a literal
    Fraction-exact average precision over the two collected rankings."""
    from flink_connector_http_spark.operators.pipeline import (
        AP_SCALE,
        QL_TOP_K,
        search_bm25_topk,
        search_lm_dirichlet_topk,
        search_map_eval,
    )

    got = search_map_eval(spark, SF).collect()[0]

    bm = [
        r["doc_id"]
        for r in search_bm25_topk(spark, SF).orderBy("rk").collect()
    ]
    rel = {
        r["doc_id"] for r in search_lm_dirichlet_topk(spark, SF).collect()
    }
    assert len(rel) == QL_TOP_K

    hits_so_far = 0
    ap = Fraction(0)
    hits_at = {}
    for rank, doc in enumerate(bm, start=1):
        if doc in rel:
            hits_so_far += 1
            ap += Fraction(hits_so_far, rank)
        hits_at[rank] = hits_so_far
    ap /= QL_TOP_K

    assert got["hits_at_5"] == hits_at.get(5, hits_so_far)
    assert got["hits_at_10"] == hits_at.get(10, hits_so_far)
    assert got["hits_at_20"] == hits_so_far
    # the scaled BIGINT is exactly AP * SCALE * |R|
    assert got["ap_scaled"] == ap * AP_SCALE * QL_TOP_K
    assert got["map"] == round(float(ap), 6)
    assert got["p_at_5"] == round(hits_at.get(5, 0) / 5, 6)
    assert got["recall_at_20"] == round(hits_so_far / QL_TOP_K, 6)
    # sanity: the two rankers genuinely overlap on this corpus
    assert 0 < hits_so_far <= QL_TOP_K


def test_anisotropy_matches_bruteforce_pairs(spark):
    """The linear-pass identity (||sum x||^2 - sum ||x||^2) / (n(n-1))
    must equal the O(n^2) brute-force mean pairwise dot product over the
    same int8 codes."""
    import pyspark.sql.functions as F

    from flink_connector_http_spark.operators.similarity import (
        _QVEC_SPARK,
        emb_anisotropy_stats,
    )
    from flink_connector_http_spark.plans.registry import load

    got = {r["label"]: r for r in emb_anisotropy_stats(spark, SF).collect()}

    emb = load(spark, SF, "embeddings")["embeddings"]
    rows = emb.select(
        "label", F.expr(_QVEC_SPARK).alias("qvec")
    ).collect()
    by_label: dict[int, list[list[int]]] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["qvec"])

    assert set(by_label) == set(got)
    for label, vecs in by_label.items():
        n = len(vecs)
        pair_sum = 0
        for i in range(n):
            for j in range(n):
                if i != j:
                    pair_sum += sum(a * b for a, b in zip(vecs[i], vecs[j]))
        norm_sum = sum(sum(x * x for x in v) for v in vecs)
        g = got[label]
        assert g["n_vectors"] == n
        assert g["sum_norm_sq"] == norm_sum
        # identity check: sum_vec_dot = pair_sum + norm_sum exactly
        assert g["sum_vec_dot"] == pair_sum + norm_sum
        assert g["avg_pair_dot"] == round(pair_sum / (n * (n - 1)), 6)


def test_chi_square_cells_match_counter(spark):
    """Per-cell observed/expected/deviation must match a Counter-based
    contingency table, including zero cells the grid must not drop."""
    from flink_connector_http_spark.plans.registry import load
    import pyspark.sql.functions as F

    from flink_connector_http_spark.plans.relational import (
        q_chi_square_cells,
    )

    got = {
        (r["event_type"], r["dow"]): r
        for r in q_chi_square_cells(spark, SF).collect()
    }

    ev = load(spark, SF, "events")["events"]
    obs = Counter(
        (r["event_type"], r["dow"])
        for r in ev.select(
            "event_type", F.expr("weekday(ts)").alias("dow")
        ).collect()
    )
    types = {t for t, _ in obs}
    days = {d for _, d in obs}
    n_tot = sum(obs.values())
    row_tot = Counter()
    col_tot = Counter()
    for (t, d), n in obs.items():
        row_tot[t] += n
        col_tot[d] += n

    assert set(got) == {(t, d) for t in types for d in days}
    for (t, d), g in got.items():
        o = obs.get((t, d), 0)
        exp_xn = row_tot[t] * col_tot[d]
        dev = o * n_tot - exp_xn
        assert g["observed"] == o
        assert g["expected_x_n"] == exp_xn
        assert g["dev_x_n"] == dev
        assert g["contrib_x_n"] == round(dev * dev / exp_xn, 4)
    # the grid includes at least one zero cell OR covers every cell —
    # both cases exercised: assert grid size is |types| x |days|
    assert len(got) == len(types) * len(days)


def test_mann_whitney_u_matches_pair_counting(spark):
    """The doubled U from cumulative band counts must equal literal
    O(n_a * n_b) pair counting (2 per win, 1 per within-band tie)."""
    import pyspark.sql.functions as F

    from flink_connector_http_spark.plans.registry import load
    from flink_connector_http_spark.plans.relational import (
        KS_BIN,
        KS_TYPE_A,
        KS_TYPE_B,
        q_mann_whitney_u,
    )

    got = q_mann_whitney_u(spark, SF).collect()[0]

    ev = load(spark, SF, "events")["events"]
    rows = ev.filter(
        F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B)
    ).select(
        "event_type",
        F.expr(
            f"CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / {KS_BIN})"
            " AS BIGINT)"
        ).alias("band"),
    ).collect()
    a = [r["band"] for r in rows if r["event_type"] == KS_TYPE_A]
    b = [r["band"] for r in rows if r["event_type"] == KS_TYPE_B]

    u2 = 0
    for x in a:
        for y in b:
            if x > y:
                u2 += 2
            elif x == y:
                u2 += 1

    assert got["n_a"] == len(a)
    assert got["n_b"] == len(b)
    assert got["u2_a"] == u2
    assert got["u_a"] == u2 / 2
    assert got["rank_biserial"] == round(
        (u2 - len(a) * len(b)) / (len(a) * len(b)), 6)


def test_theil_decomposition_identity(spark):
    """Between + spend-share-weighted within must reassemble (to the
    rounding tolerance) the total Theil computed naively from raw
    per-customer cents — the additivity that makes the decomposition
    meaningful."""
    import math

    import pyspark.sql.functions as F

    from flink_connector_http_spark.plans.registry import load
    from flink_connector_http_spark.plans.relational import (
        q_theil_decomposition,
    )

    rows = q_theil_decomposition(spark, SF).collect()
    assert len(rows) > 1

    t = load(spark, SF, "orders", "customer")
    spend = (
        t["orders"].join(
            t["customer"],
            t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)"
        ).alias("cents"))
        .collect()
    )
    cents = [r["cents"] for r in spend]
    n, x = len(cents), sum(cents)
    t_total = sum(
        (c / x) * math.log(c * n / x) for c in cents if c > 0
    )

    reassembled = sum(
        r["spend_share"] * r["theil_within"] + r["between_term"]
        for r in rows
    )
    # 25 nations x 6dp rounding on three factors — tolerance well above
    # accumulated rounding, far below any formula error
    assert abs(reassembled - t_total) < 1e-4
    # within-group Theil is nonnegative; between terms sum to >= 0
    assert all(r["theil_within"] >= 0 for r in rows)
    assert sum(r["between_term"] for r in rows) >= -1e-9
    # per-nation member counts cover every spending customer exactly once
    assert sum(r["n_customers"] for r in rows) == n


def test_intrinsic_dimension_matches_naive_fold(spark):
    """The DECIMAL-summed MLE must equal a Python float fold over the
    same kNN graph rows (independent aggregation path), and the estimate
    must land strictly inside (0, ambient_dim]."""
    import math

    from flink_connector_http_spark.operators.similarity import (
        emb_intrinsic_dimension,
        emb_knn_graph,
    )

    got = emb_intrinsic_dimension(spark, SF).collect()[0]

    two = {}
    for r in emb_knn_graph(spark, SF).filter("rk <= 2").collect():
        two.setdefault(r["src_id"], {})[r["rk"]] = r["cosine"]
    used = 0
    total = 0  # exact integer sum of the 9dp-scaled terms
    excluded = 0
    for src, byrk in two.items():
        c1, c2 = byrk.get(1), byrk.get(2)
        if c2 is None or c1 is None or c1 >= 1:
            excluded += 1
            continue
        used += 1
        total += round(math.log((1 - c2) / (1 - c1)) * 10**9)
    sum_log = total / 10**9

    assert got["n_used"] == used
    assert got["n_excluded"] == excluded
    assert got["sum_log_ratio"] == round(sum_log, 6)
    assert got["id_mle"] == round(used / sum_log, 4)
    # sanity: a real corpus lives strictly inside the ambient 64 dims
    assert 0 < got["id_mle"] <= 64


def test_cms_inner_product_overestimates_and_covers_pairs(spark):
    """The CMS min-row dot product must dominate the exact inner product
    for EVERY source pair (the AMS/CMS guarantee — a single violation
    means the bucket hashing diverged between build and probe), and the
    pair grid must cover all C(|sources|, 2) pairs."""
    import pyspark.sql.functions as F

    from flink_connector_http_spark.operators.text import (
        sketch_cms_inner_product,
    )
    from flink_connector_http_spark.plans.registry import load

    rows = sketch_cms_inner_product(spark, SF).collect()
    n_sources = (
        load(spark, SF, "documents")["documents"]
        .select(F.countDistinct("source")).collect()[0][0]
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["cms_estimate"] >= r["exact_inner"] > 0
        assert r["overestimate_ratio"] >= 1.0
