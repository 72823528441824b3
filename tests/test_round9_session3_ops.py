"""Naive-reference cross-checks for the round-9 session-3 operators —
the complement to the DuckDB oracle gate (the gate proves Spark and
DuckDB agree; these prove the shared formula is the RIGHT formula, via
independent Python references and the operators' own invariants)."""

import math

import pytest

from flink_connector_http_spark.plans.relational import (
    q_attribution_shapley,
    q_ab_msprt_always_valid,
    q_mann_kendall_trend,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mk_row(spark):
    return q_mann_kendall_trend(spark, SF).collect()[0]


def test_mann_kendall_matches_python_reference(spark, mk_row):
    """Recompute S, the tie-corrected variance, and z from the daily
    revenue grain with plain Python loops."""
    daily = (
        spark.sql(
            "SELECT o_orderdate AS d,"
            " SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev"
            f" FROM parquet.`{SF}/orders.parquet` GROUP BY 1"
        )
        .orderBy("d")
        .collect()
    )
    revs = [r.rev for r in daily]
    n = len(revs)
    s = sum(
        (revs[j] > revs[i]) - (revs[j] < revs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(revs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t >= 2)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    z = (s - 1) / math.sqrt(var_s) if s > 0 else (
        (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
    )
    assert mk_row.n_days == n
    assert mk_row.s_stat == s
    assert mk_row.n_pairs == n * (n - 1) // 2
    assert abs(mk_row.var_s - round(var_s, 4)) < 1e-9
    assert abs(mk_row.z_mk - z) < 1e-5


def test_mann_kendall_agrees_with_theil_sen_direction(spark, mk_row):
    """The test statistic's sign and the Theil–Sen slope's sign answer
    the same question; they must not contradict on a strong trend."""
    from flink_connector_http_spark.plans.relational import q_theil_sen_trend

    slope = q_theil_sen_trend(spark, SF).collect()[0].slope_per_day
    if mk_row.trend == "increasing":
        assert slope > 0
    elif mk_row.trend == "decreasing":
        assert slope < 0


def test_msprt_always_valid_invariants(spark):
    """The always-valid p is a running min per event type (monotone
    non-increasing), bounded in (0, 1], with non-decreasing cumulative
    arm counts — the properties that make peeking safe."""
    rows = q_ab_msprt_always_valid(spark, SF).collect()
    assert rows
    by_type = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        prev = by_type.get(r.event_type)
        assert 0.0 <= r.p_always_valid <= 1.0
        if prev is not None:
            assert r.p_always_valid <= prev.p_always_valid + 1e-12
            # counts are cumulative THROUGH days the arm traded; a day
            # where an arm is silent reports 0 (the documented
            # day-sparse NULL semantics), so monotonicity applies only
            # to non-zero readings
            if r.n_control > 0 and prev.n_control > 0:
                assert r.n_control >= prev.n_control
            if r.n_treat > 0 and prev.n_treat > 0:
                assert r.n_treat >= prev.n_treat
        by_type[r.event_type] = r


def test_shapley_efficiency_property(spark):
    """Σ_i φ_i = v(grand coalition) − v(empty set): the fair-division
    axiom exact Shapley values satisfy by construction — recompute the
    two boundary coalition values independently and check the four
    reported values sum to their difference (up to 6dp rounding)."""
    phis = {r.channel: r.shapley_value
            for r in q_attribution_shapley(spark, SF).collect()}
    sets = spark.sql(f"""
        WITH fp AS (
          SELECT user_id, MIN(ts) AS t0,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fpts
          FROM parquet.`{SF}/events.parquet` GROUP BY user_id
        ),
        users AS (
          SELECT e.user_id,
                 CAST(MAX(CASE WHEN e.event_type = 'view'
                           AND (fp.fpts IS NULL OR e.ts < fp.fpts)
                          THEN 1 ELSE 0 END)
                    + MAX(CASE WHEN e.event_type = 'click'
                           AND (fp.fpts IS NULL OR e.ts < fp.fpts)
                          THEN 2 ELSE 0 END)
                    + MAX(CASE WHEN e.event_type = 'signup'
                           AND (fp.fpts IS NULL OR e.ts < fp.fpts)
                          THEN 4 ELSE 0 END)
                    + MAX(CASE WHEN e.event_type = 'error'
                           AND (fp.fpts IS NULL OR e.ts < fp.fpts)
                          THEN 8 ELSE 0 END) AS INT) AS mask,
                 MAX(CASE WHEN fp.fpts IS NOT NULL
                           AND fp.fpts <= fp.t0 + INTERVAL 3 DAY
                          THEN 1 ELSE 0 END) AS converted
          FROM parquet.`{SF}/events.parquet` e
          JOIN fp ON fp.user_id = e.user_id
          GROUP BY e.user_id
        )
        SELECT mask, COUNT(*) AS tot, SUM(converted) AS conv
        FROM users GROUP BY mask
    """).collect()
    v = {r.mask: r.conv / r.tot for r in sets}
    expected = v.get(15, 0.0) - v.get(0, 0.0)
    assert abs(sum(phis.values()) - expected) < 5e-5


def test_holt_fold_matches_python_reference(spark):
    """Replay the Holt recursion (alpha=.5, beta=.25) in Python over
    the same daily series and compare level/trend/MAE."""
    from flink_connector_http_spark.plans.relational import (
        q_holt_linear_forecast,
    )

    row = q_holt_linear_forecast(spark, SF).collect()[0]
    daily = (
        spark.sql(
            "SELECT datediff(o_orderdate, DATE '1992-01-01') AS di,"
            " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y"
            f" FROM parquet.`{SF}/orders.parquet` GROUP BY 1 ORDER BY 1"
        )
        .collect()
    )
    ys = [r.y for r in daily]
    l, b, prev = ys[0], 0.0, ys[0]
    err = errn = 0.0
    for y in ys[1:]:
        err += abs(y - (l + b))
        errn += abs(y - prev)
        l_new = 0.5 * y + 0.5 * (l + b)
        b = 0.25 * (l_new - l) + 0.75 * b
        l, prev = l_new, y
    cnt = len(ys) - 1
    assert row.n_days == len(ys)
    assert abs(row.level_final - round(l, 4)) < 1e-6
    assert abs(row.trend_final - round(b, 4)) < 1e-6
    assert abs(row.mae_holt - round(err / cnt, 4)) < 1e-6
    assert abs(row.mae_naive1 - round(errn / cnt, 4)) < 1e-6
