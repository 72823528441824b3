"""The two-phase distributed ranking helpers (plans/relational:
_global_rank / _ntile_expr / _global_cumsum) must be EXACTLY equivalent
to the naive single-partition window formulations they replace —
including at bucket boundaries, under heavy ties on the bucket key, and
when n < k (NTILE's short-tile edge)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_connector_http_spark.plans.relational import (
    _global_cumsum,
    _global_rank,
    _ntile_expr,
)


def _data(spark, n, tie_every=1):
    """n rows; value repeats every `tie_every` ids (tie_every>1 forces
    duplicate bucket keys straddling would-be boundaries)."""
    rows = [(i, (i // tie_every) * 3 % 97) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long")


@pytest.mark.parametrize("n,tie_every,buckets", [
    (1, 1, 8), (7, 1, 8), (64, 1, 8), (200, 1, 8),
    (200, 5, 8),   # ties share buckets
    (200, 50, 4),  # few distinct keys << buckets: most buckets empty
    (23, 1, 64),   # more buckets than rows
])
def test_global_rank_matches_naive_window(spark, n, tie_every, buckets):
    df = _data(spark, n, tie_every)
    got = _global_rank(
        df, "CAST(v AS DOUBLE)", [F.asc("v"), F.asc("id")],
        n_buckets=buckets, with_total=True,
    )
    rows = {r["id"]: (r["__rank"], r["__n"]) for r in got.collect()}
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    naive = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert {k: v[0] for k, v in rows.items()} == naive
    assert all(v[1] == n for v in rows.values())


@pytest.mark.parametrize("n,k", [
    (1, 5), (3, 5), (5, 5), (7, 5), (23, 5), (100, 5),
    (9, 10), (10, 10), (101, 10),
])
def test_ntile_expr_matches_window_ntile(spark, n, k):
    df = _data(spark, n)
    got = (
        _global_rank(df, "CAST(v AS DOUBLE)",
                     [F.asc("v"), F.asc("id")], with_total=True)
        .withColumn("tile", F.expr(_ntile_expr(k)))
    )
    tiles = {r["id"]: r["tile"] for r in got.collect()}
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    naive = {
        r["id"]: r["t"]
        for r in df.withColumn("t", F.ntile(k).over(w)).collect()
    }
    assert tiles == naive


@pytest.mark.parametrize("n,tie_every", [(1, 1), (64, 1), (200, 7)])
def test_global_cumsum_matches_naive_window(spark, n, tie_every):
    df = _data(spark, n, tie_every)
    got = _global_cumsum(
        df, "-v", [F.desc("v"), F.asc("id")], "v", with_total=True,
    )
    rows = {r["id"]: (r["__cum"], r["__total"]) for r in got.collect()}
    w = (
        Window.orderBy(F.desc("v"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = sum(r["v"] for r in df.collect())
    naive = {
        r["id"]: r["c"]
        for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }
    assert {k: v[0] for k, v in rows.items()} == naive
    assert all(v[1] == total for v in rows.values())


def test_global_rank_null_keys_sort_first(spark):
    """Spark sorts NULLs first ascending; null bucket keys must land in
    bucket 0 so the two-phase rank agrees with the naive window."""
    df = spark.createDataFrame(
        [(0, None), (1, 5), (2, None), (3, 1)], "id long, v long"
    )
    got = _global_rank(df, "CAST(v AS DOUBLE)", [F.asc("v"), F.asc("id")])
    rows = {r["id"]: r["__rank"] for r in got.collect()}
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    naive = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert rows == naive


# hypothesis sweep: arbitrary duplicate-heavy integer data must rank
# identically to the naive window, whatever the bucket boundaries land on
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=120),
    buckets=st.sampled_from([2, 8, 64]),
)
def test_global_rank_property_random_data(spark, vals, buckets):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r["id"]: r["__rank"]
        for r in _global_rank(
            df, "CAST(v AS DOUBLE)", [F.asc("v"), F.asc("id")],
            n_buckets=buckets,
        ).collect()
    }
    order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    naive = {i: rk + 1 for rk, i in enumerate(order)}
    assert got == naive
