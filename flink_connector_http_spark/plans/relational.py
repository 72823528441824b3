"""Relational substrate queries (SURVEY §2.4): aggregations, multi-way joins,
window functions, rollup/cube/grouping sets, set ops, scalar string/date/JSON
functions, sessionization, as-of enrichment.

The reference implements **none** of these itself — they come from the host
engine (SURVEY.md §2.4, verified absence of aggregate/window/sort code in
`/root/reference/`). Here they are all Catalyst built-ins, expressed with the
DataFrame API so predicate pushdown / column pruning / broadcast-join
selection are automatic; each query carries a DuckDB oracle for the driver's
correctness gate.

Scale notes (100 TB design stance):
- every filter is applied before joins/aggregations → pushed to the parquet
  scan (`PushedFilters` in `.explain`);
- small dims (region/nation/supplier/part/customer) sit far below the
  broadcast threshold → Catalyst/AQE picks broadcast-hash joins, so the only
  shuffles left are the final aggregations on already-reduced data;
- aggregates are expressed with built-in functions only → whole-stage
  codegen, map-side partial aggregation, no Python in the hot path.

Float determinism: see ``registry.py`` — DECIMAL-exact arithmetic, DOUBLE at
the boundary. The expression strings below are valid in BOTH Spark SQL and
DuckDB, so the two engines run literally the same math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import load, register

# -- shared DECIMAL-exact arithmetic (identical text in Spark SQL and DuckDB) --

DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(10,2)) * "
    "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(10,2))) "
    "AS DECIMAL(22,4))"
)
CHARGE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(10,2)) * "
    "CAST((CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(10,2))) * "
    "(CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(10,2))) "
    "AS DECIMAL(23,4)) AS DECIMAL(34,6))"
)
D_QTY = "CAST(l_quantity AS DECIMAL(10,2))"
D_PRICE = "CAST(l_extendedprice AS DECIMAL(10,2))"
D_DISC = "CAST(l_discount AS DECIMAL(10,2))"
D_TOTAL = "CAST(o_totalprice AS DECIMAL(10,2))"


def _range_bucket(
    df: DataFrame, bucket_expr: str, n_buckets: int = 64
) -> DataFrame:
    """Deterministic order-respecting range buckets: ``percentile_approx``
    on ``bucket_expr`` (one tiny agg, broadcast back) assigns each row a
    ``__bucket`` in [0, n_buckets) that ascends with the expression —
    ties always share a bucket, so per-bucket windows + a bounded
    bucket-summary pass reconstruct any global ordered computation
    without a single-partition exchange. Adds ``__bkey`` and ``__bucket``."""
    keyed = df.withColumn("__bkey", F.expr(bucket_expr).cast("double"))
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = keyed.agg(
        F.percentile_approx("__bkey", fracs, 10000).alias("__bs"))
    return (
        keyed.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__bucket",
            F.expr(
                "aggregate(__bs, 0, (acc, b) -> "
                "acc + CASE WHEN __bkey > b THEN 1 ELSE 0 END)"
            ),
        )
        .drop("__bs")
    )


def _global_rank(
    df: DataFrame,
    bucket_expr: str,
    order_cols: list,
    rank_col: str = "__rank",
    n_buckets: int = 64,
    with_total: bool = False,
) -> DataFrame:
    """Global 1-based ROW_NUMBER over ``order_cols`` WITHOUT a
    single-partition window: a naive ``Window.orderBy`` funnels every row
    through one task's sort, which is the classic 100x scale-killer for
    entity-grain ranking (customers, parts, pairs).

    Two-phase distributed rank instead:
      1. ``percentile_approx`` on ``bucket_expr`` (one tiny agg, ~10 KB
         broadcast) yields ``n_buckets`` order-respecting range buckets —
         ties on the bucket key always land in the same bucket, so any
         ordering refinement by tie-break columns stays intra-bucket;
      2. per-bucket ``row_number`` windows run in PARALLEL;
      3. bucket-count prefix offsets (a window over <= ``n_buckets``
         rows — bounded, never data-sized) are broadcast back and added.

    The result is EXACT regardless of boundary quality; boundary skew only
    costs balance, not correctness. ``bucket_expr`` must be a numeric SQL
    expression that ASCENDS with ``order_cols`` (negate for DESC sorts).
    ``with_total`` additionally attaches the total row count as ``__n``
    (from the bucket totals — no extra scan of the input).

    Cost shape: the three phases each recompute ``df``'s lineage (bounds
    agg, per-bucket windows, offset counts) — for a pre-aggregated input
    that is up to three pruned-column scans of the underlying fact table,
    all map-side-combined. That trade is deliberate: re-scanning a
    columnar projection across the cluster scales linearly, while the
    single-partition sort this replaces pins the whole entity set to ONE
    task. Callers on hot paths can persist the input first if the
    aggregate is small enough to cache.
    """
    bucketed = _range_bucket(df, bucket_expr, n_buckets)
    w_local = Window.partitionBy("__bucket").orderBy(*order_cols)
    local = bucketed.withColumn("__lrank", F.row_number().over(w_local))
    # <= n_buckets rows: the only sequential step is over bucket TOTALS
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__bc"))
        .withColumn(
            "__off", F.coalesce(F.sum("__bc").over(w_off), F.lit(0)))
    )
    if with_total:
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)
        offsets = offsets.withColumn("__n", F.sum("__bc").over(w_all))
    offsets = offsets.drop("__bc")
    out = (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            rank_col, (F.col("__off") + F.col("__lrank")).cast("bigint"))
        .drop("__bkey", "__bucket", "__lrank", "__off")
    )
    return out


def _global_cumsum(
    df: DataFrame,
    bucket_expr: str,
    order_cols: list,
    value_col: str,
    cum_col: str = "__cum",
    n_buckets: int = 64,
    with_total: bool = False,
) -> DataFrame:
    """Global running SUM of ``value_col`` over ``order_cols`` without a
    single-partition window — same two-phase shape as ``_global_rank``:
    parallel per-bucket cumsums + a prefix sum over <= ``n_buckets``
    bucket TOTALS broadcast back. ``with_total`` attaches the grand
    total as ``__total`` (from the same bucket totals, no extra scan)."""
    bucketed = _range_bucket(df, bucket_expr, n_buckets)
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__lcum", F.sum(value_col).over(w_local))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.sum(value_col).alias("__bt"))
        .withColumn("__off", F.sum("__bt").over(w_off))
    )
    if with_total:
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)
        offsets = offsets.withColumn("__total", F.sum("__bt").over(w_all))
    offsets = offsets.drop("__bt")
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            cum_col,
            F.coalesce(F.col("__off"), F.lit(0)) + F.col("__lcum"))
        .drop("__bkey", "__bucket", "__lcum", "__off")
    )


def _ntile_expr(k: int, rank_col: str = "__rank", n_col: str = "__n") -> str:
    """Exact NTILE(k) from a global rank and total count: the first
    ``n % k`` tiles get ``n div k + 1`` rows, the rest ``n div k`` —
    the same tile assignment as the window function, computed from the
    two-phase rank so no single-partition NTILE window is needed."""
    q = f"(CAST({n_col} AS BIGINT) DIV {k})"
    r = f"(CAST({n_col} AS BIGINT) % {k})"
    big = f"({r} * ({q} + 1))"
    return (
        f"CAST(CASE WHEN {rank_col} <= {big} "
        f"THEN CEIL({rank_col} / CAST({q} + 1 AS DOUBLE)) "
        f"ELSE {r} + CEIL(({rank_col} - {big}) / CAST({q} AS DOUBLE)) "
        f"END AS INT)"
    )


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({D_QTY}) AS DOUBLE) AS sum_qty,
           CAST(SUM({D_PRICE}) AS DOUBLE) AS sum_base_price,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({CHARGE}) AS DOUBLE) AS sum_charge,
           CAST(SUM({D_QTY}) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM({D_PRICE}) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM({D_DISC}) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shape pricing summary: hash agg with partial (map-side) combine.",
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem")
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"CAST(SUM({D_QTY}) AS DOUBLE)").alias("sum_qty"),
            F.expr(f"CAST(SUM({D_PRICE}) AS DOUBLE)").alias("sum_base_price"),
            F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("sum_disc_price"),
            F.expr(f"CAST(SUM({CHARGE}) AS DOUBLE)").alias("sum_charge"),
            F.expr(f"CAST(SUM({D_QTY}) AS DOUBLE) / COUNT(*)").alias("avg_qty"),
            F.expr(f"CAST(SUM({D_PRICE}) AS DOUBLE) / COUNT(*)").alias("avg_price"),
            F.expr(f"CAST(SUM({D_DISC}) AS DOUBLE) / COUNT(*)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q03 — shipping priority (join + agg + top-k)
# ---------------------------------------------------------------------------

@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT o_orderkey, o_orderdate,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: broadcast dim join + agg + deterministic top-k.",
    bench=True,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q05 — local supplier volume (6-way join)
# ---------------------------------------------------------------------------

@register(
    "q05_local_supplier",
    oracle=f"""
    SELECT n_name, CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join; all dims broadcast, one shuffle for the agg.",
    bench=True,
)
def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    region = t["region"].filter(F.col("r_name") == "ASIA")
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["customer"]),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q06 — forecast revenue change (scan-heavy scalar agg)
# ---------------------------------------------------------------------------

@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST({D_PRICE} * {D_DISC} AS DECIMAL(22,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan+filter+scalar agg; every predicate pushed to parquet.",
    bench=True,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(f"CAST(SUM(CAST({D_PRICE} * {D_DISC} AS DECIMAL(22,4))) AS DOUBLE)").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — volume shipping between nation pairs
# ---------------------------------------------------------------------------

@register(
    "q07_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: self-joined dim (nation×2), year() bucketing.",
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2")).alias("n1")
    n2 = t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2")).alias("n2")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(F.col("n1.n_name") != F.col("n2.n_name"))
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("volume"))
    )


# ---------------------------------------------------------------------------
# q09 — product-type profit by nation/year
# ---------------------------------------------------------------------------

@register(
    "q09_product_profit",
    oracle=f"""
    SELECT n_name, year(o_orderdate) AS o_year,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
    doc="TPC-H Q9 shape: LIKE-filtered part dim, profit rollup by nation/year.",
    bench=True,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    part = t["part"].filter(F.col("p_name").like("%red%"))
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("profit"))
    )


# ---------------------------------------------------------------------------
# q10 — returned-item losers (top 20 customers)
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue,
           any_value(c_acctbal) AS c_acctbal
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-lineitem revenue per customer, deterministic top-20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("revenue"),
            F.expr("any_value(c_acctbal)").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

@register(
    "q_top3_customers_per_nation",
    oracle=f"""
    WITH rev AS (
      SELECT c_nationkey, c_custkey,
             CAST(SUM({D_TOTAL}) AS DOUBLE) AS revenue
      FROM customer, orders
      WHERE c_custkey = o_custkey
      GROUP BY c_nationkey, c_custkey
    )
    SELECT n_name, c_custkey, revenue, rk FROM (
      SELECT c_nationkey, c_custkey, revenue,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY revenue DESC, c_custkey) AS rk
      FROM rev
    ) t JOIN nation ON n_nationkey = c_nationkey
    WHERE rk <= 3
    """,
    doc="Ranking window function: top-3 revenue customers per nation.",
    bench=True,
)
def q_top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer", "orders", "nation")
    rev = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.expr(f"CAST(SUM({D_TOTAL}) AS DOUBLE)").alias("revenue"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "revenue", "rk")
    )


@register(
    "q_running_value_by_user",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(10,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_event_type
    FROM events
    """,
    doc="Analytic window frame: running sum + lag over a deterministic event order.",
)
def q_running_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.expr("CAST(value AS DECIMAL(10,2))").alias("_v"),
        F.lag("event_type").over(w).alias("prev_event_type"),
        "ts",
    ).select(
        "event_id",
        "user_id",
        F.sum("_v").over(frame).cast("double").alias("running_value"),
        "prev_event_type",
    )


# ---------------------------------------------------------------------------
# rollup / cube / grouping sets
# ---------------------------------------------------------------------------

@register(
    "q_rollup_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM({D_TOTAL}) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy totals with GROUPING() disambiguation.",
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(f"CAST(SUM({D_TOTAL}) AS DOUBLE)").alias("total_price"),
        )
    )


@register(
    "q_cube_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n_items,
           CAST(SUM({D_QTY}) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dimensions.",
)
def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n_items"),
            F.expr(f"CAST(SUM({D_QTY}) AS DOUBLE)").alias("sum_qty"),
        )
    )


@register(
    "q_grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM({D_TOTAL}) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    doc="GROUPING SETS (disjoint one-dimension slices).",
)
def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")["orders"]
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM({D_TOTAL}) AS DOUBLE) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# distinct aggregation / set ops
# ---------------------------------------------------------------------------

@register(
    "q_distinct_parts_suppliers",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multi-distinct aggregation (expand + two-phase distinct agg in Spark).",
)
def q_distinct_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_setops_customers",
    oracle="""
    SELECT 'never_ordered' AS bucket, c_custkey FROM (
      SELECT c_custkey FROM customer EXCEPT SELECT o_custkey AS c_custkey FROM orders
    ) a
    UNION ALL
    SELECT 'big_spender_building' AS bucket, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    ) b
    """,
    doc="Set operations: EXCEPT (anti) + INTERSECT (semi), bucket-labelled union.",
)
def q_setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer", "orders")
    cust_keys = t["customer"].select("c_custkey")
    order_keys = t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    never = cust_keys.exceptAll(order_keys).distinct()
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        t["orders"].filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    inter = building.intersect(big)
    return never.select(F.lit("never_ordered").alias("bucket"), "c_custkey").unionAll(
        inter.select(F.lit("big_spender_building").alias("bucket"), "c_custkey")
    )


# ---------------------------------------------------------------------------
# scalar function surface: string / date / JSON
# ---------------------------------------------------------------------------

@register(
    "q_string_date_functions",
    oracle=f"""
    SELECT upper(substr(o_orderpriority, 3)) AS prio,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           COUNT(*) AS n_orders,
           CAST(SUM({D_TOTAL}) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY prio, yr, mo
    """,
    doc="String (upper/substr) and date-part (year/month) scalar functions.",
)
def q_string_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(
            F.upper(F.expr("substr(o_orderpriority, 3)")).alias("prio"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(f"CAST(SUM({D_TOTAL}) AS DOUBLE)").alias("total_price"),
        )
    )


@register(
    "q_json_events",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    doc="JSON field extraction from a string column (get_json_object / JSONPath).",
)
def q_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# sessionization (gap-based) and as-of enrichment
# ---------------------------------------------------------------------------

@register(
    "q_sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                       OR date_diff('second',
                                    LAG(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id),
                                    ts) > 3600
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
    doc="Gap-based sessionization (1h inactivity) via lag window — the batch "
        "analogue of session_window(); streaming variant lives in streaming/.",
    bench=True,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 3600),
        1,
    ).otherwise(0)
    return (
        ev.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "q_asof_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id, MAX(o.o_orderdate) AS last_order_date
    FROM events e LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    WHERE e.event_type = 'purchase'
    GROUP BY e.event_id, e.user_id
    """,
    doc="As-of (point-in-time) enrichment: latest order at or before each event; "
        "range join kept broadcast-able on the probe side.",
)
def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "events", "orders")
    ev = t["events"].filter(F.col("event_type") == "purchase")
    o = t["orders"].select("o_custkey", "o_orderdate")
    return (
        ev.join(
            o,
            (F.col("o_custkey") == F.col("user_id"))
            & (F.col("o_orderdate") <= F.col("ts")),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(F.max("o_orderdate").alias("last_order_date"))
    )


# ---------------------------------------------------------------------------
# subquery shapes: EXISTS / NOT EXISTS / IN-HAVING / correlated scalar /
# uncorrelated scalar — Catalyst rewrites all of these to semi/anti/
# broadcast joins, which is exactly the 100 TB plan you'd hand-write.
# (Adapted to the slimmed test schema: no l_commitdate/l_receiptdate or
# c_phone, so the classic TPC-H predicates use the available columns.)
# ---------------------------------------------------------------------------

@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS → left-semi join with a non-equi "
        "term (l_shipdate > o_orderdate); the date filter prunes the probe "
        "side before the join.",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = t["lineitem"]
    has_late_ship = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return has_late_ship.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q12_shipping_modes",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape (TPC-H Q12 proper keys on l_shipmode/commitdate/"
        "receiptdate, which the reduced synthetic schema lacks — "
        "returnflag stands in for shipmode and ship-lag > 30 days for "
        "the late-commit predicate): per shipping class, how many line "
        "items of high- vs low-priority orders shipped late in the "
        "window. The year filter reaches the lineitem scan; the lag "
        "predicate rides the orderkey join; one final 3-group aggregate.",
)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    return (
        t["orders"]
        .join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate")
               >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("high_line_count"),
            F.expr(
                "CAST(SUM(CASE WHEN o_orderpriority NOT IN "
                "('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: outer join with an ON-clause filter, per-customer "
        "count, then count distribution. Two shuffles (custkey, c_count), "
        "both on already-reduced data.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer", "orders")
    cust = t["customer"].select("c_custkey")
    # filtering the right side before a LEFT join ≡ the ON-clause filter
    orders = t["orders"].filter(F.col("o_orderstatus") != "F").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE}
                                 ELSE CAST(0.0 AS DECIMAL(22,4)) END) AS DOUBLE)
                 / CAST(SUM({DISC_PRICE}) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional aggregation over a broadcast dim join; "
        "the month filter reaches the lineitem scan, part is broadcast.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(
                f"100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE} "
                f"ELSE CAST(0.0 AS DECIMAL(22,4)) END) AS DOUBLE) "
                f"/ CAST(SUM({DISC_PRICE}) AS DOUBLE)"
            ).alias("promo_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({D_PRICE}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(10,2))) AS DOUBLE)
                      / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part 0.2×avg "
        "quantity threshold) → per-part aggregate joined back; part filter "
        "broadcast, threshold DECIMAL-exact so both engines agree.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "part")
    pt = t["part"].filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    joined = t["lineitem"].join(
        F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey")
    )
    # the correlated subquery ranges over ALL lineitems of the part; the
    # brand filter touches only part attributes, so aggregating the joined
    # rows per part computes the identical threshold
    thresh = joined.groupBy("p_partkey").agg(
        F.expr(
            "0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE)"
            " / COUNT(*))"
        ).alias("qty_thresh")
    ).withColumnRenamed("p_partkey", "t_partkey")
    return (
        joined.join(
            F.broadcast(thresh), F.col("p_partkey") == F.col("t_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.expr(f"CAST(SUM({D_PRICE}) AS DOUBLE) / 7.0").alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST({D_TOTAL} AS DOUBLE) AS total_price,
           CAST(SUM({D_QTY}) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 212
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY total_price DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: IN (GROUP BY … HAVING) → semi join against the "
        "aggregated order set, then enrich + re-aggregate; deterministic "
        "top-k tie-break on o_orderkey.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(10,2)))").alias("q"))
        .filter(F.col("q") > 212)
        .select("l_orderkey")
    )
    orders = t["orders"].join(
        big, F.col("o_orderkey") == big["l_orderkey"], "left_semi"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.expr(f"CAST(SUM({D_QTY}) AS DOUBLE)").alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.expr(f"CAST({D_TOTAL} AS DOUBLE)").alias("total_price"),
            "total_qty",
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q22_dormant_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.00
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape (schema-adapted: no c_phone, and every customer "
        "has at least one order, so 'dormant' = no orders since 2000): "
        "uncorrelated scalar subquery broadcast as a 1-row join + NOT "
        "EXISTS → left-anti join on the date-pruned orders scan.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer", "orders")
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0.00).agg(
        F.expr(
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*)"
        ).alias("ab")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr(
                "CAST(SUM(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE)"
            ).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q08 — market share (8-way join, conditional share aggregation)
# ---------------------------------------------------------------------------

@register(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                         ELSE CAST(0.0 AS DECIMAL(22,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {DISC_PRICE} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY'
    ) allnations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one supplier nation's revenue share per year within "
        "a region×part-type market. All five dims broadcast; lineitem is the "
        "only big side, so the plan is a chain of broadcast joins over a "
        "single fact scan, then one tiny agg shuffle on o_year.",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "part", "supplier", "lineitem", "orders",
             "customer", "nation", "region")
    part = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    region = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    vol = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.expr("CAST(EXTRACT(year FROM o_orderdate) AS INT)").alias("o_year"),
            F.expr(DISC_PRICE).alias("volume"),
            "nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.expr(
            "CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume "
            "ELSE CAST(0.0 AS DECIMAL(22,4)) END) AS DOUBLE) "
            "/ CAST(SUM(volume) AS DOUBLE)"
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# q15 — top supplier (aggregate-defined view + scalar max subquery)
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({DISC_PRICE}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: revenue view + scalar MAX subquery over it; the "
        "max is a 1-row broadcast joined back, DECIMAL-exact so the "
        "equality is safe cross-engine.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "supplier", "lineitem")
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t["supplier"]),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# rolling time-range window (RANGE frame over event time)
# ---------------------------------------------------------------------------

_7D_US = 7 * 24 * 3600 * 1_000_000


@register(
    "q_rolling_7d_user",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) OVER w AS DOUBLE)
               AS rolling_value,
           COUNT(*) OVER w AS rolling_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_7D_US} PRECEDING AND CURRENT ROW)
    """,
    doc="Per-user rolling 7-day sum/count via a RANGE window frame on epoch "
        "micros (exact frame edges in both engines; an interval frame on "
        "raw timestamps would hide sub-second boundary semantics). One "
        "shuffle on user_id + per-partition sort — the minimal plan.",
)
def q_rolling_7d_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "events")
    ev = t["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-_7D_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.expr("CAST(value AS DECIMAL(10,2))"))
        .over(w)
        .cast("double")
        .alias("rolling_value"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
    )


# ---------------------------------------------------------------------------
# pivot (status columns per order-year)
# ---------------------------------------------------------------------------

@register(
    "q_pivot_status_revenue",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN {D_TOTAL}
                         ELSE CAST(0.0 AS DECIMAL(10,2)) END) AS DOUBLE) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN {D_TOTAL}
                         ELSE CAST(0.0 AS DECIMAL(10,2)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN {D_TOTAL}
                         ELSE CAST(0.0 AS DECIMAL(10,2)) END) AS DOUBLE) AS P
    FROM orders
    GROUP BY o_year
    """,
    doc="Pivot: per-year total price spread across order-status columns "
        "(explicit value list, so Catalyst skips the distinct-values scan "
        "and plans a single conditional aggregation — the same plan as the "
        "oracle's CASE rewrite).",
)
def q_pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders")
    return (
        t["orders"]
        .select(
            F.expr("CAST(EXTRACT(year FROM o_orderdate) AS INT)").alias("o_year"),
            "o_orderstatus",
            F.expr(D_TOTAL).alias("price"),
        )
        .groupBy("o_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.expr("CAST(SUM(price) AS DOUBLE)"))
        .na.fill(0.0, ["F", "O", "P"])
    )


# ---------------------------------------------------------------------------
# unpivot (wide metrics → long rows via stack)
# ---------------------------------------------------------------------------

@register(
    "q_unpivot_metrics",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(SUM({D_QTY}) AS DOUBLE) AS sum_qty,
             CAST(SUM({D_PRICE}) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM m
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM m
    """,
    doc="Unpivot: per-returnflag wide metrics melted to (metric, value) "
        "long rows via stack() — a zero-shuffle per-row expansion above "
        "the aggregation (the oracle's UNION ALL rewrite is the same "
        "relational algebra).",
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem")
    wide = t["lineitem"].groupBy("l_returnflag").agg(
        F.expr(f"CAST(SUM({D_QTY}) AS DOUBLE)").alias("sum_qty"),
        F.expr(f"CAST(SUM({D_PRICE}) AS DOUBLE)").alias("sum_price"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price) "
            "AS (metric, value)"
        ),
    )


# ---------------------------------------------------------------------------
# column profiling (ANALYZE TABLE-style stats in one pass)
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    # (name, numeric extraction expr — identical text in Spark and DuckDB)
    ("o_orderkey", "CAST(o_orderkey AS DOUBLE)"),
    ("o_custkey", "CAST(o_custkey AS DOUBLE)"),
    ("o_totalprice", "CAST(CAST(o_totalprice AS DECIMAL(10,2)) AS DOUBLE)"),
    ("o_orderdate", "CAST(epoch_us_expr AS DOUBLE)"),
    ("o_orderstatus", None),
    ("o_orderpriority", None),
]


def _profile_oracle() -> str:
    parts = []
    for name, num in _PROFILE_COLS:
        num_expr = (num or "NULL").replace("epoch_us_expr", "epoch_us(o_orderdate)")
        parts.append(f"""
        SELECT '{name}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
               MIN({num_expr}) AS min_num,
               MAX({num_expr}) AS max_num
        FROM orders""")
    return " UNION ALL ".join(parts)


@register(
    "q_profile_orders",
    oracle=_profile_oracle(),
    doc="Column profiling: per-column row/null/exact-distinct counts and "
        "numeric min/max (timestamps as epoch micros, non-numerics NULL) — "
        "the ANALYZE TABLE statistics a query optimizer or data-quality "
        "gate consumes. Spark runs it as one multi-distinct aggregate over "
        "a single scan (Expand + partial aggs), vs the oracle's 6-scan "
        "UNION ALL — same result, one pass.",
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders")
    aggs = []
    for name, num in _PROFILE_COLS:
        num_expr = (num or "NULL").replace(
            "epoch_us_expr", "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
        )
        aggs += [
            F.expr(f"CAST(COUNT(*) - COUNT({name}) AS BIGINT)").alias(f"{name}__nulls"),
            F.expr(f"CAST(COUNT(DISTINCT {name}) AS BIGINT)").alias(f"{name}__distinct"),
            F.expr(f"MIN({num_expr})").alias(f"{name}__min"),
            F.expr(f"MAX({num_expr})").alias(f"{name}__max"),
        ]
    wide = t["orders"].agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__nulls, {name}__distinct, "
        f"CAST({name}__min AS DOUBLE), CAST({name}__max AS DOUBLE)"
        for name, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_nulls, n_distinct, min_num, max_num)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_num", "max_num")


# ---------------------------------------------------------------------------
# CDC compaction: latest row per key
# ---------------------------------------------------------------------------

@register(
    "q_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type,
           CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE) AS value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    ) t WHERE rk = 1
    """,
    doc="Upsert/CDC compaction: keep the latest row per key "
        "(deterministic ts, event_id tie-break) — the merge-on-read "
        "compaction every changelog consumer needs. One shuffle on the "
        "key; at scale this is the same plan as MERGE INTO's dedup stage.",
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id", "event_id", "ts", "event_type",
            F.expr("CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE)").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# exact Pearson correlation (order-independent formulation)
# ---------------------------------------------------------------------------

# built-in corr() accumulates co-moments in floating point — result depends
# on partition merge order. This formulation uses DECIMAL-exact sums, so
# both engines compute the identical double from the same 6 exact numbers.
_CORR_TERMS = """
      CAST(COUNT(*) AS DOUBLE) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sx,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sy,
      CAST(SUM(CAST(l_quantity AS DECIMAL(10,2)) *
               CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sxx,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) *
               CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS syy,
      CAST(SUM(CAST(l_quantity AS DECIMAL(10,2)) *
               CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sxy
"""
_CORR_R = (
    "round((n * sxy - sx * sy) / "
    "(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)"
)


@register(
    "q_corr_qty_price",
    oracle=f"""
    SELECT l_returnflag, {_CORR_R} AS r, CAST(n AS BIGINT) AS n_rows
    FROM (
      SELECT l_returnflag, {_CORR_TERMS}
      FROM lineitem GROUP BY l_returnflag
    ) t
    """,
    doc="Exact Pearson correlation of quantity vs price per return flag, "
        "from DECIMAL-exact sufficient statistics (n, Σx, Σy, Σx², Σy², "
        "Σxy) — unlike the built-in corr(), the result is independent of "
        "partition merge order, so it is bit-reproducible across engines "
        "and cluster sizes. Single scan, map-side partial aggregation.",
)
def q_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    terms = li.groupBy("l_returnflag").agg(
        *[
            F.expr(term.strip().rsplit(" AS ", 1)[0]).alias(
                term.strip().rsplit(" AS ", 1)[1]
            )
            for term in _CORR_TERMS.strip().split(",\n")
        ]
    )
    return terms.select(
        "l_returnflag",
        F.expr(_CORR_R).alias("r"),
        F.expr("CAST(n AS BIGINT)").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# funnel analysis (ordered view → click → purchase conversion)
# ---------------------------------------------------------------------------

@register(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after
    """,
    doc="Ordered funnel: users with a view, then a click strictly after "
        "their first view, then a purchase strictly after that first "
        "click. Three per-user min-aggregations chained by range-predicate "
        "joins — each stage shrinks the key set, so at scale each join's "
        "build side is the (small) surviving cohort, broadcastable.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]

    def stage(event_type: str, after, after_col: str):
        e = ev.filter(F.col("event_type") == event_type)
        if after is not None:
            # no broadcast hint: the cohort shrinks per stage but still
            # scales with user count — let AQE broadcast when it fits
            e = e.join(after, "user_id").filter(
                F.col("ts") > F.col(after_col)
            )
        return e.groupBy("user_id").agg(F.min("ts").alias(f"t_{event_type}"))

    v = stage("view", None, "")
    c = stage("click", v, "t_view")
    p = stage("purchase", c, "t_click")
    counts = [
        df.agg(F.count(F.lit(1)).cast("bigint").alias(name))
        for df, name in
        [(v, "n_viewed"), (c, "n_clicked_after"), (p, "n_purchased_after")]
    ]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


# ---------------------------------------------------------------------------
# range join (band join on a numeric interval dim)
# ---------------------------------------------------------------------------

N_PRICE_BANDS = 25
BAND_WIDTH = 4.0
BAND_BASE = 900.0


@register(
    "q_range_join_price_bands",
    oracle=f"""
    WITH bands AS (
      SELECT i AS band_id,
             {BAND_BASE} + i * {BAND_WIDTH} AS lo,
             {BAND_BASE} + (i + 1) * {BAND_WIDTH} AS hi
      FROM unnest(range(0, {N_PRICE_BANDS})) AS t(i)
    )
    SELECT band_id,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(10,2))) AS DOUBLE)
               AS sum_price
    FROM part JOIN bands
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band_id
    """,
    doc="Range (band) join: parts matched to price intervals via non-equi "
        "predicates. The interval dim is tiny and broadcast, so the plan "
        "is a BroadcastNestedLoopJoin over a single fact scan — the right "
        "shape when the band table is small; for large interval tables "
        "the same query bucketizes both sides on floor(price/width) first "
        "(equi-join on bucket + residual range filter).",
)
def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "part")
    bands = spark.range(N_PRICE_BANDS).select(
        F.col("id").alias("band_id"),
        (F.lit(BAND_BASE) + F.col("id") * BAND_WIDTH).alias("lo"),
        (F.lit(BAND_BASE) + (F.col("id") + 1) * BAND_WIDTH).alias("hi"),
    )
    return (
        t["part"]
        .join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr(
                "CAST(SUM(CAST(p_retailprice AS DECIMAL(10,2))) AS DOUBLE)"
            ).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H-derived shapes (q02/q11/q16/q19/q20/q21, schema-adapted:
# the synthetic tables carry no partsupp/shipmode/commitdate, so each query
# keeps the original's OPTIMIZER shape — the part the reference delegates to
# its host engine — while sourcing the part↔supplier relationship from
# lineitem)
# ---------------------------------------------------------------------------

@register(
    "q02_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(10,2))) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT CAST(CAST(s_acctbal AS DECIMAL(10,2)) AS DOUBLE) AS s_acctbal,
           s_name, n_name, p_partkey,
           CAST(supply_cost AS DOUBLE) AS supply_cost
    FROM part, supplier, cost, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size = 15 AND p_type = 'PROMO'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND supply_cost = (
        SELECT MIN(c2.supply_cost)
        FROM cost c2, supplier s2, nation n2, region r2
        WHERE c2.l_partkey = p_partkey AND s2.s_suppkey = c2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (partsupp derived from lineitem): per-part argmin "
        "over a correlated aggregate subquery. Spark plan: the region-pruned "
        "cost table is aggregated once, the per-part MIN is a second "
        "aggregate broadcast back — one shuffle on (partkey,suppkey), dims "
        "broadcast. Deterministic top-k via (s_name,p_partkey) tie-break.",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "part", "supplier", "lineitem", "nation", "region")
    # suppliers restricted to the region — tiny, broadcast everywhere
    nat = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # partsupp analogue: min extendedprice per (part, supplier), built once
    # and reused for both the join and the correlated-min side (Spark caches
    # the exchange; at scale this is the one big shuffle in the query)
    cost = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr("MIN(CAST(l_extendedprice AS DECIMAL(10,2)))").alias("supply_cost"))
    )
    pt = t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
    # region-restricted costs only (the correlated subquery's domain)
    rcost = cost.join(F.broadcast(supp.select("s_suppkey")),
                      F.col("l_suppkey") == F.col("s_suppkey")).drop("s_suppkey")
    min_cost = rcost.groupBy("l_partkey").agg(
        F.min("supply_cost").alias("min_cost")
    ).withColumnRenamed("l_partkey", "m_partkey")
    return (
        rcost
        .join(F.broadcast(pt.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(min_cost), F.col("p_partkey") == F.col("m_partkey"))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.expr("CAST(CAST(s_acctbal AS DECIMAL(10,2)) AS DOUBLE)").alias("s_acctbal"),
            "s_name", "n_name", "p_partkey",
            F.expr("CAST(supply_cost AS DOUBLE)").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle=f"""
    SELECT l_partkey, CAST(SUM({DISC_PRICE}) AS DOUBLE) AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING CAST(SUM({DISC_PRICE}) AS DOUBLE) > (
      SELECT CAST(SUM({DISC_PRICE}) AS DOUBLE) * 0.001
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
    )
    """,
    doc="TPC-H Q11 shape: GROUP BY … HAVING SUM > fraction-of-global-total "
        "(uncorrelated scalar subquery). Spark plan: aggregate once per "
        "part, global total from a second aggregation of the SAME partial "
        "(no second lineitem scan at the logical level Catalyst dedups), "
        "1-row threshold broadcast via cross join. DECIMAL sums keep both "
        "engines bit-identical; the 0.001 multiply happens in DOUBLE on "
        "both sides.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "supplier", "nation")
    nat = t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = t["lineitem"].join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = li.groupBy("l_partkey").agg(
        F.expr(f"SUM({DISC_PRICE})").alias("v_dec")
    )
    total = per_part.agg(
        F.expr("CAST(SUM(v_dec) AS DOUBLE) * 0.001").alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.expr("CAST(v_dec AS DOUBLE) > threshold"))
        .select("l_partkey", F.expr("CAST(v_dec AS DOUBLE)").alias("part_value"))
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#45'
      AND p_type <> 'PROMO'
      AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.00
      )
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape ('complaint' suppliers = negative account balance): "
        "NOT IN over a not-null key → broadcast left-anti join, then "
        "COUNT(DISTINCT) grouped by part attributes. Part filters (<>, IN "
        "list) reach the parquet scan as PushedFilters.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "part", "lineitem", "supplier")
    pt = t["part"].filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0.00).select("s_suppkey")
    return (
        t["lineitem"].select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
         (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
          AND l_quantity >= 1 AND l_quantity <= 11)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
          AND l_quantity >= 10 AND l_quantity <= 20)
      OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
          AND l_quantity >= 20 AND l_quantity <= 30)
    )
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive clauses spanning both "
        "join sides. Catalyst extracts the common implied predicates "
        "(p_brand IN (...), l_quantity BETWEEN 1 AND 30) and pushes them "
        "below the join as scan filters; the full OR stays as the join "
        "residual on the broadcast-hash join — the plan Q19 exists to test.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("revenue"))
    )


@register(
    "q20_excess_shippers",
    oracle="""
    SELECT s_name, s_suppkey
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
          )
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 30
      )
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: nested IN subqueries (suppliers who shipped >30 "
        "units of any red part in 1997). Spark plan: inner IN → broadcast "
        "left-semi on the part scan (LIKE pushed down), HAVING aggregate on "
        "(suppkey,partkey), outer IN → second left-semi onto the broadcast "
        "supplier dim. No shuffle touches more than the filtered lineitems.",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(10,2)))").alias("q"))
        .filter(F.col("q") > 30)
        .select("l_suppkey").distinct()
    )
    nat = t["nation"].filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


@register(
    "q21_sole_blame_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape (adapted: 'kept waiting' = sole supplier with a "
        "returned line in a multi-supplier finished order). The correlated "
        "EXISTS/NOT EXISTS pair over the self-joined fact is rewritten as "
        "ONE per-order aggregate (distinct suppliers, distinct R-flag "
        "suppliers) joined back — a single extra shuffle on l_orderkey "
        "instead of two self-joins, the rewrite that matters at 100 TB.",
)
def q21_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    li = t["lineitem"]
    # per-order supplier stats replace both correlated subqueries:
    #   EXISTS other-supplier line      ≡ n_supp > 1
    #   NOT EXISTS other-supplier R-line ≡ the order's R-suppliers = {l1's}
    #                                      (l1 is itself R) ≡ n_r_supp = 1
    order_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    fo = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    nat = t["nation"].filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(fo, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# SCD2 validity intervals from a changelog (temporal dimension build)
# ---------------------------------------------------------------------------

@register(
    "q_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           CAST(LEAD(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY valid_from, event_id) IS NULL
                AS BOOLEAN) AS is_current
    FROM changes
    """,
    doc="SCD type-2 dimension build from a changelog: collapse each user's "
        "event stream to its change points, then derive "
        "[valid_from, valid_to) validity intervals with LEAD and flag the "
        "open (current) interval. The two windows and the change filter "
        "share one hash partitioning on user_id, so the whole history "
        "build is a single shuffle at any scale — the standard "
        "merge-free way to maintain temporal dimensions for training-data "
        "point-in-time joins.",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_ev))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id", "event_type", F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    # event_id tiebreak: two change points at an identical ts would
    # otherwise get an engine-nondeterministic LEAD order
    w_iv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        F.lead("valid_from").over(w_iv).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# point-in-time enrichment against SCD2 intervals (leakage-safe feature join)
# ---------------------------------------------------------------------------

_SCD2_CTE = """
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    intervals AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
"""


@register(
    "q_pit_enrichment",
    oracle=f"""
    WITH {_SCD2_CTE}
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           i.event_type AS state_at_order, i.valid_from AS state_since
    FROM orders o
    LEFT JOIN intervals i
      ON i.user_id = o.o_custkey
     AND i.valid_from <= o.o_orderdate
     AND (i.valid_to IS NULL OR o.o_orderdate < i.valid_to)
    """,
    doc="Point-in-time (as-of) enrichment: each order picks up the SCD2 "
        "state interval covering its order date — the leakage-safe feature "
        "join a training pipeline must use instead of joining current "
        "attributes onto historical examples. Equi-key on user_id carries "
        "the join (one shuffle per side); the interval predicates are "
        "post-join filters, and disjoint intervals guarantee at most one "
        "match per order. LEFT join keeps orders predating any state.",
)
def q_pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "events", "orders")
    ev = t["events"]
    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tiebreak keeps LEAD deterministic when two change points
    # share a timestamp (mirrors the oracle CTE exactly)
    w_iv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    intervals = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_ev))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id", "event_type", F.col("ts").alias("valid_from"),
            "event_id",
        )
        .withColumn("valid_to", F.lead("valid_from").over(w_iv))
        .drop("event_id")
    )
    o = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate")
    return o.join(
        intervals,
        (F.col("user_id") == F.col("o_custkey"))
        & (F.col("valid_from") <= F.col("o_orderdate"))
        & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to"))),
        "left",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("event_type").alias("state_at_order"),
        F.col("valid_from").alias("state_since"),
    )


# ---------------------------------------------------------------------------
# per-group z-score outliers (exact two-pass, no floating accumulation drift)
# ---------------------------------------------------------------------------

Z_THRESHOLD = 2.5

#: identical left-to-right IEEE chain in both engines; inputs are the
#: DECIMAL-exact per-group sums, so the double is bit-reproducible
_Z_EXPR = (
    "round((CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE) - sx / n) / "
    "sqrt(greatest(sxx / n - sx / n * (sx / n), 1e-12)), 6)"
)


@register(
    "q_value_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(10,2)) *
                      CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(CAST(e.value AS DECIMAL(10,2)) AS DOUBLE) AS value,
           {_Z_EXPR} AS z
    FROM events e JOIN stats USING (event_type)
    WHERE abs({_Z_EXPR}) > {Z_THRESHOLD}
    """,
    doc="Per-group z-score outlier detection (the numeric-quality filter "
        "for pipeline monitoring): population mean/std from DECIMAL-exact "
        "sums — order-independent, so results are identical under any "
        "partitioning — then a broadcast of the tiny per-group stats back "
        "onto the scan. Two narrow passes over events, no wide shuffle.",
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    stats = ev.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE)").alias("sx"),
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(10,2)) * "
            "CAST(value AS DECIMAL(10,2))) AS DOUBLE)"
        ).alias("sxx"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.expr(_Z_EXPR))
        .filter(F.abs(F.col("z")) > Z_THRESHOLD)
        .select(
            "event_id",
            "event_type",
            F.expr("CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE)").alias("value"),
            "z",
        )
    )


# ---------------------------------------------------------------------------
# Pareto concentration: cumulative revenue share over aggregated groups
# ---------------------------------------------------------------------------

@register(
    "q_pareto_brands",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(10,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(10,2))))
                  AS DECIMAL(38,6)) AS revenue
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ),
    tot AS (SELECT SUM(revenue) AS total FROM rev)
    SELECT p_brand,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(CAST(SUM(revenue) OVER (ORDER BY revenue DESC, p_brand)
                     AS DECIMAL(38,6)) AS DOUBLE)
                / CAST((SELECT total FROM tot) AS DOUBLE) AS cum_share,
           CAST(CAST(CAST(SUM(revenue) OVER (ORDER BY revenue DESC, p_brand)
                     AS DECIMAL(38,6)) AS DOUBLE)
                / CAST((SELECT total FROM tot) AS DOUBLE)
                <= 0.8 AS BOOLEAN) AS in_top80
    FROM rev
    """,
    doc="Pareto/ABC analysis: revenue concentration by brand with "
        "cumulative share and 80%-tier flag. The global-order window runs "
        "AFTER the distributed aggregation, over one row per brand — the "
        "aggregate-then-window shape that keeps a 'global' cumulative sum "
        "legal at 100 TB (the wide input is reduced by the groupBy's "
        "map-side partials; the window input is dozens of rows). DECIMAL "
        "running sums keep the shares engine-exact.",
)
def q_pareto_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "part")
    rev = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * "
                "(1 - CAST(l_discount AS DECIMAL(10,2)))) AS DECIMAL(38,6))"
            ).alias("revenue")
        )
    )
    tot = rev.agg(F.expr("SUM(revenue)").alias("total"))
    w = Window.orderBy(F.desc("revenue"), F.asc("p_brand")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        rev.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum", F.expr("CAST(1 AS DECIMAL(38,6))") * F.sum("revenue").over(w)
        )
        .select(
            "p_brand",
            F.expr("CAST(revenue AS DOUBLE)").alias("revenue"),
            F.expr(
                "CAST(CAST(cum AS DECIMAL(38,6)) AS DOUBLE) / "
                "CAST(total AS DOUBLE)"
            ).alias("cum_share"),
            F.expr(
                "CAST(CAST(CAST(cum AS DECIMAL(38,6)) AS DOUBLE) / "
                "CAST(total AS DOUBLE) <= 0.8 AS BOOLEAN)"
            ).alias("in_top80"),
        )
    )


# ---------------------------------------------------------------------------
# equi-width histogram (distributed two-pass profiling)
# ---------------------------------------------------------------------------

N_BINS = 20

#: bin index from DECIMAL-exact extremes, identical IEEE order both engines;
#: the last bin is closed so max lands in bin N-1
_BIN_EXPR = (
    f"CAST(least(floor((CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE) - lo)"
    f" / w), {N_BINS - 1}) AS BIGINT)"
)


@register(
    "q_histogram_values",
    oracle=f"""
    WITH ext AS (
      SELECT CAST(MIN(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS lo,
             (CAST(MAX(CAST(value AS DECIMAL(10,2))) AS DOUBLE)
              - CAST(MIN(CAST(value AS DECIMAL(10,2))) AS DOUBLE))
             / {N_BINS} AS w
      FROM events
    )
    SELECT {_BIN_EXPR} AS bin,
           lo + {_BIN_EXPR} * w AS bin_lo,
           lo + ({_BIN_EXPR} + 1) * w AS bin_hi,
           COUNT(*) AS n
    FROM events CROSS JOIN ext
    GROUP BY bin, bin_lo, bin_hi
    """,
    doc="Equi-width histogram over a numeric column: DECIMAL-exact "
        "extremes (order-independent MIN/MAX) broadcast as scalars, then "
        "one binning scan with map-side partial counts — the two-pass "
        "profiling shape that replaces a sort-based histogram. Bin edges "
        "recomputed from the same IEEE expression on both engines, so "
        "the doubles hash-match.",
)
def q_histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ext = ev.agg(
        F.expr("CAST(MIN(CAST(value AS DECIMAL(10,2))) AS DOUBLE)").alias("lo"),
        F.expr(
            "(CAST(MAX(CAST(value AS DECIMAL(10,2))) AS DOUBLE)"
            " - CAST(MIN(CAST(value AS DECIMAL(10,2))) AS DOUBLE))"
            f" / {N_BINS}"
        ).alias("w"),
    )
    return (
        ev.crossJoin(F.broadcast(ext))
        .select(
            F.expr(_BIN_EXPR).alias("bin"),
            F.expr(f"lo + {_BIN_EXPR} * w").alias("bin_lo"),
            F.expr(f"lo + ({_BIN_EXPR} + 1) * w").alias("bin_hi"),
        )
        .groupBy("bin", "bin_lo", "bin_hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# referential-integrity audit (anti-join data-quality gate)
# ---------------------------------------------------------------------------

@register(
    "q_integrity_orphans",
    oracle="""
    SELECT 'lineitem_without_order' AS violation,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'order_without_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_without_part',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM part p
                      WHERE p.p_partkey = l.l_partkey)
    """,
    doc="Referential-integrity audit: orphan counts for the three fact→dim "
        "edges via left-anti joins — the data-quality gate an ingestion "
        "pipeline runs before publishing a snapshot. Each anti join "
        "broadcasts the key side when it fits (Catalyst picks "
        "BroadcastHashJoin for the dims) and degrades to shuffled anti "
        "join for fact-fact, so the audit scales with the fact scan.",
)
def q_integrity_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "orders", "customer", "part")

    def orphans(label, fact, keys, dim, dim_keys):
        probe = dim.select(*[F.col(k).alias(j) for k, j in zip(dim_keys, keys)])
        return (
            fact.select(*keys)
            .join(probe, keys, "left_anti")
            .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
            .select(F.lit(label).alias("violation"), "n")
        )

    return (
        orphans("lineitem_without_order", t["lineitem"], ["l_orderkey"],
                t["orders"], ["o_orderkey"])
        .unionAll(orphans("order_without_customer", t["orders"], ["o_custkey"],
                          t["customer"], ["c_custkey"]))
        .unionAll(orphans("lineitem_without_part", t["lineitem"], ["l_partkey"],
                          t["part"], ["p_partkey"]))
    )


# ---------------------------------------------------------------------------
# salted two-stage aggregation (hot-key skew pattern, result-identical)
# ---------------------------------------------------------------------------

N_SALTS = 8


@register(
    "q_salted_user_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Salted two-stage aggregation: stage 1 groups on "
        "(user_id, salt) so a hot user's rows spread over N_SALTS "
        "reducers, stage 2 merges the partials per user — bit-identical "
        "to the plain GROUP BY (the oracle) because counts and DECIMAL "
        "sums are associative. The manual skew-mitigation pattern for "
        "when AQE's runtime skew split isn't available (e.g. first-stage "
        "aggregations, which AQE does not rebalance).",
)
def q_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    partial = (
        ev.withColumn(
            "salt", F.expr(f"CAST(event_id % {N_SALTS} AS INT)")
        )
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.expr("SUM(CAST(value AS DECIMAL(10,2)))").alias("pv"),
        )
    )
    return partial.groupBy("user_id").agg(
        F.expr("CAST(SUM(pn) AS BIGINT)").alias("n_events"),
        F.expr("CAST(SUM(pv) AS DOUBLE)").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# cohort retention (first-seen cohort x activity period)
# ---------------------------------------------------------------------------

@register(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS active_week,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY f.cohort_week, active_week
    """,
    doc="Cohort retention matrix: users bucketed by first-seen week, "
        "counted distinct per subsequent activity week — the engagement "
        "analysis every product/warehouse runs. Two shuffles (first-seen "
        "per user, cohort x week distinct count); the firsts side is one "
        "row per user and joins back on the same user_id partitioning.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    firsts = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP_NTZ)"
        ).alias("cohort_week")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("CAST(date_trunc('week', ts) AS TIMESTAMP_NTZ)").alias(
                "active_week"
            ),
        )
        .agg(
            F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias("n_active")
        )
    )


# ---------------------------------------------------------------------------
# dense calendar gap-fill (spine generation + left join)
# ---------------------------------------------------------------------------

@register(
    "q_gap_fill_daily",
    oracle="""
    WITH ext AS (
      SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM ext
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             COUNT(*) AS n
      FROM events GROUP BY day, event_type
    )
    SELECT s.day, t.event_type,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
    FROM spine s CROSS JOIN types t
    LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
    """,
    doc="Dense time-series gap-fill: a generated day spine crossed with "
        "the observed key set, left-joined onto daily aggregates with "
        "zero-fill — the step that makes downstream window/trend math "
        "correct when quiet days produce no rows at all. The spine is "
        "sequence()-generated from the DECIMAL-free min/max day (tiny, "
        "broadcast); the only wide shuffle is the daily aggregation "
        "itself.",
)
def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    spine = (
        ev.agg(
            F.expr("CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP_NTZ)").alias("lo"),
            F.expr("CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP_NTZ)").alias("hi"),
        )
        .select(
            F.explode(
                F.expr("sequence(lo, hi, INTERVAL 1 DAY)")
            ).alias("day")
        )
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        F.expr("CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ)").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        F.broadcast(spine)
        .crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.expr("CAST(COALESCE(n, 0) AS BIGINT)").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# first-touch attribution (argmin over join candidates)
# ---------------------------------------------------------------------------

ATTR_WINDOW_S = 3600


@register(
    "q_first_touch_attribution",
    oracle=f"""
    WITH cand AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             p.user_id, epoch_us(c.ts) - epoch_us(p.ts) AS gap_us,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts, c.event_id) AS rk
      FROM events p JOIN events c
        ON p.user_id = c.user_id
       AND c.ts > p.ts
       AND c.ts <= p.ts + INTERVAL {ATTR_WINDOW_S} SECONDS
      WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    )
    SELECT purchase_id, click_id, user_id, gap_us
    FROM cand WHERE rk = 1
    """,
    doc="First-touch attribution: each purchase credits only the EARLIEST "
        "follow-up click in its window — the argmin-per-join-group "
        "pattern (interval join for candidates, then a row_number cut on "
        "the purchase key). The candidate join shuffles both sides on "
        "user_id; the dedup window re-partitions on purchase_id, whose "
        "cardinality is the purchase count, not the candidate count.",
)
def q_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cand = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {ATTR_WINDOW_S} SECONDS")),
    )
    w = Window.partitionBy("purchase_id").orderBy("c_ts", "click_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            F.expr(
                "CAST(unix_micros(CAST(c_ts AS TIMESTAMP)) "
                "- unix_micros(CAST(p_ts AS TIMESTAMP)) AS BIGINT)"
            ).alias("gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# week-over-week trend (lag over aggregated series)
# ---------------------------------------------------------------------------

@register(
    "q_trend_wow",
    oracle="""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
      FROM events GROUP BY week, event_type
    )
    SELECT week, event_type, n, total,
           n - LAG(n) OVER w AS n_delta,
           CASE WHEN LAG(n) OVER w IS NULL OR LAG(n) OVER w = 0
                THEN CAST(NULL AS DOUBLE)
                ELSE CAST(n - LAG(n) OVER w AS DOUBLE) / LAG(n) OVER w
           END AS n_pct_change
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
    doc="Week-over-week trend: the aggregate-then-lag shape — the wide "
        "input reduces to one row per (week, type) before the ordered "
        "window runs, so the 'global' time ordering costs nothing at "
        "scale. Deltas are integer-exact; the pct change divides exact "
        "integers in a fixed IEEE order.",
)
def q_trend_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    weekly = ev.groupBy(
        F.expr("CAST(date_trunc('week', ts) AS TIMESTAMP_NTZ)").alias("week"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE)").alias("total"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.select(
        "week",
        "event_type",
        "n",
        "total",
        (F.col("n") - F.lag("n").over(w)).alias("n_delta"),
        F.expr(
            "CASE WHEN LAG(n) OVER (PARTITION BY event_type ORDER BY week) IS NULL "
            "OR LAG(n) OVER (PARTITION BY event_type ORDER BY week) = 0 "
            "THEN CAST(NULL AS DOUBLE) "
            "ELSE CAST(n - LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS DOUBLE) "
            "/ LAG(n) OVER (PARTITION BY event_type ORDER BY week) END"
        ).alias("n_pct_change"),
    )


# ---------------------------------------------------------------------------
# per-group OLS slope (closed-form regression as aggregation)
# ---------------------------------------------------------------------------

#: x = seconds since the user's first event (small magnitudes keep the
#: closed-form numerically tame); exact integer/decimal sums -> one fixed
#: IEEE expression, so both engines emit the identical double
_SLOPE = (
    "CASE WHEN n * sxx - sx * sx = 0 THEN CAST(NULL AS DOUBLE) "
    "ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) END"
)


@register(
    "q_user_trend_slope",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
             epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id)
               AS x_us,
             CAST(value AS DECIMAL(10,2)) AS y
      FROM events
    ),
    sums AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x_us // 1000000) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM((x_us // 1000000) * (x_us // 1000000)) AS DOUBLE) AS sxx,
             CAST(SUM((x_us // 1000000) * y) AS DOUBLE) AS sxy
      FROM base GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events, {_SLOPE} AS slope
    FROM sums
    """,
    doc="Per-user OLS trend slope (value vs seconds-since-first-event): "
        "closed-form regression expressed as exact aggregation — integer "
        "x, DECIMAL y, so the six sufficient statistics are "
        "order-independent and the final slope is one deterministic IEEE "
        "expression. The per-entity-model feature extraction pattern "
        "(churn/engagement slopes) without any Python in the row path; "
        "one window + one aggregate sharing the user_id partitioning.",
)
def q_user_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        (
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
            - F.min(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).over(w)
        ).alias("x_us"),
        F.expr("CAST(value AS DECIMAL(10,2))").alias("y"),
    )
    sums = base.groupBy("user_id").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr("CAST(SUM(x_us DIV 1000000) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(y) AS DOUBLE)").alias("sy"),
        F.expr(
            "CAST(SUM((x_us DIV 1000000) * (x_us DIV 1000000)) AS DOUBLE)"
        ).alias("sxx"),
        F.expr("CAST(SUM((x_us DIV 1000000) * y) AS DOUBLE)").alias("sxy"),
    )
    return sums.select(
        "user_id",
        F.expr("CAST(n AS BIGINT)").alias("n_events"),
        F.expr(_SLOPE).alias("slope"),
    )


# ---------------------------------------------------------------------------
# winsorized robust aggregation (order-statistic clipping)
# ---------------------------------------------------------------------------

WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


@register(
    "q_winsorized_value_stats",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bounds AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN r = ({WINSOR_LO_PCT} * n + 99) // 100
                      THEN value END) AS lo,
             MAX(CASE WHEN r = ({WINSOR_HI_PCT} * n + 99) // 100
                      THEN value END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(b.n AS BIGINT) AS n_events,
           CAST(CAST(b.lo AS DECIMAL(10,2)) AS DOUBLE) AS p_lo,
           CAST(CAST(b.hi AS DECIMAL(10,2)) AS DOUBLE) AS p_hi,
           round(CAST(SUM(CAST(e.value AS DECIMAL(10,2))) AS DOUBLE)
                 / b.n, 6) AS raw_mean,
           round(CAST(SUM(CAST(LEAST(GREATEST(e.value, b.lo), b.hi)
                               AS DECIMAL(10,2))) AS DOUBLE)
                 / b.n, 6) AS winsorized_mean,
           CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type, b.n, b.lo, b.hi
    """,
    doc=f"Winsorized robust mean per event_type: clip values to the exact "
        f"p{WINSOR_LO_PCT:02d}/p{WINSOR_HI_PCT} ORDER STATISTICS (type-1 "
        "quantile — the ceil(p*n)-th smallest actual data value, integer "
        "ceil-division rank math, no float interpolation) and aggregate "
        "the clipped column with DECIMAL-exact sums. The heavy-tail-"
        "robust companion to q_value_outliers' z-scores: a single extreme "
        "sensor reading moves a raw mean arbitrarily but a winsorized "
        "mean by at most (hi-lo)/n. Two passes: a per-group rank window "
        "(one shuffle, sort within group) to locate the two cut values, "
        "then a broadcast of the tiny per-group bounds onto the scan for "
        "the clipped aggregate. At 100 TB the rank pass is the cost "
        "driver — swap in approx_percentile bounds when 0.1% rank error "
        "is acceptable; the clipping aggregate is unchanged.",
)
def q_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "value", "event_id",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.expr(f"CASE WHEN r = ({WINSOR_LO_PCT} * n + 99) DIV 100 "
                   "THEN value END")
        ).alias("lo"),
        F.max(
            F.expr(f"CASE WHEN r = ({WINSOR_HI_PCT} * n + 99) DIV 100 "
                   "THEN value END")
        ).alias("hi"),
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.expr(
                "round(CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE)"
                " / n, 6)"
            ).alias("raw_mean"),
            F.expr(
                "round(CAST(SUM(CAST(LEAST(GREATEST(value, lo), hi) "
                "AS DECIMAL(10,2))) AS DOUBLE) / n, 6)"
            ).alias("winsorized_mean"),
            F.expr(
                "CAST(SUM(CASE WHEN value < lo OR value > hi "
                "THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_clipped"),
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.expr("CAST(CAST(lo AS DECIMAL(10,2)) AS DOUBLE)").alias("p_lo"),
            F.expr("CAST(CAST(hi AS DECIMAL(10,2)) AS DOUBLE)").alias("p_hi"),
            "raw_mean",
            "winsorized_mean",
            "n_clipped",
        )
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------

@register(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    totals AS (
      SELECT from_type, SUM(n) AS total FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n_transitions,
           round(CAST(t.n AS DOUBLE) / tot.total, 6) AS p_transition
    FROM trans t JOIN totals tot USING (from_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
        "sequences: P(next event type | current) from LEAD pairs — the "
        "behavioral model behind session simulation, anomaly scoring "
        "(improbable transitions), and funnel-leak diagnosis; the "
        "categorical sibling of the bigram LM over tokens. One shuffle "
        "for the per-user sequence window (same partitioning the "
        "sessionize/funnel family already uses), then two tiny "
        "aggregates; probabilities are exact integer ratios divided once "
        "at the end. The |types|^2-row result is broadcast-sized at any "
        "corpus scale.",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("total"))
    return trans.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        F.expr("round(CAST(n AS DOUBLE) / total, 6)").alias("p_transition"),
    )


# ---------------------------------------------------------------------------
# decile lift analysis (marketing-style value concentration)
# ---------------------------------------------------------------------------

@register(
    "q_decile_lift",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT o_custkey, total_spend,
             NTILE(10) OVER (ORDER BY total_spend DESC, o_custkey) AS decile
      FROM spend
    ),
    per AS (
      SELECT decile,
             COUNT(*) AS n_customers,
             SUM(total_spend) AS revenue
      FROM tiled GROUP BY decile
    ),
    tot AS (SELECT SUM(revenue) AS t FROM per)
    SELECT decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(revenue AS DOUBLE) AS revenue,
           round(CAST(revenue AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE),
                 6) AS revenue_share,
           round(CAST(SUM(revenue) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS cum_share
    FROM per
    """,
    doc="Decile lift: customers ranked by DECIMAL-exact total spend, cut "
        "into NTILE(10) value tiers (deterministic — the ORDER BY carries "
        "a full tie-break), then per-decile revenue share and the "
        "cumulative lift curve. The whale-concentration diagnostic "
        "(complement of q_pareto_brands' cumulative-share-by-entity). The "
        "NTILE is computed from a TWO-PHASE distributed rank "
        "(_global_rank: range buckets -> parallel per-bucket row_number "
        "-> bucket-count prefix offsets), so no single task ever sorts "
        "the full customer set; the only remaining global window runs "
        "over the 10 decile rows.",
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    spend = orders.groupBy("o_custkey").agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(12,2)))").alias("total_spend")
    )
    # two-phase distributed rank (see _global_rank): NTILE over all
    # customers without funnelling them through one task's sort
    ranked = _global_rank(
        spend,
        "-total_spend",
        [F.desc("total_spend"), F.asc("o_custkey")],
        with_total=True,
    )
    tiled = ranked.withColumn(
        "decile", F.expr(_ntile_expr(10))
    ).drop("__rank", "__n")
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("total_spend").alias("revenue"),
    )
    tot = per.agg(F.sum("revenue").alias("t"))
    wc = Window.orderBy("decile")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("revenue").cast("double").alias("revenue"),
            F.expr("round(CAST(revenue AS DOUBLE) / CAST(t AS DOUBLE), 6)")
            .alias("revenue_share"),
            F.round(
                F.sum(F.col("revenue")).over(wc).cast("double")
                / F.col("t").cast("double"),
                6,
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA smoothing with dyadic weights (integer-exact time-series smoothing)
# ---------------------------------------------------------------------------

EWMA_DEPTH = 10  # alpha = 1/2 → weights 2^-k, truncated at 10 lags

_EWMA_CENTS = "CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)"
_EWMA_S = " + ".join(
    f"COALESCE(lag(cents, {k}) OVER w, 0) * {1 << (EWMA_DEPTH - 1 - k)}"
    for k in range(EWMA_DEPTH)
)
_EWMA_D = " + ".join(
    f"(CASE WHEN lag(cents, {k}) OVER w IS NOT NULL "
    f"THEN {1 << (EWMA_DEPTH - 1 - k)} ELSE 0 END)"
    for k in range(EWMA_DEPTH)
)


@register(
    "q_ewma_user_value",
    oracle=f"""
    WITH c AS (
      SELECT event_id, user_id, ts, {_EWMA_CENTS} AS cents FROM events
    ),
    s AS (
      SELECT event_id, user_id, cents,
             {_EWMA_S} AS s_scaled,
             {_EWMA_D} AS d_scaled
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           round(CAST(cents AS DOUBLE) / 100, 6) AS value,
           round(CAST(s_scaled AS DOUBLE) / (CAST(d_scaled AS DOUBLE) * 100),
                 6) AS ewma
    FROM s
    """,
    doc=f"Per-user EWMA smoothing (alpha = 1/2, truncated at "
        f"{EWMA_DEPTH} lags): weights 2^-k are DYADIC, so the whole "
        "smoothing pipeline runs in scaled integers — value cents times "
        "power-of-two weights, a COALESCE-lag fold, one integer division "
        "at the end. Exactly reproducible under any partitioning or "
        "engine, unlike a float pow()-weighted SUM OVER whose summation "
        "order is unspecified; the short-series head renormalizes over "
        "the lags that exist instead of decaying toward zero. One "
        "shuffle on user_id (the window partition the sessionize/funnel "
        "family already uses). The untruncated recursive EWMA is the "
        "stateful-streaming sibling (applyInPandasWithState carrying one "
        "running value per key).",
)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = ev.select(
        "event_id", "user_id", "ts", F.expr(_EWMA_CENTS).alias("cents")
    )
    s_col = reduce(
        lambda a, b: a + b,
        [
            F.coalesce(F.lag("cents", k).over(w), F.lit(0))
            * F.lit(1 << (EWMA_DEPTH - 1 - k))
            for k in range(EWMA_DEPTH)
        ],
    )
    d_col = reduce(
        lambda a, b: a + b,
        [
            F.when(
                F.lag("cents", k).over(w).isNotNull(),
                F.lit(1 << (EWMA_DEPTH - 1 - k)),
            ).otherwise(F.lit(0))
            for k in range(EWMA_DEPTH)
        ],
    )
    return c.select(
        "event_id",
        "user_id",
        F.expr("round(CAST(cents AS DOUBLE) / 100, 6)").alias("value"),
        F.round(
            s_col.cast("double") / (d_col.cast("double") * F.lit(100.0)), 6
        ).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# equi-depth histogram (quantile-bucketed profiling)
# ---------------------------------------------------------------------------

EQUIDEPTH_BUCKETS = 10


@register(
    "q_histogram_equidepth",
    oracle=f"""
    WITH tiled AS (
      SELECT event_type, value,
             NTILE({EQUIDEPTH_BUCKETS}) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS bucket
      FROM events
    )
    SELECT event_type, CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(MIN(value) AS DECIMAL(10,2)) AS DOUBLE) AS lo,
           CAST(CAST(MAX(value) AS DECIMAL(10,2)) AS DOUBLE) AS hi
    FROM tiled GROUP BY event_type, bucket
    """,
    doc=f"Equi-DEPTH histogram: {EQUIDEPTH_BUCKETS} equal-count value "
        "buckets per event_type via NTILE (full tie-break → "
        "deterministic), with each bucket's row count and [lo, hi] value "
        "bounds. The skew-robust complement of q_histogram_values' "
        "equi-width bins — a heavy-tailed column gets resolution where "
        "the data is, which is why engine optimizers store exactly this "
        "shape as column statistics. One shuffle (per-type sort for the "
        "rank), one reduce; at 100 TB swap NTILE for approx_percentile "
        "cut points and keep the same output contract.",
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    tiled = ev.select(
        "event_type", "value",
        F.ntile(EQUIDEPTH_BUCKETS).over(w).alias("bucket"),
    )
    return tiled.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("CAST(CAST(MIN(value) AS DECIMAL(10,2)) AS DOUBLE)").alias("lo"),
        F.expr("CAST(CAST(MAX(value) AS DECIMAL(10,2)) AS DOUBLE)").alias("hi"),
    ).select(
        "event_type", F.col("bucket").cast("int").alias("bucket"),
        "n_rows", "lo", "hi",
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit (data-quality / anomaly screening)
# ---------------------------------------------------------------------------

import math as _math

# expected Benford proportions inlined as IDENTICAL literals in both the
# Spark plan and the DuckDB oracle — computing log10 in each engine would
# risk last-ulp libm divergence under the value-hash gate
_BENFORD_EXPECTED = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN CAST({_BENFORD_EXPECTED[d]!r} AS DOUBLE)"
    for d in range(1, 10)
)


@register(
    "q_benford_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
      SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
    ),
    tot AS (SELECT SUM(n) AS t FROM counts)
    SELECT digit,
           CAST(n AS BIGINT) AS n_orders,
           round(CAST(n AS DOUBLE) / (SELECT t FROM tot), 6) AS observed_p,
           round(CASE digit {_BENFORD_CASE} END, 6) AS expected_p,
           round(abs(CAST(n AS DOUBLE) / (SELECT t FROM tot)
                     - CASE digit {_BENFORD_CASE} END), 6) AS abs_dev
    FROM counts
    """,
    doc="Benford first-digit audit over order totals: observed leading-"
        "digit distribution vs the log10(1+1/d) law — the classic "
        "fabricated-data / unit-mixing screen auditors run on financial "
        "columns. The leading digit comes from integer string truncation "
        "(FLOOR then CAST), never log10 of the value, so binning is "
        "integer-exact; the expected proportions are Python-precomputed "
        "literals inlined into BOTH plans, keeping libm out of the "
        "comparison entirely. One narrow aggregate over the scan plus a "
        "broadcast of the 9-row total.",
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    counts = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) "
                "AS STRING), 1, 1) AS INT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("t"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n_orders"),
        F.expr("round(CAST(n AS DOUBLE) / t, 6)").alias("observed_p"),
        F.expr(f"round(CASE digit {_BENFORD_CASE} END, 6)").alias("expected_p"),
        F.expr(
            f"round(abs(CAST(n AS DOUBLE) / t "
            f"- CASE digit {_BENFORD_CASE} END), 6)"
        ).alias("abs_dev"),
    )


# ---------------------------------------------------------------------------
# market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

BASKET_MIN_PAIRS = 3  # report part pairs co-bought in >= 3 orders


@register(
    "q_market_basket",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
    part_n AS (
      SELECT l_partkey, COUNT(*) AS n_orders FROM items GROUP BY l_partkey
    ),
    pair_n AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_both
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
    )
    SELECT p.part_a, p.part_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(na.n_orders AS BIGINT) AS n_a,
           CAST(nb.n_orders AS BIGINT) AS n_b,
           round(CAST(p.n_both AS DOUBLE) / na.n_orders, 6)
             AS confidence_a_to_b,
           round(CAST(p.n_both AS DOUBLE) * (SELECT n FROM n_orders)
                 / (CAST(na.n_orders AS DOUBLE) * nb.n_orders), 6) AS lift
    FROM pair_n p
    JOIN part_n na ON na.l_partkey = p.part_a
    JOIN part_n nb ON nb.l_partkey = p.part_b
    WHERE p.n_both >= {BASKET_MIN_PAIRS}
    """,
    doc=f"Market-basket association rules: part pairs co-occurring in >= "
        f"{BASKET_MIN_PAIRS} orders with confidence P(b|a) and lift "
        "P(a,b)/(P(a)P(b)) as exact integer ratios. The basket self-join "
        "is keyed on the order — pair volume per order is "
        "(items_per_basket choose 2), bounded by basket size, NOT corpus "
        "size, which is what separates this from an unbounded pair "
        "explosion (a pathological mega-basket is the hot key; cap or "
        "salt it like any skewed join). The canonical a<b ordering halves "
        "the join output; per-part marginals broadcast back onto the "
        "pair aggregate.",
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct().persist()
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("n"))
    part_n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    a = items.alias("a")
    b = items.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= BASKET_MIN_PAIRS)
    )
    na = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("na")
    )
    nb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("nb")
    )
    # marginals are per-part (catalog-sized at scale): no broadcast hint,
    # AQE upgrades the joins when the catalog actually fits
    return (
        pair_n.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.expr("round(CAST(n_both AS DOUBLE) / na, 6)")
            .alias("confidence_a_to_b"),
            F.expr(
                "round(CAST(n_both AS DOUBLE) * n "
                "/ (CAST(na AS DOUBLE) * nb), 6)"
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------

@register(
    "q_rfm_segments",
    bench=True,
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, n_orders,
             NTILE(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY n_orders, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY spend, o_custkey) AS m_score
      FROM base
    )
    SELECT r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders
    FROM scored GROUP BY r_score, f_score, m_score
    """,
    doc="RFM segmentation: per-customer recency (last order date), "
        "frequency (order count), monetary (DECIMAL-exact spend) cut "
        "into quintiles (NTILE with full tie-breaks — deterministic "
        "segment assignment, unlike percentile-threshold variants that "
        "waver on ties), then the classic 3-digit RFM segment code with "
        "member counts. Higher score = better (more recent / more "
        "frequent / higher spend). Each quintile comes from a TWO-PHASE "
        "distributed rank (_global_rank) over the pre-aggregated "
        "CUSTOMER table — exact NTILE semantics with no "
        "single-partition sort anywhere in the plan.",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(12,2)))").alias("spend"),
    )
    # three INDEPENDENT two-phase ranks (see _global_rank), each quintile
    # assignment exact NTILE(5) without a single-partition sort over the
    # customer set. Round 15: the ranks used to be CHAINED (each
    # consuming the previous output) with a localCheckpoint barrier
    # between every pair — four serialized jobs. Each rank only appends
    # a column, so they are independent by construction: compute all
    # three from the ONE checkpointed base in parallel subtrees of a
    # single action and join them back on the customer key — one
    # barrier instead of four, and the three rank pipelines overlap on
    # the cluster (guide §2.6). Rank values are identical either way
    # (each rank orders by base columns + o_custkey only).
    base = base.localCheckpoint()
    # Round 16 (guide §2.4): the three rank subtrees used to be joined
    # back on o_custkey — two SortMergeJoins and three per-customer
    # exchanges whose only job was landing the three score columns on one
    # row. Each subtree now finishes its own NTILE(5) (every pipeline
    # carries __n via with_total — an offsets-grain window, not a data
    # scan) and emits (o_custkey, dim, score); a union + ONE o_custkey
    # hash aggregate pivots the scores back together. Rank and tile
    # values are identical (same order columns, same tile arithmetic);
    # only the combine step changed. n_orders rides the f subtree, whose
    # rank input already carries it.
    def _dim_scores(df, bucket_expr, order_cols, dim, n_orders_col):
        ranked = _global_rank(
            df, bucket_expr, order_cols,
            rank_col="__rank", with_total=True,
        )
        return ranked.select(
            "o_custkey",
            F.lit(dim).alias("__dim"),
            F.expr(_ntile_expr(5, "__rank")).alias("__score"),
            n_orders_col.alias("__no"),
        )

    melted = (
        _dim_scores(
            base.select("o_custkey", "last_order"),
            "CAST(unix_date(CAST(last_order AS DATE)) AS DOUBLE)",
            [F.asc("last_order"), F.asc("o_custkey")],
            1, F.lit(None).cast("bigint"),
        )
        .unionByName(_dim_scores(
            base.select("o_custkey", "n_orders"),
            "CAST(n_orders AS DOUBLE)",
            [F.asc("n_orders"), F.asc("o_custkey")],
            2, F.col("n_orders").cast("bigint"),
        ))
        .unionByName(_dim_scores(
            base.select("o_custkey", "spend"),
            "CAST(spend AS DOUBLE)",
            [F.asc("spend"), F.asc("o_custkey")],
            3, F.lit(None).cast("bigint"),
        ))
    )
    scored = melted.groupBy("o_custkey").agg(
        F.max(F.when(F.col("__dim") == 1, F.col("__score")))
        .alias("r_score"),
        F.max(F.when(F.col("__dim") == 2, F.col("__score")))
        .alias("f_score"),
        F.max(F.when(F.col("__dim") == 3, F.col("__score")))
        .alias("m_score"),
        F.max("__no").alias("n_orders"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
        )
        .select(
            "r_score", "f_score", "m_score",
            F.expr(
                "CAST(r_score * 100 + f_score * 10 + m_score AS INT)"
            ).alias("segment"),
            "n_customers", "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# shipping-delay SLA stats (exact day-difference order statistics)
# ---------------------------------------------------------------------------

@register(
    "q_shipping_delay_stats",
    oracle="""
    WITH d AS (
      SELECT o.o_orderpriority,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS delay_days,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    ranked AS (
      SELECT o_orderpriority, delay_days,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY delay_days, l_orderkey, l_linenumber)
               AS r,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM d
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           round(CAST(SUM(delay_days) AS DOUBLE) / MAX(n), 6) AS mean_days,
           CAST(MAX(CASE WHEN r = (50 * n + 99) // 100
                         THEN delay_days END) AS BIGINT) AS p50_days,
           CAST(MAX(CASE WHEN r = (90 * n + 99) // 100
                         THEN delay_days END) AS BIGINT) AS p90_days,
           CAST(MAX(delay_days) AS BIGINT) AS max_days
    FROM ranked GROUP BY o_orderpriority
    """,
    doc="Shipping-delay SLA profile per order priority: order-to-ship lag "
        "in whole days (DATE datediff — integer-exact, no timestamp "
        "float math), with mean as an exact integer ratio and p50/p90 as "
        "type-1 order statistics (the ceil-rank pattern shared with the "
        "winsorize operator). The operational twin of the TPC-H pricing "
        "suite: one fact-to-dim broadcast join, one per-priority rank "
        "window, one reduce.",
)
def q_shipping_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = (
        load(spark, sf_dir, "lineitem", "orders")[t]
        for t in ("lineitem", "orders")
    )
    d = li.join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        F.expr(
            "datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))"
        ).alias("delay_days"),
        "l_orderkey", "l_linenumber",
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "delay_days", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = d.select(
        "o_orderpriority", "delay_days",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_lines"),
        F.expr("round(CAST(SUM(delay_days) AS DOUBLE) / MAX(n), 6)")
        .alias("mean_days"),
        F.expr(
            "CAST(MAX(CASE WHEN r = (50 * n + 99) DIV 100 "
            "THEN delay_days END) AS BIGINT)"
        ).alias("p50_days"),
        F.expr(
            "CAST(MAX(CASE WHEN r = (90 * n + 99) DIV 100 "
            "THEN delay_days END) AS BIGINT)"
        ).alias("p90_days"),
        F.max("delay_days").cast("bigint").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# sequential pattern mining: frequent event-type trigrams
# ---------------------------------------------------------------------------

SEQ_PATTERN_TOPK = 15


@register(
    "q_event_trigram_patterns",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pat AS (
      SELECT e1, e2, e3, COUNT(*) AS n
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, CAST(n AS BIGINT) AS n_occurrences,
           CAST(rk AS INT) AS rk
    FROM (
      SELECT e1, e2, e3, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS rk
      FROM pat
    ) t WHERE rk <= {SEQ_PATTERN_TOPK}
    """,
    doc=f"Sequential pattern mining: the top {SEQ_PATTERN_TOPK} most "
        "frequent length-3 event-type sequences across per-user "
        "timelines (contiguous trigrams via double LEAD) — the order-2 "
        "extension of q_markov_transitions that surfaces whole flows "
        "(view→click→purchase vs view→click→abandon) rather than single "
        "hops. One shuffle for the per-user sequence window (shared "
        "partitioning with the sessionize/funnel/markov family), one "
        "map-side-combinable count, and a "
        "top-k over the tiny |types|^3 pattern space.",
)
def q_event_trigram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    pat = (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
    return (
        pat.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= SEQ_PATTERN_TOPK)
        .select(
            "e1", "e2", "e3",
            F.col("n").cast("bigint").alias("n_occurrences"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# daily active users: new vs returning decomposition
# ---------------------------------------------------------------------------

@register(
    "q_new_vs_returning",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events GROUP BY user_id, day
    ),
    first_seen AS (
      SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id
    )
    SELECT d.day,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users,
           round(CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS new_share
    FROM d JOIN first_seen f ON f.user_id = d.user_id
    GROUP BY d.day
    """,
    doc="Daily active users decomposed into new vs returning by each "
        "user's first-seen day — the growth-accounting staple. The "
        "(user, day) grain reduces FIRST (events collapse to at most one "
        "row per user-day before anything joins), then the tiny "
        "first-seen table broadcasts back; the double pass over events "
        "that a naive MIN-window-over-raw-events plan would shuffle is "
        "avoided entirely. Shares are exact integer ratios.",
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    d = ev.select(
        "user_id", F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day")
    ).distinct()
    first_seen = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    # no broadcast hint: first_seen is per-user (corpus-sized at scale);
    # the join co-partitions on user_id with d's aggregation, and AQE
    # still broadcasts it when it happens to be small
    return (
        d.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.expr(
                "CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("new_users"),
            F.expr(
                "CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("returning_users"),
            F.expr(
                "round(CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) "
                "AS DOUBLE) / COUNT(*), 6)"
            ).alias("new_share"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifier combinations
# ---------------------------------------------------------------------------

K_ANON = 5


@register(
    "q_k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / 100) AS BIGINT)
               AS value_band,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    tot AS (SELECT SUM(n) AS t FROM qi)
    SELECT event_type, day, value_band,
           CAST(n AS BIGINT) AS group_size,
           round(CAST(n AS DOUBLE) / (SELECT t FROM tot), 6) AS row_share
    FROM qi WHERE n < {K_ANON}
    """,
    doc=f"k-anonymity audit (k = {K_ANON}): quasi-identifier combinations "
        "— here (event_type, day, coarse value band) — whose group size "
        "is below k, i.e. rows an adversary could re-identify by joining "
        "on those attributes alone. The release-gating privacy check "
        "that runs before a dataset export, listing each violating "
        "combination with its size and the at-risk row share. The value "
        "band uses DECIMAL floor division (integer-exact binning, the "
        "generalization step of the anonymization itself); one "
        "map-side-combinable aggregate over the scan plus a broadcast "
        "1-row total — the audit costs one pass regardless of corpus "
        "size.",
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    qi = ev.groupBy(
        "event_type",
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
        F.expr(
            "CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / 100) AS BIGINT)"
        ).alias("value_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = qi.agg(F.sum("n").alias("t"))
    return (
        qi.filter(F.col("n") < K_ANON)
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type", "day", "value_band",
            F.col("n").cast("bigint").alias("group_size"),
            F.expr("round(CAST(n AS DOUBLE) / t, 6)").alias("row_share"),
        )
    )


# ---------------------------------------------------------------------------
# l-diversity audit (the homogeneity-attack counterpart of k-anonymity)
# ---------------------------------------------------------------------------

L_DIV_K = 15  # bottom-k lowest-diversity groups reported


@register(
    "q_l_diversity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / 100) AS BIGINT)
               AS value_band,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
      FROM events GROUP BY 1, 2, 3
    ),
    eligible AS (
      SELECT *, round(CAST(n_distinct_users AS DOUBLE) / group_size, 6)
               AS diversity_ratio
      FROM qi WHERE group_size >= {{K_ANON}}
    )
    SELECT event_type, day, value_band, group_size, n_distinct_users,
           diversity_ratio,
           ROW_NUMBER() OVER (ORDER BY diversity_ratio, n_distinct_users,
                              event_type, day, value_band) AS rk
    FROM (
      SELECT * FROM eligible
      ORDER BY diversity_ratio, n_distinct_users, event_type, day,
               value_band
      LIMIT {{L_DIV_K}}
    ) t
    """.format(K_ANON=K_ANON, L_DIV_K=L_DIV_K),
    doc=f"l-diversity audit: among quasi-identifier groups that PASS the "
        f"k-anonymity size check, the {L_DIV_K} LOWEST-diversity groups "
        "(distinct identities / group size) — the homogeneity-attack "
        "surface k-anonymity misses (a 50-row group belonging to 2 "
        "users still leaks who was there). Bottom-k instead of a fixed "
        "l threshold so the audit reports the worst offenders at every "
        "corpus scale; selection is a distributed TakeOrdered (never a "
        "global sort), ranks assigned over the k survivors.",
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    qi = ev.groupBy(
        "event_type",
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
        F.expr(
            "CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / 100) AS BIGINT)"
        ).alias("value_band"),
    ).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("group_size"),
        F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias(
            "n_distinct_users"),
    )
    eligible = qi.filter(F.col("group_size") >= K_ANON).withColumn(
        "diversity_ratio",
        F.expr("round(CAST(n_distinct_users AS DOUBLE) / group_size, 6)"),
    )
    order = [
        F.asc("diversity_ratio"), F.asc("n_distinct_users"),
        F.asc("event_type"), F.asc("day"), F.asc("value_band"),
    ]
    top = eligible.orderBy(*order).limit(L_DIV_K)
    w = Window.orderBy(*order)
    return top.withColumn("rk", F.row_number().over(w))


# ---------------------------------------------------------------------------
# t-closeness audit (the attribute-disclosure counterpart of l-diversity)
# ---------------------------------------------------------------------------

T_CLOSE_K = 15  # top-k highest-skew groups reported


@register(
    "q_t_closeness_audit",
    oracle=f"""
    WITH gt AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / 100) AS BIGINT)
               AS value_band,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS c_gt
      FROM events GROUP BY 1, 2, 3
    ),
    grp AS (
      SELECT day, value_band, CAST(SUM(c_gt) AS BIGINT) AS group_size
      FROM gt GROUP BY day, value_band
    ),
    gl AS (
      SELECT event_type, CAST(SUM(c_gt) AS BIGINT) AS c_t FROM gt
      GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_total FROM gl),
    dev AS (
      SELECT g.day, g.value_band, g.group_size,
             CAST(SUM(ABS(COALESCE(x.c_gt, 0) * t.n_total
                          - o.c_t * g.group_size)) AS BIGINT) AS numer,
             t.n_total
      FROM grp g
      CROSS JOIN gl o
      CROSS JOIN tot t
      LEFT JOIN gt x ON x.day = g.day AND x.value_band = g.value_band
                    AND x.event_type = o.event_type
      WHERE g.group_size >= {K_ANON}
      GROUP BY g.day, g.value_band, g.group_size, t.n_total
    ),
    scored AS (
      SELECT day, value_band, group_size,
             round(CAST(numer AS DOUBLE)
                   / (2 * group_size * n_total), 6) AS tvd
      FROM dev
    )
    SELECT day, value_band, group_size, tvd,
           ROW_NUMBER() OVER (ORDER BY tvd DESC, group_size DESC,
                              day, value_band) AS rk
    FROM (
      SELECT * FROM scored
      ORDER BY tvd DESC, group_size DESC, day, value_band
      LIMIT {T_CLOSE_K}
    ) t
    """,
    doc=f"t-closeness audit, completing the release-gating privacy trio "
        "(k-anonymity = group too small, l-diversity = identities too "
        "concentrated, t-closeness = SENSITIVE-ATTRIBUTE distribution "
        "too far from the corpus baseline). Quasi-identifier here is "
        "(day, coarse value band); the sensitive attribute is the event "
        "type: a group whose event-type mix diverges sharply from the "
        "global mix leaks that attribute even when it passes k and l. "
        f"Distance is total variation, reported for the {T_CLOSE_K} "
        "worst k-eligible groups. Float discipline: TVD's numerator "
        "SUM |c_gt*N - c_t*n_g| is computed entirely in BIGINT (exact, "
        "order-independent), with ONE double division at the end — no "
        "accumulated float sums to drift between engines. Scale shape: "
        "all three distributions derive from one map-side-combinable "
        "(day, band, type) aggregate; the group x type grid is a "
        "broadcast of the tiny type table against eligible groups "
        "(linear in groups, never quadratic), and selection is a "
        "distributed TakeOrdered top-k.",
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    gt = ev.groupBy(
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
        F.expr(
            "CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / 100) AS BIGINT)"
        ).alias("value_band"),
        "event_type",
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c_gt"))
    grp = gt.groupBy("day", "value_band").agg(
        F.expr("CAST(SUM(c_gt) AS BIGINT)").alias("group_size")
    )
    glob = gt.groupBy("event_type").agg(
        F.expr("CAST(SUM(c_gt) AS BIGINT)").alias("c_t")
    )
    tot = glob.agg(F.expr("CAST(SUM(c_t) AS BIGINT)").alias("n_total"))
    dev = (
        grp.filter(F.col("group_size") >= K_ANON)
        .crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(gt, ["day", "value_band", "event_type"], "left")
        .groupBy("day", "value_band", "group_size", "n_total")
        .agg(
            F.expr(
                "CAST(SUM(ABS(COALESCE(c_gt, 0) * n_total"
                " - c_t * group_size)) AS BIGINT)"
            ).alias("numer")
        )
    )
    scored = dev.select(
        "day", "value_band", "group_size",
        F.expr(
            "round(CAST(numer AS DOUBLE) / (2 * group_size * n_total), 6)"
        ).alias("tvd"),
    )
    order = [
        F.desc("tvd"), F.desc("group_size"), F.asc("day"),
        F.asc("value_band"),
    ]
    top = scored.orderBy(*order).limit(T_CLOSE_K)
    w = Window.orderBy(*order)
    return top.withColumn("rk", F.row_number().over(w))


# ---------------------------------------------------------------------------
# Hoover (Robin Hood) inequality index per nation
# ---------------------------------------------------------------------------


@register(
    "q_hoover_index",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s
      FROM orders GROUP BY o_custkey
    ),
    tagged AS (
      SELECT n_name, s
      FROM spend
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
    ),
    grp AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(s) AS s_tot
      FROM tagged GROUP BY n_name
    ),
    dev AS (
      SELECT t.n_name, g.n_customers, g.s_tot,
             SUM(ABS(g.n_customers * t.s - g.s_tot)) AS d
      FROM tagged t JOIN grp g ON g.n_name = t.n_name
      GROUP BY t.n_name, g.n_customers, g.s_tot
    )
    SELECT n_name, n_customers,
           CAST(s_tot AS DOUBLE) AS total_spend,
           round(CAST(d AS DOUBLE)
                 / (2 * n_customers * CAST(s_tot AS DOUBLE)), 6) AS hoover
    FROM dev
    """,
    doc="Hoover (Robin Hood) index of per-customer spend within each "
        "nation: the share of total spend that would have to move "
        "between customers to equalize them, Sum|x_i - mu| / (2*Sum x). "
        "The log-free inequality complement to q_spend_gini — unlike "
        "Gini it needs NO global rank at all, so it scales as a plain "
        "two-level aggregate. Float discipline: the deviation sum runs "
        "entirely in DECIMAL (n*x_i - S is exact — integer count times "
        "exact DECIMAL spend), floats appear only in the single final "
        "division. Scale shape: customer-grain aggregate, broadcast of "
        "the 25-row nation totals back onto it, second "
        "map-side-combinable aggregate — no windows, no sorts.",
)
def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders", "customer", "nation")
    spend = t["orders"].groupBy("o_custkey").agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(12,2)))").alias("s")
    )
    tagged = (
        spend.join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            spend["o_custkey"] == F.col("c_custkey"),
        )
        .join(F.broadcast(t["nation"]),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .select("n_name", "s")
    )
    grp = tagged.groupBy("n_name").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_customers"),
        F.expr("SUM(s)").alias("s_tot"),
    )
    dev = (
        tagged.join(F.broadcast(grp), "n_name")
        .groupBy("n_name", "n_customers", "s_tot")
        .agg(F.expr("SUM(ABS(n_customers * s - s_tot))").alias("d"))
    )
    return dev.select(
        "n_name", "n_customers",
        F.expr("CAST(s_tot AS DOUBLE)").alias("total_spend"),
        F.expr(
            "round(CAST(d AS DOUBLE)"
            " / (2 * n_customers * CAST(s_tot AS DOUBLE)), 6)"
        ).alias("hoover"),
    )


# ---------------------------------------------------------------------------
# sample-ratio-mismatch (SRM) audit for a hash-randomized A/B split
# ---------------------------------------------------------------------------

#: chi-square 5% critical value for df=1, as the exact rational 384/100 —
#: the flag compares (n0-n1)^2 * 100 > 384 * (n0+n1) entirely in integers
SRM_CRIT_NUM = 384

_SRM_ARM_SPARK = (
    "CAST(conv(substr(md5(concat('srm:', user_id)), 1, 8), 16, 10)"
    " AS BIGINT) % 2"
)
_SRM_ARM_DUCK = (
    "(('0x' || substr(md5(concat('srm:', user_id)), 1, 8))::BIGINT) % 2"
)


@register(
    "q_srm_check",
    oracle=f"""
    WITH armed AS (
      SELECT event_type, {_SRM_ARM_DUCK} AS arm FROM events
    ),
    counts AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_arm0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_arm1
      FROM armed GROUP BY event_type
    )
    SELECT event_type, n_arm0, n_arm1,
           round(CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE)
                 / (n_arm0 + n_arm1), 6) AS chi2,
           CASE WHEN (n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 100
                     > {SRM_CRIT_NUM} * (n_arm0 + n_arm1)
                THEN 1 ELSE 0 END AS srm_flag
    FROM counts
    """,
    doc="Sample-ratio-mismatch audit for a deterministic 50/50 hash "
        "split of users (md5 parity — the same salted-hash assignment "
        "an online experiment would use): per event type, the chi-square "
        "statistic (o0-o1)^2/(o0+o1) against the expected equal split, "
        "flagged at the df=1 5% critical value. SRM is the standard "
        "guardrail that invalidates an A/B readout when randomization "
        "or logging is skewed. Determinism: the flag comparison runs "
        "entirely in integers ((diff^2)*100 vs 384*total — no float "
        "boundary), chi2 itself is one double division for display. "
        "Scale: one map-side-combinable conditional aggregate over the "
        "scan; the md5 arm assignment is JVM-side codegen.",
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    counts = ev.select(
        "event_type", F.expr(_SRM_ARM_SPARK).alias("arm")
    ).groupBy("event_type").agg(
        F.expr(
            "CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_arm0"),
        F.expr(
            "CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_arm1"),
    )
    return counts.select(
        "event_type", "n_arm0", "n_arm1",
        F.expr(
            "round(CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE)"
            " / (n_arm0 + n_arm1), 6)"
        ).alias("chi2"),
        F.expr(
            "CASE WHEN (n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 100"
            f" > {SRM_CRIT_NUM} * (n_arm0 + n_arm1)"
            " THEN 1 ELSE 0 END"
        ).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov distance (binned ECDF)
# ---------------------------------------------------------------------------

KS_TYPE_A = "click"
KS_TYPE_B = "purchase"
KS_BIN = 10  # value-band width; the band domain is bounded (~60 bands)


@register(
    "q_ks_two_sample",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / {KS_BIN}) AS BIGINT)
               AS band,
             CAST(SUM(CASE WHEN event_type = '{KS_TYPE_A}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = '{KS_TYPE_B}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM events
      WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
      GROUP BY 1
    ),
    cum AS (
      SELECT band,
             SUM(ca) OVER (ORDER BY band) AS cum_a,
             SUM(cb) OVER (ORDER BY band) AS cum_b,
             SUM(ca) OVER () AS n_a,
             SUM(cb) OVER () AS n_b
      FROM binned
    )
    SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           CAST(COUNT(*) AS BIGINT) AS n_bands,
           round(CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
                 / (MAX(n_a) * MAX(n_b)), 6) AS d_stat,
           round(CAST(1.358 AS DOUBLE)
                 * sqrt(CAST(MAX(n_a) + MAX(n_b) AS DOUBLE)
                        / (MAX(n_a) * MAX(n_b))), 6) AS ks_critical
    FROM cum
    """,
    doc=f"Two-sample Kolmogorov-Smirnov distance between the "
        f"'{KS_TYPE_A}' and '{KS_TYPE_B}' value distributions over "
        f"width-{KS_BIN} bins — the standard distribution-shift test a "
        "pipeline runs between snapshots or cohorts, next to "
        "pipeline_distribution_drift's chi-square view. The supremum "
        "|F_a - F_b| is computed on the common denominator n_a*n_b "
        "(|cum_a*n_b - cum_b*n_a| — exact integers, ONE double "
        "division at the end), and the 5% critical value "
        "1.358*sqrt((n_a+n_b)/(n_a*n_b)) uses only IEEE-exact sqrt of "
        "one division. The cumulative window runs over the BOUNDED "
        "value-band domain (~60 rows), never entity-grain data.",
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    binned = (
        ev.filter(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B))
        .groupBy(
            F.expr(
                f"CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / {KS_BIN})"
                " AS BIGINT)"
            ).alias("band")
        )
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN event_type = '{KS_TYPE_A}'"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("ca"),
            F.expr(
                f"CAST(SUM(CASE WHEN event_type = '{KS_TYPE_B}'"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("cb"),
        )
    )
    wcum = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = binned.select(
        "band",
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    )
    return cum.agg(
        F.expr("CAST(MAX(n_a) AS BIGINT)").alias("n_a"),
        F.expr("CAST(MAX(n_b) AS BIGINT)").alias("n_b"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_bands"),
        F.expr(
            "round(CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE)"
            " / (MAX(n_a) * MAX(n_b)), 6)"
        ).alias("d_stat"),
        F.expr(
            "round(CAST(1.358 AS DOUBLE)"
            " * sqrt(CAST(MAX(n_a) + MAX(n_b) AS DOUBLE)"
            " / (MAX(n_a) * MAX(n_b))), 6)"
        ).alias("ks_critical"),
    )


# day-of-week seasonality profile
# ---------------------------------------------------------------------------

@register(
    "q_seasonality_dow",
    oracle="""
    WITH base AS (
      SELECT isodow(ts) - 1 AS dow,
             event_type,
             CAST(value AS DECIMAL(10,2)) AS v
      FROM events
    ),
    per AS (
      SELECT dow, event_type, COUNT(*) AS n, SUM(v) AS sv
      FROM base GROUP BY dow, event_type
    ),
    tot AS (
      SELECT event_type, SUM(n) AS tn FROM per GROUP BY event_type
    )
    SELECT CAST(p.dow AS INT) AS dow, p.event_type,
           CAST(p.n AS BIGINT) AS n_events,
           CAST(p.sv AS DOUBLE) AS total_value,
           round(CAST(p.n AS DOUBLE) / t.tn, 6) AS day_share,
           round(CAST(p.n AS DOUBLE) * 7 / t.tn, 6) AS seasonality_index
    FROM per p JOIN tot t ON t.event_type = p.event_type
    """,
    doc="Day-of-week seasonality per event type: Monday-based weekday "
        "share and the seasonality index (share x 7 — 1.0 means flat, "
        "2.0 means that weekday carries double its uniform load), with "
        "DECIMAL-exact value totals. Weekday extraction is Monday-based "
        "in BOTH engines (Spark weekday(), DuckDB isodow-1) — the "
        "classic cross-engine calendar trap where Sunday-based "
        "dayofweek() silently shifts every bucket. One "
        "map-side-combinable aggregate plus a |types|-row marginal "
        "join.",
)
def q_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    per = ev.groupBy(
        F.expr("weekday(ts)").alias("dow"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("SUM(CAST(value AS DECIMAL(10,2)))").alias("sv"),
    )
    tot = per.groupBy("event_type").agg(F.sum("n").alias("tn"))
    return per.join(F.broadcast(tot), "event_type").select(
        F.col("dow").cast("int").alias("dow"),
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("sv").cast("double").alias("total_value"),
        F.expr("round(CAST(n AS DOUBLE) / tn, 6)").alias("day_share"),
        F.expr("round(CAST(n AS DOUBLE) * 7 / tn, 6)").alias("seasonality_index"),
    )


# ---------------------------------------------------------------------------
# inter-arrival gap statistics (per-user event cadence)
# ---------------------------------------------------------------------------

@register(
    "q_interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    gg AS (SELECT * FROM g WHERE gap_us IS NOT NULL),
    ranked AS (
      SELECT user_id, gap_us,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY gap_us, event_id) AS r,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM gg
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           round(CAST(SUM(gap_us) AS DOUBLE) / MAX(n) / 1000000, 6)
             AS mean_gap_s,
           round(CAST(MAX(CASE WHEN r = (50 * n + 99) // 100
                               THEN gap_us END) AS DOUBLE) / 1000000, 6)
             AS p50_gap_s,
           round(CAST(MAX(gap_us) AS DOUBLE) / 1000000, 6) AS max_gap_s
    FROM ranked GROUP BY user_id
    """,
    doc="Per-user inter-arrival cadence: microsecond-exact gaps between "
        "consecutive events (epoch-micros LAG — integer arithmetic, no "
        "timestamp float math or timezone dependence), reduced to count, "
        "mean, type-1 median, and max per user. The cadence profile that "
        "calibrates session-gap thresholds (q_sessionize_events' 3600 s "
        "cut) and bot-vs-human heuristics from data instead of folklore. "
        "Shares the per-user (ts, event_id) window partitioning the "
        "whole behavioral family already shuffles on.",
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id", "event_id",
        (
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
            - F.lag(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("user_id").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = g.select(
        "user_id", "gap_us",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.expr(
            "round(CAST(SUM(gap_us) AS DOUBLE) / MAX(n) / 1000000, 6)"
        ).alias("mean_gap_s"),
        F.expr(
            "round(CAST(MAX(CASE WHEN r = (50 * n + 99) DIV 100 "
            "THEN gap_us END) AS DOUBLE) / 1000000, 6)"
        ).alias("p50_gap_s"),
        F.expr("round(CAST(MAX(gap_us) AS DOUBLE) / 1000000, 6)")
        .alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# XYZ demand-variability classification (companion to Pareto/ABC)
# ---------------------------------------------------------------------------

@register(
    "q_xyz_demand_classes",
    oracle="""
    WITH weekly AS (
      SELECT l_partkey,
             CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
             SUM(CAST(l_quantity AS DECIMAL(10,2))) AS qty
      FROM lineitem GROUP BY l_partkey, week
    ),
    stats AS (
      SELECT l_partkey,
             COUNT(*) AS n_weeks,
             CAST(SUM(qty) AS DOUBLE) AS sx,
             CAST(SUM(qty * qty) AS DOUBLE) AS sxx
      FROM weekly GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(n_weeks AS BIGINT) AS n_weeks,
           round(sx / n_weeks, 6) AS mean_weekly_qty,
           round(sqrt((sxx - sx * sx / n_weeks) / n_weeks)
                 / (sx / n_weeks), 6) AS cv,
           CASE WHEN sqrt((sxx - sx * sx / n_weeks) / n_weeks)
                     / (sx / n_weeks) < 0.5 THEN 'X'
                WHEN sqrt((sxx - sx * sx / n_weeks) / n_weeks)
                     / (sx / n_weeks) < 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM stats WHERE n_weeks >= 2 AND sx > 0
    """,
    doc="XYZ demand-variability classification: per part, the "
        "coefficient of variation of weekly shipped quantity from "
        "DECIMAL-exact sufficient statistics (one sqrt + one division of "
        "exactly-reproducible doubles), cut into the standard X (<0.5, "
        "steady), Y (<1.0, variable), Z (erratic) classes. The "
        "forecastability axis that pairs with q_pareto_brands' value "
        "axis into the ABC/XYZ inventory matrix. Two "
        "map-side-combinable aggregates (week grain, then part grain); "
        "single-week or zero-demand parts are excluded — a CV needs "
        "dispersion to be defined.",
)
def q_xyz_demand_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    weekly = li.groupBy(
        "l_partkey",
        F.expr("CAST(date_trunc('week', l_shipdate) AS DATE)").alias("week"),
    ).agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(10,2)))").alias("qty"))
    stats = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.expr("CAST(SUM(qty) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(qty * qty) AS DOUBLE)").alias("sxx"),
    )
    cv = "sqrt((sxx - sx * sx / n_weeks) / n_weeks) / (sx / n_weeks)"
    return (
        stats.filter((F.col("n_weeks") >= 2) & (F.col("sx") > 0))
        .select(
            "l_partkey",
            F.col("n_weeks").cast("bigint").alias("n_weeks"),
            F.expr("round(sx / n_weeks, 6)").alias("mean_weekly_qty"),
            F.expr(f"round({cv}, 6)").alias("cv"),
            F.expr(
                f"CASE WHEN {cv} < 0.5 THEN 'X' "
                f"WHEN {cv} < 1.0 THEN 'Y' ELSE 'Z' END"
            ).alias("xyz_class"),
        )
    )


# ---------------------------------------------------------------------------
# session entry→exit flow matrix
# ---------------------------------------------------------------------------

@register(
    "q_session_entry_exit",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts) > 3600
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    ses AS (
      SELECT user_id, sid,
             FIRST_VALUE(event_type) OVER w2 AS entry_type,
             LAST_VALUE(event_type) OVER (
               PARTITION BY user_id, sid ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             ) AS exit_type,
             COUNT(*) OVER (PARTITION BY user_id, sid) AS n_events,
             ROW_NUMBER() OVER w2 AS rn
      FROM s
      WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
             AS avg_session_events
    FROM ses WHERE rn = 1
    GROUP BY entry_type, exit_type
    """,
    doc="Session entry→exit flow matrix: gap-sessionized (the 1h rule "
        "q_sessionize_events established) sessions keyed by their first "
        "and last event type — the Sankey-diagram source showing where "
        "journeys start and where they die (view→purchase vs "
        "view→view abandonment), with session counts and exact mean "
        "session length per flow. One per-user sequence shuffle shared "
        "with the whole behavioral family, then per-session window "
        "reads; the |types|^2 flow matrix is broadcast-sized.",
)
def q_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    g = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            prev_ts.isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 3600),
            1,
        ).otherwise(0).alias("new_session"),
    )
    s = g.withColumn(
        "sid",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w2 = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    w2full = w2.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ses = s.select(
        "user_id", "sid",
        F.first("event_type").over(w2).alias("entry_type"),
        F.last("event_type").over(w2full).alias("exit_type"),
        F.count(F.lit(1)).over(
            Window.partitionBy("user_id", "sid")
        ).alias("n_events"),
        F.row_number().over(w2).alias("rn"),
    ).filter(F.col("rn") == 1)
    return ses.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        F.expr(
            "round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)"
        ).alias("avg_session_events"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer spend (inequality measure)
# ---------------------------------------------------------------------------

@register(
    "q_spend_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s, o_custkey) AS r,
             COUNT(*) OVER () AS n
      FROM spend
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(SUM(s) AS DOUBLE) AS total_spend,
           round(2.0 * CAST(SUM(r * s) AS DOUBLE)
                 / (MAX(n) * CAST(SUM(s) AS DOUBLE))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini
    FROM ranked
    """,
    doc="Gini coefficient of per-customer spend via the rank formula "
        "G = 2*sum(r_i*x_i)/(n*sum(x_i)) - (n+1)/n: both accumulations "
        "are EXACT (integer rank times DECIMAL spend — no float "
        "accumulates across rows), the floats appear only in the final "
        "three-term expression. The inequality summary behind the "
        "decile/Pareto views — one number a dashboard tracks over time "
        "to see concentration drift. The rank comes from a TWO-PHASE "
        "distributed computation (_global_rank) over the pre-aggregated "
        "customer table — no single-partition sort anywhere.",
)
def q_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    spend = orders.groupBy("o_custkey").agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(12,2)))").alias("s")
    )
    # two-phase distributed rank (see _global_rank): no single task ever
    # sorts the full customer set; __n rides along from the bucket totals
    ranked = _global_rank(
        spend, "CAST(s AS DOUBLE)",
        [F.asc("s"), F.asc("o_custkey")],
        with_total=True,
    ).select("s", F.col("__rank").alias("r"), F.col("__n").alias("n"))
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.expr("CAST(SUM(s) AS DOUBLE)").alias("total_spend"),
        F.expr(
            "round(2.0 * CAST(SUM(r * s) AS DOUBLE) "
            "/ (MAX(n) * CAST(SUM(s) AS DOUBLE)) "
            "- (MAX(n) + 1.0) / MAX(n), 6)"
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# catalog coverage: parts ever ordered, per brand
# ---------------------------------------------------------------------------

@register(
    "q_catalog_coverage",
    oracle="""
    WITH ordered AS (
      SELECT DISTINCT l_partkey FROM lineitem
    )
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN o.l_partkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ordered,
           round(CAST(SUM(CASE WHEN o.l_partkey IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS coverage
    FROM part p LEFT JOIN ordered o ON o.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="Catalog coverage audit: per brand, how much of the part catalog "
        "has EVER shipped — dead-inventory detection and the "
        "completeness check for a fact table claimed to cover the "
        "catalog. The fact side reduces to distinct keys FIRST (the "
        "semi-join-shaped pre-aggregation), so the dimension joins "
        "against |parts-with-sales| rows, not raw line items; coverage "
        "ratios are exact integer fractions.",
)
def q_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = (
        load(spark, sf_dir, "lineitem", "part")[t] for t in ("lineitem", "part")
    )
    ordered = li.select("l_partkey").distinct()
    return (
        part.join(ordered, part["p_partkey"] == ordered["l_partkey"], "left")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.expr(
                "CAST(SUM(CASE WHEN l_partkey IS NOT NULL THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("n_ordered"),
            F.expr(
                "round(CAST(SUM(CASE WHEN l_partkey IS NOT NULL THEN 1 ELSE 0 "
                "END) AS DOUBLE) / COUNT(*), 6)"
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# median absolute deviation (robust dispersion + outlier counts)
# ---------------------------------------------------------------------------

@register(
    "q_mad_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, event_id,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    med AS (
      SELECT event_type,
             MAX(CASE WHEN r = (50 * n + 99) // 100 THEN cents END) AS m
      FROM (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY cents, event_id) AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM c
      ) t GROUP BY event_type
    ),
    dev AS (
      SELECT c.event_type, c.event_id, c.cents,
             abs(c.cents - med.m) AS ad, med.m
      FROM c JOIN med ON med.event_type = c.event_type
    ),
    mad AS (
      SELECT event_type,
             MAX(CASE WHEN r = (50 * n + 99) // 100 THEN ad END) AS mad
      FROM (
        SELECT event_type, ad,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ad, event_id) AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
      ) t GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST(MAX(d.m) AS DOUBLE) / 100, 6) AS median_value,
           round(CAST(MAX(mad.mad) AS DOUBLE) / 100, 6) AS mad_value,
           CAST(SUM(CASE WHEN d.ad > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad ON mad.event_type = d.event_type
    GROUP BY d.event_type
    """,
    doc="Median-absolute-deviation robust dispersion per event_type, with "
        "the |x - median| > 3*MAD outlier count — the estimator with a "
        "50% breakdown point, catching what z-scores (q_value_outliers) "
        "miss when the outliers themselves inflate the std. Everything "
        "runs on integer cents: two type-1 rank passes (median, then "
        "MAD) and integer comparisons — no float enters until the "
        "display columns. Three shuffles on the same event_type "
        "partitioning; at 100 TB swap the rank passes for "
        "approx_percentile and keep the flag contract.",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    c = ev.select(
        "event_type", "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)")
        .alias("cents"),
    )
    wv = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    med = (
        c.select(
            "event_type", "cents",
            F.row_number().over(wv).alias("r"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .groupBy("event_type")
        .agg(F.expr(
            "MAX(CASE WHEN r = (50 * n + 99) DIV 100 THEN cents END)"
        ).alias("m"))
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "cents",
        F.abs(F.col("cents") - F.col("m")).alias("ad"), "m",
    )
    wa = Window.partitionBy("event_type").orderBy("ad", "event_id")
    mad = (
        dev.select(
            "event_type", "ad",
            F.row_number().over(wa).alias("r"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .groupBy("event_type")
        .agg(F.expr(
            "MAX(CASE WHEN r = (50 * n + 99) DIV 100 THEN ad END)"
        ).alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.expr("round(CAST(MAX(m) AS DOUBLE) / 100, 6)")
            .alias("median_value"),
            F.expr("round(CAST(MAX(mad) AS DOUBLE) / 100, 6)")
            .alias("mad_value"),
            F.expr(
                "CAST(SUM(CASE WHEN ad > 3 * mad THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# unit-price consistency audit (exact scaled-integer unit prices)
# ---------------------------------------------------------------------------

@register(
    "q_unit_price_audit",
    oracle="""
    WITH u AS (
      SELECT l_partkey,
             (CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
              * 100)
             // CAST(CAST(l_quantity AS DECIMAL(10,2)) * 100 AS BIGINT)
               AS unit_scaled
      FROM lineitem WHERE l_quantity > 0
    )
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(DISTINCT unit_scaled) AS BIGINT) AS n_distinct_units,
           round(CAST(MIN(unit_scaled) AS DOUBLE) / 100, 6) AS min_unit,
           round(CAST(MAX(unit_scaled) AS DOUBLE) / 100, 6) AS max_unit,
           CAST(CASE WHEN COUNT(DISTINCT unit_scaled) > 1 THEN 1 ELSE 0 END
                AS INT) AS inconsistent
    FROM u GROUP BY l_partkey
    """,
    doc="Unit-price consistency audit: per part, the distinct "
        "extended-price/quantity ratios across its line items — a part "
        "sold at several unit prices flags entry errors, unrecorded "
        "discounts, or a broken price pipeline. The ratio is computed in "
        "SCALED INTEGERS (cents x 100 integer-divided by quantity "
        "cents), so 'distinct unit price' is an exact equality class, "
        "not a float-epsilon guess — the difference between an audit "
        "and a heuristic. One aggregate keyed on the part; distinct "
        "count is the only non-trivially-combinable piece and stays "
        "bounded by per-part line counts.",
)
def q_unit_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    u = li.filter(F.col("l_quantity") > 0).select(
        "l_partkey",
        F.expr(
            "(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) "
            "* 100) DIV "
            "CAST(CAST(l_quantity AS DECIMAL(10,2)) * 100 AS BIGINT)"
        ).alias("unit_scaled"),
    )
    return u.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.countDistinct("unit_scaled").cast("bigint")
        .alias("n_distinct_units"),
        F.expr("round(CAST(MIN(unit_scaled) AS DOUBLE) / 100, 6)")
        .alias("min_unit"),
        F.expr("round(CAST(MAX(unit_scaled) AS DOUBLE) / 100, 6)")
        .alias("max_unit"),
        F.expr(
            "CAST(CASE WHEN COUNT(DISTINCT unit_scaled) > 1 THEN 1 ELSE 0 "
            "END AS INT)"
        ).alias("inconsistent"),
    )


# ---------------------------------------------------------------------------
# cohort LTV curve (cumulative spend by cohort age)
# ---------------------------------------------------------------------------

@register(
    "q_cohort_ltv_curve",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS midx,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders
    ),
    first_m AS (
      SELECT o_custkey, MIN(midx) AS cohort_m FROM o GROUP BY o_custkey
    ),
    cohort_sizes AS (
      SELECT cohort_m, COUNT(*) AS n_customers FROM first_m GROUP BY cohort_m
    ),
    aged AS (
      SELECT f.cohort_m, o.midx - f.cohort_m AS age_months, o.price
      FROM o JOIN first_m f ON f.o_custkey = o.o_custkey
    ),
    per_age AS (
      SELECT cohort_m, age_months, SUM(price) AS spend
      FROM aged GROUP BY cohort_m, age_months
    )
    SELECT p.cohort_m,
           CAST(p.age_months AS INT) AS age_months,
           CAST(cs.n_customers AS BIGINT) AS n_customers,
           CAST(p.spend AS DOUBLE) AS spend,
           round(CAST(SUM(p.spend) OVER (PARTITION BY p.cohort_m
                                         ORDER BY p.age_months) AS DOUBLE)
                 / cs.n_customers, 6) AS cum_ltv_per_customer
    FROM per_age p JOIN cohort_sizes cs ON cs.cohort_m = p.cohort_m
    """,
    doc="Cohort LTV curve: customers grouped by first-order month, spend "
        "accumulated by cohort age — the lifetime-value ramp that "
        "marketing payback math reads off. Months are INTEGER indexes "
        "(year*12+month), never interval arithmetic, so ages are exact "
        "in both engines; spend accumulates in DECIMAL with the one "
        "float division (per-customer normalization) at the end. The "
        "cumulative window runs over the per-(cohort, age) aggregate "
        "(tiny), not raw orders — aggregate-then-window, the same "
        "discipline as the Pareto/decile family.",
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    o = orders.select(
        "o_custkey",
        F.expr("year(o_orderdate) * 12 + month(o_orderdate)").alias("midx"),
        F.expr("CAST(o_totalprice AS DECIMAL(12,2))").alias("price"),
    )
    first_m = o.groupBy("o_custkey").agg(F.min("midx").alias("cohort_m"))
    cohort_sizes = first_m.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    aged = o.join(first_m, "o_custkey").select(
        "cohort_m", (F.col("midx") - F.col("cohort_m")).alias("age_months"),
        "price",
    )
    per_age = aged.groupBy("cohort_m", "age_months").agg(
        F.sum("price").alias("spend")
    )
    wc = Window.partitionBy("cohort_m").orderBy("age_months")
    return (
        per_age.join(F.broadcast(cohort_sizes), "cohort_m")
        .select(
            "cohort_m",
            F.col("age_months").cast("int").alias("age_months"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("spend").cast("double").alias("spend"),
            F.round(
                F.sum("spend").over(wc).cast("double") / F.col("n_customers"),
                6,
            ).alias("cum_ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# discount-band effectiveness
# ---------------------------------------------------------------------------

@register(
    "q_discount_effectiveness",
    oracle="""
    WITH banded AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(10,2)) * 100 AS BIGINT)
               AS discount_pct,
             CAST(l_quantity AS DECIMAL(10,2)) AS qty,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(10,2))) AS net
      FROM lineitem
    )
    SELECT discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           round(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6) AS avg_quantity,
           CAST(SUM(net) AS DOUBLE) AS net_revenue
    FROM banded GROUP BY discount_pct
    """,
    doc="Discount-band effectiveness: line volume, average quantity, and "
        "DECIMAL-exact net revenue per whole-percent discount band — the "
        "'does discounting move volume' read. Discount percents come "
        "from DECIMAL x100 integer banding (2-decimal discounts band "
        "exactly; a double floor would misband the .29999 "
        "representations). One map-side-combinable aggregate over the "
        "fact scan.",
)
def q_discount_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    banded = li.select(
        F.expr(
            "CAST(CAST(l_discount AS DECIMAL(10,2)) * 100 AS BIGINT)"
        ).alias("discount_pct"),
        F.expr("CAST(l_quantity AS DECIMAL(10,2))").alias("qty"),
        F.expr(
            "CAST(l_extendedprice AS DECIMAL(12,2)) "
            "* (1 - CAST(l_discount AS DECIMAL(10,2)))"
        ).alias("net"),
    )
    return banded.groupBy("discount_pct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.expr("round(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6)")
        .alias("avg_quantity"),
        F.expr("CAST(SUM(net) AS DOUBLE)").alias("net_revenue"),
    )


# ---------------------------------------------------------------------------
# supplier concentration (Herfindahl–Hirschman index per part type)
# ---------------------------------------------------------------------------

@register(
    "q_supplier_hhi",
    oracle="""
    WITH rev AS (
      SELECT p.p_type, l.l_suppkey,
             CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))))
                  AS BIGINT) AS units
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_type, l.l_suppkey
    )
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           round(CAST(SUM(units * units) AS DOUBLE)
                 / (CAST(SUM(units) AS DOUBLE) * SUM(units)), 6) AS hhi,
           round(CAST(MAX(units) AS DOUBLE) / SUM(units), 6) AS top_share
    FROM rev GROUP BY p_type
    """,
    doc="Supplier-concentration HHI per part type: sum of squared revenue "
        "shares, computed with cleared denominators — SUM(units^2) and "
        "SUM(units)^2 are both exact BIGINT-derived quantities (whole "
        "currency units: truncation is identical in both engines and "
        "shares are scale-invariant; cents-squared would overflow "
        "BIGINT at this revenue volume), so the "
        "index is two IEEE ops from exact integers rather than a "
        "float-share accumulation. HHI > 0.25 is the antitrust-style "
        "red-flag band; top_share pins the single-supplier dependency. "
        "One fact-dim broadcast join and two map-side-combinable "
        "reduces.",
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = (
        load(spark, sf_dir, "lineitem", "part")[t] for t in ("lineitem", "part")
    )
    rev = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_type", "l_suppkey")
        .agg(
            F.expr(
                "CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))) "
                "AS BIGINT)"
            ).alias("units")
        )
    )
    return rev.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.expr(
            "round(CAST(SUM(units * units) AS DOUBLE) "
            "/ (CAST(SUM(units) AS DOUBLE) * SUM(units)), 6)"
        ).alias("hhi"),
        F.expr(
            "round(CAST(MAX(units) AS DOUBLE) / SUM(units), 6)"
        ).alias("top_share"),
    )


# ---------------------------------------------------------------------------
# return-rate analysis per brand
# ---------------------------------------------------------------------------

@register(
    "q_return_rate_brand",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           round(CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS return_rate,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END)
                AS DOUBLE) AS returned_value
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
    doc="Return-rate profile per brand: returned-line share (exact "
        "integer ratio) and DECIMAL-exact returned value — the "
        "product-quality feedback loop reading, and a disguised "
        "conditional-aggregation exercise (one scan computes both "
        "branches; no second pass over returns). Fact-dim broadcast "
        "join, one map-side-combinable reduce.",
)
def q_return_rate_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = (
        load(spark, sf_dir, "lineitem", "part")[t] for t in ("lineitem", "part")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.expr(
                "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("n_returned"),
            F.expr(
                "round(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 "
                "END) AS DOUBLE) / COUNT(*), 6)"
            ).alias("return_rate"),
            F.expr(
                "CAST(SUM(CASE WHEN l_returnflag = 'R' "
                "THEN CAST(l_extendedprice AS DECIMAL(12,2)) "
                "ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)"
            ).alias("returned_value"),
        )
    )


# ---------------------------------------------------------------------------
# nation-to-nation trade flow matrix
# ---------------------------------------------------------------------------

@register(
    "q_nation_trade_matrix",
    oracle="""
    WITH flows AS (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(10,2)))) AS revenue
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      GROUP BY supp_nation, cust_nation
    ),
    tot AS (SELECT SUM(revenue) AS t FROM flows)
    SELECT supp_nation, cust_nation,
           CAST(revenue AS DOUBLE) AS revenue,
           round(CAST(revenue AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE),
                 6) AS flow_share,
           CAST(CASE WHEN supp_nation = cust_nation THEN 1 ELSE 0 END AS INT)
             AS domestic
    FROM flows
    """,
    doc="Full nation-to-nation trade matrix: DECIMAL-exact discounted "
        "revenue for every (supplier nation, customer nation) flow with "
        "its global share and a domestic flag — the complete-matrix "
        "generalization of TPC-H q07's two-nation slice, and the "
        "origin-destination shape every marketplace/logistics dashboard "
        "renders. Plan shape: the two nation dims and supplier/customer "
        "broadcast onto the fact chain, orders co-join on the order key; "
        "one final reduce to a |nations|^2 matrix (broadcast-sized).",
)
def q_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "supplier", "nation", "orders",
             "customer")
    li, supp, nat, orders, cust = (
        t["lineitem"], t["supplier"], t["nation"], t["orders"], t["customer"]
    )
    ns = nat.select(F.col("n_nationkey").alias("sk"),
                    F.col("n_name").alias("supp_nation"))
    nc = nat.select(F.col("n_nationkey").alias("ck"),
                    F.col("n_name").alias("cust_nation"))
    flows = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sk"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("ck"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.expr(
                "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) "
                "* (1 - CAST(l_discount AS DECIMAL(10,2))))"
            ).alias("revenue")
        )
    )
    tot = flows.agg(F.sum("revenue").alias("t"))
    return flows.crossJoin(F.broadcast(tot)).select(
        "supp_nation", "cust_nation",
        F.col("revenue").cast("double").alias("revenue"),
        F.expr(
            "round(CAST(revenue AS DOUBLE) / CAST(t AS DOUBLE), 6)"
        ).alias("flow_share"),
        F.expr(
            "CAST(CASE WHEN supp_nation = cust_nation THEN 1 ELSE 0 END "
            "AS INT)"
        ).alias("domestic"),
    )


# ---------------------------------------------------------------------------
# basket-size distribution
# ---------------------------------------------------------------------------

@register(
    "q_basket_size_dist",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey
    ),
    tot AS (SELECT COUNT(*) AS t FROM sizes)
    SELECT CAST(n_lines AS BIGINT) AS basket_size,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(COUNT(*) AS DOUBLE) / (SELECT t FROM tot), 6)
             AS order_share
    FROM sizes GROUP BY n_lines
    """,
    doc="Basket-size distribution: how many line items orders carry, with "
        "order shares — the denominator model behind the market-basket "
        "pair-work bound (pairs per order = C(basket,2)) and the "
        "fulfillment-cost driver. Two map-side-combinable reduces; the "
        "histogram is constant-sized at any scale.",
)
def q_basket_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    tot = sizes.agg(F.count(F.lit(1)).alias("t"))
    return (
        sizes.groupBy("n_lines")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_lines").cast("bigint").alias("basket_size"),
            "n_orders",
            F.expr("round(CAST(n_orders AS DOUBLE) / t, 6)")
            .alias("order_share"),
        )
    )


# ---------------------------------------------------------------------------
# repeat-purchase rate per brand
# ---------------------------------------------------------------------------

@register(
    "q_repeat_purchase_rate",
    oracle="""
    WITH cp AS (
      SELECT o.o_custkey, p.p_brand,
             COUNT(DISTINCT l.l_orderkey) AS n_orders
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY o.o_custkey, p.p_brand
    )
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_customer_brand_pairs,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           round(CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS repeat_rate
    FROM cp GROUP BY p_brand
    """,
    doc="Repeat-purchase rate per brand: the share of (customer, brand) "
        "relationships spanning two or more distinct orders — the "
        "loyalty/consumable-vs-durable signal behind retention "
        "forecasting. The (customer, brand) grain reduces before any "
        "rate math (distinct order counts are per-pair bounded); "
        "fact-to-dims are broadcast joins and the final reduce is "
        "map-side combinable.",
)
def q_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "orders", "part")
    li, orders, part = t["lineitem"], t["orders"], t["part"]
    cp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("o_custkey", "p_brand")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    return cp.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customer_brand_pairs"),
        F.expr(
            "CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_repeat"),
        F.expr(
            "round(CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) "
            "AS DOUBLE) / COUNT(*), 6)"
        ).alias("repeat_rate"),
    )


# ---------------------------------------------------------------------------
# weekday x hour activity heatmap
# ---------------------------------------------------------------------------

@register(
    "q_activity_heatmap",
    oracle="""
    WITH cells AS (
      SELECT isodow(ts) - 1 AS dow, hour(ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n) AS t FROM cells)
    SELECT CAST(dow AS INT) AS dow, CAST(hr AS INT) AS hr,
           CAST(n AS BIGINT) AS n_events,
           round(CAST(n AS DOUBLE) / (SELECT t FROM tot), 6) AS cell_share
    FROM cells
    """,
    doc="Weekday x hour activity heatmap (Monday-based weekday, the "
        "cross-engine-safe spelling): the 7x24 grid every ops dashboard "
        "renders and the capacity-planning input for micro-batch "
        "scheduling. One map-side-combinable reduce to at most 168 "
        "cells plus a 1-row broadcast total.",
)
def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    cells = ev.groupBy(
        F.expr("weekday(ts)").alias("dow"),
        F.expr("hour(ts)").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").alias("t"))
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("int").alias("dow"),
        F.col("hr").cast("int").alias("hr"),
        F.col("n").cast("bigint").alias("n_events"),
        F.expr("round(CAST(n AS DOUBLE) / t, 6)").alias("cell_share"),
    )


# ---------------------------------------------------------------------------
# dormancy curve (time-since-last-activity distribution)
# ---------------------------------------------------------------------------

@register(
    "q_dormancy_curve",
    oracle="""
    WITH horizon AS (
      SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS h FROM events
    ),
    last_seen AS (
      SELECT user_id, MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day
      FROM events GROUP BY user_id
    ),
    aged AS (
      SELECT user_id,
             datediff('day', last_day, (SELECT h FROM horizon))
               AS days_dormant
      FROM last_seen
    ),
    tot AS (SELECT COUNT(*) AS t FROM aged)
    SELECT CAST(days_dormant AS INT) AS days_dormant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(COUNT(*)) OVER (ORDER BY days_dormant) AS DOUBLE)
                 / (SELECT t FROM tot), 6) AS cum_active_share
    FROM aged GROUP BY days_dormant
    """,
    doc="Dormancy curve: users bucketed by whole days since their last "
        "activity relative to the corpus horizon, with the cumulative "
        "share still active within N days — the churn-risk CDF that "
        "picks the inactivity threshold for win-back campaigns from "
        "data rather than convention. Integer DATE day-diffs (no "
        "timestamp float or timezone math); the cumulative window runs "
        "over the tiny per-day aggregate.",
)
def q_dormancy_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    days = ev.select(
        "user_id", F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day")
    )
    horizon = days.agg(F.max("day").alias("h"))
    last_seen = days.groupBy("user_id").agg(F.max("day").alias("last_day"))
    aged = last_seen.crossJoin(F.broadcast(horizon)).select(
        F.expr("datediff(h, last_day)").alias("days_dormant")
    )
    tot = aged.agg(F.count(F.lit(1)).alias("t"))
    per = aged.groupBy("days_dormant").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    wc = Window.orderBy("days_dormant")
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("days_dormant").cast("int").alias("days_dormant"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(
            F.sum("n_users").over(wc).cast("double") / F.col("t"), 6
        ).alias("cum_active_share"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint scan over daily value series
# ---------------------------------------------------------------------------

@register(
    "q_changepoint_cusum",
    # the centered cumulative sum n*prefix_t - t*total is the standard CUSUM
    # statistic with the mean cleared to integers: dividing by n would leave
    # engine-specific float rounding, multiplying through keeps every value
    # an exact BIGINT in cent-day units
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    series AS (
      SELECT event_type, day, cents,
             ROW_NUMBER() OVER w AS t,
             SUM(cents) OVER w AS prefix,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(cents) OVER (PARTITION BY event_type) AS total
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    cusum AS (
      SELECT event_type, day, cents,
             CAST(n * prefix - t * total AS BIGINT) AS cusum_scaled
      FROM series
    )
    SELECT event_type, day, cents AS day_cents, cusum_scaled,
           abs(cusum_scaled) = MAX(abs(cusum_scaled))
             OVER (PARTITION BY event_type) AS is_peak
    FROM cusum
    """,
    doc="CUSUM changepoint scan per event type: daily DECIMAL-exact value "
        "totals, then the centered cumulative deviation n*prefix_t - "
        "t*total (the classic CUSUM statistic scaled by n to stay in "
        "exact integer cent-day units — no float mean, no division). The "
        "day where |CUSUM| peaks is the single-changepoint estimate a "
        "level-shift detector reports; is_peak flags it. Scale shape: one "
        "map-side-combinable (type, day) aggregate, then windows keyed on "
        "event_type over the ~365-row-per-type daily series — window "
        "state is bounded by days, not events.",
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        "event_type", F.expr("CAST(ts AS DATE)").alias("day")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT)"
        ).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    series = daily.select(
        "event_type",
        "day",
        "cents",
        F.row_number().over(w).alias("t"),
        F.sum("cents").over(w).alias("prefix"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("cents").over(wt).alias("total"),
    )
    cusum = series.select(
        "event_type",
        "day",
        "cents",
        F.expr("CAST(n * prefix - t * total AS BIGINT)").alias("cusum_scaled"),
    )
    return cusum.select(
        "event_type",
        "day",
        F.col("cents").alias("day_cents"),
        "cusum_scaled",
        (
            F.abs(F.col("cusum_scaled"))
            == F.max(F.abs(F.col("cusum_scaled"))).over(wt)
        ).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# time-bounded ordered funnel (conversion window)
# ---------------------------------------------------------------------------

@register(
    "q_funnel_windowed",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
       AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 7 DAY
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
       AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 7 DAY
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_7d,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_7d,
           round(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / greatest((SELECT COUNT(*) FROM v), 1), 6) AS click_rate,
           round(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / greatest((SELECT COUNT(*) FROM c), 1), 6) AS purchase_rate
    """,
    doc="Time-bounded ordered funnel (the windowFunnel pattern): view, "
        "then a click within 7 days of the first view, then a purchase "
        "within 7 days of that first click — the bounded conversion "
        "window is what separates campaign attribution from the "
        "unbounded q_funnel_conversion. Same chained per-user "
        "min-aggregation shape with a range upper bound added to each "
        "join predicate; each stage's surviving cohort shrinks, so at "
        "scale the build sides stay small and the range condition prunes "
        "inside the join instead of post-filtering.",
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    c = (
        clicks.join(
            v,
            (F.col("c_uid") == F.col("user_id"))
            & (F.col("c_ts") > F.col("t_view"))
            & (F.col("c_ts") <= F.expr("t_view + INTERVAL 7 DAY")),
        )
        .groupBy("user_id")
        .agg(F.min("c_ts").alias("t_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    p = (
        purchases.join(
            c,
            (F.col("p_uid") == F.col("user_id"))
            & (F.col("p_ts") > F.col("t_click"))
            & (F.col("p_ts") <= F.expr("t_click + INTERVAL 7 DAY")),
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = c.agg(F.count(F.lit(1)).alias("n_clicked_7d"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased_7d"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            F.col("n_viewed").cast("bigint").alias("n_viewed"),
            F.col("n_clicked_7d").cast("bigint").alias("n_clicked_7d"),
            F.col("n_purchased_7d").cast("bigint").alias("n_purchased_7d"),
            F.expr(
                "round(CAST(n_clicked_7d AS DOUBLE) / greatest(n_viewed, 1), 6)"
            ).alias("click_rate"),
            F.expr(
                "round(CAST(n_purchased_7d AS DOUBLE) / greatest(n_clicked_7d, 1), 6)"
            ).alias("purchase_rate"),
        )
    )


# ---------------------------------------------------------------------------
# skyline (Pareto-front) query: cheapest-and-largest parts
# ---------------------------------------------------------------------------

@register(
    "q_skyline_parts",
    # dominance test via one running max over distinct value pairs: with
    # pairs ordered (price ASC, size DESC), every preceding row has
    # strictly lower price OR equal price with strictly larger size — so
    # "preceding max size >= mine" is exactly "somebody dominates me"
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(p_retailprice AS DECIMAL(10,2)) AS price, p_size
      FROM part
    ),
    flagged AS (
      SELECT price, p_size,
             MAX(p_size) OVER (ORDER BY price ASC, p_size DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS best_prev
      FROM pairs
    ),
    sky AS (
      SELECT price, p_size FROM flagged
      WHERE best_prev IS NULL OR best_prev < p_size
    )
    SELECT p.p_partkey, p.p_brand,
           CAST(sky.price AS DOUBLE) AS price, p.p_size
    FROM part p
    JOIN sky ON CAST(p.p_retailprice AS DECIMAL(10,2)) = sky.price
            AND p.p_size = sky.p_size
    """,
    doc="Skyline (Pareto-front) query: parts where no other part is both "
        "cheaper-or-equal AND larger-or-equal with one strict — the "
        "classic multi-criteria shortlist (minimize price, maximize "
        "size). Dominance collapses to ONE running max over DISTINCT "
        "(price, size) pairs ordered (price ASC, size DESC): any "
        "preceding pair dominates iff its size reaches yours. The "
        "running max is computed TWO-PHASE (_range_bucket: parallel "
        "per-bucket windows + a prefix max over bucket summaries), so "
        "even a fact-table-sized pair set never funnels through one "
        "task. DECIMAL-cast prices keep the equality join exact.",
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")["part"]
    pairs = (
        part.select(
            F.expr("CAST(p_retailprice AS DECIMAL(10,2))").alias("price"),
            "p_size",
        )
        .distinct()
    )
    # two-phase running max (same bucketing as _global_rank): per-bucket
    # windows in parallel + a prefix max over <= 64 bucket SUMMARIES —
    # equal prices share a bucket, so "max size over earlier buckets"
    # plus the intra-bucket preceding max is exactly the global
    # preceding max, with no single-partition sort over the pair set
    bucketed = _range_bucket(pairs, "CAST(price AS DOUBLE)")
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(F.asc("price"), F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("local_prev", F.max("p_size").over(w_local))
    w_prior = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    prior = (
        bucketed.groupBy("__bucket")
        .agg(F.max("p_size").alias("bucket_max"))
        .withColumn("prior_max", F.max("bucket_max").over(w_prior))
        .select("__bucket", "prior_max")
    )
    sky = (
        local.join(F.broadcast(prior), "__bucket")
        .withColumn("best_prev", F.greatest("local_prev", "prior_max"))
        .filter(F.col("best_prev").isNull() | (F.col("best_prev") < F.col("p_size")))
        .select("price", "p_size")
    )
    return (
        part.withColumn("price", F.expr("CAST(p_retailprice AS DECIMAL(10,2))"))
        .join(F.broadcast(sky), ["price", "p_size"])
        .select(
            "p_partkey", "p_brand",
            F.col("price").cast("double").alias("price"), "p_size",
        )
    )


# ---------------------------------------------------------------------------
# XmR (individuals / moving-range) control chart
# ---------------------------------------------------------------------------

@register(
    "q_control_chart_xmr",
    # the classic XmR rule flags |x - mean| > 2.66 * avg moving range;
    # clearing denominators makes the comparison pure integers:
    #   100*(n-1)*|n*x - total|  vs  266*n*sum_MR
    # (mean = total/n, MRbar = sum_MR/(n-1), 2.66 = 266/100)
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    mr AS (
      SELECT event_type, day, cents,
             abs(cents - lag(cents) OVER w) AS moving_range
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(cents) AS total,
             SUM(moving_range) AS sum_mr
      FROM mr GROUP BY event_type
    )
    SELECT mr.event_type, mr.day, mr.cents AS day_cents,
           CAST(mr.moving_range AS BIGINT) AS moving_range,
           100 * (s.n - 1) * abs(s.n * mr.cents - s.total)
             > 266 * s.n * s.sum_mr AS out_of_control
    FROM mr JOIN stats s ON s.event_type = mr.event_type
    """,
    doc="XmR (individuals/moving-range) control chart per event type: "
        "daily DECIMAL-exact totals, consecutive-day moving ranges, and "
        "the classic |x - mean| > 2.66*MRbar out-of-control rule with "
        "every denominator cleared so the flag is an exact integer "
        "comparison (100*(n-1)*|n*x - total| vs 266*n*sum_MR) — the SPC "
        "complement to CUSUM: XmR flags single-point excursions, CUSUM "
        "accumulates small sustained shifts. One (type, day) aggregate "
        "with map-side partials, one lag window over the short daily "
        "series, one |types|-row broadcast join.",
)
def q_control_chart_xmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        "event_type", F.expr("CAST(ts AS DATE)").alias("day")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT)"
        ).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    mr = daily.select(
        "event_type", "day", "cents",
        F.abs(F.col("cents") - F.lag("cents").over(w)).alias("moving_range"),
    )
    stats = mr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total"),
        F.sum("moving_range").alias("sum_mr"),
    )
    return mr.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        F.col("cents").alias("day_cents"),
        F.col("moving_range").cast("bigint").alias("moving_range"),
        F.expr(
            "100 * (n - 1) * abs(n * cents - total) > 266 * n * sum_mr"
        ).alias("out_of_control"),
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness (engagement depth per week)
# ---------------------------------------------------------------------------

@register(
    "q_dau_wau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS week,
             CAST(ts AS DATE) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY week, day
    ),
    weekly AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS week,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM events GROUP BY week
    ),
    davg AS (
      SELECT week, CAST(SUM(dau) AS BIGINT) AS dau_total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY week
    )
    SELECT CAST(d.week AS DATE) AS week, d.dau_total, d.n_days, w.wau,
           round(CAST(d.dau_total AS DOUBLE) / d.n_days / w.wau, 6)
             AS stickiness
    FROM davg d JOIN weekly w ON w.week = d.week
    """,
    doc="DAU/WAU stickiness per week: average daily active users divided "
        "by weekly actives — the engagement-depth ratio (1/7 = users "
        "show up once a week, 1.0 = every active user active every day) "
        "growth dashboards track. Two distinct-count aggregates at "
        "different grains joined on the |weeks|-row broadcast side; the "
        "ratio is one final division of exact integers. Monday-based "
        "week truncation in BOTH engines (the same cross-engine calendar "
        "discipline as q_seasonality_dow).",
)
def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    base = ev.select(
        F.expr("CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE)").alias("week"),
        F.expr("CAST(ts AS DATE)").alias("day"),
        "user_id",
    )
    daily = base.groupBy("week", "day").agg(
        F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias("dau")
    )
    weekly = base.groupBy("week").agg(
        F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias("wau")
    )
    davg = daily.groupBy("week").agg(
        F.expr("CAST(SUM(dau) AS BIGINT)").alias("dau_total"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_days"),
    )
    return davg.join(F.broadcast(weekly), "week").select(
        "week", "dau_total", "n_days", "wau",
        F.expr(
            "round(CAST(dau_total AS DOUBLE) / n_days / wau, 6)"
        ).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve over user activity lifetimes
# ---------------------------------------------------------------------------

@register(
    "q_survival_kaplan_meier",
    # the KM product Π(1 - d/n) becomes a SUM via logs: per-day ln factor
    # rounded at 6dp (exact integer d, n inputs), cumulative DECIMAL sum
    # over the short day series, exp + round at the end — the established
    # order-independent float discipline
    oracle="""
    WITH lifetime AS (
      SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day FROM events
      GROUP BY user_id
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM lifetime),
    deaths AS (
      SELECT last_day AS day, CAST(COUNT(*) AS BIGINT) AS d
      FROM lifetime GROUP BY last_day
    ),
    ordered AS (
      SELECT day, d,
             (SELECT n_users FROM total)
               - COALESCE(SUM(d) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM deaths
    ),
    logged AS (
      SELECT day, d, n_at_risk,
             CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk + 1e-12), 6)
                  AS DECIMAL(18,6)) AS lnf
      FROM ordered WHERE n_at_risk > d
    )
    SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk, d AS n_events,
           round(exp(CAST(SUM(lnf) OVER (ORDER BY day) AS DOUBLE)), 6)
             AS survival
    FROM logged
    """,
    doc="Kaplan-Meier survival curve over user activity lifetimes (event "
        "= last observed activity day): at-risk counts from a running "
        "death total, and the KM product Π(1 - d/n) carried as a "
        "cumulative sum of per-day rounded log factors (DECIMAL "
        "accumulation — order-independent, so the curve is "
        "engine-reproducible; a tiny epsilon guards the final day's "
        "ln(0), and days where everyone at risk dies are the curve's "
        "end). The survival curve is the principled churn model behind "
        "q_dormancy_curve's empirical CDF. One per-user aggregate, then "
        "all windows run over the |days|-row series.",
)
def q_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    lifetime = ev.groupBy("user_id").agg(
        F.expr("MAX(CAST(ts AS DATE))").alias("last_day")
    )
    total = lifetime.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_users"))
    deaths = lifetime.groupBy(F.col("last_day").alias("day")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("d")
    )
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    ordered = deaths.crossJoin(F.broadcast(total)).select(
        "day",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("d").over(wprev), F.lit(0))
        ).alias("n_at_risk"),
    )
    logged = ordered.filter(F.col("n_at_risk") > F.col("d")).select(
        "day",
        "d",
        "n_at_risk",
        F.expr(
            "CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk + 1e-12), 6)"
            " AS DECIMAL(18,6))"
        ).alias("lnf"),
    )
    wcum = Window.orderBy("day")
    return logged.select(
        "day",
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").alias("n_events"),
        F.expr(
            "round(exp(CAST(SUM(lnf) OVER (ORDER BY day) AS DOUBLE)), 6)"
        ).alias("survival"),
    )


# ---------------------------------------------------------------------------
# ABC x XYZ inventory matrix (value axis x forecastability axis)
# ---------------------------------------------------------------------------

@register(
    "q_abc_xyz_matrix",
    # ABC: cumulative DECIMAL revenue share over (revenue DESC, partkey)
    # — A <= 80%, B <= 95%, C rest (denominators cleared: 100*cum vs
    # 80*total). XYZ: the exact CV classes of q_xyz_demand_classes,
    # reused verbatim. The matrix is the 9-cell join of the two.
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey) AS cum,
             SUM(revenue) OVER () AS total
      FROM rev
    ),
    abc AS (
      SELECT l_partkey, revenue,
             CASE WHEN 100 * cum <= 80 * total THEN 'A'
                  WHEN 100 * cum <= 95 * total THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    ),
    weekly AS (
      SELECT l_partkey,
             CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
             SUM(CAST(l_quantity AS DECIMAL(10,2))) AS qty
      FROM lineitem GROUP BY l_partkey, week
    ),
    stats AS (
      SELECT l_partkey,
             COUNT(*) AS n_weeks,
             CAST(SUM(qty) AS DOUBLE) AS sx,
             CAST(SUM(qty * qty) AS DOUBLE) AS sxx
      FROM weekly GROUP BY l_partkey
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN sqrt((sxx - sx * sx / n_weeks) / n_weeks)
                       / (sx / n_weeks) < 0.5 THEN 'X'
                  WHEN sqrt((sxx - sx * sx / n_weeks) / n_weeks)
                       / (sx / n_weeks) < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM stats WHERE n_weeks >= 2 AND sx > 0
    )
    SELECT abc.abc_class, xyz.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(abc.revenue) AS DOUBLE) AS revenue_total
    FROM abc JOIN xyz ON xyz.l_partkey = abc.l_partkey
    GROUP BY abc.abc_class, xyz.xyz_class
    """,
    doc="ABC x XYZ inventory matrix: the value axis (cumulative-revenue "
        "A/B/C cut at 80/95% with cleared-denominator integer "
        "comparisons) crossed with the forecastability axis (the exact "
        "weekly-CV X/Y/Z classes of q_xyz_demand_classes) — the 9-cell "
        "segmentation stock policy hangs off (AX: automate replenishment; "
        "CZ: make-to-order). The ABC cumulative share is a TWO-PHASE "
        "distributed running sum (_global_cumsum — no single-partition "
        "window over parts), XYZ is two map-side aggregates; the final "
        "join is part-grain with a 9-row result.",
)
def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    rev = li.groupBy("l_partkey").agg(
        F.expr(
            "SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
            " * (1 - CAST(l_discount AS DECIMAL(12,2))))"
        ).alias("revenue")
    )
    # two-phase distributed running sum (see _global_cumsum): the
    # cumulative-revenue cut never funnels the part table through one task
    abc = _global_cumsum(
        rev, "-revenue",
        [F.desc("revenue"), F.asc("l_partkey")],
        "revenue", with_total=True,
    ).select(
        "l_partkey",
        "revenue",
        F.col("__cum").alias("cum"),
        F.col("__total").alias("total"),
    ).select(
        "l_partkey",
        "revenue",
        F.expr(
            "CASE WHEN 100 * cum <= 80 * total THEN 'A' "
            "WHEN 100 * cum <= 95 * total THEN 'B' ELSE 'C' END"
        ).alias("abc_class"),
    )
    weekly = li.groupBy(
        "l_partkey",
        F.expr("CAST(date_trunc('week', l_shipdate) AS DATE)").alias("week"),
    ).agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(10,2)))").alias("qty"))
    stats = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.expr("CAST(SUM(qty) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(qty * qty) AS DOUBLE)").alias("sxx"),
    )
    xyz = stats.filter((F.col("n_weeks") >= 2) & (F.col("sx") > 0)).select(
        "l_partkey",
        F.expr(
            "CASE WHEN sqrt((sxx - sx * sx / n_weeks) / n_weeks)"
            " / (sx / n_weeks) < 0.5 THEN 'X' "
            "WHEN sqrt((sxx - sx * sx / n_weeks) / n_weeks)"
            " / (sx / n_weeks) < 1.0 THEN 'Y' ELSE 'Z' END"
        ).alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_parts"),
            F.expr("CAST(SUM(revenue) AS DOUBLE)").alias("revenue_total"),
        )
    )


# ---------------------------------------------------------------------------
# seasonal-naive forecast backtest (the baseline every model must beat)
# ---------------------------------------------------------------------------

@register(
    "q_forecast_snaive_eval",
    # forecast(day d) = actual(d - 7): the seasonal-naive baseline. MAE
    # accumulates in exact integer cents; MAPE clears denominators per
    # row (1e6 * |err| / actual as BIGINT) and averages the scaled
    # integers, so both metrics are engine-order-independent
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    paired AS (
      SELECT a.event_type, a.day, a.cents,
             f.cents AS forecast_cents
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type AND f.day = a.day - 7
      WHERE a.cents > 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(abs(cents - forecast_cents)) AS BIGINT) AS mae_cents_total,
           round(CAST(SUM(abs(cents - forecast_cents)) AS DOUBLE)
                 / COUNT(*) / 100, 6) AS mae,
           round(CAST(SUM(1000000 * abs(cents - forecast_cents) // cents)
                      AS DOUBLE) / COUNT(*) / 1e6, 6) AS mape
    FROM paired GROUP BY event_type
    """,
    doc="Seasonal-naive forecast backtest: tomorrow looks like the same "
        "weekday last week — the no-model baseline every demand forecast "
        "must beat before it earns compute (a model that loses to sNaive "
        "on MAE/MAPE is negative value). Per event type over the daily "
        "series: MAE in exact integer cents; MAPE via per-row "
        "cleared-denominator scaled integers (1e6*|err|/actual as "
        "BIGINT, averaged exactly) — no float accumulation anywhere. "
        "One (type, day) aggregate, then a self-join on the 7-day lag "
        "key over the short daily series.",
)
def q_forecast_snaive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        "event_type", F.expr("CAST(ts AS DATE)").alias("day")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT)"
        ).alias("cents")
    )
    f = daily.select(
        F.col("event_type").alias("f_type"),
        F.col("day").alias("f_day"),
        F.col("cents").alias("forecast_cents"),
    )
    paired = daily.filter(F.col("cents") > 0).join(
        f,
        (F.col("f_type") == F.col("event_type"))
        & (F.col("f_day") == F.expr("day - 7")),
    )
    return paired.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_days"),
        F.expr(
            "CAST(SUM(abs(cents - forecast_cents)) AS BIGINT)"
        ).alias("mae_cents_total"),
        F.expr(
            "round(CAST(SUM(abs(cents - forecast_cents)) AS DOUBLE)"
            " / COUNT(*) / 100, 6)"
        ).alias("mae"),
        F.expr(
            "round(CAST(SUM(1000000 * abs(cents - forecast_cents) DIV cents)"
            " AS DOUBLE) / COUNT(*) / 1e6, 6)"
        ).alias("mape"),
    )


# ---------------------------------------------------------------------------
# chi-square independence audit (event type x weekday contingency cells)
# ---------------------------------------------------------------------------

@register(
    "q_chi_square_cells",
    oracle="""
    WITH base AS (
      SELECT event_type, isodow(ts) - 1 AS dow FROM events
    ),
    obs AS (
      SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY event_type, dow
    ),
    rows_t AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS row_tot
      FROM obs GROUP BY event_type
    ),
    cols_t AS (
      SELECT dow, CAST(SUM(n) AS BIGINT) AS col_tot
      FROM obs GROUP BY dow
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot FROM obs),
    grid AS (
      SELECT r.event_type, c.dow, r.row_tot, c.col_tot, t.n_tot
      FROM rows_t r CROSS JOIN cols_t c CROSS JOIN tot t
    )
    SELECT g.event_type, CAST(g.dow AS INT) AS dow,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS observed,
           CAST(g.row_tot * g.col_tot AS BIGINT) AS expected_x_n,
           CAST(COALESCE(o.n, 0) * g.n_tot - g.row_tot * g.col_tot
                AS BIGINT) AS dev_x_n,
           round(CAST(COALESCE(o.n, 0) * g.n_tot
                      - g.row_tot * g.col_tot AS DOUBLE)
                 * (COALESCE(o.n, 0) * g.n_tot - g.row_tot * g.col_tot)
                 / (CAST(g.row_tot AS DOUBLE) * g.col_tot), 4)
             AS contrib_x_n
    FROM grid g LEFT JOIN obs o
      ON o.event_type = g.event_type AND o.dow = g.dow
    """,
    doc="Chi-square independence audit of event type vs weekday: the "
        "full contingency grid (including zero cells — a LEFT JOIN from "
        "the marginals cross product, which a naive GROUP BY silently "
        "drops) with per-cell observed count, N-scaled expected count "
        "(row_tot * col_tot = E*N, exact BIGINT), N-scaled deviation "
        "O*N - E*N, and the N-scaled chi-square contribution "
        "(dev^2 / (row_tot * col_tot) = N * (O-E)^2/E) — cells with "
        "|contrib| large are the dependence drivers. Everything up to "
        "the last per-cell division is exact integer arithmetic, so no "
        "cross-row float accumulation anywhere; the global statistic is "
        "the reader's sum over the ~|types| x 7 bounded grid. BIGINT "
        "scaling holds to ~3e9 events (O*N < 2^63); past that, audit "
        "per date-partition. Weekday is Monday-based in both engines "
        "(Spark weekday(), DuckDB isodow-1). One shuffle on the cell "
        "keys; marginals broadcast.",
)
def q_chi_square_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    base = ev.select("event_type", F.expr("weekday(ts)").alias("dow"))
    obs = base.groupBy("event_type", "dow").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")
    )
    rows_t = obs.groupBy("event_type").agg(
        F.expr("CAST(SUM(n) AS BIGINT)").alias("row_tot")
    )
    cols_t = obs.groupBy("dow").agg(
        F.expr("CAST(SUM(n) AS BIGINT)").alias("col_tot")
    )
    tot = obs.agg(F.expr("CAST(SUM(n) AS BIGINT)").alias("n_tot"))
    grid = rows_t.crossJoin(F.broadcast(cols_t)).crossJoin(F.broadcast(tot))
    return (
        grid.join(F.broadcast(obs), ["event_type", "dow"], "left")
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.expr("CAST(COALESCE(n, 0) AS BIGINT)").alias("observed"),
            F.expr("CAST(row_tot * col_tot AS BIGINT)").alias("expected_x_n"),
            F.expr(
                "CAST(COALESCE(n, 0) * n_tot - row_tot * col_tot AS BIGINT)"
            ).alias("dev_x_n"),
            F.expr(
                "round(CAST(COALESCE(n, 0) * n_tot - row_tot * col_tot"
                " AS DOUBLE)"
                " * (COALESCE(n, 0) * n_tot - row_tot * col_tot)"
                " / (CAST(row_tot AS DOUBLE) * col_tot), 4)"
            ).alias("contrib_x_n"),
        )
    )


# ---------------------------------------------------------------------------
# two-sample Mann-Whitney U (binned ranks, tie-aware via half-counts)
# ---------------------------------------------------------------------------

@register(
    "q_mann_whitney_u",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / {KS_BIN}) AS BIGINT)
               AS band,
             CAST(SUM(CASE WHEN event_type = '{KS_TYPE_A}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = '{KS_TYPE_B}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM events
      WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
      GROUP BY 1
    ),
    cum AS (
      SELECT band, ca, cb,
             COALESCE(SUM(cb) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb_below,
             SUM(ca) OVER () AS n_a,
             SUM(cb) OVER () AS n_b
      FROM binned
    ),
    u AS (
      SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
             CAST(MAX(n_b) AS BIGINT) AS n_b,
             CAST(SUM(ca * (2 * cb_below + cb)) AS BIGINT) AS u2_a
      FROM cum
    )
    SELECT n_a, n_b, u2_a,
           CAST(u2_a AS DOUBLE) / 2 AS u_a,
           round(CAST(u2_a - n_a * n_b AS DOUBLE) / (n_a * n_b), 6)
             AS rank_biserial,
           round(CAST(u2_a - n_a * n_b AS DOUBLE)
                 / (2 * sqrt(CAST(n_a AS DOUBLE) * n_b
                             * (n_a + n_b + 1) / 12)), 6) AS z_score
    FROM u
    """,
    doc=f"Two-sample Mann-Whitney U between the '{KS_TYPE_A}' and "
        f"'{KS_TYPE_B}' value distributions — the rank-based "
        "location-shift companion to q_ks_two_sample's supremum view "
        "(U detects a median shift KS may under-weight; KS detects "
        f"shape changes U misses). Values share the width-{KS_BIN} "
        "bands; within-band pairs count as ties. Everything is exact "
        "integer arithmetic on the DOUBLED statistic "
        "u2 = sum(ca * (2*cb_below + cb)) — each A-observation scores "
        "2 per B below its band and 1 per tied B — so partial sums "
        "commute exactly; u_a = u2/2 is a binary-exact halving, and "
        "the only rounding floats are the rank-biserial effect size "
        "(2U/(n_a n_b) - 1) and the normal-approximation z-score "
        "(no tie correction in sigma; with ~60 bands the correction "
        "is <1% and the doubled U itself is the hashable evidence). "
        "BIGINT holds to ~2e9 observations per arm (u2 < 2^63). The "
        "cumulative window runs over the bounded value-band domain "
        "(~60 rows), never entity-grain data.",
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    binned = (
        ev.filter(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B))
        .groupBy(
            F.expr(
                f"CAST(FLOOR(CAST(value AS DECIMAL(10,2)) / {KS_BIN})"
                " AS BIGINT)"
            ).alias("band")
        )
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN event_type = '{KS_TYPE_A}'"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("ca"),
            F.expr(
                f"CAST(SUM(CASE WHEN event_type = '{KS_TYPE_B}'"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("cb"),
        )
    )
    wbelow = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = binned.select(
        "band", "ca", "cb",
        F.coalesce(F.sum("cb").over(wbelow), F.lit(0)).alias("cb_below"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    )
    u = cum.agg(
        F.expr("CAST(MAX(n_a) AS BIGINT)").alias("n_a"),
        F.expr("CAST(MAX(n_b) AS BIGINT)").alias("n_b"),
        F.expr("CAST(SUM(ca * (2 * cb_below + cb)) AS BIGINT)").alias("u2_a"),
    )
    return u.select(
        "n_a", "n_b", "u2_a",
        F.expr("CAST(u2_a AS DOUBLE) / 2").alias("u_a"),
        F.expr(
            "round(CAST(u2_a - n_a * n_b AS DOUBLE) / (n_a * n_b), 6)"
        ).alias("rank_biserial"),
        F.expr(
            "round(CAST(u2_a - n_a * n_b AS DOUBLE)"
            " / (2 * sqrt(CAST(n_a AS DOUBLE) * n_b"
            " * (n_a + n_b + 1) / 12)), 6)"
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# lag-1 autocorrelation of daily event value (time-series persistence)
# ---------------------------------------------------------------------------

@register(
    "q_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(18,2)) AS dv
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.dv AS x, b.dv AS y
      FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy) /
                 (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
             AS r_lag1
    FROM stats
    """,
    doc="Lag-1 autocorrelation of the daily event-value series — the "
        "persistence/momentum diagnostic behind q_trend_wow and "
        "q_forecast_snaive_eval (near 0 means yesterday tells you "
        "nothing; strongly positive means smoothing/seasonal models "
        "apply). Consecutive days pair by an equi-join on day+1 over the "
        "BOUNDED date grain (no global window, no sort); the Pearson "
        "sufficient statistics accumulate as exact DECIMALs (day sums "
        "re-cast to DECIMAL(18,2) so the quadratic products stay inside "
        "DECIMAL(38) exactly at any corpus scale) and convert to double "
        "once, so the result is independent of partition merge order. "
        "One scan, map-side partials, then a tiny day-grain self-join.",
)
def q_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.expr("CAST(ts AS DATE)").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(18,2))"
        ).alias("dv")
    )
    a = daily.select(F.col("day").alias("da"), F.col("dv").alias("x"))
    b = daily.select(F.col("day").alias("db"), F.col("dv").alias("y"))
    pairs = a.join(F.broadcast(b), F.expr("db = date_add(da, 1)"))
    stats = pairs.agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr("CAST(SUM(x) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(y) AS DOUBLE)").alias("sy"),
        F.expr("CAST(SUM(x * x) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(SUM(y * y) AS DOUBLE)").alias("syy"),
        F.expr("CAST(SUM(x * y) AS DOUBLE)").alias("sxy"),
    )
    return stats.select(
        F.expr("CAST(n AS BIGINT)").alias("n_pairs"),
        F.expr(
            "round((n * sxy - sx * sy) /"
            " (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)"
        ).alias("r_lag1"),
    )


# ---------------------------------------------------------------------------
# Theil inequality decomposition (between / within nations)
# ---------------------------------------------------------------------------

#: per-customer Theil term (x/X_g)·ln(x·N_g/X_g): one double expression
#: rounded at 9dp then summed as exact DECIMAL — the text_js_divergence
#: discipline for log-bearing aggregates (no float-summation order
#: sensitivity; ln feeds from identical IEEE ops in both engines)
_THEIL_TERM = """
    CAST(round(
      CASE WHEN cents > 0 THEN
        (CAST(cents AS DOUBLE) / x_g)
        * ln(CAST(cents AS DOUBLE) * n_g / x_g)
      ELSE 0.0 END, 9) AS DECIMAL(20,9))
"""


@register(
    "q_theil_decomposition",
    oracle=f"""
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(cents) AS BIGINT) AS x_g
      FROM spend GROUP BY nationkey
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot,
             CAST(SUM(x_g) AS BIGINT) AS x_tot
      FROM g
    ),
    within AS (
      SELECT s.nationkey, SUM({_THEIL_TERM}) AS t_g
      FROM (SELECT sp.nationkey, sp.cents, gg.n_g, gg.x_g
            FROM spend sp JOIN g gg ON gg.nationkey = sp.nationkey) s
      GROUP BY s.nationkey
    )
    SELECT g.nationkey, g.n_g AS n_customers, g.x_g AS spend_cents,
           round(CAST(g.x_g AS DOUBLE) / t.x_tot, 6) AS spend_share,
           round(CAST(w.t_g AS DOUBLE), 6) AS theil_within,
           round((CAST(g.x_g AS DOUBLE) / t.x_tot)
                 * ln((CAST(g.x_g AS DOUBLE) / t.x_tot)
                      / (CAST(g.n_g AS DOUBLE) / t.n_tot)), 6)
             AS between_term
    FROM g JOIN within w ON w.nationkey = g.nationkey CROSS JOIN tot t
    """,
    doc="Theil-T inequality decomposition of customer spend by nation — "
        "the additive complement to q_spend_gini/q_hoover_index: total "
        "Theil splits exactly into a between-nations part (is inequality "
        "driven by rich vs poor MARKETS?) and a within-nation part "
        "(Σ share_g · T_g — rich vs poor customers inside each market), "
        "which Gini cannot do. Spend is exact integer cents; each "
        "customer's log term is one double expression rounded at 9dp "
        "then summed as exact DECIMAL (the text_js_divergence "
        "discipline), so nothing depends on partition merge order. "
        "Customer grain only ever feeds a groupBy — no global window, "
        "no sort; the output is the bounded 25-nation grid.",
)
def q_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders", "customer")
    orders, customer = t["orders"], t["customer"]
    spend = (
        orders.join(customer,
                    orders["o_custkey"] == customer["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)"
                " AS BIGINT)"
            ).alias("cents")
        )
    )
    g = spend.groupBy("nationkey").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_g"),
        F.expr("CAST(SUM(cents) AS BIGINT)").alias("x_g"),
    )
    tot = g.agg(
        F.expr("CAST(SUM(n_g) AS BIGINT)").alias("n_tot"),
        F.expr("CAST(SUM(x_g) AS BIGINT)").alias("x_tot"),
    )
    within = (
        spend.join(F.broadcast(g), "nationkey")
        .groupBy("nationkey")
        .agg(F.expr(f"SUM({_THEIL_TERM})").alias("t_g"))
    )
    return (
        g.join(F.broadcast(within), "nationkey")
        .crossJoin(F.broadcast(tot))
        .select(
            "nationkey",
            F.col("n_g").alias("n_customers"),
            F.col("x_g").alias("spend_cents"),
            F.expr("round(CAST(x_g AS DOUBLE) / x_tot, 6)").alias(
                "spend_share"),
            F.expr("round(CAST(t_g AS DOUBLE), 6)").alias("theil_within"),
            F.expr(
                "round((CAST(x_g AS DOUBLE) / x_tot)"
                " * ln((CAST(x_g AS DOUBLE) / x_tot)"
                " / (CAST(n_g AS DOUBLE) / n_tot)), 6)"
            ).alias("between_term"),
        )
    )


# ---------------------------------------------------------------------------
# per-nation Gini coefficient (group-local inequality, partitioned ranks)
# ---------------------------------------------------------------------------

@register(
    "q_gini_by_nation",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nationkey, cents,
             ROW_NUMBER() OVER (PARTITION BY nationkey
                                ORDER BY cents, custkey) AS rk
      FROM spend
    ),
    agg AS (
      SELECT nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(SUM(rk * cents) AS BIGINT) AS weighted_cents
      FROM ranked GROUP BY nationkey
    )
    SELECT nationkey, n_customers, total_cents,
           round((2.0 * weighted_cents)
                 / (CAST(n_customers AS DOUBLE) * total_cents)
                 - (CAST(n_customers + 1 AS DOUBLE) / n_customers), 6)
             AS gini
    FROM agg
    """,
    doc="Per-nation Gini coefficient of customer spend — the group-local "
        "counterpart to the corpus-wide q_spend_gini and the "
        "within-nation companion to q_theil_decomposition (Theil says "
        "how much inequality lives inside each market, Gini says how "
        "concentrated each market's own distribution is; the two "
        "disagree exactly when a market has a thick middle and extreme "
        "tails). Ranks come from a window PARTITIONED BY nation — "
        "group-local sorts that parallelize across nations, never a "
        "global single-partition funnel — and the weighted sum "
        "sum(rank * cents) is exact BIGINT, so the only float math is "
        "the closed-form G = 2*W/(n*T) - (n+1)/n per 25-row output. "
        "2.0 is binary-exact; ties break on custkey for deterministic "
        "ranks.",
)
def q_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders", "customer")
    spend = (
        t["orders"].join(
            t["customer"],
            t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)"
                " AS BIGINT)"
            ).alias("cents")
        )
    )
    w = Window.partitionBy("nationkey").orderBy("cents", "custkey")
    ranked = spend.select(
        "nationkey", "cents", F.row_number().over(w).alias("rk")
    )
    agg = ranked.groupBy("nationkey").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_customers"),
        F.expr("CAST(SUM(cents) AS BIGINT)").alias("total_cents"),
        F.expr("CAST(SUM(rk * cents) AS BIGINT)").alias("weighted_cents"),
    )
    return agg.select(
        "nationkey", "n_customers", "total_cents",
        F.expr(
            "round((2.0 * weighted_cents)"
            " / (CAST(n_customers AS DOUBLE) * total_cents)"
            " - (CAST(n_customers + 1 AS DOUBLE) / n_customers), 6)"
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# repeated-event audit (same user, same type, same day — replay detector)
# ---------------------------------------------------------------------------

@register(
    "q_event_replay_audit",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS DATE) AS event_date,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    )
    SELECT user_id, event_type, event_date,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT cents) AS BIGINT) AS n_distinct_values,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CASE WHEN COUNT(DISTINCT cents) < COUNT(*) THEN 1 ELSE 0 END
             AS exact_replay_flag
    FROM e
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= 2
    """,
    doc="Repeated-event audit: the same user firing the same event type "
        "more than once on one day — the replay / double-submit / "
        "at-least-once-duplicate detector run before any event stream is "
        "trusted for billing or training labels. Values compare as exact "
        "DECIMAL cents (float equality would silently split groups); "
        "exact_replay_flag = 1 marks groups where two events carry the "
        "IDENTICAL amount (likely a transport replay — what "
        "stream_dedup_events_watermark would have suppressed), flag = 0 "
        "marks organic same-day repeats with different values. One "
        "map-side-combinable aggregate on the (user, type, day) key — "
        "the group key is the audit predicate, so no self-join and no "
        "pair explosion at any scale; HAVING prunes to the anomalies.",
)
def q_event_replay_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    e = ev.select(
        "user_id", "event_type",
        F.expr("CAST(ts AS DATE)").alias("event_date"),
        F.expr(
            "CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    return (
        e.groupBy("user_id", "event_type", "event_date")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
            F.expr("CAST(COUNT(DISTINCT cents) AS BIGINT)").alias(
                "n_distinct_values"),
            F.expr("CAST(MIN(cents) AS BIGINT)").alias("min_cents"),
            F.expr("CAST(MAX(cents) AS BIGINT)").alias("max_cents"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            "user_id", "event_type", "event_date", "n_events",
            "n_distinct_values", "min_cents", "max_cents",
            F.expr(
                "CASE WHEN n_distinct_values < n_events THEN 1 ELSE 0 END"
            ).alias("exact_replay_flag"),
        )
    )


# ---------------------------------------------------------------------------
# A/B treatment-effect readout (mean-value lift per arm, Welch z)
# ---------------------------------------------------------------------------

@register(
    "q_ab_lift_readout",
    oracle=f"""
    WITH armed AS (
      SELECT event_type,
             {_SRM_ARM_DUCK} AS arm,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    per_arm AS (
      SELECT event_type, arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS ss
      FROM armed GROUP BY event_type, arm
    ),
    wide AS (
      SELECT event_type,
             MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 0 THEN s END) AS s0,
             MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 1 THEN s END) AS s1,
             MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
      FROM per_arm GROUP BY event_type
    )
    SELECT event_type,
           CAST(n0 AS BIGINT) AS n_arm0, CAST(n1 AS BIGINT) AS n_arm1,
           round(CAST(s0 AS DOUBLE) / n0 / 100, 6) AS mean_arm0,
           round(CAST(s1 AS DOUBLE) / n1 / 100, 6) AS mean_arm1,
           round((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                 / 100, 6) AS lift,
           round((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                 / sqrt(
                     (CAST(ss0 AS DOUBLE) / n0
                      - (CAST(s0 AS DOUBLE) / n0)
                        * (CAST(s0 AS DOUBLE) / n0)) / n0
                     + (CAST(ss1 AS DOUBLE) / n1
                        - (CAST(s1 AS DOUBLE) / n1)
                          * (CAST(s1 AS DOUBLE) / n1)) / n1
                 ), 4) AS z_welch
    FROM wide
    """,
    doc="A/B treatment-effect readout over the same deterministic md5 "
        "50/50 user split as q_srm_check (run the SRM guardrail first; "
        "this is the readout it protects): per event type, each arm's "
        "mean value, the lift, and the Welch z-statistic from pooled "
        "per-arm variances. Sufficient statistics are exact integer "
        "cents sums (sum, sum-of-squares — BIGINT holds to ~3e9 cents^2 "
        "rows per arm); every mean/variance/z is a closed-form double "
        "expression of those exact integers, so nothing depends on "
        "partition order. One conditional aggregate on (type, arm) — "
        "map-side combinable — then a |types|-row pivot.",
)
def q_ab_lift_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    armed = ev.select(
        "event_type",
        F.expr(_SRM_ARM_SPARK).alias("arm"),
        F.expr(
            "CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    per_arm = armed.groupBy("event_type", "arm").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(cents) AS BIGINT)").alias("s"),
        F.expr("CAST(SUM(cents * cents) AS BIGINT)").alias("ss"),
    )
    wide = per_arm.groupBy("event_type").agg(
        F.expr("MAX(CASE WHEN arm = 0 THEN n END)").alias("n0"),
        F.expr("MAX(CASE WHEN arm = 0 THEN s END)").alias("s0"),
        F.expr("MAX(CASE WHEN arm = 0 THEN ss END)").alias("ss0"),
        F.expr("MAX(CASE WHEN arm = 1 THEN n END)").alias("n1"),
        F.expr("MAX(CASE WHEN arm = 1 THEN s END)").alias("s1"),
        F.expr("MAX(CASE WHEN arm = 1 THEN ss END)").alias("ss1"),
    )
    return wide.select(
        "event_type",
        F.expr("CAST(n0 AS BIGINT)").alias("n_arm0"),
        F.expr("CAST(n1 AS BIGINT)").alias("n_arm1"),
        F.expr("round(CAST(s0 AS DOUBLE) / n0 / 100, 6)").alias("mean_arm0"),
        F.expr("round(CAST(s1 AS DOUBLE) / n1 / 100, 6)").alias("mean_arm1"),
        F.expr(
            "round((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)"
            " / 100, 6)"
        ).alias("lift"),
        F.expr(
            "round((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)"
            " / sqrt("
            " (CAST(ss0 AS DOUBLE) / n0"
            " - (CAST(s0 AS DOUBLE) / n0) * (CAST(s0 AS DOUBLE) / n0)) / n0"
            " + (CAST(ss1 AS DOUBLE) / n1"
            " - (CAST(s1 AS DOUBLE) / n1) * (CAST(s1 AS DOUBLE) / n1)) / n1"
            " ), 4)"
        ).alias("z_welch"),
    )


# ---------------------------------------------------------------------------
# multi-lag autocorrelation (daily persistence vs weekly seasonality)
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 7)


@register(
    "q_autocorr_lags",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(18,2)) AS dv
      FROM events GROUP BY 1
    ),
    lags AS (
      SELECT unnest(ARRAY{list(ACF_LAGS)}) AS lag
    ),
    pairs AS (
      SELECT l.lag, a.dv AS x, b.dv AS y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + l.lag * INTERVAL 1 DAY
    ),
    stats AS (
      SELECT lag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy) /
                 (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
             AS r
    FROM stats
    """,
    doc="Autocorrelation of the daily event-value series at lags 1 and 7 "
        "in one pass — r(1) measures day-to-day persistence, r(7) weekly "
        "seasonality; r(7) >> r(1) says the weekday profile "
        "(q_seasonality_dow) dominates any momentum, which decides "
        "whether a forecast baseline should be seasonal-naive "
        "(q_forecast_snaive_eval) or smoothing-based (q_ewma_user_value)."
        " Same exactness discipline as q_autocorr_daily: day pairs by "
        "lagged equi-join over the bounded date grain, DECIMAL-exact "
        "sufficient statistics per lag, one double expression per output "
        "row. The lag spine is a 2-row broadcast.",
)
def q_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.expr("CAST(ts AS DATE)").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(18,2))"
        ).alias("dv")
    )
    lags = spark.createDataFrame(
        [(int(lg),) for lg in ACF_LAGS], "lag INT"
    )
    a = daily.select(F.col("day").alias("da"), F.col("dv").alias("x"))
    b = daily.select(F.col("day").alias("db"), F.col("dv").alias("y"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(F.broadcast(b), F.expr("db = date_add(da, lag)"))
    )
    stats = pairs.groupBy("lag").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr("CAST(SUM(x) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(y) AS DOUBLE)").alias("sy"),
        F.expr("CAST(SUM(x * x) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(SUM(y * y) AS DOUBLE)").alias("syy"),
        F.expr("CAST(SUM(x * y) AS DOUBLE)").alias("sxy"),
    )
    return stats.select(
        F.col("lag").cast("int").alias("lag"),
        F.expr("CAST(n AS BIGINT)").alias("n_pairs"),
        F.expr(
            "round((n * sxy - sx * sy) /"
            " (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)"
        ).alias("r"),
    )


# ---------------------------------------------------------------------------
# deterministic bootstrap CI of the mean event value (md5 Poisson weights)
# ---------------------------------------------------------------------------

BOOT_B = 100  # bootstrap replicates
#: Poisson(1) CDF cut points scaled to 16-bit md5 values: P(W=k) for
#: k = 0..3 is .3679/.3679/.1839/.0613, tail mass goes to W=4
BOOT_CUTS = (24109, 48218, 60274, 64292)

_BOOT_W_DUCK = (
    "CASE WHEN u < 24109 THEN 0 WHEN u < 48218 THEN 1 "
    "WHEN u < 60274 THEN 2 WHEN u < 64292 THEN 3 ELSE 4 END"
)
_BOOT_U_DUCK = (
    "('0x' || substr(md5(concat('boot:', b, ':', event_id)), 1, 4))::INT"
)
_BOOT_U_SPARK = (
    "CAST(conv(substr(md5(concat('boot:', b, ':', event_id)), 1, 4),"
    " 16, 10) AS INT)"
)


@register(
    "q_bootstrap_mean_ci",
    oracle=f"""
    WITH e AS (
      SELECT event_id,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    reps AS (
      SELECT b, u.event_id, u.cents,
             {_BOOT_W_DUCK.replace('u <', 'uu <')} AS w
      FROM (SELECT unnest(range({BOOT_B})) AS b) bs
      CROSS JOIN (
        SELECT event_id, cents FROM e
      ) u,
      LATERAL (SELECT {_BOOT_U_DUCK} AS uu) lat
    ),
    boot AS (
      SELECT b,
             round(CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100, 6)
               AS mean_b
      FROM reps GROUP BY b
    ),
    ranked AS (
      SELECT mean_b,
             ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rk
      FROM boot
    ),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 6)
               AS mean_value
      FROM e
    ),
    spread AS (
      SELECT CAST(SUM(CAST(round(mean_b, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS sm,
             CAST(SUM(CAST(round(mean_b * mean_b, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS smm
      FROM boot
    )
    SELECT base.n_rows, base.mean_value,
           CAST({BOOT_B} AS BIGINT) AS n_replicates,
           (SELECT mean_b FROM ranked WHERE rk = 3) AS boot_ci_low,
           (SELECT mean_b FROM ranked WHERE rk = 98) AS boot_ci_high,
           round(sqrt(({BOOT_B} * smm - sm * sm)
                      / (CAST({BOOT_B} AS DOUBLE)
                         * ({BOOT_B} - 1))), 6) AS boot_se
    FROM base CROSS JOIN spread
    """,
    doc=f"Deterministic bootstrap 95% CI of the mean event value: "
        f"B = {BOOT_B} resampling replicates whose per-row multiplicities "
        "are Poisson(1) weights derived from md5(replicate, event_id) "
        "cut at the exact 16-bit CDF points — the standard Poisson "
        "bootstrap (one pass, no row-index resampling), made "
        "reproducible and oracle-checkable because the 'randomness' is "
        "a pure hash of the data. Replicate means are single divisions "
        "of exact integer cents sums; the CI bounds are type-1 order "
        "statistics over the bounded B-row replicate set and the "
        "bootstrap SE uses 9dp-rounded DECIMAL-summed moments. Scale "
        "note: the replicate explode is a deliberate B× amplification — "
        "at 100 TB run it over a stratified sample or per-partition "
        "aggregates, exactly as production bootstraps do.",
)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")["events"]
    e = ev.select(
        "event_id",
        F.expr(
            "CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    bs = spark.createDataFrame([(b,) for b in range(BOOT_B)], "b INT")
    reps = (
        e.crossJoin(F.broadcast(bs))
        .withColumn("u", F.expr(_BOOT_U_SPARK))
        .withColumn("w", F.expr(_BOOT_W_DUCK))
    )
    boot = reps.groupBy("b").agg(
        F.expr(
            "round(CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100, 6)"
        ).alias("mean_b")
    )
    w_rk = Window.orderBy("mean_b", "b")  # bounded: B rows
    ranked = boot.select(
        "mean_b", F.row_number().over(w_rk).alias("rk")
    )
    base = e.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
        F.expr(
            "round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 6)"
        ).alias("mean_value"),
    )
    spread = boot.agg(
        F.expr(
            "CAST(SUM(CAST(round(mean_b, 6) AS DECIMAL(18,6))) AS DOUBLE)"
        ).alias("sm"),
        F.expr(
            "CAST(SUM(CAST(round(mean_b * mean_b, 9) AS DECIMAL(20,9)))"
            " AS DOUBLE)"
        ).alias("smm"),
    )
    lo = ranked.filter(F.col("rk") == 3).select(
        F.col("mean_b").alias("boot_ci_low"))
    hi = ranked.filter(F.col("rk") == 98).select(
        F.col("mean_b").alias("boot_ci_high"))
    return (
        base.crossJoin(F.broadcast(spread))
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_rows", "mean_value",
            F.expr(f"CAST({BOOT_B} AS BIGINT)").alias("n_replicates"),
            "boot_ci_low", "boot_ci_high",
            F.expr(
                f"round(sqrt(({BOOT_B} * smm - sm * sm)"
                f" / (CAST({BOOT_B} AS DOUBLE) * ({BOOT_B} - 1))), 6)"
            ).alias("boot_se"),
        )
    )


# ---------------------------------------------------------------------------
# A/B sample-size planner (power analysis from measured variance)
# ---------------------------------------------------------------------------

#: z_{alpha/2} + z_beta for a two-sided 5% test at 80% power, as the
#: exact-decimal text both engines parse identically once CAST AS DOUBLE
AB_Z_SUM = "CAST(2.8016 AS DOUBLE)"   # 1.9600 + 0.8416
AB_MDE_PCT = 5                        # detect a 5%-of-mean lift


@register(
    "q_ab_sample_size",
    oracle=f"""
    WITH e AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS ss
      FROM e GROUP BY event_type
    )
    SELECT event_type, n AS n_observed,
           round(CAST(s AS DOUBLE) / n / 100, 6) AS mean_value,
           round(sqrt((CAST(ss AS DOUBLE) / n
                       - (CAST(s AS DOUBLE) / n)
                         * (CAST(s AS DOUBLE) / n))) / 100, 6) AS sd_value,
           CAST(CEIL(
             2 * (CAST(ss AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             * {AB_Z_SUM} * {AB_Z_SUM}
             / (({AB_MDE_PCT} * (CAST(s AS DOUBLE) / n)
                 / CAST(100 AS DOUBLE))
                * ({AB_MDE_PCT} * (CAST(s AS DOUBLE) / n)
                   / CAST(100 AS DOUBLE)))
           ) AS BIGINT) AS n_per_arm_required,
           CASE WHEN n >= 2 * CAST(CEIL(
             2 * (CAST(ss AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             * {AB_Z_SUM} * {AB_Z_SUM}
             / (({AB_MDE_PCT} * (CAST(s AS DOUBLE) / n)
                 / CAST(100 AS DOUBLE))
                * ({AB_MDE_PCT} * (CAST(s AS DOUBLE) / n)
                   / CAST(100 AS DOUBLE)))
           ) AS BIGINT) THEN 1 ELSE 0 END AS powered_now
    FROM stats
    """,
    doc=f"A/B sample-size planner: per event type, the per-arm n needed "
        f"to detect a {AB_MDE_PCT}%-of-mean lift at two-sided 5% / 80% "
        "power (n = 2·sigma²·(z_a+z_b)²/delta²) using the VARIANCE "
        "MEASURED from the data — the pre-experiment step that completes "
        "the trio with q_srm_check (randomization guardrail) and "
        "q_ab_lift_readout (the readout), plus a powered_now flag "
        "against the current volume. Sufficient statistics are exact "
        "integer cents sums; each output value is a closed-form double "
        "expression of them (the z-constant is one decimal literal CAST "
        "AS DOUBLE, never a libm quantile call). One map-side-"
        "combinable aggregate over the scan.",
)
def q_ab_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    stats = ev.select(
        "event_type",
        F.expr(
            "CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    ).groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(cents) AS BIGINT)").alias("s"),
        F.expr("CAST(SUM(cents * cents) AS BIGINT)").alias("ss"),
    )
    var = ("(CAST(ss AS DOUBLE) / n"
           " - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))")
    delta = (f"({AB_MDE_PCT} * (CAST(s AS DOUBLE) / n)"
             f" / CAST(100 AS DOUBLE))")
    n_req = (f"CAST(CEIL(2 * {var} * {AB_Z_SUM} * {AB_Z_SUM}"
             f" / ({delta} * {delta})) AS BIGINT)")
    return stats.select(
        "event_type",
        F.col("n").alias("n_observed"),
        F.expr("round(CAST(s AS DOUBLE) / n / 100, 6)").alias("mean_value"),
        F.expr(f"round(sqrt({var}) / 100, 6)").alias("sd_value"),
        F.expr(n_req).alias("n_per_arm_required"),
        F.expr(
            f"CASE WHEN n >= 2 * {n_req} THEN 1 ELSE 0 END"
        ).alias("powered_now"),
    )


# ---------------------------------------------------------------------------
# join-key skew audit (heavy hitters + salting plan)
# ---------------------------------------------------------------------------

#: partition budget the salting plan targets (the shuffle width the
#: cluster would use; the plan is a pure function of the histogram)
SKEW_AUDIT_PARTITIONS = 200
SKEW_AUDIT_TOPK = 20


@register(
    "q_join_skew_audit",
    oracle=f"""
    WITH hist AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT SUM(n_rows) AS total FROM hist)
    SELECT user_id, n_rows,
           round(CAST(n_rows AS DOUBLE) * CAST(100 AS DOUBLE)
                 / CAST(total AS DOUBLE), 4) AS share_pct,
           CAST(CASE WHEN n_rows * {SKEW_AUDIT_PARTITIONS} % total = 0
                     THEN n_rows * {SKEW_AUDIT_PARTITIONS} // total
                     ELSE n_rows * {SKEW_AUDIT_PARTITIONS} // total + 1
                END AS BIGINT) AS salt_factor
    FROM hist CROSS JOIN tot
    ORDER BY n_rows DESC, user_id
    LIMIT {SKEW_AUDIT_TOPK}
    """,
    doc="Join-key skew audit — the pre-flight a 100 TB join runs on its "
        "key column: the top heavy-hitter keys by row count, each key's "
        "share of the table, and the SALT FACTOR a salted join would "
        "need so no single reducer holds more than an even 1/P share "
        "(ceil(key_rows / (total/P)) in exact integer arithmetic). One "
        "map-side-combinable histogram plus a broadcast total; the top-k "
        "is a distributed TakeOrdered, never a global sort.",
)
def q_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    hist = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = hist.agg(F.sum("n_rows").alias("total"))
    p = SKEW_AUDIT_PARTITIONS
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_rows",
            F.expr(
                "round(CAST(n_rows AS DOUBLE) * CAST(100 AS DOUBLE)"
                " / CAST(total AS DOUBLE), 4)"
            ).alias("share_pct"),
            F.expr(
                f"CAST(CASE WHEN n_rows * {p} % total = 0"
                f" THEN n_rows * {p} DIV total"
                f" ELSE n_rows * {p} DIV total + 1"
                f" END AS BIGINT)"
            ).alias("salt_factor"),
        )
        .orderBy(F.col("n_rows").desc(), "user_id")
        .limit(SKEW_AUDIT_TOPK)
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (median of pairwise slopes over the daily grain)
# ---------------------------------------------------------------------------

#: Theil–Sen is Θ(n²) in the number of POINTS — only honest at scale when
#: the points are a bounded grain. Daily revenue is: the day domain grows
#: with calendar time, not data volume (~2.4k days → ~2.9M pairs at any
#: SF), so the heavy distributed work is the daily aggregation and the
#: pair enumeration is a bounded broadcast nested-loop.
THEIL_SEN_EPOCH = "DATE '1992-01-01'"


@register(
    "q_theil_sen_trend",
    oracle=f"""
    WITH daily AS (
      SELECT date_diff('day', {THEIL_SEN_EPOCH}, o_orderdate) AS di,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(b.rev - a.rev AS DOUBLE) / CAST(b.di - a.di AS DOUBLE)
               AS slope
      FROM daily a JOIN daily b ON b.di > a.di
    ),
    ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS r,
             COUNT(*) OVER () AS n
      FROM pairs
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(n AS BIGINT) AS n_pairs,
           round(slope, 6) AS slope_per_day
    FROM ranked WHERE r = (n + 1) // 2
    """,
    doc="Theil–Sen robust trend estimator over daily order revenue: the "
        "LOWER MEDIAN of all pairwise slopes (rev_j - rev_i)/(day_j - "
        "day_i), immune to the outlier days that bend an OLS fit "
        "(cf. q_user_trend_slope). Slopes are one exact-DECIMAL "
        "difference divided by an integer day gap — a single IEEE "
        "division both engines compute bit-identically. The median is "
        "selected by the two-phase _global_rank (never a "
        "single-partition sort over the ~2.9M pairs); the pair "
        "enumeration itself is a broadcast nested-loop over the BOUNDED "
        "daily grain (the day domain grows with the calendar, not the "
        "data volume).",
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy("o_orderdate").agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").alias("rev")
    ).select(
        F.expr(f"datediff(o_orderdate, {THEIL_SEN_EPOCH})").alias("di"),
        "rev",
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        F.broadcast(b), F.expr("b.di > a.di")
    ).select(
        F.expr(
            "CAST(b.rev - a.rev AS DOUBLE) / CAST(b.di - a.di AS DOUBLE)"
        ).alias("slope")
    )
    # _global_rank scans its input three times (bounds agg, per-bucket
    # windows, offset counts); persist the ~2.9M-slope pair set (~25 MB)
    # so the broadcast nested-loop enumeration runs once, not three times
    pairs = pairs.persist()
    ranked = _global_rank(
        pairs, "slope", [F.col("slope")], with_total=True
    )
    n_days = daily.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_days"))
    return (
        ranked.filter(F.expr("__rank = (__n + 1) DIV 2"))
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            F.expr("CAST(__n AS BIGINT)").alias("n_pairs"),
            F.expr("round(slope, 6)").alias("slope_per_day"),
        )
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR adjustment over the per-nation return-rate tests
# ---------------------------------------------------------------------------

#: two-sided p-value from a z-score via the Abramowitz–Stegun 7.1.26
#: erf approximation (max abs error 1.5e-7 — identical in both engines
#: because the FORMULA is identical; engine ulp drift in exp() is orders
#: of magnitude below the 9dp rounding). Every literal is CAST AS DOUBLE:
#: bare decimal literals parse as DECIMAL in Spark but DOUBLE in DuckDB
#: and the exact-decimal intermediate drifts at rounding boundaries.
_BH_X = "(abs(z) / sqrt(CAST(2 AS DOUBLE)))"
_BH_T = f"(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(0.3275911 AS DOUBLE) * {_BH_X}))"
_BH_P_RAW = (
    f"round((CAST(0.254829592 AS DOUBLE) * {_BH_T} "
    f"+ CAST(-0.284496736 AS DOUBLE) * {_BH_T} * {_BH_T} "
    f"+ CAST(1.421413741 AS DOUBLE) * {_BH_T} * {_BH_T} * {_BH_T} "
    f"+ CAST(-1.453152027 AS DOUBLE) * {_BH_T} * {_BH_T} * {_BH_T} * {_BH_T} "
    f"+ CAST(1.061405429 AS DOUBLE) * {_BH_T} * {_BH_T} * {_BH_T} * {_BH_T} * {_BH_T}) "
    f"* exp(-{_BH_X} * {_BH_X}), 9)"
)
_BH_Z = (
    "((CAST(n_returns AS DOUBLE) / CAST(n_rows AS DOUBLE)"
    " - CAST(tot_returns AS DOUBLE) / CAST(tot_rows AS DOUBLE))"
    " / sqrt(CAST(tot_returns AS DOUBLE) / CAST(tot_rows AS DOUBLE)"
    " * (CAST(1 AS DOUBLE) - CAST(tot_returns AS DOUBLE)"
    " / CAST(tot_rows AS DOUBLE)) / CAST(n_rows AS DOUBLE)))"
)
BH_FDR_Q = "CAST(0.05 AS DOUBLE)"


@register(
    "q_fdr_bh_adjust",
    oracle=f"""
    WITH cells AS (
      SELECT n.n_name AS nation,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returns
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    tot AS (
      SELECT SUM(n_rows) AS tot_rows, SUM(n_returns) AS tot_returns
      FROM cells
    ),
    scored AS (
      SELECT nation, n_rows, n_returns, {_BH_Z} AS z
      FROM cells CROSS JOIN tot
    ),
    pvals AS (
      SELECT nation, n_rows, n_returns, z, {_BH_P_RAW} AS p_raw,
             CAST(COUNT(*) OVER () AS DOUBLE) AS m,
             CAST(ROW_NUMBER() OVER (ORDER BY {_BH_P_RAW}, nation)
                  AS DOUBLE) AS k
      FROM scored
    ),
    adjusted AS (
      SELECT nation, n_rows, n_returns, z, p_raw,
             round(least(CAST(1 AS DOUBLE),
                 MIN(m * p_raw / k) OVER (
                     ORDER BY p_raw DESC, nation DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                 9) AS p_adj
      FROM pvals
    )
    SELECT nation, n_rows, n_returns,
           round(CAST(n_returns AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
             AS return_rate,
           round(z, 6) AS z_score, p_raw, p_adj,
           CASE WHEN p_adj <= {BH_FDR_Q} THEN 1 ELSE 0 END AS rejected
    FROM adjusted
    ORDER BY nation
    """,
    doc="Benjamini–Hochberg FDR step-up over the 25 per-nation two-sided "
        "return-rate z-tests (each nation vs the pooled rate): p-values "
        "via the Abramowitz–Stegun erf polynomial (identical formula "
        "text in both engines, rounded at 9dp before any comparison), "
        "then p_adj(k) = min_{{j>=k}} m·p_(j)/j as a running MIN over "
        "the DESCENDING p order. Completes the experimentation suite "
        "(q_srm_check → q_ab_lift_readout → q_ab_sample_size) with the "
        "multiple-testing correction a 25-arm readout needs. The only "
        "global window runs over the 25-row nation grain — the heavy "
        "work is one map-side-combinable join-aggregate.",
)
def q_fdr_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    cells = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
            F.expr(
                "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_returns"),
        )
    )
    tot = cells.agg(
        F.expr("SUM(n_rows)").alias("tot_rows"),
        F.expr("SUM(n_returns)").alias("tot_returns"),
    )
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "nation", "n_rows", "n_returns", F.expr(_BH_Z).alias("z")
    )
    w_k = Window.orderBy(F.expr(_BH_P_RAW), F.col("nation"))
    pvals = scored.select(
        "nation", "n_rows", "n_returns", "z",
        F.expr(_BH_P_RAW).alias("p_raw"),
        F.expr("CAST(COUNT(*) OVER () AS DOUBLE)").alias("m"),
        F.row_number().over(w_k).cast("double").alias("k"),
    )
    w_min = (
        Window.orderBy(F.col("p_raw").desc(), F.col("nation").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    adjusted = pvals.select(
        "nation", "n_rows", "n_returns", "z", "p_raw",
        F.round(
            F.least(
                F.expr("CAST(1 AS DOUBLE)"),
                F.min(F.expr("m * p_raw / k")).over(w_min),
            ),
            9,
        ).alias("p_adj"),
    )
    return adjusted.select(
        "nation", "n_rows", "n_returns",
        F.expr(
            "round(CAST(n_returns AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)"
        ).alias("return_rate"),
        F.expr("round(z, 6)").alias("z_score"),
        "p_raw", "p_adj",
        F.expr(
            f"CASE WHEN p_adj <= {BH_FDR_Q} THEN 1 ELSE 0 END"
        ).alias("rejected"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# CEP-style sequence detection: view -> click -> purchase episodes
# ---------------------------------------------------------------------------

#: pattern window (Flink CEP `within`): each step must follow the
#: previous within 7 days
CEP_WITHIN_US = 7 * 86_400 * 1_000_000


CEP_FUNNEL_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS u
      FROM events
    ),
    annotated AS (
      SELECT user_id, event_type, u,
             MAX(CASE WHEN event_type = 'click' THEN u END) OVER (
                 PARTITION BY user_id ORDER BY u, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_u,
             MAX(CASE WHEN event_type = 'view' THEN u END) OVER (
                 PARTITION BY user_id ORDER BY u, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_u,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER (
                 PARTITION BY user_id ORDER BY u, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS err_incl,
             COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                          END) OVER (
                 PARTITION BY user_id ORDER BY u, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS err_excl
      FROM ev
    ),
    episodes AS (
      SELECT p.user_id,
             p.u - v.view_u AS gap_us,
             CASE WHEN p.err_excl - v.err_at_view > 0 THEN 1 ELSE 0 END
               AS blocked
      FROM (SELECT user_id, u, last_click_u, err_excl FROM annotated
            WHERE event_type = 'purchase' AND last_click_u IS NOT NULL
              AND u - last_click_u <= {CEP_WITHIN_US}) p
      JOIN (SELECT user_id, u AS click_u, last_view_u FROM annotated
            WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.last_click_u = c.click_u
      JOIN (SELECT user_id, u AS view_u, err_incl AS err_at_view
            FROM annotated WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND c.last_view_u = v.view_u
      WHERE c.last_view_u IS NOT NULL
        AND c.click_u - c.last_view_u <= {CEP_WITHIN_US}
    )
    SELECT user_id,
           CAST(SUM(1 - blocked) AS BIGINT) AS n_episodes,
           CAST(SUM(blocked) AS BIGINT) AS n_blocked,
           CASE WHEN SUM(1 - blocked) > 0 THEN
             round(CAST(SUM(CASE WHEN blocked = 0 THEN gap_us END)
                        AS DOUBLE)
                   / CAST(SUM(1 - blocked) AS DOUBLE)
                   / CAST(60000000 AS DOUBLE), 4)
           END AS avg_min_view_to_purchase
    FROM episodes
    GROUP BY user_id
    """


@register(
    "q_cep_funnel_episodes",
    oracle=CEP_FUNNEL_ORACLE,
    doc="CEP-style sequence detection — the MATCH_RECOGNIZE / Flink-CEP "
        "pattern `view -> click -> purchase WITHIN 7d, no error between` "
        "expressed as composable DataFrame ops: per-user running-state "
        "windows annotate every row with the latest preceding click/view "
        "and a running error count (the NFA state), then two equality "
        "joins on (user_id, ts) stitch the step rows into episodes and "
        "the error-count DELTA between the view and purchase positions "
        "checks the negative condition without rescanning. Everything "
        "partitions by user_id — per-user windows and co-partitioned "
        "joins, no global ordering anywhere.",
)
def q_cep_funnel_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"].select(
        "user_id", "event_id", "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("u"),
    )
    w = Window.partitionBy("user_id").orderBy("u", "event_id")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_incl = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    annotated = ev.select(
        "user_id", "event_type", "u",
        F.max(F.expr("CASE WHEN event_type = 'click' THEN u END"))
          .over(w_prev).alias("last_click_u"),
        F.max(F.expr("CASE WHEN event_type = 'view' THEN u END"))
          .over(w_prev).alias("last_view_u"),
        F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
          .over(w_incl).alias("err_incl"),
        F.coalesce(
            F.sum(
                F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END")
            ).over(w_prev),
            F.lit(0),
        ).alias("err_excl"),
    )
    purchases = annotated.filter(
        f"event_type = 'purchase' AND last_click_u IS NOT NULL "
        f"AND u - last_click_u <= {CEP_WITHIN_US}"
    ).select("user_id", "u", "last_click_u", "err_excl")
    clicks = annotated.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user_id"),
        F.col("u").alias("click_u"),
        "last_view_u",
    )
    views = annotated.filter("event_type = 'view'").select(
        F.col("user_id").alias("v_user_id"),
        F.col("u").alias("view_u"),
        F.col("err_incl").alias("err_at_view"),
    )
    episodes = (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("last_click_u") == F.col("click_u")),
        )
        .filter(
            f"last_view_u IS NOT NULL "
            f"AND click_u - last_view_u <= {CEP_WITHIN_US}"
        )
        .join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("last_view_u") == F.col("view_u")),
        )
        .select(
            "user_id",
            (F.col("u") - F.col("view_u")).alias("gap_us"),
            F.expr(
                "CASE WHEN err_excl - err_at_view > 0 THEN 1 ELSE 0 END"
            ).alias("blocked"),
        )
    )
    return episodes.groupBy("user_id").agg(
        F.expr("CAST(SUM(1 - blocked) AS BIGINT)").alias("n_episodes"),
        F.expr("CAST(SUM(blocked) AS BIGINT)").alias("n_blocked"),
        F.expr(
            "CASE WHEN SUM(1 - blocked) > 0 THEN "
            "round(CAST(SUM(CASE WHEN blocked = 0 THEN gap_us END)"
            " AS DOUBLE)"
            " / CAST(SUM(1 - blocked) AS DOUBLE)"
            " / CAST(60000000 AS DOUBLE), 4) END"
        ).alias("avg_min_view_to_purchase"),
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

#: pre/post boundary: 2024-01-16 00:00:00 UTC in epoch micros (events
#: span 2024-01; integer comparison sidesteps engine timestamp-literal
#: typing differences)
CUPED_CUT_US = 1_705_363_200_000_000

#: shared closed-form pieces (identical text in both engines; every
#: input is an exact BIGINT cents sum, so each expression is ONE
#: deterministic IEEE evaluation)
_CUPED_THETA = (
    "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
)
_CUPED_VAR = (
    "((CAST(ss{a}y AS DOUBLE) / n{a}"
    " - (CAST(s{a}y AS DOUBLE) / n{a}) * (CAST(s{a}y AS DOUBLE) / n{a}))"
    " + theta * theta * (CAST(ss{a}x AS DOUBLE) / n{a}"
    " - (CAST(s{a}x AS DOUBLE) / n{a}) * (CAST(s{a}x AS DOUBLE) / n{a}))"
    " - CAST(2 AS DOUBLE) * theta * (CAST(sx{a}y AS DOUBLE) / n{a}"
    " - (CAST(s{a}x AS DOUBLE) / n{a}) * (CAST(s{a}y AS DOUBLE) / n{a})))"
)
_CUPED_ADJ_MEAN = (
    "(CAST(s{a}y AS DOUBLE) / n{a}"
    " - theta * (CAST(s{a}x AS DOUBLE) / n{a} - CAST(sx AS DOUBLE) / n))"
)


def _cuped_sql(arm_expr: str, micros_expr: str, int_div: str) -> str:
    """Engine-shared CUPED pipeline: per-user pre/post cents, per-arm and
    pooled exact sufficient statistics, then the closed-form readout."""
    return f"""
    WITH per_user AS (
      SELECT user_id, {arm_expr} AS arm,
             SUM(CASE WHEN {micros_expr} < {CUPED_CUT_US}
                      THEN CAST(CAST(value AS DECIMAL(10,2)) * 100
                                AS BIGINT) ELSE 0 END) AS x_cents,
             SUM(CASE WHEN {micros_expr} >= {CUPED_CUT_US}
                      THEN CAST(CAST(value AS DECIMAL(10,2)) * 100
                                AS BIGINT) ELSE 0 END) AS y_cents
      FROM events GROUP BY user_id, {arm_expr}
    ),
    per_arm AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS na,
             CAST(SUM(x_cents) AS BIGINT) AS sax,
             CAST(SUM(y_cents) AS BIGINT) AS say,
             CAST(SUM(x_cents * x_cents) AS BIGINT) AS ssax,
             CAST(SUM(y_cents * y_cents) AS BIGINT) AS ssay,
             CAST(SUM(x_cents * y_cents) AS BIGINT) AS saxy
      FROM per_user GROUP BY arm
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 0 THEN na END) AS n0,
        MAX(CASE WHEN arm = 0 THEN sax END) AS s0x,
        MAX(CASE WHEN arm = 0 THEN say END) AS s0y,
        MAX(CASE WHEN arm = 0 THEN ssax END) AS ss0x,
        MAX(CASE WHEN arm = 0 THEN ssay END) AS ss0y,
        MAX(CASE WHEN arm = 0 THEN saxy END) AS sx0y,
        MAX(CASE WHEN arm = 1 THEN na END) AS n1,
        MAX(CASE WHEN arm = 1 THEN sax END) AS s1x,
        MAX(CASE WHEN arm = 1 THEN say END) AS s1y,
        MAX(CASE WHEN arm = 1 THEN ssax END) AS ss1x,
        MAX(CASE WHEN arm = 1 THEN ssay END) AS ss1y,
        MAX(CASE WHEN arm = 1 THEN saxy END) AS sx1y,
        SUM(na) AS n, SUM(sax) AS sx, SUM(say) AS sy,
        SUM(ssax) AS sxx, SUM(ssay) AS syy, SUM(saxy) AS sxy
      FROM per_arm
    ),
    with_theta AS (
      SELECT *, {_CUPED_THETA} AS theta FROM wide
    )
    SELECT
      CAST(n0 AS BIGINT) AS n_arm0, CAST(n1 AS BIGINT) AS n_arm1,
      round(theta, 6) AS theta,
      round(CAST(s0y AS DOUBLE) / n0 / 100, 6) AS mean_arm0,
      round(CAST(s1y AS DOUBLE) / n1 / 100, 6) AS mean_arm1,
      round((CAST(s1y AS DOUBLE) / n1 - CAST(s0y AS DOUBLE) / n0)
            / 100, 6) AS lift_raw,
      round(({_CUPED_ADJ_MEAN.format(a=1)}
             - {_CUPED_ADJ_MEAN.format(a=0)}) / 100, 6) AS lift_cuped,
      round(CAST(100 AS DOUBLE) * (CAST(1 AS DOUBLE)
            - ({_CUPED_VAR.format(a=0)} / n0 + {_CUPED_VAR.format(a=1)} / n1)
              / ((CAST(ss0y AS DOUBLE) / n0
                  - (CAST(s0y AS DOUBLE) / n0) * (CAST(s0y AS DOUBLE) / n0))
                 / n0
                 + (CAST(ss1y AS DOUBLE) / n1
                    - (CAST(s1y AS DOUBLE) / n1)
                      * (CAST(s1y AS DOUBLE) / n1)) / n1)), 4)
        AS var_reduction_pct,
      round((CAST(s1y AS DOUBLE) / n1 - CAST(s0y AS DOUBLE) / n0)
            / sqrt((CAST(ss0y AS DOUBLE) / n0
                    - (CAST(s0y AS DOUBLE) / n0) * (CAST(s0y AS DOUBLE) / n0))
                   / n0
                   + (CAST(ss1y AS DOUBLE) / n1
                      - (CAST(s1y AS DOUBLE) / n1)
                        * (CAST(s1y AS DOUBLE) / n1)) / n1), 4) AS z_raw,
      round(({_CUPED_ADJ_MEAN.format(a=1)} - {_CUPED_ADJ_MEAN.format(a=0)})
            / sqrt({_CUPED_VAR.format(a=0)} / n0
                   + {_CUPED_VAR.format(a=1)} / n1), 4) AS z_cuped
    FROM with_theta
    """


@register(
    "q_ab_cuped_adjust",
    oracle=_cuped_sql(_SRM_ARM_DUCK, "epoch_us(ts)", "//"),
    doc="CUPED variance-reduced A/B readout (Deng et al. WSDM'13) over "
        "the same deterministic md5 50/50 user split as q_srm_check / "
        "q_ab_lift_readout: each user's PRE-period value sum (2024-01-01"
        "..15) is the covariate, the POST-period sum the metric; theta "
        "= cov(x,y)/var(x) from POOLED exact integer-cents sufficient "
        "statistics, adjusted means subtract theta*(arm pre-mean - "
        "pooled pre-mean), and the readout reports raw vs CUPED lift, "
        "z-statistics, and the achieved variance-reduction percentage "
        "(= 100*rho^2 asymptotically). Everything reduces to ONE "
        "conditional aggregate per user then a 2-row pivot — the "
        "100 TB shape is a single map-side-combinable shuffle on "
        "user_id; all float math is closed-form over exact BIGINT "
        "cents sums, so no partition-order dependence anywhere.",
)
def q_ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(
        _cuped_sql(
            _SRM_ARM_SPARK, "unix_micros(CAST(ts AS TIMESTAMP))", "DIV"
        )
    )


# ---------------------------------------------------------------------------
# revenue bridge: price / volume / mix decomposition between two years
# ---------------------------------------------------------------------------

PVM_Y0, PVM_Y1 = 1996, 1997


def _pvm_sql(year_fn) -> str:
    """Engine-shared PVM bridge; ``year_fn(col)`` renders the engine's
    year extraction. Identity per brand (in exact arithmetic):
    delta = volume + mix + price, with volume = dq*P0 (portfolio price),
    mix = dq*(p0 - P0) (brand-vs-portfolio price gap on the volume
    change), price = dp*q1 (price change on new volume)."""
    return f"""
    WITH by_brand AS (
      SELECT p.p_brand AS brand, {year_fn('l.l_shipdate')} AS yr,
             SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS q,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE {year_fn('l.l_shipdate')} IN ({PVM_Y0}, {PVM_Y1})
      GROUP BY p.p_brand, {year_fn('l.l_shipdate')}
    ),
    portfolio AS (
      SELECT yr, SUM(q) AS pq, SUM(r) AS pr FROM by_brand GROUP BY yr
    ),
    wide AS (
      SELECT b0.brand,
             b0.q AS q0, b0.r AS r0, b1.q AS q1, b1.r AS r1,
             p0.pq AS pq0, p0.pr AS pr0
      FROM by_brand b0
      JOIN by_brand b1 ON b0.brand = b1.brand AND b1.yr = {PVM_Y1}
      JOIN portfolio p0 ON p0.yr = b0.yr
      WHERE b0.yr = {PVM_Y0}
    )
    SELECT brand,
           round(CAST(r0 AS DOUBLE), 2) AS rev_y0,
           round(CAST(r1 AS DOUBLE), 2) AS rev_y1,
           round(CAST(r1 - r0 AS DOUBLE), 2) AS delta,
           round(CAST(q1 - q0 AS DOUBLE)
                 * (CAST(pr0 AS DOUBLE) / CAST(pq0 AS DOUBLE)), 4)
             AS volume_effect,
           round(CAST(q1 - q0 AS DOUBLE)
                 * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)
                    - CAST(pr0 AS DOUBLE) / CAST(pq0 AS DOUBLE)), 4)
             AS mix_effect,
           round((CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                  - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))
                 * CAST(q1 AS DOUBLE), 4) AS price_effect
    FROM wide
    ORDER BY brand
    """


@register(
    "q_revenue_bridge_pvm",
    oracle=_pvm_sql(lambda c: f"EXTRACT(year FROM {c})"),
    doc="Price/volume/mix revenue bridge between two ship years, per "
        "brand — the waterfall decomposition every revenue review runs: "
        "volume effect prices the quantity change at the YEAR-0 "
        "PORTFOLIO unit price, mix effect prices it at the brand-vs-"
        "portfolio price gap, price effect applies the brand's unit-"
        "price change to year-1 volume; the three sum to the exact "
        "revenue delta (identity in exact arithmetic). Quantities and "
        "revenues are exact DECIMAL sums (one map-side-combinable "
        "aggregate on (brand, year)); every effect is a closed-form "
        "double expression of those decimals. The year-grain pivot "
        "self-join runs over the 25-brand grain — broadcast-sized at "
        "any SF.",
)
def q_revenue_bridge_pvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "part")
    t["lineitem"].createOrReplaceTempView("lineitem")
    t["part"].createOrReplaceTempView("part")
    return spark.sql(_pvm_sql(lambda c: f"year({c})"))


# ---------------------------------------------------------------------------
# seasonal decomposition (STL-lite: centered MA trend + DOW seasonal)
# ---------------------------------------------------------------------------

def _seasonal_sql(dow_fn) -> str:
    """Engine-shared STL-lite: daily revenue, ROW-based centered 7-day
    moving-average trend (only rows with a full 7-row window keep a
    trend), per-day-of-week mean of the detrended series. Detrended
    values are rounded at 9dp then summed as exact DECIMAL — the
    cross-row float-sum ban (see text_js_divergence discipline)."""
    return f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_orderdate
    ),
    windowed AS (
      SELECT d, rev,
             SUM(rev) OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             COUNT(*) OVER (ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily
    ),
    detrended AS (
      SELECT {dow_fn('d')} AS dow,
             CAST(round(CAST(rev AS DOUBLE)
                        - CAST(s7 AS DOUBLE) / CAST(7 AS DOUBLE), 9)
                  AS DECIMAL(24,9)) AS resid,
             rev
      FROM windowed WHERE c7 = 7
    )
    SELECT dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 2) AS mean_revenue,
           round(CAST(SUM(resid) AS DOUBLE) / COUNT(*), 4)
             AS seasonal_effect
    FROM detrended
    GROUP BY dow
    ORDER BY dow
    """


@register(
    "q_seasonal_ma_decompose",
    oracle=_seasonal_sql(lambda c: f"(dayofweek({c}) + 1)"),
    doc="STL-lite seasonal decomposition of daily order revenue: trend "
        "via a ROW-based centered 7-day moving average over the daily "
        "grain (global window, calendar-bounded ~2.4k rows), seasonal "
        "component as the per-day-of-week mean of the detrended series. "
        "Detrended residuals are rounded at 9dp and summed as exact "
        "DECIMAL (never a raw double SUM across rows); the day-of-week "
        "readout says WHICH weekdays structurally over/under-index "
        "after removing the weekly trend. The heavy work is one "
        "map-side-combinable daily aggregate; everything after runs on "
        "the bounded day grain.",
)
def q_seasonal_ma_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    orders.createOrReplaceTempView("orders")
    return spark.sql(_seasonal_sql(lambda c: f"dayofweek({c})"))


# ---------------------------------------------------------------------------
# difference-in-differences readout (arms x pre/post periods)
# ---------------------------------------------------------------------------

def _did_sql(arm_expr: str, micros_expr: str) -> str:
    """Engine-shared DiD: exact integer-cents sufficient statistics per
    (event_type, arm, period) cell, then closed-form estimate and Welch
    z over the four cells."""
    mean = "(CAST(s{c} AS DOUBLE) / n{c})"
    var_over_n = (
        "((CAST(ss{c} AS DOUBLE) / n{c}"
        " - (CAST(s{c} AS DOUBLE) / n{c}) * (CAST(s{c} AS DOUBLE) / n{c}))"
        " / n{c})"
    )
    did = (
        f"(({mean.format(c='11')} - {mean.format(c='10')})"
        f" - ({mean.format(c='01')} - {mean.format(c='00')}))"
    )
    se = (
        f"sqrt({var_over_n.format(c='00')} + {var_over_n.format(c='01')}"
        f" + {var_over_n.format(c='10')} + {var_over_n.format(c='11')})"
    )
    cells = []
    for arm in (0, 1):
        for per in (0, 1):
            c = f"{arm}{per}"
            cells.append(
                f"MAX(CASE WHEN arm = {arm} AND period = {per}"
                f" THEN n END) AS n{c},\n"
                f"        MAX(CASE WHEN arm = {arm} AND period = {per}"
                f" THEN s END) AS s{c},\n"
                f"        MAX(CASE WHEN arm = {arm} AND period = {per}"
                f" THEN ss END) AS ss{c}"
            )
    cells_sql = ",\n        ".join(cells)
    return f"""
    WITH celled AS (
      SELECT event_type, {arm_expr} AS arm,
             CASE WHEN {micros_expr} >= {CUPED_CUT_US} THEN 1 ELSE 0 END
               AS period,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    per_cell AS (
      SELECT event_type, arm, period,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS ss
      FROM celled GROUP BY event_type, arm, period
    ),
    wide AS (
      SELECT event_type,
        {cells_sql}
      FROM per_cell GROUP BY event_type
    )
    SELECT event_type,
           CAST(n00 + n01 AS BIGINT) AS n_arm0,
           CAST(n10 + n11 AS BIGINT) AS n_arm1,
           round({mean.format(c='00')} / 100, 6) AS mean_c_pre,
           round({mean.format(c='01')} / 100, 6) AS mean_c_post,
           round({mean.format(c='10')} / 100, 6) AS mean_t_pre,
           round({mean.format(c='11')} / 100, 6) AS mean_t_post,
           round({did} / 100, 6) AS did_estimate,
           round({did} / {se}, 4) AS z_did
    FROM wide
    ORDER BY event_type
    """


@register(
    "q_ab_diff_in_diff",
    oracle=_did_sql(_SRM_ARM_DUCK, "epoch_us(ts)"),
    doc="Difference-in-differences readout per event type over the same "
        "deterministic md5 50/50 split as q_srm_check and the same "
        "pre/post boundary as q_ab_cuped_adjust: the treatment effect "
        "estimate that survives a level shift between arms AND a "
        "common time trend — (treat-post - treat-pre) - (control-post "
        "- control-pre) — with a Welch z from the four cells' exact "
        "integer-cents sufficient statistics. With CUPED and the lift "
        "readout this completes the panel-data corner of the "
        "experimentation suite; ONE conditional aggregate on (type, "
        "arm, period), map-side-combinable, then a 4-cell pivot.",
)
def q_ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(
        _did_sql(_SRM_ARM_SPARK, "unix_micros(CAST(ts AS TIMESTAMP))")
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (the significance companion to q_theil_sen_trend)
# ---------------------------------------------------------------------------

def _mann_kendall_sql(daydiff: str) -> str:
    """One SQL text for both engines (only the day-diff expression is
    engine-specific). S is an exact integer (DECIMAL revenue comparisons),
    the tie-corrected variance numerator is exact BIGINT arithmetic, and
    z / p are single closed-form expressions of those exact integers —
    the same float-determinism discipline as q_fdr_bh_adjust (whose
    Abramowitz–Stegun erf text is reused verbatim for the p-value)."""
    return f"""
    WITH daily AS (
      SELECT {daydiff} AS di,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    s_stat AS (
      SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1
                           ELSE 0 END) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM daily a JOIN daily b ON b.di > a.di
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN t >= 2
                       THEN t * (t - 1) * (2 * t + 5)
                       ELSE 0 END), 0) AS BIGINT) AS tie_term,
             CAST(COALESCE(SUM(CASE WHEN t >= 2 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_tied_groups
      FROM (SELECT rev, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY rev) g
    ),
    sized AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    scored AS (
      SELECT n, s, n_pairs, n_tied_groups,
             CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
               / CAST(18 AS DOUBLE) AS var_s
      FROM s_stat CROSS JOIN ties CROSS JOIN sized
    ),
    ztab AS (
      SELECT n, s, n_pairs, n_tied_groups, var_s,
             CASE WHEN s > 0
                    THEN (CAST(s AS DOUBLE) - CAST(1 AS DOUBLE))
                         / sqrt(var_s)
                  WHEN s < 0
                    THEN (CAST(s AS DOUBLE) + CAST(1 AS DOUBLE))
                         / sqrt(var_s)
                  ELSE CAST(0 AS DOUBLE) END AS z
      FROM scored
    )
    SELECT n AS n_days, s AS s_stat, n_pairs, n_tied_groups,
           round(var_s, 4) AS var_s,
           round(z, 6) AS z_mk,
           {_BH_P_RAW} AS p_two_sided,
           CASE WHEN {_BH_P_RAW} < CAST(0.05 AS DOUBLE) AND s > 0
                  THEN 'increasing'
                WHEN {_BH_P_RAW} < CAST(0.05 AS DOUBLE) AND s < 0
                  THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM ztab
    """


@register(
    "q_mann_kendall_trend",
    oracle=_mann_kendall_sql("date_diff('day', DATE '1992-01-01', o_orderdate)"),
    doc="Mann–Kendall non-parametric trend TEST over daily order revenue "
        "— the significance companion to q_theil_sen_trend's magnitude "
        "estimate (the standard pairing in hydrology/telemetry trend "
        "monitoring). S = sum of pairwise revenue-comparison signs is an "
        "EXACT INTEGER (DECIMAL sums compare exactly), the tie-corrected "
        "variance numerator n(n-1)(2n+5) - sum t(t-1)(2t+5) is exact "
        "BIGINT arithmetic, and the continuity-corrected z and its "
        "two-sided p (Abramowitz–Stegun erf text shared verbatim with "
        "q_fdr_bh_adjust) are single closed-form expressions of those "
        "integers. The pairwise comparison is a broadcast nested-loop "
        "over the BOUNDED daily grain (the day domain grows with the "
        "calendar, not data volume — q_theil_sen_trend's scale "
        "justification); the heavy distributed work is the one "
        "map-side-combinable daily aggregation.",
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    orders.createOrReplaceTempView("orders")
    return spark.sql(_mann_kendall_sql("datediff(o_orderdate, DATE '1992-01-01')"))


# ---------------------------------------------------------------------------
# mSPRT always-valid p-values (sequential A/B testing under peeking)
# ---------------------------------------------------------------------------

#: mixture-prior variance for the mSPRT normal mixture (dollars² scale —
#: events.value is ~O(100) dollars, so τ = 1 puts the prior mass on
#: detectable-but-not-huge lifts); a pure constant of the test definition
MSPRT_TAU_SQ = "CAST(1 AS DOUBLE)"


_MSPRT_MEAN = "(CAST(s{a} AS DOUBLE) / CAST(n{a} AS DOUBLE))"
# population variance from cumulative integer sufficient statistics
_MSPRT_VAR = (
    "(CAST(ss{a} AS DOUBLE) / CAST(n{a} AS DOUBLE)"
    f" - {_MSPRT_MEAN.format(a='{a}')} * {_MSPRT_MEAN.format(a='{a}')})"
)
# per-arm squared-standard-error contribution, dollars² (cents²/1e4)
_MSPRT_V = (
    f"(({_MSPRT_VAR.format(a='0')} / CAST(n0 AS DOUBLE)"
    f" + {_MSPRT_VAR.format(a='1')} / CAST(n1 AS DOUBLE))"
    " / CAST(10000 AS DOUBLE))"
)
_MSPRT_DELTA = (
    f"(({_MSPRT_MEAN.format(a='1')} - {_MSPRT_MEAN.format(a='0')})"
    " / CAST(100 AS DOUBLE))"
)
_MSPRT_LAM_INV = (
    f"(sqrt(({_MSPRT_V} + {MSPRT_TAU_SQ}) / {_MSPRT_V})"
    f" * exp(-({_MSPRT_DELTA} * {_MSPRT_DELTA}) * {MSPRT_TAU_SQ}"
    f" / (CAST(2 AS DOUBLE) * {_MSPRT_V} * ({_MSPRT_V} + {MSPRT_TAU_SQ}))))"
)
_MSPRT_P_DAY = (
    f"CASE WHEN n0 >= 2 AND n1 >= 2 AND {_MSPRT_VAR.format(a='0')} > 0"
    f" AND {_MSPRT_VAR.format(a='1')} > 0"
    f" THEN least(CAST(1 AS DOUBLE), {_MSPRT_LAM_INV})"
    " ELSE CAST(1 AS DOUBLE) END"
)

#: scoring tail over a `wide` CTE/view with columns (event_type, day,
#: n0, s0, ss0, n1, s1, ss1) — engine-neutral text shared verbatim by
#: the batch query, its DuckDB oracle, AND the streaming twin's
#: post-stream projection (stream_ab_msprt scores the stateful
#: operator's integer output through this exact text, so batch/stream
#: parity is the full hash gate, not a reimplementation)
_MSPRT_TAIL = f"""
    filled AS (
      SELECT event_type, day, n0, n1,
             CASE WHEN n0 IS NOT NULL AND n1 IS NOT NULL
                  THEN {_MSPRT_P_DAY} ELSE CAST(1 AS DOUBLE) END AS p_day,
             CASE WHEN n0 IS NOT NULL AND n1 IS NOT NULL
                  THEN {_MSPRT_DELTA} ELSE CAST(0 AS DOUBLE) END AS delta
      FROM wide
    ),
    tracked AS (
      SELECT event_type, day,
             COALESCE(n0, 0) AS n_control, COALESCE(n1, 0) AS n_treat,
             delta,
             MIN(p_day) OVER (PARTITION BY event_type ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS p_av
      FROM filled
    )
    SELECT event_type, day,
           CAST(n_control AS BIGINT) AS n_control,
           CAST(n_treat AS BIGINT) AS n_treat,
           round(delta, 6) AS delta_cum,
           round(p_av, 9) AS p_always_valid,
           CASE WHEN round(p_av, 9) < CAST(0.05 AS DOUBLE)
                THEN 1 ELSE 0 END AS reject_h0
    FROM tracked
    ORDER BY event_type, day
    """


def _msprt_sql(arm_expr: str) -> str:
    """One SQL text for both engines (only the md5 arm split differs).
    Per (event_type, day, arm) sufficient statistics are EXACT integers
    (counts, cents, cents²); the cumulative prefix sums over the bounded
    day grain stay integer; each day's mixture likelihood ratio Λ_n and
    its inverse are then ONE closed-form double expression of those
    integers (Johari/Pekelis/Walsh, 'Peeking at A/B Tests', KDD'17:
    Λ_n = sqrt(V/(V+τ²))·exp(δ²τ²/(2V(V+τ²)))), and the always-valid
    p-value is the running MIN of min(1, 1/Λ) — monotone by
    construction, deterministic because every per-row input to the min
    is bit-identical in both engines."""
    return f"""
    WITH armed AS (
      SELECT event_type, CAST(ts AS DATE) AS day, {arm_expr} AS arm,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    per_cell AS (
      SELECT event_type, day, arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS ss
      FROM armed GROUP BY event_type, day, arm
    ),
    cum AS (
      SELECT event_type, day, arm,
             SUM(n) OVER w AS n, SUM(s) OVER w AS s, SUM(ss) OVER w AS ss
      FROM per_cell
      WINDOW w AS (PARTITION BY event_type, arm ORDER BY day
                   ROWS UNBOUNDED PRECEDING)
    ),
    wide AS (
      SELECT event_type, day,
             MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 0 THEN s END) AS s0,
             MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 1 THEN s END) AS s1,
             MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
      FROM cum GROUP BY event_type, day
    ),
    {_MSPRT_TAIL}
    """


@register(
    "q_ab_msprt_always_valid",
    oracle=_msprt_sql(_SRM_ARM_DUCK),
    doc="Always-valid p-value sequence (mSPRT, Johari/Pekelis/Walsh "
        "KDD'17) per event type over the q_srm_check md5 50/50 split: "
        "the sequential-testing readout that stays valid under "
        "CONTINUOUS PEEKING — the fixed-n z-test (q_ab_lift_readout) "
        "inflates false positives when checked daily, the running min "
        "of min(1, 1/Λ_n) never does. Per-day per-arm sufficient "
        "statistics are exact integers (counts/cents/cents²), prefix "
        "sums over the bounded day grain stay integer, Λ_n is one "
        "closed-form expression per row, and the always-valid p is a "
        "monotone running min. One map-side-combinable aggregation on "
        "(type, day, arm); windows partition by event_type over the "
        "calendar-bounded day grain — no single-partition exchange.",
)
def q_ab_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(_msprt_sql(_SRM_ARM_SPARK))


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing (recursive) + one-step forecast eval
# ---------------------------------------------------------------------------

#: binary-exact smoothing constants (0.5/0.25/0.75 are exactly
#: representable, so the literal-parsing DECIMAL-vs-DOUBLE hazard the
#: round-8 Dirichlet scorer hit cannot occur)
HOLT_ALPHA = "CAST(0.5 AS DOUBLE)"
HOLT_ALPHA_C = "CAST(0.5 AS DOUBLE)"  # 1 - alpha
HOLT_BETA = "CAST(0.25 AS DOUBLE)"
HOLT_BETA_C = "CAST(0.75 AS DOUBLE)"  # 1 - beta


def _holt_step(y: str, l: str, b: str, prev: str) -> dict:
    """Per-observation Holt update formulas, parameterized only on the
    engine's variable names — the arithmetic text (operator order,
    literals) is IDENTICAL in the Spark fold and the DuckDB recursion,
    so both engines execute the same IEEE op sequence and the
    accumulated doubles are bit-identical (a sequential fold is
    order-pinned, unlike a parallel SUM — the float rule this repo
    enforces bans only order-dependent double aggregation)."""
    l_new = f"({HOLT_ALPHA} * {y} + {HOLT_ALPHA_C} * ({l} + {b}))"
    return {
        "err": f"abs({y} - ({l} + {b}))",
        "errn": f"abs({y} - {prev})",
        "l_new": l_new,
        "b_new": f"({HOLT_BETA} * ({l_new} - {l}) + {HOLT_BETA_C} * {b})",
    }


_HOLT_SPARK_STEP = _holt_step("x.y", "acc.l", "acc.b", "acc.prev")
_HOLT_DUCK_STEP = _holt_step("d.y", "r.l", "r.b", "r.prev")

_HOLT_FINAL = """
    SELECT CAST({n} AS BIGINT) AS n_days,
           round({l}, 4) AS level_final,
           round({b}, 4) AS trend_final,
           CASE WHEN {cnt} > 0
                THEN round({err} / CAST({cnt} AS DOUBLE), 4)
                ELSE CAST(0 AS DOUBLE) END AS mae_holt,
           CASE WHEN {cnt} > 0
                THEN round({errn} / CAST({cnt} AS DOUBLE), 4)
                ELSE CAST(0 AS DOUBLE) END AS mae_naive1
    """


@register(
    "q_holt_linear_forecast",
    oracle=f"""
    WITH RECURSIVE day0 AS (
      SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS di,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    d AS (SELECT ROW_NUMBER() OVER (ORDER BY di) AS i, y FROM day0),
    rec AS (
      SELECT i, y AS l, CAST(0 AS DOUBLE) AS b, y AS prev,
             CAST(0 AS DOUBLE) AS err, CAST(0 AS DOUBLE) AS errn,
             CAST(0 AS BIGINT) AS cnt
      FROM d WHERE i = 1
      UNION ALL
      SELECT d.i,
             {_HOLT_DUCK_STEP["l_new"]} AS l,
             {_HOLT_DUCK_STEP["b_new"]} AS b,
             d.y AS prev,
             r.err + {_HOLT_DUCK_STEP["err"]} AS err,
             r.errn + {_HOLT_DUCK_STEP["errn"]} AS errn,
             r.cnt + 1 AS cnt
      FROM rec r JOIN d ON d.i = r.i + 1
    )
    {_HOLT_FINAL.format(n="r.i", l="r.l", b="r.b", cnt="r.cnt",
                        err="r.err", errn="r.errn")}
    FROM rec r WHERE r.i = (SELECT MAX(i) FROM d)
    """,
    doc="Holt double-exponential smoothing over daily order revenue "
        "(level + linear trend, α=0.5 β=0.25) with a one-step-ahead "
        "forecast evaluation: MAE of the Holt forecast l+b vs the "
        "naive-1 carry-forward baseline — the trend-aware counterpart "
        "of q06_forecast_revenue/q_forecast_snaive_eval. RECURSIVE by "
        "nature: Spark runs it as a sequential fold (aggregate() over "
        "the array_sort'ed bounded daily grain — ~2.4k days at any "
        "scale factor, so the fold input is a bounded broadcastable "
        "summary, never the raw table), DuckDB as a recursive CTE; "
        "the per-step arithmetic text is shared so both engines "
        "execute the identical IEEE op sequence (order-pinned — the "
        "parallel-sum nondeterminism the float rules ban cannot "
        "arise). The distributed work is the one map-side-combinable "
        "daily aggregation.",
)
def q_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    orders.createOrReplaceTempView("orders")
    s = _HOLT_SPARK_STEP
    fold = f"""
      aggregate(
        a,
        CAST(named_struct(
          'l', CAST(NULL AS DOUBLE), 'b', CAST(0 AS DOUBLE),
          'prev', CAST(NULL AS DOUBLE),
          'err', CAST(0 AS DOUBLE), 'errn', CAST(0 AS DOUBLE),
          'cnt', CAST(0 AS BIGINT))
          AS struct<l: DOUBLE, b: DOUBLE, prev: DOUBLE,
                    err: DOUBLE, errn: DOUBLE, cnt: BIGINT>),
        (acc, x) -> CASE WHEN acc.l IS NULL THEN named_struct(
            'l', x.y, 'b', CAST(0 AS DOUBLE), 'prev', x.y,
            'err', CAST(0 AS DOUBLE), 'errn', CAST(0 AS DOUBLE),
            'cnt', CAST(0 AS BIGINT))
          ELSE named_struct(
            'l', {s["l_new"]},
            'b', {s["b_new"]},
            'prev', x.y,
            'err', acc.err + {s["err"]},
            'errn', acc.errn + {s["errn"]},
            'cnt', acc.cnt + 1) END)
    """
    final = _HOLT_FINAL.format(
        n="size(a)", l="res.l", b="res.b", cnt="res.cnt",
        err="res.err", errn="res.errn",
    )
    return spark.sql(f"""
    WITH daily AS (
      SELECT datediff(o_orderdate, DATE '1992-01-01') AS di,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    arr AS (SELECT array_sort(collect_list(struct(di, y))) AS a FROM daily),
    folded AS (SELECT a, {fold} AS res FROM arr)
    {final}
    FROM folded
    """)


# ---------------------------------------------------------------------------
# Cramér's V categorical association matrix (documents metadata QA)
# ---------------------------------------------------------------------------

#: (tag, column-a, column-b) attribute pairs scored for association
_CRAMERS_PAIRS = (
    ("lang_x_source", "lang", "source"),
    ("lang_x_lenbin", "lang", "lenbin"),
    ("source_x_lenbin", "source", "lenbin"),
)


def _cramers_block(tag: str, a: str, b: str) -> str:
    """One pair's chi-square + Cramér's V: observed counts are exact
    integers; each cell's (O-E)²/E term is ONE double expression of
    exact integers rounded at 9dp and summed as DECIMAL(20,9) (the
    text_js_divergence discipline — the cell grid is bounded, the sum
    must still never be a raw double aggregate)."""
    e = f"(CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))"
    term = (
        f"round((CAST(o AS DOUBLE) - {e}) * (CAST(o AS DOUBLE) - {e})"
        f" / {e}, 9)"
    )
    return f"""
    obs_{tag} AS (
      SELECT {a} AS a, {b} AS b, CAST(COUNT(*) AS BIGINT) AS o
      FROM base GROUP BY 1, 2
    ),
    rt_{tag} AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra
                 FROM obs_{tag} GROUP BY a),
    ct_{tag} AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb
                 FROM obs_{tag} GROUP BY b),
    dims_{tag} AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS c
      FROM obs_{tag}
    ),
    chi_{tag} AS (
      SELECT SUM(CAST({term} AS DECIMAL(20,9))) AS chi2
      FROM obs_{tag}
      JOIN rt_{tag} USING (a) JOIN ct_{tag} USING (b)
      CROSS JOIN dims_{tag}
    ),
    row_{tag} AS (
      SELECT '{tag}' AS pair, n, r, c,
             CAST((r - 1) * (c - 1) AS BIGINT) AS df,
             round(CAST(chi2 AS DOUBLE), 6) AS chi_square,
             round(sqrt(CAST(chi2 AS DOUBLE)
                        / (CAST(n AS DOUBLE)
                           * CAST(least(r, c) - 1 AS DOUBLE))), 6)
               AS cramers_v
      FROM chi_{tag} CROSS JOIN dims_{tag}
    )"""


def _cramers_sql(intdiv: str) -> str:
    blocks = ",".join(_cramers_block(t, a, b) for t, a, b in _CRAMERS_PAIRS)
    union = "\n    UNION ALL\n    ".join(
        f"SELECT * FROM row_{t}" for t, _, _ in _CRAMERS_PAIRS
    )
    return f"""
    WITH base AS (
      SELECT lang, source,
             least(CAST(n_chars AS BIGINT) {intdiv} 500, 7) AS lenbin
      FROM documents
    ),
    {blocks}
    {union}
    ORDER BY pair
    """


@register(
    "q_cramers_v_matrix",
    oracle=_cramers_sql("//"),
    doc="Cramér's V association matrix over document metadata pairs "
        "(lang×source, lang×length-bin, source×length-bin) — the "
        "corpus-QA check that catches a crawler whose language mix "
        "silently depends on the source or whose length distribution "
        "shifts per language (the bias that leaks into a trained "
        "model). Chi-square from exact integer observed counts with "
        "expected counts as one closed-form double per bounded grid "
        "cell (9dp-rounded, DECIMAL-summed); V normalizes by "
        "n·(min(r,c)-1) so pairs with different cardinalities are "
        "comparable. Three map-side-combinable aggregations over the "
        "bounded attribute grids; no shuffle exceeds the grid size.",
)
def q_cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    docs.createOrReplaceTempView("documents")
    return spark.sql(_cramers_sql("DIV"))


# ---------------------------------------------------------------------------
# lead–lag cross-correlation between event-type daily series
# ---------------------------------------------------------------------------

XCORR_MAX_LAG = 7
XCORR_MIN_DAYS = 20

#: Pearson r from exact integer sufficient statistics: the five sums
#: are BIGINT-exact over the bounded day grain, the products in the
#: closed form are widened to DECIMAL(38,0) (exact in both engines, no
#: 64-bit overflow at any realistic daily magnitude), and only the
#: final ratio is a double
_XCORR_D38 = "CAST({v} AS DECIMAL(38,0))"
_XCORR_R = (
    f"(CAST({_XCORR_D38.format(v='n')} * {_XCORR_D38.format(v='sxy')}"
    f" - {_XCORR_D38.format(v='sx')} * {_XCORR_D38.format(v='sy')} AS DOUBLE)"
    f" / sqrt(CAST({_XCORR_D38.format(v='n')} * {_XCORR_D38.format(v='sxx')}"
    f" - {_XCORR_D38.format(v='sx')} * {_XCORR_D38.format(v='sx')} AS DOUBLE)"
    f" * CAST({_XCORR_D38.format(v='n')} * {_XCORR_D38.format(v='syy')}"
    f" - {_XCORR_D38.format(v='sy')} * {_XCORR_D38.format(v='sy')} AS DOUBLE)))"
)


def _xcorr_sql(daydiff: str, lags_from: str) -> str:
    """One SQL text for both engines (day-diff expression and the lag
    enumeration differ). Daily dollar totals are exact integers (cents
    summed, then integer-divided by 100); every (pair, lag) cell's
    correlation is one closed-form expression of six exact integers."""
    return f"""
    WITH daily AS (
      SELECT event_type, {daydiff} AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    dollars AS (
      SELECT event_type, d, cents {{intdiv}} 100 AS x FROM daily
    ),
    lags AS ({lags_from}),
    cells AS (
      SELECT a.event_type AS t_lead, b.event_type AS t_follow, l.lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a.x) AS BIGINT) AS sx,
             CAST(SUM(b.x) AS BIGINT) AS sy,
             CAST(SUM(a.x * a.x) AS BIGINT) AS sxx,
             CAST(SUM(b.x * b.x) AS BIGINT) AS syy,
             CAST(SUM(a.x * b.x) AS BIGINT) AS sxy
      FROM dollars a
      CROSS JOIN lags l
      JOIN dollars b
        ON b.event_type <> a.event_type AND b.d = a.d + l.lag
      GROUP BY a.event_type, b.event_type, l.lag
    )
    SELECT t_lead, t_follow, CAST(lag AS BIGINT) AS lag, n AS n_days,
           round({_XCORR_R}, 6) AS pearson_r
    FROM cells
    WHERE n >= {XCORR_MIN_DAYS}
      AND {_XCORR_D38.format(v='n')} * {_XCORR_D38.format(v='sxx')}
          - {_XCORR_D38.format(v='sx')} * {_XCORR_D38.format(v='sx')} > 0
      AND {_XCORR_D38.format(v='n')} * {_XCORR_D38.format(v='syy')}
          - {_XCORR_D38.format(v='sy')} * {_XCORR_D38.format(v='sy')} > 0
    ORDER BY t_lead, t_follow, lag
    """


@register(
    "q_leadlag_xcorr",
    oracle=_xcorr_sql(
        "date_diff('day', DATE '1992-01-01', CAST(ts AS DATE))",
        f"SELECT unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG} + 1)) AS lag",
    ).format(intdiv="//"),
    doc=f"Lead–lag cross-correlation matrix between event-type daily "
        f"revenue series at lags -{XCORR_MAX_LAG}..+{XCORR_MAX_LAG}: "
        "Pearson r of (type A at day d, type B at day d+lag) — the "
        "Granger-style screening that finds which activity LEADS which "
        "(views leading purchases shows up as the off-zero peak of the "
        "lag curve). Daily dollar totals are exact integers; each "
        "(pair, lag) correlation is ONE closed-form expression of six "
        "integer sums widened to DECIMAL(38,0) so no product can "
        "overflow. The lag enumeration is a bounded broadcast cross "
        "join; the day-shifted self-join co-partitions on the "
        "calendar-bounded day key.",
)
def q_leadlag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(
        _xcorr_sql(
            "datediff(CAST(ts AS DATE), DATE '1992-01-01')",
            f"SELECT explode(sequence(-{XCORR_MAX_LAG},"
            f" {XCORR_MAX_LAG})) AS lag",
        ).format(intdiv="DIV")
    )


# ---------------------------------------------------------------------------
# empirical-Bayes shrinkage of per-brand return rates (beta-binomial MoM)
# ---------------------------------------------------------------------------

def _eb_shrink_sql() -> str:
    """Engine-shared (no dialect differences): per-brand return counts
    are exact integers; the method-of-moments beta prior is fit from
    the BOUNDED brand grain (~25 brands) with 9dp-rounded per-brand
    terms DECIMAL-summed; every shrunk rate is one closed-form
    expression of those quantities."""
    rate = "(CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE))"
    return f"""
    WITH cells AS (
      SELECT p.p_brand AS brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ret
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ),
    moments AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(round({rate}, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS sr,
             CAST(SUM(CAST(round({rate} * {rate}, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS srr,
             CAST(SUM(CAST(round(CAST(1 AS DOUBLE) / CAST(n AS DOUBLE), 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS sinv
      FROM cells
    ),
    prior AS (
      SELECT k, sr / CAST(k AS DOUBLE) AS m,
             greatest(
               srr / CAST(k AS DOUBLE)
               - (sr / CAST(k AS DOUBLE)) * (sr / CAST(k AS DOUBLE))
               - (sr / CAST(k AS DOUBLE))
                 * (CAST(1 AS DOUBLE) - sr / CAST(k AS DOUBLE))
                 * sinv / CAST(k AS DOUBLE),
               CAST(1e-9 AS DOUBLE)) AS v
      FROM moments
    ),
    ab AS (
      SELECT m, v,
             greatest(m * (CAST(1 AS DOUBLE) - m) / v - CAST(1 AS DOUBLE),
                      CAST(1 AS DOUBLE)) AS strength
      FROM prior
    )
    SELECT c.brand, c.n, c.n_ret,
           round({rate.replace('n_ret', 'c.n_ret').replace('n AS', 'c.n AS')}, 6)
             AS raw_rate,
           round((CAST(c.n_ret AS DOUBLE) + ab.m * ab.strength)
                 / (CAST(c.n AS DOUBLE) + ab.strength), 6) AS eb_rate,
           round(ab.m, 6) AS prior_mean,
           round(ab.strength, 4) AS prior_strength
    FROM cells c CROSS JOIN ab
    ORDER BY c.brand
    """


@register(
    "q_eb_shrunk_return_rates",
    oracle=_eb_shrink_sql(),
    doc="Empirical-Bayes shrinkage of per-brand return rates "
        "(beta-binomial, method of moments): small brands' noisy raw "
        "rates pull toward the cross-brand prior mean proportionally "
        "to prior strength vs their own sample size — the standard "
        "small-cell stabilizer for dashboards and ranking (a 3-return "
        "brand stops topping the leaderboard). The prior is fit on "
        "the BOUNDED brand grain: between-brand variance minus the "
        "average binomial sampling variance (9dp-rounded terms, "
        "DECIMAL-summed), strength = m(1-m)/v - 1 clamped ≥ 1. One "
        "map-side-combinable count aggregate over the join; "
        "everything after is a ~25-row bounded computation broadcast "
        "back per brand.",
)
def q_eb_shrunk_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "part")
    t["lineitem"].createOrReplaceTempView("lineitem")
    t["part"].createOrReplaceTempView("part")
    return spark.sql(_eb_shrink_sql())


# ---------------------------------------------------------------------------
# log-log price elasticity per brand (OLS on ln unit price vs ln quantity)
# ---------------------------------------------------------------------------

def _elasticity_sql() -> str:
    """Engine-shared. Each row's ln-based regressors are ONE double
    expression rounded at 9dp (the module's log-bearing-aggregate rule:
    libm ulp drift dies at the rounding unless a value sits exactly on
    a boundary), sums run as DECIMAL(20,9), and the per-brand OLS slope
    is one closed form of those sums."""
    x = "round(ln(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)), 9)"
    y = "round(ln(CAST(l_quantity AS DOUBLE)), 9)"
    xy = ("round(ln(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))"
          " * ln(CAST(l_quantity AS DOUBLE)), 9)")
    xx = ("round(ln(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))"
          " * ln(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)), 9)")
    return f"""
    WITH terms AS (
      SELECT p.p_brand AS brand,
             CAST({x} AS DECIMAL(20,9)) AS x,
             CAST({y} AS DECIMAL(20,9)) AS y,
             CAST({xy} AS DECIMAL(20,9)) AS xy,
             CAST({xx} AS DECIMAL(20,9)) AS xx
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ),
    sums AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xy) AS DOUBLE) AS sxy,
             CAST(SUM(xx) AS DOUBLE) AS sxx
      FROM terms GROUP BY brand
    )
    SELECT brand, n,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) AS elasticity,
           round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)
                        * sx / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE), 4) AS ln_q_at_unit_price
    FROM sums
    WHERE CAST(n AS DOUBLE) * sxx - sx * sx > 0
    ORDER BY brand
    """


@register(
    "q_price_elasticity",
    oracle=_elasticity_sql(),
    doc="Log-log price elasticity of demand per brand: OLS slope of "
        "ln(quantity) on ln(unit price) over line items — the "
        "econometric readout behind pricing decisions (elasticity < -1 "
        "= revenue falls when price rises). Each row contributes "
        "ln-based regressor terms as single 9dp-rounded double "
        "expressions summed as DECIMAL(20,9) (the log-bearing "
        "aggregate discipline shared with text_js_divergence); the "
        "per-brand slope and the ln-quantity intercept are closed "
        "forms of those exact sums. One map-side-combinable aggregate "
        "over the co-partitioned part join; the bounded brand grain "
        "carries everything downstream.",
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "lineitem", "part")
    t["lineitem"].createOrReplaceTempView("lineitem")
    t["part"].createOrReplaceTempView("part")
    return spark.sql(_elasticity_sql())


# ---------------------------------------------------------------------------
# Shapley-value channel attribution (exact over the bounded subset lattice)
# ---------------------------------------------------------------------------

#: channel → bit. Conversion = the user has a purchase event; the
#: other four event types are the attribution channels.
_SHAPLEY_CHANNELS = (("view", 1), ("click", 2), ("signup", 4), ("error", 8))
#: |S|!(n-1-|S|)! for n=4, indexed by |S| — Shapley weights scaled by
#: n! = 24 so they are exact integers
_SHAPLEY_W = {0: 6, 1: 2, 2: 2, 3: 6}


def _shapley_sql(masks_from: str, channels_from: str) -> str:
    """Engine-shared except the two bounded domain enumerations (16
    masks, 4 channels). v(S) = conversion rate of users whose channel
    set is EXACTLY S (0 for unobserved sets — the data-driven Shapley
    convention); each marginal term (v(S∪i) − v(S)) is one 9dp-rounded
    closed form of exact integers, weighted by the exact integer
    |S|!(n−1−|S|)! and DECIMAL-summed over the ≤8 subsets per channel;
    the n! division happens once at the end."""
    has = " + ".join(
        f"MAX(CASE WHEN e.event_type = '{t}'"
        f" AND (fp.fpts IS NULL OR e.ts < fp.fpts)"
        f" THEN {b} ELSE 0 END)"
        for t, b in _SHAPLEY_CHANNELS
    )
    w = ("CASE CAST(bit_count(CAST(m AS BIGINT)) AS INT) "
         + " ".join(f"WHEN {k} THEN {v}" for k, v in _SHAPLEY_W.items())
         + " END")
    v0 = "round(CAST(COALESCE(s0.conv, 0) AS DOUBLE) / CAST(COALESCE(s0.tot, 1) AS DOUBLE), 9)"
    v1 = "round(CAST(COALESCE(s1.conv, 0) AS DOUBLE) / CAST(COALESCE(s1.tot, 1) AS DOUBLE), 9)"
    return f"""
    WITH fp AS (
      SELECT user_id, MIN(ts) AS t0,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fpts
      FROM events GROUP BY user_id
    ),
    users AS (
      SELECT e.user_id, CAST({has} AS INT) AS mask,
             MAX(CASE WHEN fp.fpts IS NOT NULL
                       AND fp.fpts <= fp.t0 + INTERVAL 3 DAY
                      THEN 1 ELSE 0 END) AS converted
      FROM events e JOIN fp ON fp.user_id = e.user_id
      GROUP BY e.user_id
    ),
    sets AS (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS tot,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM users GROUP BY mask
    ),
    masks AS ({masks_from}),
    channels AS ({channels_from}),
    terms AS (
      SELECT c.channel, c.bit,
             CAST({w} * round({v1} - {v0}, 9) AS DECIMAL(20,9)) AS term
      FROM masks
      CROSS JOIN channels c
      LEFT JOIN sets s0 ON s0.mask = masks.m
      LEFT JOIN sets s1 ON s1.mask = masks.m + c.bit
      WHERE (CAST(masks.m AS INT) & c.bit) = 0
    ),
    phi AS (
      SELECT channel, bit,
             round(CAST(SUM(term) AS DOUBLE) / CAST(24 AS DOUBLE), 6)
               AS shapley_value
      FROM terms GROUP BY channel, bit
    ),
    reach AS (
      SELECT c.channel,
             CAST(SUM(CASE WHEN (u.mask & c.bit) <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_users_with_channel
      FROM users u CROSS JOIN channels c
      GROUP BY c.channel
    )
    SELECT phi.channel, phi.shapley_value, reach.n_users_with_channel
    FROM phi JOIN reach ON reach.channel = phi.channel
    ORDER BY phi.channel
    """


_SHAPLEY_MASKS_SPARK = "SELECT explode(sequence(0, 15)) AS m"
_SHAPLEY_MASKS_DUCK = "SELECT unnest(range(0, 16)) AS m"
_SHAPLEY_CH_ROWS = ", ".join(f"('{t}', {b})" for t, b in _SHAPLEY_CHANNELS)
_SHAPLEY_CH_SPARK = f"SELECT channel, bit FROM VALUES {_SHAPLEY_CH_ROWS} AS t(channel, bit)"
_SHAPLEY_CH_DUCK = f"SELECT channel, bit FROM (VALUES {_SHAPLEY_CH_ROWS}) t(channel, bit)"


@register(
    "q_attribution_shapley",
    oracle=_shapley_sql(_SHAPLEY_MASKS_DUCK, _SHAPLEY_CH_DUCK),
    doc="EXACT Shapley-value channel attribution (data-driven games, "
        "Zhao et al. style): a user's journey is the channel set seen "
        "BEFORE their first purchase (whole history if none), the "
        "conversion outcome is purchase-within-3-days-of-first-"
        "activity, v(S) = conversion rate of journeys exactly S, and "
        "each channel's "
        "Shapley value averages its marginal contribution over all "
        "2³ = 8 subsets it can join, with the factorial weights as "
        "exact integers (scaled by 4!) — the fair-division answer to "
        "'which channel actually drives purchases' that first/last-"
        "touch heuristics (q_first_touch_attribution) approximate. "
        "Exact because the channel lattice is BOUNDED (16 subsets): "
        "one user-grain aggregate builds the per-set conversion "
        "table, then everything is a 64-row bounded join — the "
        "pattern that makes game-theoretic attribution feasible at "
        "100 TB (the heavy pass is one map-side-combinable GROUP BY "
        "user).",
)
def q_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(_shapley_sql(_SHAPLEY_MASKS_SPARK, _SHAPLEY_CH_SPARK))


# ---------------------------------------------------------------------------
# population stability index (PSI) between pre/post periods
# ---------------------------------------------------------------------------

#: fixed value-bin edges (shared with the streaming drift monitor's
#: bucketing) and the industry alert threshold
PSI_EDGES = (50, 150, 300)
PSI_ALERT = "CAST(0.2 AS DOUBLE)"


def _psi_sql(micros_expr: str, bins_from: str) -> str:
    """Engine-shared except the epoch-micros expression and the 4-row
    bin enumeration. Bin counts are exact integers over the fixed
    value edges; Laplace-smoothed shares (c+1)/(tot+4) make every bin
    well-defined; each bin's (q−p)·ln(q/p) contribution is ONE
    9dp-rounded double expression DECIMAL-summed over the 4 bins."""
    e0, e1, e2 = PSI_EDGES
    binx = (
        f"CASE WHEN CAST(value AS DOUBLE) < CAST({e0} AS DOUBLE) THEN 0 "
        f"WHEN CAST(value AS DOUBLE) < CAST({e1} AS DOUBLE) THEN 1 "
        f"WHEN CAST(value AS DOUBLE) < CAST({e2} AS DOUBLE) THEN 2 "
        f"ELSE 3 END"
    )
    p = "((CAST(c0 AS DOUBLE) + CAST(1 AS DOUBLE)) / (CAST(t0 AS DOUBLE) + CAST(4 AS DOUBLE)))"
    q = "((CAST(c1 AS DOUBLE) + CAST(1 AS DOUBLE)) / (CAST(t1 AS DOUBLE) + CAST(4 AS DOUBLE)))"
    term = f"round(({q} - {p}) * ln({q} / {p}), 9)"
    return f"""
    WITH binned AS (
      SELECT event_type,
             CASE WHEN {micros_expr} >= {CUPED_CUT_US} THEN 1 ELSE 0 END
               AS period,
             {binx} AS bin
      FROM events
    ),
    counts AS (
      SELECT event_type, period, bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM binned GROUP BY event_type, period, bin
    ),
    types AS (SELECT DISTINCT event_type FROM binned),
    bins AS ({bins_from}),
    grid AS (
      SELECT t.event_type, b.bin,
             CAST(COALESCE(c0.c, 0) AS BIGINT) AS c0,
             CAST(COALESCE(c1.c, 0) AS BIGINT) AS c1
      FROM types t CROSS JOIN bins b
      LEFT JOIN counts c0 ON c0.event_type = t.event_type
                         AND c0.bin = b.bin AND c0.period = 0
      LEFT JOIN counts c1 ON c1.event_type = t.event_type
                         AND c1.bin = b.bin AND c1.period = 1
    ),
    tots AS (
      SELECT event_type, CAST(SUM(c0) AS BIGINT) AS t0,
             CAST(SUM(c1) AS BIGINT) AS t1
      FROM grid GROUP BY event_type
    ),
    scored AS (
      SELECT g.event_type,
             CAST({term} AS DECIMAL(20,9)) AS term
      FROM grid g JOIN tots ON tots.event_type = g.event_type
    )
    SELECT event_type,
           round(CAST(SUM(term) AS DOUBLE), 6) AS psi,
           CASE WHEN round(CAST(SUM(term) AS DOUBLE), 6) > {PSI_ALERT}
                THEN 1 ELSE 0 END AS drift_alert
    FROM scored GROUP BY event_type
    ORDER BY event_type
    """


@register(
    "q_psi_value_drift",
    oracle=_psi_sql(
        "epoch_us(ts)", "SELECT unnest(range(0, 4)) AS bin"
    ),
    doc="Population stability index between the pre/post periods (the "
        "same boundary as the CUPED/DiD experimentation queries) per "
        "event type: PSI = Σ_bins (q−p)·ln(q/p) over the fixed value "
        "bins — the industry-standard drift score for models and "
        "features (0.1 = watch, 0.2 = act), complementing "
        "pipeline_distribution_drift's TVD with a divergence that "
        "weights tail bins by their log-ratio. Laplace-smoothed "
        "shares keep empty bins finite; each bin term is one "
        "9dp-rounded closed form, DECIMAL-summed over the 4-bin "
        "bounded grid. One map-side-combinable aggregate; everything "
        "downstream is grid-sized.",
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(
        _psi_sql(
            "unix_micros(CAST(ts AS TIMESTAMP))",
            "SELECT explode(sequence(0, 3)) AS bin",
        )
    )


# ---------------------------------------------------------------------------
# adstock decay sweep: carryover transform + same-day revenue response
# ---------------------------------------------------------------------------

#: binary-exact decay rates swept (0 = no carryover baseline)
ADSTOCK_LAMBDAS = ("0.0", "0.25", "0.5", "0.75")


def _adstock_step(v: str, r: str, lam: str, st: dict) -> dict:
    """Per-day update: adstock_t = views_t + λ·adstock_{t-1}, then the
    Pearson sufficient sums update SEQUENTIALLY inside the same fold —
    order-pinned, so the doubles are bit-identical in Spark's
    aggregate() and DuckDB's recursion (raw double += across rows is
    only banned where the order is engine-chosen)."""
    ad = f"(CAST({v} AS DOUBLE) + CAST({lam} AS DOUBLE) * {st['ad']})"
    y = f"(CAST({r} AS DOUBLE) / CAST(100 AS DOUBLE))"
    return {
        "ad": ad,
        "n": f"({st['n']} + 1)",
        "sx": f"({st['sx']} + {ad})",
        "sy": f"({st['sy']} + {y})",
        "sxx": f"({st['sxx']} + {ad} * {ad})",
        "syy": f"({st['syy']} + {y} * {y})",
        "sxy": f"({st['sxy']} + {ad} * {y})",
    }


_ADSTOCK_R = (
    "((CAST({n} AS DOUBLE) * {sxy} - {sx} * {sy})"
    " / sqrt((CAST({n} AS DOUBLE) * {sxx} - {sx} * {sx})"
    " * (CAST({n} AS DOUBLE) * {syy} - {sy} * {sy})))"
)


@register(
    "q_adstock_decay_sweep",
    oracle=f"""
    WITH RECURSIVE day0 AS (
      SELECT date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS di,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(value AS DECIMAL(10,2)) * 100
                                AS BIGINT) ELSE 0 END) AS BIGINT) AS r
      FROM events GROUP BY 1
    ),
    d AS (SELECT ROW_NUMBER() OVER (ORDER BY di) AS i, v, r FROM day0),
    rec AS (
      SELECT CAST(lam AS DOUBLE) AS lam, 0 AS i,
             CAST(0 AS DOUBLE) AS ad, CAST(0 AS BIGINT) AS n,
             CAST(0 AS DOUBLE) AS sx, CAST(0 AS DOUBLE) AS sy,
             CAST(0 AS DOUBLE) AS sxx, CAST(0 AS DOUBLE) AS syy,
             CAST(0 AS DOUBLE) AS sxy
      FROM (VALUES ({'), ('.join(ADSTOCK_LAMBDAS)})) ls(lam)
      UNION ALL
      SELECT rec.lam, d.i,
             {_adstock_step('d.v', 'd.r', 'rec.lam',
                            dict(ad='rec.ad', n='rec.n', sx='rec.sx',
                                 sy='rec.sy', sxx='rec.sxx',
                                 syy='rec.syy', sxy='rec.sxy'))['ad']},
             {_adstock_step('d.v', 'd.r', 'rec.lam',
                            dict(ad='rec.ad', n='rec.n', sx='rec.sx',
                                 sy='rec.sy', sxx='rec.sxx',
                                 syy='rec.syy', sxy='rec.sxy'))['n']},
             {_adstock_step('d.v', 'd.r', 'rec.lam',
                            dict(ad='rec.ad', n='rec.n', sx='rec.sx',
                                 sy='rec.sy', sxx='rec.sxx',
                                 syy='rec.syy', sxy='rec.sxy'))['sx']},
             {_adstock_step('d.v', 'd.r', 'rec.lam',
                            dict(ad='rec.ad', n='rec.n', sx='rec.sx',
                                 sy='rec.sy', sxx='rec.sxx',
                                 syy='rec.syy', sxy='rec.sxy'))['sy']},
             {_adstock_step('d.v', 'd.r', 'rec.lam',
                            dict(ad='rec.ad', n='rec.n', sx='rec.sx',
                                 sy='rec.sy', sxx='rec.sxx',
                                 syy='rec.syy', sxy='rec.sxy'))['sxx']},
             {_adstock_step('d.v', 'd.r', 'rec.lam',
                            dict(ad='rec.ad', n='rec.n', sx='rec.sx',
                                 sy='rec.sy', sxx='rec.sxx',
                                 syy='rec.syy', sxy='rec.sxy'))['syy']},
             {_adstock_step('d.v', 'd.r', 'rec.lam',
                            dict(ad='rec.ad', n='rec.n', sx='rec.sx',
                                 sy='rec.sy', sxx='rec.sxx',
                                 syy='rec.syy', sxy='rec.sxy'))['sxy']}
      FROM rec JOIN d ON d.i = rec.i + 1
    )
    SELECT lam AS decay_lambda, CAST(n AS BIGINT) AS n_days,
           round({_ADSTOCK_R.format(n='n', sx='sx', sy='sy', sxx='sxx',
                                    syy='syy', sxy='sxy')}, 6)
             AS pearson_r
    FROM rec WHERE i = (SELECT MAX(i) FROM d)
    ORDER BY decay_lambda
    """,
    doc="Adstock (geometric carryover) decay sweep — the marketing-mix "
        "transform: adstock_t = views_t + λ·adstock_{t-1}, correlated "
        "against same-day purchase revenue for λ ∈ {0, .25, .5, .75} "
        "(λ=0 is the no-carryover baseline; the λ that maximizes r is "
        "the memory the response curve actually has). RECURSIVE like "
        "q_holt_linear_forecast — Spark folds the array_sort'ed "
        "bounded daily grain with the Pearson sufficient sums carried "
        "INSIDE the fold (order-pinned, so the doubles are "
        "bit-identical), DuckDB runs one recursion anchored at all "
        "four λ rows; the per-step arithmetic text is shared. The "
        "distributed work is one map-side-combinable daily aggregate.",
)
def q_adstock_decay_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    st0 = dict(ad="acc.ad", n="acc.n", sx="acc.sx", sy="acc.sy",
               sxx="acc.sxx", syy="acc.syy", sxy="acc.sxy")
    upd = _adstock_step("x.v", "x.r", "lam.lam", st0)
    fold = f"""
      aggregate(
        a,
        CAST(named_struct(
          'ad', CAST(0 AS DOUBLE), 'n', CAST(0 AS BIGINT),
          'sx', CAST(0 AS DOUBLE), 'sy', CAST(0 AS DOUBLE),
          'sxx', CAST(0 AS DOUBLE), 'syy', CAST(0 AS DOUBLE),
          'sxy', CAST(0 AS DOUBLE))
          AS struct<ad: DOUBLE, n: BIGINT, sx: DOUBLE, sy: DOUBLE,
                    sxx: DOUBLE, syy: DOUBLE, sxy: DOUBLE>),
        (acc, x) -> named_struct(
          'ad', {upd['ad']}, 'n', {upd['n']},
          'sx', {upd['sx']}, 'sy', {upd['sy']},
          'sxx', {upd['sxx']}, 'syy', {upd['syy']},
          'sxy', {upd['sxy']}))
    """
    r = _ADSTOCK_R.format(n="res.n", sx="res.sx", sy="res.sy",
                          sxx="res.sxx", syy="res.syy", sxy="res.sxy")
    lam_rows = ", ".join(f"({v})" for v in ADSTOCK_LAMBDAS)
    return spark.sql(f"""
    WITH day0 AS (
      SELECT datediff(CAST(ts AS DATE), DATE '1992-01-01') AS di,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(value AS DECIMAL(10,2)) * 100
                                AS BIGINT) ELSE 0 END) AS BIGINT) AS r
      FROM events GROUP BY 1
    ),
    arr AS (
      SELECT array_sort(collect_list(struct(di, v, r))) AS a FROM day0
    ),
    lams AS (SELECT CAST(lam AS DOUBLE) AS lam
             FROM VALUES {lam_rows} AS ls(lam)),
    folded AS (
      SELECT lam.lam, {fold} AS res, size(a) AS nd
      FROM arr CROSS JOIN lams lam
    )
    SELECT lam AS decay_lambda, CAST(res.n AS BIGINT) AS n_days,
           round({r}, 6) AS pearson_r
    FROM folded
    ORDER BY decay_lambda
    """)


# ---------------------------------------------------------------------------
# value-tier migration matrix (customer-base health between periods)
# ---------------------------------------------------------------------------

_TIER_LABEL = (
    "CASE WHEN {t} = 1 THEN 'T1' WHEN {t} = 2 THEN 'T2'"
    " WHEN {t} = 3 THEN 'T3' ELSE 'none' END"
)


@register(
    "q_value_tier_migration",
    oracle=f"""
    WITH spend AS (
      SELECT user_id,
             CASE WHEN epoch_us(ts) >= {CUPED_CUT_US} THEN 1 ELSE 0 END
               AS period,
             CAST(SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT))
                  AS BIGINT) AS s
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, period,
             ROW_NUMBER() OVER (PARTITION BY period
                                ORDER BY s, user_id) AS r,
             COUNT(*) OVER (PARTITION BY period) AS n
      FROM spend
    ),
    tiers AS (
      SELECT user_id, period,
             CAST(1 + (3 * (r - 1)) // n AS BIGINT) AS tier
      FROM ranked
    ),
    moves AS (
      SELECT {_TIER_LABEL.format(t='a.tier')} AS from_tier,
             {_TIER_LABEL.format(t='b.tier')} AS to_tier
      FROM (SELECT * FROM tiers WHERE period = 0) a
      FULL OUTER JOIN (SELECT * FROM tiers WHERE period = 1) b
        ON b.user_id = a.user_id
    ),
    matrix AS (
      SELECT from_tier, to_tier, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM moves GROUP BY from_tier, to_tier
    )
    SELECT from_tier, to_tier, n_users,
           round(CAST(n_users AS DOUBLE)
                 / CAST(SUM(n_users) OVER (PARTITION BY from_tier)
                        AS DOUBLE), 6) AS row_share
    FROM matrix
    ORDER BY from_tier, to_tier
    """,
    doc="Value-tier migration matrix between the pre/post periods (the "
        "experimentation boundary): users ranked into spend terciles "
        "per period, full-outer-joined across periods ('none' = "
        "churned or newly arrived), with per-from-tier row shares — "
        "the customer-base-health diagonal (sticky tiers) vs "
        "off-diagonal churn/upgrade flow that LTV dashboards track. "
        "Spark ranks each period with the two-phase _global_rank "
        "(parallel per-bucket windows + bounded prefix pass — never a "
        "user-grain single-partition sort); the tier arithmetic is "
        "exact integers (1 + 3(r-1) div n) and the matrix/share pass "
        "is a 16-cell bounded window.",
)
def q_value_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    spend = (
        ev.groupBy(
            "user_id",
            F.expr(
                f"CASE WHEN unix_micros(CAST(ts AS TIMESTAMP))"
                f" >= {CUPED_CUT_US} THEN 1 ELSE 0 END"
            ).alias("period"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100"
                " AS BIGINT)) AS BIGINT)"
            ).alias("s")
        )
    )
    tiers = []
    for p in (0, 1):
        sub = spend.filter(F.col("period") == p)
        ranked = _global_rank(
            sub, "s", [F.col("s"), F.col("user_id")], with_total=True
        )
        tiers.append(
            ranked.select(
                "user_id",
                F.expr(
                    "CAST(1 + (3 * (__rank - 1)) DIV __n AS BIGINT)"
                ).alias(f"tier{p}"),
            )
        )
    moves = tiers[0].join(tiers[1], "user_id", "full_outer").select(
        F.expr(_TIER_LABEL.format(t="tier0")).alias("from_tier"),
        F.expr(_TIER_LABEL.format(t="tier1")).alias("to_tier"),
    )
    matrix = moves.groupBy("from_tier", "to_tier").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_users")
    )
    w = Window.partitionBy("from_tier")
    return (
        matrix.withColumn(
            "row_share",
            F.expr("CAST(n_users AS DOUBLE)")
            / F.sum("n_users").over(w).cast("double"),
        )
        .withColumn("row_share", F.expr("round(row_share, 6)"))
        .orderBy("from_tier", "to_tier")
    )


# ---------------------------------------------------------------------------
# AMS F2 sketch: self-join size estimation from ±1 projections
# ---------------------------------------------------------------------------

AMS_K = 16  # independent ±1 estimators averaged


def _ams_sql(hash_int: str, jdom_from: str) -> str:
    """Engine-shared core: per-key frequencies are exact integers,
    each estimator Z_j = Σ_key sign_j(key)·f_key is an exact integer
    sum (signs from the (j, key) hash — regenerable anywhere, no
    stored matrix), E[Z²] = F2 exactly; the only floats are the final
    mean/relative-error divisions."""
    sign = (
        f"(CASE WHEN {hash_int.format(x=chr(39) + 'ams:' + chr(39) + ' || jd.j || ' + chr(39) + ':' + chr(39) + ' || u.user_id')}"
        f" % 2 = 0 THEN 1 ELSE -1 END)"
    )
    return f"""
    users AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
      FROM events GROUP BY user_id
    ),
    jdom AS ({jdom_from}),
    z AS (
      SELECT jd.j, CAST(SUM({sign} * u.f) AS BIGINT) AS zj
      FROM users u CROSS JOIN jdom jd
      GROUP BY jd.j
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(f * f) AS BIGINT) AS f2_exact
      FROM users
    ),
    est AS (
      SELECT CAST(SUM(zj * zj) AS BIGINT) AS sum_z2,
             CAST(MIN(zj * zj) AS BIGINT) AS min_z2,
             CAST(MAX(zj * zj) AS BIGINT) AS max_z2
      FROM z
    )
    SELECT exact.n_keys, exact.f2_exact,
           round(CAST(est.sum_z2 AS DOUBLE) / CAST({AMS_K} AS DOUBLE), 2)
             AS f2_estimate,
           round((CAST(est.sum_z2 AS DOUBLE) / CAST({AMS_K} AS DOUBLE)
                  - CAST(exact.f2_exact AS DOUBLE))
                 / CAST(exact.f2_exact AS DOUBLE), 6) AS rel_error,
           est.min_z2, est.max_z2
    FROM exact CROSS JOIN est
    """


@register(
    "sketch_ams_f2",
    oracle=f"""
    WITH {_ams_sql(
        "(('0x' || substr(md5({x}), 1, 8))::BIGINT)",
        f"SELECT unnest(range(1, {AMS_K} + 1)) AS j",
    )}
    """,
    doc=f"AMS F2 sketch (Alon–Matias–Szegedy): estimate the second "
        f"frequency moment Σf² of the events join key from {AMS_K} "
        "±1-projection estimators — and Σf² IS the output row count of "
        "a self-equi-join on that key, so this is the kilobyte-sized "
        "answer to 'how big will this join explode' that complements "
        "q_join_skew_audit's exact heavy-hitter histogram (the sketch "
        "needs one pass and O(k) space at any cardinality; the "
        "histogram needs the full key grain). Signs come from the "
        "(estimator, key) hash — regenerable on any executor, no "
        "stored matrix — so each Z_j is an exact integer sum "
        "(order-free, map-side-combinable) and E[Z²] = F2 exactly; "
        "the exact ground truth rides along as the eval baseline. "
        "The only floats are the final mean and relative error.",
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(
        f"WITH {_ams_sql('CAST(conv(substr(md5({x}), 1, 8), 16, 10) AS BIGINT)', f'SELECT explode(sequence(1, {AMS_K})) AS j')}"
    )


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis of daily revenue
# ---------------------------------------------------------------------------

HURST_BLOCKS = (16, 64, 256)


def _hurst_sql(daydiff: str, sizes_from: str, intdiv: str) -> str:
    """Engine-shared except day-diff, the block-size enumeration, and
    integer division. Daily cents are exact integers; within each
    consecutive block the cumulative deviation W_k = cumsum(x) − k·m
    is one closed-form double per row (integer prefix sums, one mean
    division), R = max W − min W, S = population std from integer
    moments; per-(size) means are 9dp-rounded DECIMAL sums over the
    bounded block count, and H is the closed-form OLS slope of
    ln(mean R/S) on ln(n) over the three sizes."""
    return f"""
    WITH daily AS (
      SELECT {daydiff} AS di,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT di, x, ROW_NUMBER() OVER (ORDER BY di) AS r FROM daily
    ),
    sizes AS ({sizes_from}),
    blocks AS (
      SELECT s.n, (seq.r - 1) {intdiv} s.n AS blk,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY s.n, (seq.r - 1) {intdiv} s.n
               ORDER BY seq.r) AS BIGINT) AS k,
             seq.x,
             CAST(SUM(seq.x) OVER (
               PARTITION BY s.n, (seq.r - 1) {intdiv} s.n
               ORDER BY seq.r ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumx
      FROM seq CROSS JOIN sizes s
    ),
    bstats AS (
      SELECT n, blk,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sxx
      FROM blocks GROUP BY n, blk
    ),
    full_blocks AS (SELECT * FROM bstats WHERE cnt = n),
    devs AS (
      SELECT b.n, b.blk,
             CAST(b.cumx AS DOUBLE)
               - CAST(b.k AS DOUBLE) * (CAST(f.sx AS DOUBLE)
                                        / CAST(f.cnt AS DOUBLE)) AS w
      FROM blocks b
      JOIN full_blocks f ON f.n = b.n AND f.blk = b.blk
    ),
    rs AS (
      SELECT d.n, d.blk,
             round((MAX(d.w) - MIN(d.w))
                   / sqrt(CAST(MAX(f.sxx) AS DOUBLE) / CAST(MAX(f.cnt) AS DOUBLE)
                          - (CAST(MAX(f.sx) AS DOUBLE) / CAST(MAX(f.cnt) AS DOUBLE))
                            * (CAST(MAX(f.sx) AS DOUBLE) / CAST(MAX(f.cnt) AS DOUBLE))),
                   9) AS ratio
      FROM devs d
      JOIN full_blocks f ON f.n = d.n AND f.blk = d.blk
      GROUP BY d.n, d.blk
    ),
    per_size AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             round(ln(CAST(SUM(CAST(ratio AS DECIMAL(20,9))) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE)), 9) AS ly,
             round(ln(CAST(n AS DOUBLE)), 9) AS lx
      FROM rs GROUP BY n
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m,
             CAST(SUM(CAST(lx AS DECIMAL(20,9))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ly AS DECIMAL(20,9))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(lx * ly, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(round(lx * lx, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS sxx
      FROM per_size
    )
    SELECT
      (SELECT CAST(SUM(n_blocks) AS BIGINT) FROM per_size)
        AS n_blocks_total,
      round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
        AS hurst_exponent
    FROM fit
    """


@register(
    "q_hurst_rs_exponent",
    oracle=_hurst_sql(
        "date_diff('day', DATE '1992-01-01', o_orderdate)",
        "SELECT unnest([" + ", ".join(map(str, HURST_BLOCKS)) + "]) AS n",
        "//",
    ),
    doc=f"Hurst exponent of daily order revenue via rescaled-range "
        f"(R/S) analysis at block sizes {HURST_BLOCKS}: H ≈ 0.5 means "
        "the series has no long memory (random walk increments), "
        "H > 0.5 persistent trends, H < 0.5 mean reversion — the "
        "long-memory diagnostic that decides whether naive "
        "day-over-day forecasting (q_forecast_snaive_eval) can work "
        "at all. Each consecutive block's cumulative deviations use "
        "exact integer prefix sums with one mean division; R/S per "
        "block is one 9dp-rounded closed form; per-size means are "
        "DECIMAL sums over the bounded block count; H is the "
        "closed-form log-log OLS slope over the three sizes. Windows "
        "partition by (size, block) over the calendar-bounded day "
        "grain; the day ranking itself is the bounded-domain "
        "exception the lint allowlists.",
)
def q_hurst_rs_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        _hurst_sql(
            "datediff(o_orderdate, DATE '1992-01-01')",
            "SELECT explode(array(" + ", ".join(map(str, HURST_BLOCKS)) + ")) AS n",
            "DIV",
        )
    )


# ---------------------------------------------------------------------------
# absorbing-chain conversion probability (Markov family completion)
# ---------------------------------------------------------------------------

MARKOV_ABSORB_STEPS = 20
MARKOV_ABSORB_STATE = "purchase"


def _markov_absorb_sql(mat: str = "AS") -> str:
    """Engine-shared up to DuckDB's AS MATERIALIZED hint on the
    transition matrix (20 CTE references would otherwise re-evaluate
    the LEAD-window subtree 20x — measured 74s -> 7s): the matrix comes from exact integer LEAD-pair
    counts with probabilities rounded at 9dp; the absorbing state's
    self-loop replaces its outgoing row; the k-step absorption vector
    iterates as {MARKOV_ABSORB_STEPS} UNROLLED CTEs generated from one
    template (no recursive aggregation — portable to both engines),
    each iteration a ≤|types|²-row bounded join with 9dp-rounded
    products DECIMAL-summed. The bounded-state matrix iteration is
    the same shape PageRank runs at graph scale; here the state space
    is the |event types| grain so the whole chain is broadcast-sized."""
    a = MARKOV_ABSORB_STATE
    its = []
    for k in range(MARKOV_ABSORB_STEPS):
        its.append(f"""
    it{k + 1} AS (
      SELECT t.from_type AS state,
             CAST(round(CAST(SUM(CAST(round(t.p * v.v, 9)
                                       AS DECIMAL(20,9))) AS DOUBLE), 9)
                  AS DOUBLE) AS v
      FROM tmat t JOIN it{k} v ON v.state = t.to_type
      GROUP BY t.from_type
    )""")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    totals AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS total
      FROM trans GROUP BY from_type
    ),
    tmat {mat} (
      SELECT t.from_type, t.to_type,
             round(CAST(t.n AS DOUBLE) / CAST(tot.total AS DOUBLE), 9)
               AS p
      FROM trans t JOIN totals tot ON tot.from_type = t.from_type
      WHERE t.from_type <> '{a}'
      UNION ALL
      SELECT '{a}', '{a}', CAST(1 AS DOUBLE)
    ),
    states AS (SELECT DISTINCT event_type AS state FROM seq),
    it0 AS (
      SELECT state,
             CASE WHEN state = '{a}' THEN CAST(1 AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END AS v
      FROM states
    ),{','.join(its)}
    SELECT state,
           round(v, 6) AS p_absorb_within_{MARKOV_ABSORB_STEPS}
    FROM it{MARKOV_ABSORB_STEPS}
    ORDER BY state
    """


@register(
    "q_markov_absorbing_conversion",
    oracle=_markov_absorb_sql("AS MATERIALIZED"),
    doc=f"Absorbing-chain conversion probability: treat "
        f"'{MARKOV_ABSORB_STATE}' as an absorbing state in the "
        "first-order event-type Markov chain (q_markov_transitions' "
        f"matrix) and iterate the absorption vector "
        f"{MARKOV_ABSORB_STEPS} steps — P(a user currently at state s "
        f"reaches {MARKOV_ABSORB_STATE} within {MARKOV_ABSORB_STEPS} "
        "transitions), the quantity funnel-leak triage actually wants "
        "(raw transition rows only say one step ahead). The iteration "
        "is UNROLLED into generated CTEs (shared template; no "
        "recursive aggregation, which neither engine allows), each step a bounded |types|²-row join with "
        "9dp-rounded products DECIMAL-summed — the PageRank iteration "
        "shape collapsed onto a broadcast-sized state space. The one "
        "heavy pass is the per-user LEAD window the funnel family "
        "already shares.",
)
def q_markov_absorbing_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(_markov_absorb_sql())


# ---------------------------------------------------------------------------
# Ljung–Box portmanteau test over daily-revenue autocorrelations
# ---------------------------------------------------------------------------

LJUNG_BOX_LAGS = 10
#: chi-square(10) critical value at alpha = 0.05 — a fixed constant of
#: the test (no incomplete-gamma evaluation needed for the verdict)
LJUNG_BOX_CRIT = "CAST(18.307 AS DOUBLE)"


def _ljung_box_sql(daydiff: str, lags_from: str) -> str:
    """Engine-shared except day-diff and lag enumeration. Every
    autocorrelation r_k is ONE closed-form expression of exact integer
    sums (Σx·x_shifted, head/tail sums, counts — the mean-subtracted
    cross product expanded so no per-row float survives), rounded at
    9dp; Q sums the 9dp-rounded r²/(T−k) terms as DECIMAL over the
    bounded lag set."""
    m = "(CAST(sall AS DOUBLE) / CAST(t AS DOUBLE))"
    ck = (
        f"(CAST(sxy AS DOUBLE) - {m} * (CAST(sh AS DOUBLE)"
        f" + CAST(st AS DOUBLE)) + CAST(novl AS DOUBLE) * {m} * {m})"
    )
    c0 = (
        f"(CAST(sxx AS DOUBLE) - CAST(2 AS DOUBLE) * {m}"
        f" * CAST(sall AS DOUBLE) + CAST(t AS DOUBLE) * {m} * {m})"
    )
    rk = f"round({ck} / {c0}, 9)"
    return f"""
    WITH daily AS (
      SELECT {daydiff} AS di,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(x) AS BIGINT) AS sall,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sxx
      FROM daily
    ),
    lags AS ({lags_from}),
    shifted AS (
      SELECT l.k,
             CAST(COUNT(*) AS BIGINT) AS novl,
             CAST(SUM(CAST(a.x AS DECIMAL(38,0))
                      * CAST(b.x AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(a.x) AS BIGINT) AS sh,
             CAST(SUM(b.x) AS BIGINT) AS st
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.di = a.di + l.k
      GROUP BY l.k
    ),
    acf AS (
      SELECT s.k, {rk} AS r, base.t
      FROM shifted s CROSS JOIN base
    )
    SELECT CAST(MAX(t) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_lags,
           round(CAST(MAX(t) AS DOUBLE)
                 * (CAST(MAX(t) AS DOUBLE) + CAST(2 AS DOUBLE))
                 * CAST(SUM(CAST(round(r * r
                     / (CAST(t AS DOUBLE) - CAST(k AS DOUBLE)), 9)
                     AS DECIMAL(20,9))) AS DOUBLE), 4) AS q_stat,
           CASE WHEN round(CAST(MAX(t) AS DOUBLE)
                 * (CAST(MAX(t) AS DOUBLE) + CAST(2 AS DOUBLE))
                 * CAST(SUM(CAST(round(r * r
                     / (CAST(t AS DOUBLE) - CAST(k AS DOUBLE)), 9)
                     AS DECIMAL(20,9))) AS DOUBLE), 4)
                > {LJUNG_BOX_CRIT} THEN 1 ELSE 0 END
             AS reject_white_noise
    FROM acf
    """


@register(
    "q_ljung_box_daily",
    oracle=_ljung_box_sql(
        "date_diff('day', DATE '1992-01-01', o_orderdate)",
        f"SELECT unnest(range(1, {LJUNG_BOX_LAGS} + 1)) AS k",
    ),
    doc=f"Ljung–Box portmanteau test on daily order revenue: Q = "
        f"T(T+2)·Σ r_k²/(T−k) over lags 1..{LJUNG_BOX_LAGS}, against "
        "the fixed χ²(10) 5% critical value — the is-there-ANY-serial-"
        "structure gate that decides whether the autocorrelation "
        "family (q_autocorr_lags, Holt, adstock) has signal to model "
        "at all. Each r_k is one closed-form expression of exact "
        "integer sums (the mean-subtracted cross product expanded so "
        "no per-row float survives); the lag sum is 9dp-rounded "
        "DECIMAL over the bounded lag set; the day-shifted self-join "
        "co-partitions on the calendar-bounded day key.",
)
def q_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        _ljung_box_sql(
            "datediff(o_orderdate, DATE '1992-01-01')",
            f"SELECT explode(sequence(1, {LJUNG_BOX_LAGS})) AS k",
        )
    )


# ---------------------------------------------------------------------------
# Gumbel extreme-value fit: return levels of the daily maximum order
# ---------------------------------------------------------------------------

#: Euler–Mascheroni and sqrt(6)/pi as double literals — constants of
#: the Gumbel method-of-moments fit, bit-identical once parsed
GUMBEL_GAMMA = "CAST(0.5772156649015329 AS DOUBLE)"
GUMBEL_S6PI = "CAST(0.7796968012336793 AS DOUBLE)"
GUMBEL_RETURN_DAYS = (30, 365)


def _gumbel_sql(daydiff: str) -> str:
    """Engine-shared except day-diff. Daily maxima are exact integer
    cents (MAX is order-free); the block-maxima moments use
    DECIMAL(38,0)-widened squares; μ, β, and each return level are
    single closed-form expressions of those exact moments."""
    m = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / CAST(100 AS DOUBLE))"
    sd = (
        "sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)"
        " / CAST(10000 AS DOUBLE) - " + m + " * " + m + ")"
    )
    beta = f"({GUMBEL_S6PI} * {sd})"
    mu = f"({m} - {GUMBEL_GAMMA} * {beta})"
    rl = (
        f"({mu} - {beta} * ln(-ln(CAST(1 AS DOUBLE)"
        " - CAST(1 AS DOUBLE) / CAST({t} AS DOUBLE))))"
    )
    rls = ",\n           ".join(
        f"round({rl.format(t=t)}, 2) AS return_level_{t}d"
        for t in GUMBEL_RETURN_DAYS
    )
    return f"""
    WITH daily AS (
      SELECT {daydiff} AS di,
             CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sxx
      FROM daily
    )
    SELECT n AS n_days,
           round({m}, 2) AS mean_daily_max,
           round({sd}, 2) AS sd_daily_max,
           round({mu}, 2) AS gumbel_mu,
           round({beta}, 2) AS gumbel_beta,
           {rls}
    FROM mom
    """


@register(
    "q_gumbel_return_levels",
    oracle=_gumbel_sql("date_diff('day', DATE '1992-01-01', o_orderdate)"),
    doc=f"Gumbel extreme-value fit on the daily MAXIMUM order price "
        f"(block maxima, method of moments: β = s·√6/π, μ = m − γβ) "
        f"with {'/'.join(str(t) + 'd' for t in GUMBEL_RETURN_DAYS)} "
        "return levels x_T = μ − β·ln(−ln(1−1/T)) — the 'how big an "
        "order should we provision for this month/year' quantile that "
        "empirical percentiles under-estimate because the tail is "
        "exactly where data runs out (the same reason EVT, not "
        "histograms, sizes flood defenses). Daily maxima are exact "
        "integer cents from one map-side-combinable MAX; moments use "
        "DECIMAL(38,0)-widened squares; the fit and return levels are "
        "single closed forms of those exact moments.",
)
def q_gumbel_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")["orders"]
    orders.createOrReplaceTempView("orders")
    return spark.sql(_gumbel_sql("datediff(o_orderdate, DATE '1992-01-01')"))


# ---------------------------------------------------------------------------
# Spearman rank correlation (two-phase ranks, exact integer arithmetic)
# ---------------------------------------------------------------------------

@register(
    "q_spearman_qty_price",
    oracle="""
    WITH base AS (
      SELECT l_quantity, l_extendedprice,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
                                l_quantity, l_extendedprice) AS rid
      FROM lineitem
    ),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY l_quantity, rid) AS rq,
             ROW_NUMBER() OVER (ORDER BY l_extendedprice, rid) AS rp
      FROM base
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rq - rp AS DECIMAL(38,0))
                      * CAST(rq - rp AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sd2
      FROM ranked
    )
    SELECT n AS n_rows,
           CAST(sd2 AS BIGINT) AS sum_d2,
           round(CAST(1 AS DOUBLE)
                 - CAST(6 AS DOUBLE) * CAST(sd2 AS DOUBLE)
                   / (CAST(n AS DOUBLE)
                      * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         - CAST(1 AS DOUBLE))), 6) AS spearman_rho
    FROM sums
    """,
    doc="Spearman rank correlation between line-item quantity and "
        "extended price: ρ = 1 − 6Σd²/(n(n²−1)) over deterministic "
        "total ranks (ties broken by (orderkey, linenumber) — the "
        "tie-broken variant, stated honestly: average-rank tie "
        "correction would need fractional ranks) — the monotone-"
        "association complement to q_corr_qty_price's Pearson (rank "
        "correlation survives the outliers and nonlinearity that bend "
        "a product-moment estimate). EVERYTHING is exact integers: "
        "ranks, d², the DECIMAL(38,0)-widened Σd² (n³ exceeds BIGINT "
        "at ~2M rows); the only float is the single final closed "
        "form. Spark computes both rankings with the two-phase "
        "_global_rank — two parallel per-bucket window passes, never "
        "an entity-grain single-partition sort.",
)
def q_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus,
    # so mint a deterministic unique row id first (identical full rows
    # may swap rids — harmless, the (rq, rp) multiset is unchanged)
    base = _global_rank(
        li.select("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice"),
        "l_orderkey",
        [F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_quantity"),
         F.col("l_extendedprice")],
        rank_col="rid",
    ).select("rid", "l_quantity", "l_extendedprice").persist()
    rq = _global_rank(
        base, "l_quantity", [F.col("l_quantity"), F.col("rid")],
        rank_col="rq",
    ).select("rid", "rq")
    rp = _global_rank(
        base, "l_extendedprice", [F.col("l_extendedprice"), F.col("rid")],
        rank_col="rp",
    ).select("rid", "rp")
    joined = rq.join(rp, ["rid"])
    sums = joined.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr(
            "CAST(SUM(CAST(rq - rp AS DECIMAL(38,0))"
            " * CAST(rq - rp AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("sd2"),
    )
    return sums.select(
        F.col("n").alias("n_rows"),
        F.expr("CAST(sd2 AS BIGINT)").alias("sum_d2"),
        F.expr(
            "round(CAST(1 AS DOUBLE) - CAST(6 AS DOUBLE)"
            " * CAST(sd2 AS DOUBLE) / (CAST(n AS DOUBLE)"
            " * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
            " - CAST(1 AS DOUBLE))), 6)"
        ).alias("spearman_rho"),
    )
