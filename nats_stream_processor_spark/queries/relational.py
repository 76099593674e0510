"""Relational surface (SURVEY.md §2B): scans, joins of every type, hash/sort
aggregation, rollup/cube/grouping sets, window functions, sorts/top-k, set
ops, scalar functions, pivot — all absent from the reference (no join-, agg-
or sort-like code anywhere in /root/reference/src except the metric counts,
SURVEY.md §2B) and expressed here as plain declarative DataFrame programs so
Catalyst supplies pushdown, pruning, join selection and AQE for free.

Cross-engine float discipline: money aggregates go through decimal casts
(operators/relational.py dsum/davg) so Spark's unordered partial aggregation
and DuckDB's single-threaded sums produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    topk_per_group,
)
from ..operators.similarity import round6_stable, round6_stable_sql
from ..registry import register, spread, table


# ------------------------------------------------------------------ scans


@register(
    "scan_filter_pushdown",
    oracle="""
    SELECT l_returnflag, count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 30
    GROUP BY 1 ORDER BY 1
    """,
    tags=("scan", "filter", "pushdown"),
)
def q_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection that must reach the parquet scan (PushedFilters
    shows both predicates; ReadSchema is 3 columns of 11)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                  & (F.col("l_quantity") > 30))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


# ------------------------------------------------------------ aggregation


@register(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql("CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))", 'DECIMAL(30,6)')} AS sum_disc_price,
           {dsum_sql("CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))", 'DECIMAL(32,6)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("agg", "partial-final", "tpch-q1"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial+final hash aggregate. Catalyst
    emits a map-side partial agg, one shuffle on the 2-key group, final agg —
    the exact plan you want at 100 TB (shuffle carries 6 rows/partition).

    The gated spread() sits between the scan and the partial aggregate:
    the decimal sum/avg arithmetic is the CPU-heavy per-row stage here,
    and the driver's single-row-group test files yield a one-task scan
    that would run it serially (measured 1.9 s -> 0.9 s at sf0.1, r15
    optimization round). The explicit 6-column projection keeps the
    round-robin exchange narrow (guide §2.3: project before the
    exchange); at real scale the scan has >= parallelism splits and
    spread() returns the input untouched — plan identity preserved."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        spread(li.filter(F.col("l_shipdate")
                         <= F.lit("2000-09-02").cast("timestamp"))
               .select("l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum((price * (F.lit(1) - disc)).cast("decimal(30,6)")), 4)
            .cast("double").alias("sum_disc_price"),
            F.round(F.sum((price * (F.lit(1) - disc) * (F.lit(1) + tax))
                          .cast("decimal(32,6)")), 4)
            .cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_distinct_per_segment",
    oracle=f"""
    SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
           count(*) AS n_customers, {dsum_sql('c_acctbal')} AS sum_acctbal
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    tags=("agg", "distinct"),
)
def q_distinct_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: Catalyst expands to a two-phase plan (distinct
    on (segment, nationkey) then final agg) — no driver-side work."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_suppkey) AS exact_supps,
           TRUE AS approx_parts_within_5pct,
           TRUE AS approx_supps_within_5pct
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    tags=("agg", "approx"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): constant memory per group vs
    the exact expand-and-dedup — the right tool at 100 TB. HLL sketch values
    are engine-specific, so the raw estimates can't be hash-compared; instead
    we emit the exact counts (oracle-checkable) plus a Spark-side assertion
    that the HLL estimate lands within 5% of exact — the oracle emits literal
    TRUE, so an out-of-tolerance sketch flips the boolean and fails the hash.

    Two-level form (r16, guide §2.3/§5): the single groupBy carrying two
    countDistinct columns planned as a 4x Expand of the scan (one replica
    per distinct class) feeding one hash aggregate — at sf0.1 that was the
    slowest registry sweep query (6 s), and repartitioning the expanded
    rows made it WORSE (r15 A/B: 17 s). Instead each column pre-distincts
    per group (partial map-side distinct, no Expand, gated spread() so the
    single-split local scan parallelizes), then counts the survivors;
    approx_count_distinct moves onto the pre-distinct rows, which is
    value-identical because HLL register updates are insertion-idempotent
    (duplicates touch the same register with the same value) and both
    forms ignore nulls — count(col) after distinct == countDistinct(col).
    The two 3-row group branches re-join null-safely (group sets are
    identical by construction; eqNullSafe keeps a NULL group if one ever
    appears, exactly as the single groupBy would)."""
    base = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", "l_suppkey")

    def per_col(col: str, exact: str, approx: str) -> DataFrame:
        return (
            spread(base.select("l_returnflag", col))
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count(col).alias(exact),
                 F.approx_count_distinct(col, 0.01).alias(approx))
        )

    p = per_col("l_partkey", "exact_parts", "approx_parts")
    s = per_col("l_suppkey", "exact_supps", "approx_supps")
    hll = (p.join(s.withColumnRenamed("l_returnflag", "rf_s"),
                  p["l_returnflag"].eqNullSafe(F.col("rf_s")))
           .drop("rf_s"))
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= F.lit(0.05)
    )
    return (
        hll.select(
            "l_returnflag",
            "exact_parts",
            "exact_supps",
            within("approx_parts", "exact_parts").alias("approx_parts_within_5pct"),
            within("approx_supps", "exact_supps").alias("approx_supps_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25), 6) AS p25,
           round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 6) AS p50,
           round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75), 6) AS p75,
           round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 6) AS p90,
           count(*) AS n_orders
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=("agg", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). At 100 TB prefer percentile_approx (GK sketch, bounded
    memory) — kept exact here for oracle comparability. Scalar columns (not
    an array) so the driver's pandas canonicalizer can sort the result."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("round(percentile(o_totalprice, 0.25D), 6)").alias("p25"),
            F.expr("round(percentile(o_totalprice, 0.5D), 6)").alias("p50"),
            F.expr("round(percentile(o_totalprice, 0.75D), 6)").alias("p75"),
            F.expr("round(percentile(o_totalprice, 0.9D), 6)").alias("p90"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_partkey, count(*) AS n_lineitems
    FROM lineitem GROUP BY 1 HAVING count(*) >= 45 ORDER BY 1
    """,
    tags=("agg", "having"),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n_lineitems"))
        .filter(F.col("n_lineitems") >= 45)
        .orderBy("l_partkey")
    )


# ------------------------------------------------------------------ joins


@register(
    "join_revenue_by_region",
    oracle="""
    SELECT r_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 4)
                AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "inner", "broadcast", "tpch-q5"),
)
def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join. nation/region (and customer at most SFs) are
    broadcast — the fact table never shuffles for the dims; the only real
    shuffle is lineitem⋈orders on orderkey, which AQE can also convert to
    broadcast when the filtered orders side is small."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"),
             F.count("*").alias("n_lineitems"))
        .orderBy("r_name")
    )


@register(
    "join_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql("CAST(l_extendedprice AS DECIMAL(18,2))"
                     " * (1 - CAST(l_discount AS DECIMAL(4,2)))",
                     'DECIMAL(30,6)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("join", "inner", "topk", "tpch-q3"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter -> 3-way join -> grouped
    revenue -> global top-10. Both date predicates and the segment filter
    push to the scans (PushedFilters); the filtered customer side is
    broadcast-eligible so the only real shuffle is lineitem x orders on
    orderkey; the final top-10 is TakeOrderedAndProject (per-partition
    heaps, no global sort). Ties broken by l_orderkey so the LIMIT
    boundary is deterministic cross-engine."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev.cast("decimal(30,6)")), 4)
             .cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey").limit(10)
    )


@register(
    "join_left_customer_orders",
    oracle=f"""
    SELECT c_mktsegment,
           count(DISTINCT c_custkey) AS n_customers,
           count(o_orderkey) AS n_orders,
           {dsum_sql('o_totalprice')} AS sum_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "left-outer"),
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("sum_totalprice"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_semi_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("join", "left-semi"),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: EXISTS without materializing the right side —
    shuffle carries only the distinct keys of the filtered orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_customers_no_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join", "left-anti"),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer_nation_counts",
    oracle="""
    WITH cc AS (SELECT c_nationkey AS k, count(*) AS n_customers
                FROM customer GROUP BY 1),
         sc AS (SELECT s_nationkey AS k, count(*) AS n_suppliers
                FROM supplier GROUP BY 1)
    SELECT coalesce(cc.k, sc.k) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM cc FULL OUTER JOIN sc ON cc.k = sc.k
    ORDER BY 1
    """,
    tags=("join", "full-outer"),
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = (table(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("k"))
          .agg(F.count("*").alias("n_customers")))
    sc = (table(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("k"))
          .agg(F.count("*").alias("n_suppliers")))
    return (
        cc.join(sc, cc.k == sc.k, "full_outer")
        .select(
            F.coalesce(cc.k, sc.k).alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_range_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
        ('p0_500', 0.0, 500.0), ('p500_1000', 500.0, 1000.0),
        ('p1000_1500', 1000.0, 1500.0), ('p1500_2000', 1500.0, 2000.0),
        ('p2000_plus', 2000.0, 1e12))
    SELECT band, count(p_partkey) AS n_parts,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_retail
    FROM bands LEFT JOIN part ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band ORDER BY band
    """,
    tags=("join", "range", "theta", "broadcast-nested-loop"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi (theta) join against a tiny inline dimension — planned
    as BroadcastNestedLoopJoin, the right physical choice when one side is a
    handful of rows; the big side streams through without a shuffle."""
    bands = spark.createDataFrame(
        [("p0_500", 0.0, 500.0), ("p500_1000", 500.0, 1000.0),
         ("p1000_1500", 1000.0, 1500.0), ("p1500_2000", 1500.0, 2000.0),
         ("p2000_plus", 2000.0, 1e12)],
        "band string, lo double, hi double",
    )
    p = table(spark, sf_dir, "part")
    return (
        F.broadcast(bands)
        .join(p, (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi), "left")
        .groupBy("band")
        .agg(F.count("p_partkey").alias("n_parts"),
             dsum("p_retailprice", "decimal(18,2)").alias("sum_retail"))
        .orderBy("band")
    )


# ---------------------------------------------------------------- windows


@register(
    "window_topk_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey)
    WHERE rn <= 3 ORDER BY c_mktsegment, rn
    """,
    tags=("window", "rank", "topk-per-group"),
)
def q_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: WindowGroupLimit pushes k into the sort, so hot
    groups cost O(n log k) instead of a full per-group sort."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice")
    return (
        topk_per_group(
            joined, ["c_mktsegment"],
            [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_revenue
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "running-agg", "frame"),
)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").alias("running_revenue"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_daily_orders",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_day, count(*) AS n_orders
        FROM orders GROUP BY 1)
    SELECT order_day, n_orders,
           n_orders - lag(n_orders) OVER (ORDER BY order_day) AS delta_vs_prev,
           lead(n_orders) OVER (ORDER BY order_day) AS next_day_orders
    FROM daily ORDER BY order_day
    """,
    tags=("window", "lag", "lead"),
)
def q_lag_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over an un-partitioned window: fine after the heavy agg has
    collapsed cardinality to ~days; never put an un-partitioned window over
    raw fact rows (single-task sort)."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("order_day"))
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.orderBy("order_day")
    return (
        daily.select(
            "order_day", "n_orders",
            (F.col("n_orders") - F.lag("n_orders").over(w)).alias("delta_vs_prev"),
            F.lead("n_orders").over(w).alias("next_day_orders"),
        )
        .orderBy("order_day")
    )


# ---------------------------------------------- rollup / cube / grouping


@register(
    "rollup_region_nation",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name) ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("rollup",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@register(
    "cube_returnflag_linestatus",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("cube",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "grouping_sets_priority_status",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=("grouping-sets", "sql-api"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the SQL entry point (spark.sql over a temp view) alongside
    the DataFrame API used elsewhere."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
    """)


# ------------------------------------------------------- sort / limit


@register(
    "sort_global_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("sort", "limit", "topk"),
)
def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject: each task keeps a
    k-heap, the driver merges k*tasks rows — no global sort at any scale."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ------------------------------------------------------------- set ops


@register(
    "set_ops_customer_years",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1995),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1996)
    SELECT 'both' AS tag, count(*) AS n FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
    UNION ALL
    SELECT 'either' AS tag, count(*) AS n FROM (SELECT * FROM y95 UNION SELECT * FROM y96)
    UNION ALL
    SELECT 'only_1995' AS tag, count(*) AS n FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
    ORDER BY tag
    """,
    tags=("set-ops", "union", "intersect", "except"),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    counts = [
        y95.intersect(y96).agg(F.lit("both").alias("tag"), F.count("*").alias("n")),
        y95.union(y96).distinct().agg(F.lit("either").alias("tag"), F.count("*").alias("n")),
        y95.exceptAll(y96).agg(F.lit("only_1995").alias("tag"), F.count("*").alias("n")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("tag")


# ------------------------------------------------------ scalar functions


@register(
    "string_funcs_parts",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 8) AS name_prefix,
           replace(p_type, ' ', '_') AS type_snake,
           concat_ws('|', p_brand, p_type) AS brand_type,
           len(regexp_extract_all(lower(p_name), '[a-z0-9]+')) AS n_name_tokens
    FROM part ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.size(F.regexp_extract_all(F.lower("p_name"), F.lit("[a-z0-9]+"), 0))
            .alias("n_name_tokens"),
        )
        .orderBy("p_partkey")
    )


@register(
    "date_funcs_orders",
    oracle="""
    SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
           count(*) AS n_orders,
           min(CAST(o_orderdate AS DATE)) AS first_day,
           max(last_day(CAST(o_orderdate AS DATE))) AS month_end,
           min(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)))
             AS min_days_since_epoch
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("scalar", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min(d).alias("first_day"),
            F.max(F.last_day(d)).alias("month_end"),
            F.min(F.datediff(d, F.lit("1995-01-01").cast("date")))
            .alias("min_days_since_epoch"),
        )
        .orderBy("order_year", "order_month")
    )


@register(
    "math_null_funcs",
    oracle=f"""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid' ELSE 'high' END AS bal_bucket,
           count(*) AS n_customers,
           round(sqrt(CAST(count(*) AS DOUBLE)), 6) AS sqrt_count,
           {dsum_sql('abs(c_acctbal)', 'DECIMAL(18,2)')} AS sum_abs_bal,
           CAST(min(floor(c_acctbal)) AS BIGINT) AS min_floor,
           CAST(max(ceil(c_acctbal)) AS BIGINT) AS max_ceil,
           count(nullif(c_mktsegment, 'BUILDING')) AS n_not_building
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    tags=("scalar", "math", "case-when", "null"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        c.groupBy(bucket.alias("bal_bucket"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sqrt(F.count("*").cast("double")), 6).alias("sqrt_count"),
            dsum(F.abs(F.col("c_acctbal")), "decimal(18,2)").alias("sum_abs_bal"),
            F.min(F.floor("c_acctbal")).cast("long").alias("min_floor"),
            F.max(F.ceil("c_acctbal")).cast("long").alias("max_ceil"),
            F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")))
            .alias("n_not_building"),
        )
        .orderBy("bal_bucket")
    )


@register(
    "pivot_event_type_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'error') AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'view') AS view
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("pivot",),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — avoids the extra distinct-values
    job Spark otherwise runs, which matters when the fact table is 100 TB."""
    ev = table(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    cols = [F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ["click", "error", "purchase", "signup", "view"]]
    return piv.select("user_id", *cols).orderBy("user_id")


@register(
    "unpivot_pricing_metrics",
    oracle="""
    WITH a AS (
        SELECT l_returnflag,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 4) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 4) AS DOUBLE) AS sum_price,
               CAST(round(sum(CAST(l_discount AS DECIMAL(25,6))), 4) AS DOUBLE) AS sum_disc
        FROM lineitem GROUP BY 1)
    SELECT l_returnflag, metric, value
    FROM (UNPIVOT a ON sum_qty, sum_price, sum_disc
          INTO NAME metric VALUE value)
    ORDER BY l_returnflag, metric
    """,
    tags=("unpivot",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-flag aggregates -> long (metric, value)
    rows via the native `DataFrame.unpivot` (Spark's Expand node — one
    pass, no join). The aggregate runs first, so the unpivot touches only
    the tiny grouped result, never the fact table."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return (
        agg.unpivot(["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"],
                    "metric", "value")
        .orderBy("l_returnflag", "metric")
    )


@register(
    "json_extract_events",
    oracle=f"""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           {round6_stable_sql(
               "avg(CAST(json_extract_string(props, '$.k') AS INT))")} AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object on a raw JSON string column (the events.props
    payload) — the schema-on-read path the reference applies to every
    message (F2), here as a relational projection."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("bigint").alias("sum_k"),
            round6_stable(F.avg(k)).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "join_right_orders_customer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2 ORDER BY 1
    """,
    tags=("join", "right-outer"),
)
def q_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, rnk LIMIT 400
    """,
    tags=("window", "rank", "dense_rank", "ntile"),
)
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over one shared window definition."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority", "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderpriority", "rnk")
        .limit(400)
    )


@register(
    "array_map_functions",
    oracle="""
    WITH t AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_unique,
           list_sort(list_distinct(toks))[1] AS first_token,
           list_contains(toks, 'spark') AS has_spark,
           array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), '|')
             AS first3,
           CAST(map(['n', 'u'], [len(toks), len(list_distinct(toks))])['u'][1]
                AS BIGINT) AS map_lookup
    FROM t ORDER BY doc_id
    """,
    tags=("scalar", "array", "map"),
)
def q_array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + map scalar functions over the token list (size, distinct,
    sort, contains, slice, map construction/lookup) — all JVM-side."""
    d = table(spark, sf_dir, "documents")
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    return (
        d.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_unique"),
            F.element_at(F.array_sort(F.array_distinct("toks")), 1)
            .alias("first_token"),
            F.array_contains("toks", "spark").alias("has_spark"),
            F.array_join(F.slice(F.array_sort(F.array_distinct("toks")), 1, 3), "|")
            .alias("first3"),
            F.element_at(
                F.create_map(F.lit("n"), F.size("toks").cast("long"),
                             F.lit("u"), F.size(F.array_distinct("toks")).cast("long")),
                F.lit("u"),
            ).alias("map_lookup"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_extract_coalesce",
    oracle="""
    SELECT doc_id,
           coalesce(nullif(trim(text), ''), source, '') AS extracted,
           CASE WHEN length(trim(coalesce(text, ''))) > 0 THEN 'text'
                WHEN source IS NOT NULL THEN 'source' ELSE 'none' END
             AS extracted_from
    FROM documents ORDER BY doc_id
    """,
    tags=("P1", "coalesce"),
)
def q_text_extract_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1's fallback-chain shape as an oracle-checked query (the real 5-way
    chain over uri/record.text/content/body/message runs in the golden
    tests — documents only carries text+source, so the chain is 2-deep
    here; semantics identical: first non-empty wins)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.coalesce(F.nullif(F.trim("text"), F.lit("")), F.col("source"),
                       F.lit("")).alias("extracted"),
            F.when(F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0,
                   "text")
            .when(F.col("source").isNotNull(), "source")
            .otherwise("none").alias("extracted_from"),
        )
        .orderBy("doc_id")
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT r_name AS region,
           count(*) AS n_nations,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    tags=("agg", "collect"),
)
def q_agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): nations per region
    as a sorted CSV. collect_list's arrival order is partition-dependent,
    so the deterministic form is collect_list -> array_sort -> concat_ws —
    the sort happens per GROUP (bounded by group size), not globally.
    Broadcast the 5-row region dim; one shuffle on the group key."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count("*").alias("n_nations"),
             F.concat_ws(",", F.array_sort(F.collect_list("n_name")))
              .alias("nations_csv"))
        .orderBy("region")
    )


@register(
    "agg_filtered_counts",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           round6_placeholder AS big_share
    FROM orders GROUP BY 1 ORDER BY 1
    """.replace(
        "round6_placeholder",
        "(CAST(floor((count(*) FILTER (WHERE o_totalprice > 150000)"
        " / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6)"),
    tags=("agg", "filtered"),
)
def q_agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (the SQL FILTER clause / count_if family):
    conditional counts inside one grouped pass — one scan, one shuffle,
    no self-joins for per-predicate tallies. Spark expresses the same
    thing as count_if / sum(CASE); both compile to a single
    partial+final hash aggregate."""
    o = table(spark, sf_dir, "orders")
    n_big = F.count(F.when(F.col("o_totalprice") > 150000, 1))
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             n_big.alias("n_big"),
             F.count(F.when(F.col("o_orderstatus") == "F", 1))
              .alias("n_finished"),
             round6_stable(n_big / F.count("*").cast("double"))
              .alias("big_share"))
        .orderBy("o_orderpriority")
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey), 6)
             AS pr6,
           round(cume_dist() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey), 6)
             AS cd6
    FROM customer ORDER BY c_mktsegment, c_custkey
    """,
    tags=("window", "percent-rank"),
)
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist — the distribution-position window
    functions (completes the ranking-family coverage next to
    rank/dense_rank/ntile/row_number). The (rank-1)/(n-1) and
    rank/n ratios are exact int divisions rounded identically in both
    engines; the c_custkey tiebreak makes positions deterministic.
    Partitioned by segment — bounded per-group sort, no global window."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_custkey", "c_mktsegment",
                 F.round(F.percent_rank().over(w), 6).alias("pr6"),
                 F.round(F.cume_dist().over(w), 6).alias("cd6"))
        .orderBy("c_mktsegment", "c_custkey")
    )


@register(
    "window_first_last_value",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           first_value(c_name) OVER w AS poorest,
           last_value(c_name) OVER w AS richest,
           nth_value(c_name, 2) OVER w AS second_poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("window", "first-last"),
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit unbounded
    frame — the navigation window functions (who is at each end of the
    partition, visible from every row). The UNBOUNDED FOLLOWING frame
    matters: with the default frame last_value degenerates to the
    current row, the classic window-function trap. Deterministic via
    the (c_acctbal, c_custkey) total order."""
    c = table(spark, sf_dir, "customer")
    w = (Window.partitionBy("c_mktsegment")
         .orderBy("c_acctbal", "c_custkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (
        c.select("c_custkey", "c_mktsegment",
                 F.first("c_name").over(w).alias("poorest"),
                 F.last("c_name").over(w).alias("richest"),
                 F.nth_value("c_name", 2).over(w).alias("second_poorest"))
        .orderBy("c_mktsegment", "c_custkey")
    )
