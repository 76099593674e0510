"""Advanced execution surface: Arrow-batched Python operators
(applyInPandas grouped-map, grouped-agg pandas UDF, Python UDTF) — the
escape hatches for semantics the built-in operators can't express
(SURVEY.md §2B "UDF/UDAF/UDTF surface"), used here on oracle-checkable
computations so the driver verifies the full plumbing.

Scale discipline: each of these runs Python, so they are the SLOW path by
construction — the rule is built-ins first (everything in
queries/relational.py), Arrow-batched Python only when semantics require
it, never row-at-a-time UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..operators.similarity import round6_stable, round6_stable_sql
from ..registry import register, table

Z_SCHEMA = "c_custkey long, c_mktsegment string, zscore double"


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    bal = pdf["c_acctbal"]
    mu = bal.mean()
    sd = bal.std(ddof=1)  # sample stddev == stddev_samp
    return pd.DataFrame({
        "c_custkey": pdf["c_custkey"],
        "c_mktsegment": pdf["c_mktsegment"],
        "zscore": ((bal - mu) / sd).round(6),
    })


@register(
    "grouped_map_zscore",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment),
                 6) AS zscore
    FROM customer ORDER BY c_custkey
    """,
    tags=("applyInPandas", "grouped-map"),
)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-segment z-score normalization. One
    shuffle on the group key; each group materializes as ONE pandas frame —
    at 100 TB that means the group key must bound group size (here 5
    segments is fine because customer is the small table; for fact-table
    normalization use window functions instead, which stream)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment").applyInPandas(_zscore, Z_SCHEMA)
        .orderBy("c_custkey")
    )


def _weighted_avg_udf():
    # built lazily: the pandas_udf decorator resolves its return type via
    # the active SparkSession, which doesn't exist at import time
    @pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        # grouped-agg pandas UDF: Arrow hands each group's columns as Series.
        # Exact integer accumulation (prices are 2-dp money, quantities are
        # integer-valued) so the result is independent of partition/row
        # order — a plain float sum flips the 6th decimal across runs.
        cents = price.mul(100).round().astype("int64")
        q = qty.round().astype("int64")
        return float(int((cents * q).sum()) / (100.0 * int(q.sum())))

    return weighted_avg_price


@register(
    "grouped_agg_weighted_avg",
    oracle=f"""
    SELECT l_returnflag,
           {round6_stable_sql(
               'CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)'
               ' * CAST(round(l_quantity) AS BIGINT)) AS BIGINT)'
               ' / (100.0 * CAST(sum(CAST(round(l_quantity) AS BIGINT))'
               ' AS BIGINT))')} AS wavg_price
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    tags=("pandas-udf", "grouped-agg"),
)
def q_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (quantity-weighted mean price).
    Unlike built-in aggs there is no partial aggregation — every group's
    rows ship to one worker — so reserve this for aggregations that are
    genuinely not expressible as built-in combinations."""
    li = table(spark, sf_dir, "lineitem")
    wavg = _weighted_avg_udf()
    return (
        li.groupBy("l_returnflag")
        .agg(round6_stable(wavg("l_extendedprice", "l_quantity"))
             .alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@register(
    "udtf_tokenize",
    oracle="""
    WITH t AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                 AS token,
               generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1)
                 AS pos
        FROM documents WHERE doc_id < 20)
    SELECT doc_id, CAST(pos AS INT) AS pos, token FROM t
    ORDER BY doc_id, pos
    """,
    tags=("udtf",),
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row -> N (pos, token) rows,
    joined laterally. The UDTF registration/lateral-join plumbing is the
    deliverable; the tokenizer keeps it oracle-checkable."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(re.findall(r"[a-z0-9]+", (text or "").lower())):
                yield i + 1, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20) \
        .createOrReplaceTempView("docs_udtf")
    return spark.sql("""
        SELECT doc_id, t.pos, t.token
        FROM docs_udtf, LATERAL tokenize_udtf(text) t
        ORDER BY doc_id, pos
    """)


@register(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    ORDER BY c_custkey
    """,
    tags=("subquery", "scalar"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the global average balance.
    Catalyst evaluates the subquery once and broadcasts the scalar."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql("""
        SELECT c_custkey, c_acctbal FROM customer_sq
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_sq)
        ORDER BY c_custkey
    """)


@register(
    "correlated_subquery_max_order",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE 3 <= (SELECT count(*) FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    ORDER BY c_custkey
    """,
    tags=("subquery", "correlated"),
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery — Catalyst decorrelates it into an aggregate +
    join (no per-row re-execution, unlike the naive nested-loop reading)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_cs")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql("""
        SELECT c_custkey, c_name FROM customer_cs
        WHERE 3 <= (SELECT count(*) FROM orders_cs
                    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        ORDER BY c_custkey
    """)


@register(
    "window_range_frame",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        FROM orders GROUP BY 1)
    SELECT d, n,
           CAST(sum(n) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n_trailing_7d
    FROM daily ORDER BY d
    """,
    tags=("window", "range-frame"),
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: trailing-7-day order count. The frame
    is value-based (days), not row-based — gaps in the calendar are handled
    correctly."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rf")
    return spark.sql("""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
            FROM orders_rf GROUP BY 1)
        SELECT d, n,
               sum(n) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAYS PRECEDING
                            AND CURRENT ROW) AS n_trailing_7d
        FROM daily ORDER BY d
    """)
