"""Reusable relational operators the reference lacks (SURVEY.md §2B) built
as compositions of DataFrame primitives so Catalyst keeps full visibility
(predicate pushdown, join selection, AQE) — no RDDs, no collect().

Scale notes are attached per operator; everything here is shuffle-safe and
was designed for the 1000-executor / 100 TB posture first, then verified on
local[32].
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: str = "decimal(25,6)") -> Column:
    """Exact cross-engine sum of a money-ish double column.

    Doubles summed in different orders (Spark partial aggregation vs a
    single-threaded oracle) diverge in the last few ulps; casting to decimal
    first makes the sum order-independent and bit-comparable. The decimal
    fits in 64-bit unscaled form at this precision, so Tungsten keeps it in
    its fast path — negligible cost vs a double sum at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(scale)), 4).cast("double")


def dsum_sql(expr: str, scale: str = "DECIMAL(25,6)") -> str:
    """DuckDB twin of :func:`dsum`.

    The round(., 4) before the double cast is what makes the comparison
    exact: a high-scale decimal sum has an unscaled int128 value above
    2^53, and DuckDB's decimal->double conversion then double-rounds
    (int->double, then /10^scale) while Spark rounds once. Rounding to
    scale 4 first keeps the unscaled value under 2^53 at our magnitudes,
    making the conversion a single correctly-rounded division in both
    engines; the decimal round itself detects ties exactly and both
    engines round half away from zero. (A plain decimal downcast would
    NOT work: DuckDB truncates on scale reduction, Spark rounds.)
    """
    return f"CAST(round(sum(CAST({expr} AS {scale})), 4) AS DOUBLE)"


def davg(col: Column | str, scale: str = "decimal(25,6)") -> Column:
    """Exact-sum average: decimal sum divided by count, both deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(scale)), 4).cast("double") / F.count(c)


def davg_sql(expr: str, scale: str = "DECIMAL(25,6)") -> str:
    return f"CAST(round(sum(CAST({expr} AS {scale})), 4) AS DOUBLE) / count({expr})"


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via ``row_number`` over a window.

    Scale: one shuffle on the partition keys; Spark's WindowExec sorts
    within partitions only. For skewed groups the rank short-circuits
    (``WindowGroupLimit`` pushes k down into the sort since Spark 3.5), so
    a hot key costs O(n log k), not a full sort.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi join: explode the hot-key side into ``salt_buckets``
    copies of the (small) right side and scatter left rows across buckets,
    so one hot key spreads over N tasks instead of one straggler.

    AQE's skew-join splitting (enabled in SparkEngineConf) handles most
    skew automatically at runtime; explicit salting remains the tool when
    a single key exceeds what one task can hold even after AQE splits —
    the classic null-key / celebrity-key case at 100 TB.
    """
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(
        salted_right,
        (salted_left[on] == salted_right[on])
        & (salted_left["__salt"] == salted_right["__salt"]),
        how,
    )
    return (out.drop(salted_right[on])
            .drop(salted_left["__salt"]).drop(salted_right["__salt"]))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    tie_breaker: str | None = None,
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, ONE right row sharing the equi keys
    ``on``, picked by time.

    - ``backward`` (default): greatest ``right_time`` <= ``left_time``
      (pandas merge_asof semantics).
    - ``forward``: smallest ``right_time`` >= ``left_time``.
    - ``nearest``: minimum |right_time - left_time|; REQUIRES
      ``tolerance_s`` so the candidate band is bounded (an unbounded
      nearest join would make every right row per key a candidate — a
      per-key cross product at scale). Ties (equal distance either side)
      resolve to the earlier right row, then ``tie_breaker`` desc.
    ``tolerance_s`` optionally bounds backward/forward too (rows further
    than the tolerance get NULLs, and the join condition tightens — at
    100 TB a bounded band is also what lets a range-partitioned layout
    prune).

    Implementation: equi join with the range predicate, then ``row_number``
    per left row (``tie_breaker`` desc makes the pick deterministic when
    right_time ties). Catalyst plans the equi part as a regular
    (broadcast/sort-merge) join and pushes the range condition into the
    join, so this scales like any equi join — the window only sees each
    left row's candidate set.

    At extreme right-side cardinality per key, prefer bucketing both sides
    on ``on`` so the join is shuffle-free; the window reuses the join's
    partitioning (no second shuffle) because its partition keys include the
    join keys.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    if direction == "nearest" and tolerance_s is None:
        raise ValueError("nearest as-of requires tolerance_s (see docstring)")
    rt = F.col(f"__r.{right_time}")
    lt = F.col(f"__l.{left_time}")
    # Seconds with full sub-second precision: a double holds epoch
    # microseconds exactly (< 2^53). unix_timestamp() would truncate to
    # whole seconds and mis-pick 'nearest' / shift tolerance bands by up
    # to 1 s on sub-second timestamps.
    dist = rt.cast("double") - lt.cast("double")
    if direction == "backward":
        order = [rt.desc()]
        range_cond = [rt <= lt]
        if tolerance_s is not None:
            range_cond.append(-dist <= tolerance_s)
    elif direction == "forward":
        order = [rt.asc()]
        range_cond = [rt >= lt]
        if tolerance_s is not None:
            range_cond.append(dist <= tolerance_s)
    else:  # nearest
        order = [F.abs(dist).asc(), rt.asc()]
        range_cond = [F.abs(dist) <= tolerance_s]
    if tie_breaker:
        order.append(F.col(f"__r.{tie_breaker}").desc())
    # A synthetic unique id keeps the dedup window narrow (partition by one
    # long) regardless of the caller's schema.
    lid = left.alias("__l").withColumn("__lid", F.monotonically_increasing_id())
    r = right.alias("__r")
    cond = [lid[k] == r[k] for k in on] + range_cond
    joined = lid.join(r, cond, "left")
    w = Window.partitionBy("__lid").orderBy(*order)
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"__l.{c}") for c in left.columns],
            *[F.col(f"__r.{c}").alias(c) for c in right_cols],
        )
    )
    return out
