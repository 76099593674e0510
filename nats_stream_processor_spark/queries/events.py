"""Event-time queries over the ``events`` table: tumbling / sliding /
session windows, the reference's 20-second rate ticks (M3,
reference: src/service.py:174-253), and the as-of join.

These run identically in batch (here, oracle-checked) and on a streaming
DataFrame (streaming/pipeline.py reuses the same window expressions with a
watermark) — the idiomatic Structured Streaming design where one transform
serves both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import asof_join, dsum, dsum_sql
from ..registry import register, table


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, {dsum_sql('value', 'DECIMAL(18,2)')} AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("window-tumbling", "streaming-twin"),
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window. In streaming mode the same expression
    runs with ``withWatermark`` bounding state; window state is partitioned
    by (window, event_type) so it scales horizontally."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             dsum("value", "decimal(18,2)").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sliding_windows",
    oracle="""
    WITH b AS (
        SELECT *,
               date_trunc('hour', ts)
                 + CASE WHEN extract(minute FROM ts) >= 30
                        THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
                 AS slide0
        FROM events),
    exploded AS (
        SELECT unnest([slide0, slide0 - INTERVAL 30 MINUTE]) AS window_start,
               event_type
        FROM b)
    SELECT window_start, count(*) AS n_events
    FROM exploded GROUP BY 1 ORDER BY 1
    """,
    tags=("window-sliding", "streaming-twin"),
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): each event lands in 2
    windows. Spark expands rows by length/slide before the agg — shuffle
    volume scales with the overlap factor, which is why the slide should
    never be tiny relative to the length at 100 TB."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


@register(
    "events_session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 10 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events),
    numbered AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged)
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("window-session", "streaming-twin"),
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10 min gap) per user. The oracle reproduces Spark's
    merge semantics via gaps-and-islands: a session extends while the next
    event starts strictly inside [last_ts, last_ts + gap)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
        .orderBy("user_id", "session_start")
    )


@register(
    "rate_ticks_20s",
    oracle="""
    WITH ticks AS (
        SELECT date_trunc('minute', ts)
                 + (CAST(extract(second FROM ts) AS INT) // 20) * INTERVAL 20 SECOND
                 AS tick_start,
               count(*) AS n_processed
        FROM events GROUP BY 1)
    SELECT tick_start, n_processed,
           round(n_processed / 20.0, 6) AS rate_per_s,
           n_processed - lag(n_processed) OVER (ORDER BY tick_start) AS delta_vs_prev
    FROM ticks ORDER BY tick_start
    """,
    tags=("M3", "rate-agg"),
)
def q_rate_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 20-second stats tick (processed/s + delta vs previous
    tick, reference: src/service.py:174-253) as an event-time tumbling
    window — in streaming this is exactly `inputRowsPerSecond` from the
    StreamingQueryListener, exposed here as a queryable aggregate."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window
    w = Window.orderBy("tick_start")
    ticks = (
        ev.groupBy(F.window("ts", "20 seconds").alias("w"))
        .agg(F.count("*").alias("n_processed"))
        .select(F.col("w.start").alias("tick_start"), "n_processed")
    )
    return (
        ticks.select(
            "tick_start", "n_processed",
            F.round(F.col("n_processed") / 20.0, 6).alias("rate_per_s"),
            (F.col("n_processed") - F.lag("n_processed").over(w)).alias("delta_vs_prev"),
        )
        .orderBy("tick_start")
    )


@register(
    "asof_join_latest_order",
    oracle="""
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
           o_totalprice AS asof_totalprice
    FROM events LEFT JOIN orders
      ON o_custkey = user_id AND o_orderdate <= ts
    QUALIFY row_number() OVER (PARTITION BY event_id
                               ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    ORDER BY event_id
    """,
    tags=("join", "asof"),
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks the most recent order of the
    matching customer (operators/relational.py asof_join: equi+range join
    then per-left-row row_number)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id")
    out = asof_join(
        ev, o, on=["user_id"], left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"], tie_breaker="o_orderkey",
    )
    return (
        out.select(
            "event_id", "user_id",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_totalprice").alias("asof_totalprice"),
        )
        .orderBy("event_id")
    )


@register(
    "asof_join_next_order",
    oracle="""
    SELECT event_id, user_id, o_orderkey AS next_orderkey,
           o_totalprice AS next_totalprice
    FROM events LEFT JOIN orders
      ON o_custkey = user_id AND o_orderdate >= ts
    QUALIFY row_number() OVER (PARTITION BY event_id
                               ORDER BY o_orderdate ASC, o_orderkey DESC) = 1
    ORDER BY event_id
    """,
    tags=("join", "asof", "forward"),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each event picks the matching customer's next
    order at-or-after the event — the attribution-style lookup (what did
    this click lead to). Same equi+range join plus per-left-row
    row_number shape as the backward variant; only the range direction
    and pick order flip (operators/relational.py asof_join
    direction='forward'; 'nearest' with a mandatory tolerance band is
    the third variant, exercised in tests)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id")
    out = asof_join(
        ev, o, on=["user_id"], left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"], tie_breaker="o_orderkey",
        direction="forward",
    )
    return (
        out.select(
            "event_id", "user_id",
            F.col("o_orderkey").alias("next_orderkey"),
            F.col("o_totalprice").alias("next_totalprice"),
        )
        .orderBy("event_id")
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
    SELECT stage, n_users FROM (
        SELECT 'x1_view' AS stage, count(*) AS n_users FROM v
        UNION ALL SELECT 'x2_click', count(*) FROM c
        UNION ALL SELECT 'x3_purchase', count(*) FROM p)
    ORDER BY stage
    """,
    tags=("events", "funnel"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: a user counts for a stage only if the
    event happens strictly AFTER their first event of the previous stage
    (first view -> first subsequent click -> first subsequent purchase).
    Every shuffle is on user_id (stage filters cut rows before each join),
    so the funnel scales with active users, not event volume."""
    e = table(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (e.filter(F.col("event_type") == "click").join(v, "user_id")
         .filter(F.col("ts") > F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (e.filter(F.col("event_type") == "purchase").join(c, "user_id")
         .filter(F.col("ts") > F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    counts = (
        v.agg(F.count("*").alias("n_users")).select(F.lit("x1_view").alias("stage"), "n_users")
        .unionAll(c.agg(F.count("*").alias("n_users"))
                  .select(F.lit("x2_click").alias("stage"), "n_users"))
        .unionAll(p.agg(F.count("*").alias("n_users"))
                  .select(F.lit("x3_purchase").alias("stage"), "n_users"))
    )
    return counts.orderBy("stage")


@register(
    "events_retention_cohorts",
    oracle="""
    WITH cohort AS (
        SELECT user_id, date_trunc('week', min(ts)) AS w0
        FROM events WHERE event_type = 'signup' GROUP BY 1),
    activity AS (
        SELECT DISTINCT c.w0, e.user_id,
               CAST(floor(date_diff('day', CAST(c.w0 AS DATE),
                          CAST(date_trunc('week', e.ts) AS DATE)) / 7.0) AS INT)
                 AS weeks_since
        FROM events e JOIN cohort c ON c.user_id = e.user_id
        WHERE e.ts >= c.w0)
    SELECT CAST(w0 AS DATE) AS cohort_week, weeks_since,
           count(*) AS n_active_users
    FROM activity GROUP BY 1, 2 ORDER BY cohort_week, weeks_since
    """,
    tags=("events", "retention"),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by signup week, counted
    once per (cohort, weeks-since-signup) they were active in. Shuffles on
    user_id (cohort join + the distinct), then on the small cohort grid —
    the cohort matrix stays tiny no matter the event volume."""
    e = table(spark, sf_dir, "events")
    cohort = (e.filter(F.col("event_type") == "signup")
              .groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("w0")))
    activity = (
        e.join(cohort, "user_id")
        .filter(F.col("ts") >= F.col("w0"))
        .select(
            "w0", "user_id",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                           F.col("w0").cast("date")) / 7.0
            ).cast("int").alias("weeks_since"),
        )
        .distinct()
    )
    return (
        activity.groupBy(F.col("w0").cast("date").alias("cohort_week"),
                         "weeks_since")
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@register(
    "events_gap_fill",
    oracle="""
    WITH ev AS (SELECT date_trunc('hour', ts) AS h, event_type FROM events),
    b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
    grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             FROM b),
    t AS (SELECT DISTINCT event_type FROM ev),
    c AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2)
    SELECT t.event_type, grid.h AS hour_ts,
           COALESCE(c.n, 0) AS n_events
    FROM t CROSS JOIN grid
    LEFT JOIN c ON c.event_type = t.event_type AND c.h = grid.h
    ORDER BY 1, 2
    """,
    tags=("time-series", "gap-fill"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense (event_type x hour) grid over the
    corpus's hour span, zero-filled where no events occurred — the
    densification step dashboards and forecasting features need before
    window arithmetic (a lag() over a gappy series silently skips the
    empty hours).

    Scale shape: the grid is generated from ONE aggregated row
    (min/max hour -> sequence() -> explode), so its size is
    hours x types regardless of corpus size — it broadcasts to the
    hourly-count join, and the only full-corpus shuffle is the
    partial+final hourly count itself. No events row is ever exploded."""
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type")
    counts = ev.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    grid = (
        ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(F.explode(F.sequence(
            F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))).alias("h"))
    )
    types = ev.select("event_type").distinct()
    dense = types.crossJoin(F.broadcast(grid))
    return (
        dense.join(counts, ["event_type", "h"], "left_outer")
        .select("event_type", F.col("h").alias("hour_ts"),
                F.coalesce(F.col("n"), F.lit(0)).alias("n_events"))
        .orderBy("event_type", "hour_ts")
    )
