"""Round-9 operators beyond the graph-ANN family (llm_ext7).

Certification status (the honest-labeling house rule):

- ``media_shot_curation`` — formal driver row round 9.
- ``events_cohort_retention`` / ``events_props_variant`` /
  ``layout_zorder_report`` / ``agg_hll_sketch_union`` /
  ``quality_expectations_report`` / ``join_interval_overlap_binned``
  (late round 9) — landed AFTER the r9 window was allocated and sat
  honestly BEHIND it; all six are INSIDE the r10 window (the rotation
  the r9 verdict pre-allocated, led by llm_ext7's graph_beam_sweep /
  graph_knn_insert). join_interval_overlap_binned additionally had its
  burst-side sessionization de-skewed in round 10 (chunked
  gaps-and-islands, output-identical), so its formal row certifies the
  new code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# Registry import FIRST among intra-package imports (worker re-import
# ordering; see llm_ext2.py's header note).
from ..registry import REGISTRY, register, spread, table

from ..functions.text import tokens_col, tokens_sql
from .llm_ext6 import (
    SCENE_FRAMES,
    SCENE_THRESH,
    scene_byte_terms_sql,
    scene_frame_features,
)

# ------------------------------------------- shot-level video curation

# media_scene_cuts reports per-VIDEO shot statistics; a video training
# pipeline curates per SHOT — each video contributes a VARIABLE number
# of candidate clips, and each clip is kept or dropped on its own
# visual features joined with its parent document's text quality (the
# cross-modal rollup curation_quality_by_cluster does for text
# clusters, done at the shot grain). This operator emits one row per
# shot: frame count, mean visual feature, intra-shot motion (summed
# frame delta), the parent doc's token count, and the keep decision —
# a shot survives when it is long enough to train on (>= SHOT_MIN_
# FRAMES), visually non-blank (feat_mean >= SHOT_MIN_FEAT: near-zero
# byte-sample means are black/padding frames in the stub-decode
# contract), and its caption/transcript side is substantial enough to
# pair with (doc_tokens >= SHOT_MIN_DOC_TOKENS). Thresholds sit at
# interior quantiles of the fixture distributions (feat_mean p25~596,
# doc-tokens median~56 at sf0.01) so the decision genuinely splits.
SHOT_MIN_FRAMES = 2       # shots must span >= 2 sampled frames
SHOT_MIN_FEAT = 400       # mean byte-sample feature: blank-shot cull
SHOT_MIN_DOC_TOKENS = 40  # text-side quality gate

SHOT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("feat", LongType()),
    StructField("doc_tokens", LongType()),
])


def _shot_feats(batches):
    import pandas as pd

    for pdf in batches:
        rows = []
        for did, p, nt in zip(pdf["doc_id"], pdf["payload"],
                              pdf["doc_tokens"]):
            for j, f in scene_frame_features(bytes(p)):
                rows.append((did, j, f, nt))
        yield pd.DataFrame(
            rows, columns=[f.name for f in SHOT_SCHEMA.fields])


@register(
    "media_shot_curation",
    oracle=None,  # set below
    tags=("llm", "multimodal", "video", "curation"),
)
def q_media_shot_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-level curation: the scene-cut sampler's frames sessionized
    into shots (the media_scene_cuts machinery, same constants), then
    one row PER SHOT — variable-length per-doc output — with frame
    count, truncating-mean visual feature, summed intra-shot delta,
    the parent document's token count, and the keep flag combining the
    visual and text-quality gates. The clip-selection table a video
    training pipeline reads.

    Scale shape: ONE scan of documents — the token count is computed
    in the same projection that derives the payload, rides the frame
    sampler as an int64, and never needs a join back to text; payloads
    die inside the mapInPandas sampler (id + three ints come out). One
    hash(doc_id) exchange serves the lag window, the shot
    sessionization, and the per-shot aggregate; frame count per doc is
    a constant, so per-shot state is bounded. Everything after the
    sampler is exact int64, so the keep decision can never flip
    cross-engine."""
    from ..operators.multimodal import with_payload

    d = with_payload(spread(table(spark, sf_dir, "documents")))
    src = d.select(
        "doc_id", "payload",
        F.size(tokens_col(F.col("text"))).cast("long").alias("doc_tokens"))
    fr = src.mapInPandas(_shot_feats, SHOT_SCHEMA)
    wlag = Window.partitionBy("doc_id").orderBy("frame_idx")
    delta = (fr.select(
        "doc_id", "frame_idx", "feat", "doc_tokens",
        F.abs(F.col("feat") - F.lag("feat").over(wlag)).alias("ad"))
        .select("doc_id", "frame_idx", "feat", "doc_tokens",
                F.coalesce("ad", F.lit(0)).cast("long").alias("ad"))
        .withColumn("cut", (F.col("ad") >= SCENE_THRESH).cast("int")))
    shots = delta.withColumn(
        "shot_idx", F.sum("cut").over(
            wlag.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"))
    per_shot = (shots.groupBy("doc_id", "shot_idx")
                .agg(F.count("*").cast("bigint").alias("n_frames"),
                     F.expr("cast(sum(feat) div count(*) as bigint)")
                     .alias("feat_mean"),
                     F.sum("ad").cast("bigint").alias("shot_delta"),
                     F.max("doc_tokens").cast("bigint")
                     .alias("doc_tokens")))
    keep = ((F.col("n_frames") >= SHOT_MIN_FRAMES)
            & (F.col("feat_mean") >= SHOT_MIN_FEAT)
            & (F.col("doc_tokens") >= SHOT_MIN_DOC_TOKENS))
    return (per_shot
            .select("doc_id", "shot_idx", "n_frames", "feat_mean",
                    "shot_delta", "doc_tokens",
                    keep.cast("int").alias("keep"))
            .orderBy("doc_id", "shot_idx"))


def _shot_curation_oracle() -> str:
    byte_terms = scene_byte_terms_sql()
    return f"""
    WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
                      octet_length(encode(text)) AS n,
                      CAST(len({tokens_sql('text')}) AS BIGINT)
                          AS doc_tokens
               FROM documents),
    fr AS (SELECT doc_id, j AS frame_idx, ({byte_terms}) AS feat,
                  doc_tokens
           FROM (SELECT doc_id, hx, n, doc_tokens,
                        unnest(range(0, {SCENE_FRAMES})) AS j,
                        (unnest(range(0, {SCENE_FRAMES})) * n)
                            // {SCENE_FRAMES} AS off
                 FROM p)),
    delta AS (SELECT doc_id, frame_idx, feat, doc_tokens,
                     CAST(coalesce(abs(feat - lag(feat) OVER
                          (PARTITION BY doc_id ORDER BY frame_idx)), 0)
                          AS BIGINT) AS ad
              FROM fr),
    cuts AS (SELECT *, CASE WHEN ad >= {SCENE_THRESH} THEN 1 ELSE 0 END
                           AS cut
             FROM delta),
    shots AS (SELECT doc_id, feat, doc_tokens, ad,
                     CAST(sum(cut) OVER (PARTITION BY doc_id
                                         ORDER BY frame_idx
                                         ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS shot_idx
              FROM cuts),
    per_shot AS (SELECT doc_id, shot_idx,
                        CAST(count(*) AS BIGINT) AS n_frames,
                        CAST(sum(feat) // count(*) AS BIGINT) AS feat_mean,
                        CAST(sum(ad) AS BIGINT) AS shot_delta,
                        CAST(max(doc_tokens) AS BIGINT) AS doc_tokens
                 FROM shots GROUP BY 1, 2)
    SELECT doc_id, shot_idx, n_frames, feat_mean, shot_delta, doc_tokens,
           CAST(CASE WHEN n_frames >= {SHOT_MIN_FRAMES}
                      AND feat_mean >= {SHOT_MIN_FEAT}
                      AND doc_tokens >= {SHOT_MIN_DOC_TOKENS}
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM per_shot
    ORDER BY doc_id, shot_idx
    """


REGISTRY["media_shot_curation"].oracle = _shot_curation_oracle()


# ----------------------------------------------- cohort retention

# The classic product-analytics table the events family was missing:
# users cohorted by first-activity week, and for each (cohort week,
# week offset) the fraction of the cohort still active. Weeks are
# exact integer arithmetic — days since the corpus epoch, truncating
# div 7 — so both engines band identically; retention is integer ppm.
COHORT_EPOCH = "2024-01-01"  # driver events start here (TESTDATA.md)


@register(
    "events_cohort_retention",
    oracle=f"""
    WITH w AS (SELECT user_id,
                      CAST(date_diff('day', DATE '{COHORT_EPOCH}',
                                     CAST(ts AS DATE)) // 7 AS BIGINT)
                          AS week
               FROM events),
    uw AS (SELECT DISTINCT user_id, week FROM w),
    cohort AS (SELECT user_id, min(week) AS cohort_week
               FROM uw GROUP BY 1),
    sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
              FROM cohort GROUP BY 1),
    act AS (SELECT c.cohort_week,
                   CAST(u.week - c.cohort_week AS BIGINT) AS week_offset,
                   CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_active
            FROM uw u JOIN cohort c ON c.user_id = u.user_id
            GROUP BY 1, 2)
    SELECT a.cohort_week, a.week_offset, s.n_cohort, a.n_active,
           CAST(a.n_active * 1000000 // s.n_cohort AS BIGINT)
               AS retention_ppm
    FROM act a JOIN sizes s ON s.cohort_week = a.cohort_week
    ORDER BY a.cohort_week, a.week_offset
    """,
    tags=("events", "cohort", "retention"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: cohort = a user's first active
    week; one row per (cohort_week, week_offset) with the cohort size,
    active-user count, and retention in integer ppm — the
    product-analytics rollup next to DAU/WAU, RFM, and
    time-to-convert.

    Scale shape: one events scan -> distinct (user, week) (the only
    event-volume shuffle, keyed on user_id x week); the cohort
    assignment is a user-keyed aggregate joined back user-keyed; the
    final matrix and the cohort sizes are both tiny (weeks x weeks
    rows), with the sizes side broadcastable."""
    ev = table(spark, sf_dir, "events")
    uw = (ev.select("user_id",
                    F.expr(f"datediff(to_date(ts), '{COHORT_EPOCH}')"
                           f" div 7").cast("bigint").alias("week"))
          .distinct())
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = (cohort.groupBy("cohort_week")
             .agg(F.count("*").cast("bigint").alias("n_cohort")))
    act = (uw.join(cohort, "user_id")
           .groupBy("cohort_week",
                    (F.col("week") - F.col("cohort_week"))
                    .cast("bigint").alias("week_offset"))
           .agg(F.count_distinct("user_id").cast("bigint")
                .alias("n_active")))
    return (act.join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week", "week_offset", "n_cohort", "n_active",
                    F.expr("cast(n_active * 1000000 div n_cohort"
                           " as bigint)").alias("retention_ppm"))
            .orderBy("cohort_week", "week_offset"))


# ------------------------------------- VARIANT semi-structured path

# Spark 4's VARIANT type is the modern schema-on-read path for the
# events.props JSON payload: parse once into the binary variant
# encoding, then typed path extraction (variant_get) — at scale this
# replaces per-expression JSON string re-parsing (get_json_object
# re-tokenizes the string for EVERY path it appears in) with one parse
# feeding any number of typed reads. json_extract_events covers the
# string path; this covers the variant path with a distinct rollup.
@register(
    "events_props_variant",
    oracle="""
    WITH k AS (SELECT event_type,
                      CAST(json_extract_string(props, '$.k') AS BIGINT)
                          AS k
               FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_even_k
    FROM k GROUP BY 1 ORDER BY 1
    """,
    tags=("scalar", "json", "variant"),
)
def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed path extraction through Spark 4's VARIANT type:
    parse_json(props) once per row, variant_get('$.k', 'bigint') for
    the typed read, then a per-event-type rollup (count, distinct,
    min/max, even-value tally). The oracle reads the same paths with
    DuckDB's JSON extraction — identical int64 values, so the variant
    encoding round-trip is value-checked end to end.

    Scale shape: parse + extraction are map-side expressions feeding
    one partial+final hash aggregate on event_type; the JSON string is
    parsed ONCE regardless of how many paths are read (the reason
    variant exists)."""
    ev = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.count_distinct("k").cast("bigint")
                 .alias("n_distinct_k"),
                 F.min("k").cast("bigint").alias("min_k"),
                 F.max("k").cast("bigint").alias("max_k"),
                 F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
                 .cast("bigint").alias("n_even_k"))
            .orderBy("event_type"))


# --------------------------------------- Z-order data-layout report

# Data-layout optimization is a first-class 100 TB concern: min/max
# file statistics only prune scans when the write LAYOUT clusters the
# filter columns. Linear (single-column) clustering gives perfect
# pruning on that column and none on any other; Z-ORDER interleaves
# the bits of two columns so each file covers a bounded rectangle in
# both — the layout Delta/Iceberg OPTIMIZE ZORDER implements. This
# report quantifies that trade on the lineitem (l_partkey, l_suppkey)
# pair: quantize both columns to 16-bit grids, assign rows to ZL_FILES
# value-range "files" under each layout, then probe ZL_PROBES pinned
# point lookups per dimension against the per-file min/max stats and
# count how many files each probe fails to skip. Everything is exact
# integer arithmetic shared by both engines.
ZL_FILES = 64    # value-range buckets standing in for written files
ZL_BITS = 16     # per-dimension quantization width
ZL_PROBES = 8    # pinned range probes per dimension
ZL_PROBE_W = (1 << ZL_BITS) // ZL_FILES  # probe width = one file span


def _interleave_expr(x: str, y: str, shift_fn) -> str:
    """z = bit-interleave of two ZL_BITS-wide ints (x even bits, y odd
    bits), as left-associated adds of single-bit shifts. shift_fn
    renders one engine's shift: shift_fn(expr, i, left?)."""
    terms = []
    for i in range(ZL_BITS):
        terms.append(shift_fn(f"({shift_fn(x, i, False)} & 1)",
                              2 * i, True))
        terms.append(shift_fn(f"({shift_fn(y, i, False)} & 1)",
                              2 * i + 1, True))
    return "(" + " + ".join(terms) + ")"


def _spark_shift(e: str, i: int, left: bool) -> str:
    if i == 0:
        return e
    return f"shift{'left' if left else 'right'}({e}, {i})"


def _duck_shift(e: str, i: int, left: bool) -> str:
    if i == 0:
        return e
    op = "<<" if left else ">>"
    return f"({e} {op} {i})"


@register(
    "layout_zorder_report",
    oracle=None,  # set below
    tags=("layout", "zorder", "pruning"),
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear layout, measured by file-skipping power: rows
    quantized to a 16-bit grid on (l_partkey, l_suppkey), bucketed
    into ZL_FILES value-range files under (a) linear l_partkey order
    and (b) Morton/Z-order interleaving, per-file min/max collected,
    and ZL_PROBES pinned RANGE probes per dimension (width = one
    linear file's span, the BETWEEN-filter shape) counted against the
    stats (a file is READ when its [min, max] overlaps the probe;
    point probes would fall into quantization gaps and match nothing).
    Linear wins on its own column and reads everything for the other;
    Z-order pays a modest factor on the first column to make the
    second prunable — the curve a lakehouse OPTIMIZE decision reads.

    Scale shape: quantization bounds are one 4-value aggregate
    (broadcast); quantize + interleave + file assignment are map-side
    integer expressions; per-file stats are one partial+final hash
    aggregate per layout over int rows; the probe join is (files x
    probes) on two tiny broadcast sides."""
    li = spread(table(spark, sf_dir, "lineitem"))
    b = F.broadcast(li.agg(
        F.min("l_partkey").alias("minp"), F.max("l_partkey").alias("maxp"),
        F.min("l_suppkey").alias("mins"), F.max("l_suppkey").alias("maxs")))
    g = (1 << ZL_BITS) - 1
    q = (li.select("l_partkey", "l_suppkey").crossJoin(b)
         .select(
             F.expr(f"cast((l_partkey - minp) * {g}"
                    f" div greatest(maxp - minp, 1) as bigint)").alias("x"),
             F.expr(f"cast((l_suppkey - mins) * {g}"
                    f" div greatest(maxs - mins, 1) as bigint)").alias("y")))
    z = _interleave_expr("x", "y", _spark_shift)
    zq = q.select(
        F.expr(f"x div {(1 << ZL_BITS) // ZL_FILES}")
        .cast("bigint").alias("f_linear"),
        F.expr(f"{z} div {(1 << (2 * ZL_BITS)) // ZL_FILES}")
        .cast("bigint").alias("f_zorder"),
        "x", "y")

    def stats(fcol: str, label: str) -> DataFrame:
        return (zq.groupBy(F.col(fcol).alias("file"))
                .agg(F.min("x").alias("minx"), F.max("x").alias("maxx"),
                     F.min("y").alias("miny"), F.max("y").alias("maxy"))
                .select(F.lit(label).alias("strategy"), "file",
                        "minx", "maxx", "miny", "maxy"))
    st = stats("f_linear", "linear").unionByName(stats("f_zorder", "zorder"))
    probes = [(1 << ZL_BITS) // ZL_PROBES * i
              + (1 << ZL_BITS) // (2 * ZL_PROBES)
              for i in range(ZL_PROBES)]
    pr = spark.createDataFrame(
        [(int(v), int(v + ZL_PROBE_W - 1)) for v in probes], "lo long, hi long")
    xhits = (st.crossJoin(F.broadcast(pr))
             .filter((F.col("hi") >= F.col("minx"))
                     & (F.col("lo") <= F.col("maxx")))
             .groupBy("strategy")
             .agg(F.count("*").cast("bigint").alias("x_probe_file_hits")))
    yhits = (st.crossJoin(F.broadcast(pr))
             .filter((F.col("hi") >= F.col("miny"))
                     & (F.col("lo") <= F.col("maxy")))
             .groupBy("strategy")
             .agg(F.count("*").cast("bigint").alias("y_probe_file_hits")))
    nf = (st.groupBy("strategy")
          .agg(F.count("*").cast("bigint").alias("n_files")))
    return (nf.join(xhits, "strategy").join(yhits, "strategy")
            .select("strategy", "n_files",
                    "x_probe_file_hits", "y_probe_file_hits")
            .orderBy("strategy"))


def _zorder_oracle() -> str:
    g = (1 << ZL_BITS) - 1
    z = _interleave_expr("x", "y", _duck_shift)
    probes = ", ".join(
        "{'lo': %d, 'hi': %d}" % (v, v + ZL_PROBE_W - 1)
        for v in ((1 << ZL_BITS) // ZL_PROBES * i
                  + (1 << ZL_BITS) // (2 * ZL_PROBES)
                  for i in range(ZL_PROBES)))
    return f"""
    WITH b AS (SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
                      min(l_suppkey) AS mins, max(l_suppkey) AS maxs
               FROM lineitem),
    q AS (SELECT CAST((l_partkey - minp) * {g}
                      // greatest(maxp - minp, 1) AS BIGINT) AS x,
                 CAST((l_suppkey - mins) * {g}
                      // greatest(maxs - mins, 1) AS BIGINT) AS y
          FROM lineitem CROSS JOIN b),
    zq AS (SELECT x // {(1 << ZL_BITS) // ZL_FILES} AS f_linear,
                  {z} // {(1 << (2 * ZL_BITS)) // ZL_FILES} AS f_zorder,
                  x, y
           FROM q),
    st AS (SELECT 'linear' AS strategy, f_linear AS file,
                  min(x) AS minx, max(x) AS maxx,
                  min(y) AS miny, max(y) AS maxy
           FROM zq GROUP BY 2
           UNION ALL
           SELECT 'zorder' AS strategy, f_zorder AS file,
                  min(x) AS minx, max(x) AS maxx,
                  min(y) AS miny, max(y) AS maxy
           FROM zq GROUP BY 2),
    pr AS (SELECT unnest([{probes}], recursive := true)),
    xh AS (SELECT strategy, CAST(count(*) AS BIGINT) AS x_probe_file_hits
           FROM st JOIN pr ON pr.hi >= st.minx AND pr.lo <= st.maxx
           GROUP BY 1),
    yh AS (SELECT strategy, CAST(count(*) AS BIGINT) AS y_probe_file_hits
           FROM st JOIN pr ON pr.hi >= st.miny AND pr.lo <= st.maxy
           GROUP BY 1),
    nf AS (SELECT strategy, CAST(count(*) AS BIGINT) AS n_files
           FROM st GROUP BY 1)
    SELECT nf.strategy, nf.n_files, xh.x_probe_file_hits,
           yh.y_probe_file_hits
    FROM nf JOIN xh ON xh.strategy = nf.strategy
            JOIN yh ON yh.strategy = nf.strategy
    ORDER BY nf.strategy
    """


REGISTRY["layout_zorder_report"].oracle = _zorder_oracle()


# ------------------------------------- mergeable HLL sketch pipeline

# agg_approx_distinct covers the one-shot approx_count_distinct path;
# this covers the MERGEABLE-sketch workflow that matters at 100 TB:
# build a Datasketches HLL sketch per group once (hll_sketch_agg),
# keep the binary sketches, and answer the global question later by
# UNIONING sketches (hll_union_agg) — never re-scanning raw data. The
# merged row below is computed exclusively from the per-type sketches.
# Sketch binaries and estimates are engine-specific, so (the
# agg_approx_distinct pattern) the output carries exact counts plus
# Spark-side tolerance booleans the oracle pins to literal TRUE.
HLL_LG_K = 14  # datasketches lgConfigK (~0.8% rel. std. error)


@register(
    "agg_hll_sketch_union",
    oracle="""
    WITH per AS (SELECT event_type,
                        CAST(count(DISTINCT user_id) AS BIGINT)
                            AS exact_users
                 FROM events GROUP BY 1)
    SELECT event_type, exact_users, TRUE AS estimate_within_5pct
    FROM per
    UNION ALL
    SELECT '__merged__' AS event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS estimate_within_5pct
    FROM events
    ORDER BY event_type
    """,
    tags=("agg", "approx", "sketch", "mergeable"),
)
def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: one Datasketches HLL sketch
    per event_type (hll_sketch_agg), per-type estimates checked
    against exact distincts, and a '__merged__' row whose estimate
    comes ONLY from hll_union_agg over the per-type sketches — the
    re-aggregation that answers "distinct users overall" from stored
    per-partition sketches without touching raw events again.

    Scale shape: the sketch build is one partial+final aggregate
    (constant memory per group); the union row re-aggregates |groups|
    sketch binaries, not events; the exact distincts exist only
    because this is an EVAL — production keeps the sketches and drops
    the raw scan."""
    ev = table(spark, sf_dir, "events")
    per = (ev.groupBy("event_type")
           .agg(F.expr(f"hll_sketch_agg(user_id, {HLL_LG_K})").alias("sk"),
                F.count_distinct("user_id").cast("bigint")
                .alias("exact_users")))
    ok = (F.abs(F.expr("hll_sketch_estimate(sk)") - F.col("exact_users"))
          / F.col("exact_users") <= F.lit(0.05))
    rows = per.select("event_type", "exact_users",
                      ok.alias("estimate_within_5pct"))
    gexact = ev.agg(F.count_distinct("user_id").cast("bigint")
                    .alias("exact_users"))
    merged = (per.agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                      .alias("est"))
              .crossJoin(F.broadcast(gexact))
              .select(F.lit("__merged__").alias("event_type"),
                      "exact_users",
                      (F.abs(F.col("est") - F.col("exact_users"))
                       / F.col("exact_users") <= F.lit(0.05))
                      .alias("estimate_within_5pct")))
    return rows.unionByName(merged).orderBy("event_type")


# ------------------------------------ data-quality expectations suite

# The Deequ / Great-Expectations-shaped contract validator an ingest
# pipeline gates on: a declarative suite of constraints (uniqueness,
# completeness, value ranges, referential integrity, freshness window)
# evaluated as VIOLATION COUNTS — one row per check, passed = zero
# violations. Every check on a table folds into ONE multi-column
# aggregate over a single scan (then unpivots to rows), so the suite
# costs one pass per table at any scale; the referential check is one
# anti-join keyed on the foreign key.
EXPECT_TS_LO = "2024-01-01"  # events freshness window (TESTDATA.md)
EXPECT_TS_HI = "2025-01-01"


@register(
    "quality_expectations_report",
    oracle=f"""
    SELECT table_name, check_name, violations,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT)
               AS passed
    FROM (
    SELECT 'orders' AS table_name, 'duplicate_orderkey' AS check_name,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
               AS violations
    FROM orders
    UNION ALL
    SELECT 'orders', 'null_custkey',
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders', 'nonpositive_totalprice',
           CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders', 'orphan_custkey',
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            ANTI JOIN customer c ON o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'lineitem', 'quantity_out_of_range',
           CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'discount_out_of_range',
           CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'null_extendedprice',
           CAST(count(*) FILTER (WHERE l_extendedprice IS NULL) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'customer', 'duplicate_custkey',
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'customer', 'null_name',
           CAST(count(*) FILTER (WHERE c_name IS NULL) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'events', 'ts_out_of_window',
           CAST(count(*) FILTER (WHERE ts < TIMESTAMP '{EXPECT_TS_LO}'
                                    OR ts >= TIMESTAMP '{EXPECT_TS_HI}')
                AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events', 'null_user_id',
           CAST(count(*) FILTER (WHERE user_id IS NULL) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents', 'empty_text',
           CAST(count(*) FILTER (WHERE text IS NULL
                                    OR length(trim(text)) = 0) AS BIGINT)
    FROM documents) t
    ORDER BY table_name, check_name
    """,
    tags=("quality", "expectations", "contract"),
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract expectations over the warehouse tables: key
    uniqueness, null completeness, value ranges, an events freshness
    window, and orders->customer referential integrity — one row per
    check with its violation count and pass flag, the gate an ingest
    job reads before publishing a batch.

    Scale shape: ALL checks on a table fold into one multi-column
    conditional aggregate over a single scan (count_if map-side
    partials), unpivoted to rows via Expand on the tiny 1-row result;
    the referential check is one LeftAnti join keyed on the foreign
    key. Adding a check adds a column to an existing pass, never
    another scan."""
    def checks(tname: str, df: DataFrame, cols: dict) -> DataFrame:
        agg = df.agg(*[expr.cast("bigint").alias(name)
                       for name, expr in cols.items()])
        return (agg.withColumn("table_name", F.lit(tname))
                .unpivot(["table_name"], list(cols),
                         "check_name", "violations"))

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    ev = table(spark, sf_dir, "events")
    d = table(spark, sf_dir, "documents")
    parts = [
        checks("orders", o, {
            "duplicate_orderkey":
                F.count("*") - F.count_distinct("o_orderkey"),
            "null_custkey": F.count_if(F.col("o_custkey").isNull()),
            "nonpositive_totalprice":
                F.count_if(F.col("o_totalprice") <= 0),
        }),
        checks("lineitem", li, {
            "quantity_out_of_range":
                F.count_if((F.col("l_quantity") < 1)
                           | (F.col("l_quantity") > 50)),
            "discount_out_of_range":
                F.count_if((F.col("l_discount") < 0)
                           | (F.col("l_discount") > 0.1)),
            "null_extendedprice":
                F.count_if(F.col("l_extendedprice").isNull()),
        }),
        checks("customer", c, {
            "duplicate_custkey":
                F.count("*") - F.count_distinct("c_custkey"),
            "null_name": F.count_if(F.col("c_name").isNull()),
        }),
        checks("events", ev, {
            "ts_out_of_window":
                F.count_if((F.col("ts") < F.lit(EXPECT_TS_LO)
                            .cast("timestamp"))
                           | (F.col("ts") >= F.lit(EXPECT_TS_HI)
                              .cast("timestamp"))),
            "null_user_id": F.count_if(F.col("user_id").isNull()),
        }),
        checks("documents", d, {
            "empty_text":
                F.count_if(F.col("text").isNull()
                           | (F.length(F.trim(F.col("text"))) == 0)),
        }),
        (o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
         .agg(F.count("*").cast("bigint").alias("violations"))
         .select(F.lit("orders").alias("table_name"),
                 F.lit("orphan_custkey").alias("check_name"),
                 "violations")),
    ]
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return (out.select("table_name", "check_name", "violations",
                       F.when(F.col("violations") == 0, 1).otherwise(0)
                       .cast("int").alias("passed"))
            .orderBy("table_name", "check_name"))


# --------------------------------------- binned interval-overlap join

# The interval-overlap join where NEITHER side fits a broadcast: the
# range-join family here so far rides BroadcastNestedLoopJoin
# (join_range_price_bands) — correct only while one side stays tiny.
# The technique that scales two LARGE interval tables is BINNING:
# explode each interval to the fixed-width time buckets it covers,
# equi-join on the bucket (a plain shuffled hash/sort-merge join),
# de-duplicate pairs that met in several buckets, and keep the exact
# overlap predicate as a residual filter. Join cost becomes
# O(intervals x buckets-per-interval) equi-join rows instead of
# |A| x |B| comparisons. Both interval sets derive from events:
# per-user activity sessions vs per-event-type bursts (gaps-and-
# islands sessionization on both sides, exact microsecond integer
# arithmetic, the events.py session discipline).
#
# SESSIONIZATION SKEW (the r9 verdict's one plan defect, fixed r10):
# the burst side keys on event_type — cardinality 5 in the fixtures
# and low BY CONSTRUCTION at any scale — so a single gaps-and-islands
# window over raw events would sort ~20% of all event volume in ONE
# task. The scale-safe form is the standard CHUNKED decomposition:
# (1) sessionize within (key, coarse-time-chunk) partitions, so raw
# event volume shuffles and sorts on a composite key with
# |keys| x |chunks| cells; (2) islands that touch a chunk boundary
# (the per-chunk FIRST and LAST islands — interior islands already
# have >= gap on both sides inside their chunk, and anything in
# another chunk is farther away than those in-chunk neighbors, so
# interior islands are final) run a second gaps-and-islands merge
# pass keyed on the bare key — but over AT MOST 2 islands per
# (key, chunk), never raw events. Output is bit-identical to the
# single-pass form (the oracle below stays the single-pass SQL, and
# the plain-Python replication test uses single-pass sessionization).
IOV_USER_GAP_US = 30 * 60 * 1_000_000   # user-session gap: 30 min
IOV_TYPE_GAP_US = 5 * 60 * 1_000_000    # type-burst gap: 5 min
IOV_BUCKET_US = 3_600 * 1_000_000       # 1 h overlap-join buckets
IOV_CHUNK_US = 6 * 3_600 * 1_000_000    # 6 h sessionization chunks (72x gap)


def _sessionize(ev: DataFrame, key: str, gap_us: int,
                out_key: str) -> DataFrame:
    """Single-pass gaps-and-islands sessionization of events keyed on
    ``key``: one row per session with exact-microsecond [start_us,
    end_us]. Windows partition on the bare key — right for
    HIGH-cardinality keys (user_id: volume spreads over all users);
    use :func:`_sessionize_chunked` for low-cardinality keys."""
    w = Window.partitionBy(out_key).orderBy("us")
    return (ev.select(F.col(key).alias(out_key),
                      F.expr("unix_micros(ts)").alias("us"))
            .withColumn("prev", F.lag("us").over(w))
            .withColumn("new_sess",
                        F.when(F.col("prev").isNull()
                               | (F.col("us") - F.col("prev")
                                  >= gap_us), 1).otherwise(0))
            .withColumn("sess", F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy(out_key, "sess")
            .agg(F.min("us").alias("start_us"),
                 F.max("us").alias("end_us"))
            .drop("sess"))


def _sessionize_chunked(ev: DataFrame, key: str, gap_us: int,
                        out_key: str, chunk_us: int) -> DataFrame:
    """Two-level gaps-and-islands sessionization for LOW-cardinality
    keys: per-(key, chunk) islands first (raw events never shuffle or
    sort on the bare key), then a boundary-island merge pass whose
    input is bounded by 2 rows per (key, chunk). ``chunk_us`` must be
    >= ``gap_us`` only for efficiency, not correctness — the merge
    pass re-checks every cross-boundary gap with the exact single-pass
    predicate (start - prev_end >= gap_us over time-ordered disjoint
    islands), so the output equals :func:`_sessionize` for ANY chunk
    width. Interior islands are final because their nearest neighbors
    in time are their in-chunk predecessors/successors, already >= gap
    away; consecutive boundary islands of the SAME chunk never merge
    for the same reason, so the merge chain only ever crosses chunk
    boundaries."""
    wc = Window.partitionBy(out_key, "chunk").orderBy("us")
    islands = (ev.select(F.col(key).alias(out_key),
                         F.expr("unix_micros(ts)").alias("us"))
               .withColumn("chunk", F.expr(f"us div {chunk_us}"))
               .withColumn("prev", F.lag("us").over(wc))
               .withColumn("new_sess",
                           F.when(F.col("prev").isNull()
                                  | (F.col("us") - F.col("prev")
                                     >= gap_us), 1).otherwise(0))
               .withColumn("sess", F.sum("new_sess").over(
                   wc.rowsBetween(Window.unboundedPreceding, 0)))
               .groupBy(out_key, "chunk", "sess")
               .agg(F.min("us").alias("start_us"),
                    F.max("us").alias("end_us")))
    wi = Window.partitionBy(out_key, "chunk")
    marked = (islands
              .withColumn("lo", F.min("start_us").over(wi))
              .withColumn("hi", F.max("start_us").over(wi)))
    interior = (marked.filter((F.col("start_us") != F.col("lo"))
                              & (F.col("start_us") != F.col("hi")))
                .select(out_key, "start_us", "end_us"))
    boundary = (marked.filter((F.col("start_us") == F.col("lo"))
                              | (F.col("start_us") == F.col("hi")))
                .select(out_key, "start_us", "end_us"))
    wb = Window.partitionBy(out_key).orderBy("start_us")
    merged = (boundary
              .withColumn("prev_end", F.lag("end_us").over(wb))
              .withColumn("new_grp",
                          F.when(F.col("prev_end").isNull()
                                 | (F.col("start_us") - F.col("prev_end")
                                    >= gap_us), 1).otherwise(0))
              .withColumn("grp", F.sum("new_grp").over(
                  wb.rowsBetween(Window.unboundedPreceding, 0)))
              .groupBy(out_key, "grp")
              .agg(F.min("start_us").alias("start_us"),
                   F.max("end_us").alias("end_us"))
              .drop("grp"))
    return interior.unionByName(merged)


def _sessions_sql(key: str, gap_us: int, out_key: str) -> str:
    """DuckDB gaps-and-islands sessionization of events keyed on
    ``key``: one row per session with [start_us, end_us]."""
    return f"""
        SELECT {key} AS {out_key},
               min(us) AS start_us, max(us) AS end_us
        FROM (SELECT {key}, us,
                     sum(CASE WHEN prev IS NULL
                               OR us - prev >= {gap_us}
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY {key} ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS sess
              FROM (SELECT {key}, epoch_us(ts) AS us,
                           lag(epoch_us(ts))
                               OVER (PARTITION BY {key} ORDER BY ts)
                               AS prev
                    FROM events))
        GROUP BY {out_key}, sess"""


@register(
    "join_interval_overlap_binned",
    oracle=f"""
    WITH us AS ({_sessions_sql('user_id', IOV_USER_GAP_US, 'user_id')}),
    tb AS ({_sessions_sql('event_type', IOV_TYPE_GAP_US, 'event_type')}),
    ua AS (SELECT user_id, start_us, end_us,
                  unnest(range(start_us // {IOV_BUCKET_US},
                               end_us // {IOV_BUCKET_US} + 1)) AS bucket
           FROM us),
    tba AS (SELECT event_type, start_us, end_us,
                   unnest(range(start_us // {IOV_BUCKET_US},
                                end_us // {IOV_BUCKET_US} + 1)) AS bucket
            FROM tb),
    pairs AS (SELECT DISTINCT a.user_id, a.start_us AS us_start,
                     b.event_type, b.start_us AS tb_start
              FROM ua a JOIN tba b ON a.bucket = b.bucket
              WHERE a.start_us <= b.end_us AND b.start_us <= a.end_us),
    nb AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_bursts
           FROM tb GROUP BY 1)
    SELECT nb.event_type, nb.n_bursts,
           -- FILTER guards the LEFT-JOIN-miss branch: DuckDB counts the
           -- all-NULL struct as one distinct value where Spark's
           -- count_distinct(user_id, us_start) yields 0 (a burst type
           -- with zero overlapping sessions must report 0 on BOTH
           -- engines, though no fixture reaches the branch today).
           CAST(count(DISTINCT (p.user_id, p.us_start))
                    FILTER (WHERE p.us_start IS NOT NULL) AS BIGINT)
               AS n_overlapping_user_sessions,
           CAST(count(p.us_start) AS BIGINT) AS n_overlap_pairs
    FROM nb LEFT JOIN pairs p ON p.event_type = nb.event_type
    GROUP BY 1, 2 ORDER BY 1
    """,
    tags=("join", "interval", "binned", "events"),
)
def q_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via bucket binning: per-user activity
    sessions (30 min gap) against per-event-type bursts (5 min gap),
    overlap pairs found by exploding both interval sets onto 1-hour
    buckets and EQUI-joining on the bucket — the shape that scales
    when neither interval table can broadcast — with the exact overlap
    predicate as a residual filter and a distinct() collapsing pairs
    that met in several buckets. Reports, per event type: burst count,
    distinct user sessions overlapping any burst, and total overlap
    pairs.

    Scale shape: the user side sessionizes with one lag + running-sum
    window hash-partitioned on user_id (high cardinality — volume
    spreads); the burst side keys on LOW-cardinality event_type, so it
    uses the two-level chunked decomposition (_sessionize_chunked):
    raw events window on (event_type, 6 h chunk) — plan-asserted —
    and only per-chunk boundary islands (<= 2 per chunk per type)
    ride the bare-key merge pass. The join is a plain shuffled
    equi-join on int buckets (NO nested loop, NO broadcast of a big
    side — plan-asserted); bucket explosion is bounded by interval
    length / bucket width. All times are exact integer microseconds
    (unix_micros / epoch_us — the events.py discipline)."""
    ev = table(spark, sf_dir, "events")
    us = _sessionize(ev, "user_id", IOV_USER_GAP_US, "user_id")
    tb = _sessionize_chunked(ev, "event_type", IOV_TYPE_GAP_US,
                             "event_type", IOV_CHUNK_US)

    def binned(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.explode(F.sequence(
                F.expr(f"start_us div {IOV_BUCKET_US}"),
                F.expr(f"end_us div {IOV_BUCKET_US}"))))

    a = binned(us).select("user_id",
                          F.col("start_us").alias("us_start"),
                          F.col("end_us").alias("us_end"), "bucket")
    b = binned(tb).select("event_type",
                          F.col("start_us").alias("tb_start"),
                          F.col("end_us").alias("tb_end"), "bucket")
    pairs = (a.join(b, "bucket")
             .filter((F.col("us_start") <= F.col("tb_end"))
                     & (F.col("tb_start") <= F.col("us_end")))
             .select("user_id", "us_start", "event_type", "tb_start")
             .distinct())
    nb = tb.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_bursts"))
    return (nb.join(pairs, "event_type", "left")
            .groupBy("event_type", "n_bursts")
            .agg(F.count_distinct("user_id", "us_start").cast("bigint")
                 .alias("n_overlapping_user_sessions"),
                 F.count("us_start").cast("bigint")
                 .alias("n_overlap_pairs"))
            .orderBy("event_type"))
