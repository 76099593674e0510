"""Round-10 operators: mergeable-summary workflows.

Certification status (the honest-labeling house rule):

- ``sketch_freq_items_topk`` / ``curation_pareto_frontier`` /
  ``sample_weighted_reservoir`` / ``events_sliding_distinct_hll`` —
  written in round 10, formal rows round 10. Two changed in round 11
  (sketch_freq_items_topk: explicit release_pins on the fallback
  branch; events_sliding_distinct_hll: engine-semantics note at the
  hour-bucket expression) and re-certify inside the r11 window per
  the house rule; the other two are unchanged and rotate behind.

The frequent-items workflow is the heavy-hitters counterpart of
round 9's ``agg_hll_sketch_union`` cardinality story: the reference
answers "top-5 topics" by sorting a full in-memory counter
(/root/reference/src/service.py:217) — fine for one process, impossible
when the key domain exceeds memory. The mergeable-summary form is
per-batch bounded candidate summaries, one summary-sized merge, and an
exact reconciliation pass over the surviving candidates only (the
Misra-Gries / SpaceSaving discipline of Agarwal et al., "Mergeable
Summaries"). The Pareto frontier applies the same merge law to a
different summary — skylines compose, so dominated mass dies map-side
and only frontier candidates cross the wire.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Registry import FIRST among intra-package imports (worker re-import
# ordering; see llm_ext2.py's header note).
from ..registry import pin, register, release_pins, spread, table

from ..functions.hashing import hash32_sql_duck
from ..functions.text import tokens_col, tokens_sql

# ------------------------------------ mergeable frequent-items top-K

# Exact top-FI_TOP tokens by occurrence count, computed WITHOUT ever
# shuffling or hash-aggregating the full key domain:
#
#   pass 1  per Arrow batch: exact within-batch counts (bounded by the
#           batch size), keep the FI_K largest as the batch summary,
#           and record the batch's (FI_K+1)-th count as its truncation
#           error e_b (every pruned item's batch count is <= e_b);
#   merge   one groupBy over the summary rows (<= batches x FI_K rows)
#           sums per-key estimates; D = sum(e_b) bounds every key's
#           global undercount (est(x) <= f(x) <= est(x) + D);
#   prune   keep candidates with est + D >= est_T (the FI_TOP-th
#           largest merged estimate). For any true top-T key x that
#           appears in SOME summary: f(x) >= f_T >= est_T (T keys hold
#           est >= est_T and every est underestimates), so
#           est(x) >= f(x) - D >= est_T - D — such keys always survive
#           the prune, for ANY batching.
#   pass 2  exact counts for the candidates only: a second scan
#           semi-joined against the broadcast candidate list, so the
#           reconciliation groupBy's key domain is candidate-bounded.
#   verify  a key absent from EVERY summary has f <= D (each batch
#           count <= that batch's e_b), and a pruned candidate has
#           f <= est + D < est_T <= f_T — so when floor_T (the
#           FI_TOP-th exact candidate count) exceeds D, NO non-candidate
#           can displace the head and the sketch result is PROVABLY the
#           exact top-T. That guard is checked at runtime on two
#           1-row candidate-bounded aggregates; if it ever fails
#           (adversarially flat key distribution — every key's count
#           within the summary error), the operator falls back to the
#           full exact aggregation, so the OUTPUT is exact top-T for
#           any input and any batching, never silently approximate.
#
# The final report is therefore EXACT (oracle: plain SQL top-T), while
# on the sketch path no stage ever holds more than max(batch,
# summaries, candidates) keys — the groupBy-the-world plan
# text_vocab_topk uses is the right call when the key domain fits the
# executors; this is the workflow for when it does not (n-grams, URLs,
# user ids at 100 TB). On the fixtures the guard sits far from the
# boundary (vocabulary 31 < FI_K, so summaries are exact and D = 0);
# both the pruning regime and the fallback are exercised by
# synthetic-corpus and hypothesis tests.
FI_K = 64    # per-batch summary width
FI_TOP = 15  # report head


def _fi_batch_summary(counts: pd.Series,
                      k: int = FI_K) -> tuple[pd.Series, int]:
    """Pure summary step: given exact within-batch counts (index = key),
    return (kept top-k, truncation error bound). Deterministic order
    (count desc, key asc) so the kept set is stable under re-runs.
    `k` is parameterized only so property tests can hammer the merge
    algebra at small widths; the operator always passes FI_K."""
    if len(counts) <= k:
        return counts, 0
    ordered = counts.sort_index().sort_values(ascending=False,
                                              kind="stable")
    return ordered.iloc[:k], int(ordered.iloc[k])


def _fi_summaries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one bounded summary per Arrow batch — FI_K
    (key, est) rows plus, when the batch was truncated, one NULL-key
    row carrying the batch's error bound."""
    for pdf in it:
        if pdf.empty:
            continue
        kept, err = _fi_batch_summary(pdf["token"].value_counts())
        out = pd.DataFrame({"token": kept.index.astype(str),
                            "est": kept.to_numpy("int64")})
        if err:
            out = pd.concat(
                [out, pd.DataFrame({"token": [None], "est": [err]})],
                ignore_index=True)
        yield out


def _fi_tokens(d: DataFrame) -> DataFrame:
    return d.select(F.explode(tokens_col(F.col("text"))).alias("token"))


def _fi_pass1(d: DataFrame) -> DataFrame:
    """Pass 1: the bounded per-batch summaries — narrow from the scan
    (no exchange may ever touch raw token volume; plan-audited)."""
    return _fi_tokens(d).mapInPandas(_fi_summaries, "token string, est long")


def _fi_candidates(summ: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Merge + prune: (derr 1-row total error, pruned candidate keys).
    The merge groupBy sees only summary rows; D and est_T ride as
    broadcast 1-row bounds."""
    merged = (summ.filter(F.col("token").isNotNull())
              .groupBy("token")
              .agg(F.sum("est").cast("long").alias("est")))
    derr = summ.filter(F.col("token").isNull()).agg(
        F.coalesce(F.sum("est"), F.lit(0)).cast("long").alias("derr"))
    est_t = (merged.orderBy(F.col("est").desc(), "token").limit(FI_TOP)
             .agg(F.min("est").cast("long").alias("est_t")))
    cand = (merged.crossJoin(F.broadcast(derr))
            .crossJoin(F.broadcast(est_t))
            .filter(F.col("est") + F.col("derr")
                    >= F.coalesce(F.col("est_t"), F.lit(0)))
            .select("token"))
    return derr, cand


def _fi_reconcile(d: DataFrame, cand: DataFrame) -> DataFrame:
    """Pass 2: exact counts for the broadcast candidate keys only —
    the semi-join runs BEFORE the groupBy, so the aggregate's hash
    tables and exchange are candidate-bounded."""
    return (_fi_tokens(d).join(F.broadcast(cand), "token", "left_semi")
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("n_occ")))


@register(
    "sketch_freq_items_topk",
    oracle=f"""
    WITH t AS (SELECT unnest({tokens_sql('text')}) AS token
               FROM documents),
    c AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occ
          FROM t GROUP BY token)
    SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, token) AS BIGINT)
               AS rank,
           token, n_occ
    FROM c ORDER BY n_occ DESC, token LIMIT {FI_TOP}
    """,
    tags=("llm", "sketch", "frequent-items", "mergeable"),
)
def q_freq_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus top-{FI_TOP} tokens via the mergeable frequent-items
    workflow (module comment above): bounded per-batch summaries, one
    summary-sized merge, provably-containing candidate prune, and an
    exact candidate-only reconciliation pass. The oracle is the plain
    exact top-T SQL — the containment argument is what makes the sketch
    path oracle-checkable.

    Scale shape: pass 1 is narrow (scan -> explode -> mapInPandas; no
    exchange touches raw token volume — asserted by the plan audit);
    the merge shuffles only summary rows; D / est_T ride as broadcast
    1-row bounds; the reconciliation scan semi-joins against the
    broadcast pruned candidates BEFORE its groupBy, so the exact
    count's hash tables and exchange carry candidate keys only; the
    final head is TakeOrderedAndProject over candidate-bounded rows.
    The one driver action is the 1-row exactness-guard collect (the
    same K-bounded-state license the k-means trainers use); the
    reconciled candidate counts are pinned so the guard and the
    returned head share one pass-2 scan."""
    d = spread(table(spark, sf_dir, "documents"))
    derr, cand = _fi_candidates(_fi_pass1(d))
    exact = pin(_fi_reconcile(d, cand))
    topk = exact.orderBy(F.col("n_occ").desc(), "token").limit(FI_TOP)
    g = (topk.agg(F.min("n_occ").alias("floor_t"),
                  F.count("*").alias("n_out"))
         .crossJoin(F.broadcast(derr)).collect()[0])
    # Exactness guard (module comment): the head is provably exact when
    # it is full and clears the summary error, or when no summary was
    # ever truncated (D = 0 -> merged holds every key exactly).
    if not (g.n_out and g.floor_t > g.derr
            and (g.n_out == FI_TOP or g.derr == 0)):
        # The guard already consumed the pinned candidate-bounded pass —
        # nothing downstream reads it on this branch, so release it now
        # rather than letting it sit in cache until the next registry
        # call (the release protocol's backstop).
        release_pins()
        exact = (_fi_tokens(d).groupBy("token")
                 .agg(F.count("*").cast("long").alias("n_occ")))
        topk = exact.orderBy(F.col("n_occ").desc(), "token").limit(FI_TOP)
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("n_occ").desc(), "token")
    return (topk.withColumn("rank", F.row_number().over(w).cast("long"))
            .select("rank", "token", "n_occ")
            .orderBy("rank"))


# ----------------------------------- Pareto-frontier data selection

# Multi-objective curation: when two quality axes pull against each
# other (here: document length vs lexical diversity), the principled
# keep-set is the PARETO FRONTIER — documents no other document beats
# on both axes at once (q dominates p iff q >= p on both and > on at
# least one; equal pairs never dominate each other). The distributed
# shape exploits that skylines are MERGEABLE: skyline(S1 ∪ S2) =
# skyline(skyline(S1) ∪ skyline(S2)) (dominance is transitive — p's
# dominator is itself dominated only by another dominator of p), so a
# per-Arrow-batch local skyline prunes the dominated mass in a pure
# map pass, and only the bounded survivor set rides the single
# exchange into the exact global pass. The global pass and the oracle
# share one relational formulation: sorted by x, a point survives iff
# no strictly-greater-x point reaches its y (RANGE-frame running max)
# and no >=-x point exceeds its y. Generalizes to more axes by
# swapping the frame trick for the NOT EXISTS form; 2 axes keep both
# engines on the O(n log n) window plan.


def _pf_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact skyline of one batch (keep = non-dominated rows,
    duplicates of a frontier point all kept)."""
    p = pdf.sort_values(["x", "y"], ascending=False, kind="mergesort")
    keep = []
    best_strict = -1  # max y among rows with strictly greater x
    gx, gmax = None, -1
    for t in p.itertuples():
        if t.x != gx:
            best_strict = max(best_strict, gmax)
            gx, gmax = t.x, t.y  # group head carries the group's max y
        if t.y > best_strict and t.y == gmax:
            keep.append(t.Index)
    return pdf.loc[keep]


def _pf_local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        if not pdf.empty:
            yield _pf_batch(pdf)


def _pf_metrics(d: DataFrame) -> DataFrame:
    toks = d.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    return toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("x"),
        F.size(F.array_distinct("toks")).cast("long").alias("y"))


def _pf_global_skyline(df: DataFrame) -> DataFrame:
    """The exact skyline as a relational plan (the oracle's twin):
    explicit single-partition windows — input is the bounded local-
    skyline survivor set, so one partition is the point, not a
    hazard."""
    w1 = (Window.partitionBy(F.lit(0)).orderBy("x")
          .rangeBetween(1, Window.unboundedFollowing))
    w2 = (Window.partitionBy(F.lit(0)).orderBy("x")
          .rangeBetween(Window.currentRow, Window.unboundedFollowing))
    return (df.withColumn("m1", F.max("y").over(w1))
            .withColumn("m2", F.max("y").over(w2))
            .filter((F.col("m1").isNull() | (F.col("m1") < F.col("y")))
                    & (F.col("m2") <= F.col("y")))
            .drop("m1", "m2"))


@register(
    "curation_pareto_frontier",
    oracle=f"""
    WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks
               FROM documents),
    m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS x,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS y
          FROM t),
    s AS (SELECT doc_id, x, y,
                 max(y) OVER (ORDER BY x RANGE BETWEEN 1 FOLLOWING
                              AND UNBOUNDED FOLLOWING) AS m1,
                 max(y) OVER (ORDER BY x RANGE BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS m2
          FROM m)
    SELECT doc_id, x AS n_tokens, y AS n_distinct_tokens
    FROM s
    WHERE (m1 IS NULL OR m1 < y) AND m2 <= y
    ORDER BY n_tokens DESC, n_distinct_tokens DESC, doc_id
    """,
    tags=("llm", "curation", "pareto", "skyline", "mergeable"),
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier document selection over (token count, distinct
    token count) — the multi-objective keep-set when length and
    lexical diversity trade off (module comment above). One row per
    non-dominated document; duplicate-metric frontier documents all
    kept.

    Scale shape: metrics are map-side integer expressions; the local
    skyline is a pure map pass (mapInPandas per Arrow batch — no
    exchange touches per-document volume; plan-audited), and only its
    bounded survivor union crosses the single exchange into the exact
    global window pass (explicit one-partition windows over survivors
    only — the two-phase top-K discipline applied to a mergeable
    summary that happens to be a skyline)."""
    d = spread(table(spark, sf_dir, "documents"))
    local = (_pf_metrics(d)
             .mapInPandas(_pf_local, "doc_id long, x long, y long"))
    return (_pf_global_skyline(local)
            .select("doc_id",
                    F.col("x").alias("n_tokens"),
                    F.col("y").alias("n_distinct_tokens"))
            .orderBy(F.col("n_tokens").desc(),
                     F.col("n_distinct_tokens").desc(), "doc_id"))


# ------------------------------ weighted reservoir sample (A-ES)

# Weighted sampling without replacement is how a mixing pipeline draws
# a quality-weighted subset in ONE distributed pass: A-ES / A-ExpJ
# (Efraimidis & Spirakis) assigns each row the key u^(1/w) for uniform
# u and keeps the global top-K keys — provably equivalent to drawing K
# items sequentially without replacement with probability proportional
# to weight. Determinism and engine parity: u derives from the audited
# md5 hash32 of the doc id ((h+1)/2^32, never 0), the key rides as
# ln(u)/w scaled to int64 micro-units (monotone in u^(1/w); floor is
# toward -inf in both engines; the only cross-engine hazard is a libm
# ln() 1-ulp difference landing exactly on a quantization boundary —
# probability ~1e-15 per row, the same accepted exposure as the ppm
# cosine quantization used throughout), ties broken on doc_id. The
# top-K is orderBy().limit(K) — TakeOrderedAndProject's per-partition
# K-row heaps then a K x partitions driver merge, never a global sort:
# the selection is one scan + one bounded gather at any corpus size.
WR_K = 20  # sample size


@register(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH m AS (SELECT doc_id,
                      CAST(len({tokens_sql('text')}) AS BIGINT) AS weight
               FROM documents),
    k AS (SELECT doc_id, weight,
                 CAST(floor(ln((({hash32_sql_duck("CAST(doc_id AS VARCHAR)")})
                                + 1) / 4294967296.0)
                            / weight * 1000000) AS BIGINT) AS key_micro
          FROM m WHERE weight > 0)
    SELECT CAST(row_number() OVER (ORDER BY key_micro DESC, doc_id)
                AS BIGINT) AS rank,
           doc_id, weight, key_micro
    FROM k ORDER BY key_micro DESC, doc_id LIMIT {WR_K}
    """,
    tags=("llm", "sampling", "weighted", "reservoir"),
)
def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass weighted reservoir sample (A-ES, module comment above):
    token count as the quality weight, hash-derived uniforms, global
    top-{WR_K} by the quantized exponential key — the deterministic,
    engine-checkable form of "sample K documents proportional to
    weight, without replacement".

    Scale shape: weight and key are map-side expressions over the scan
    (one md5 per row); the only 'shuffle' is TakeOrderedAndProject's
    K-row-per-partition gather; no full sort, no full-key aggregation
    anywhere."""
    from ..functions.hashing import hash32_col

    d = spread(table(spark, sf_dir, "documents"))
    m = d.select("doc_id",
                 F.size(tokens_col(F.col("text"))).cast("long")
                 .alias("weight"))
    k = (m.filter(F.col("weight") > 0)
         .select("doc_id", "weight",
                 F.floor(F.log((hash32_col(F.col("doc_id").cast("string"))
                                + 1).cast("double") / F.lit(4294967296.0))
                         / F.col("weight") * 1e6).cast("long")
                 .alias("key_micro")))
    topk = k.orderBy(F.col("key_micro").desc(), "doc_id").limit(WR_K)
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("key_micro").desc(), "doc_id")
    return (topk.withColumn("rank", F.row_number().over(w).cast("long"))
            .select("rank", "doc_id", "weight", "key_micro")
            .orderBy("rank"))


# --------------------------- sliding-window distinct via HLL union

# Overlapping time windows are where the mergeable-sketch discipline
# pays hardest: "distinct users per sliding 6-hour window" computed
# naively touches every event once PER WINDOW it falls into (6x the
# raw volume here; worse as windows lengthen). The sketch form builds
# ONE Datasketches HLL per base hour — each raw event contributes to
# exactly one partial+final aggregate cell — then every sliding window
# is an hll_union_agg over its <= 6 constituent hourly sketch
# binaries: the raw data is scanned once, window fan-out happens on
# |hours| x 6 sketch rows. This is agg_hll_sketch_union's
# re-aggregation workflow extended along the time axis (and the batch
# twin of what a streaming job does with per-bucket sketch state).
# Output carries the EXACT per-window distinct (computed from the
# deduplicated (hour, user) pairs — still never raw volume per
# window) plus a Spark-side estimate-within-5% boolean the oracle
# pins to literal TRUE, the established engine-specific-sketch
# pattern.
SW_HOURS = 6  # sliding window width, hours


@register(
    "events_sliding_distinct_hll",
    oracle=f"""
    WITH b AS (SELECT epoch_us(ts) // 3600000000 AS h, user_id
               FROM events),
    hm AS (SELECT max(h) AS hmax FROM b),
    hrs AS (SELECT DISTINCT h FROM b),
    wins AS (SELECT h, unnest(range(h, least(h + {SW_HOURS - 1},
                                             hm.hmax) + 1)) AS w
             FROM hrs CROSS JOIN hm),
    nh AS (SELECT w, CAST(count(*) AS BIGINT) AS n_hours
           FROM wins GROUP BY w),
    pairs AS (SELECT DISTINCT h, user_id FROM b),
    pw AS (SELECT DISTINCT p.user_id, wn.w
           FROM pairs p JOIN wins wn ON wn.h = p.h),
    ex AS (SELECT w, CAST(count(*) AS BIGINT) AS exact_users
           FROM pw GROUP BY w)
    SELECT nh.w AS window_hour, nh.n_hours, ex.exact_users,
           TRUE AS estimate_within_5pct
    FROM nh JOIN ex ON ex.w = nh.w
    ORDER BY window_hour
    """,
    tags=("events", "sketch", "hll", "sliding-window", "mergeable"),
)
def q_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per sliding {SW_HOURS}-hour window from mergeable
    hourly HLL sketches (module comment above): one row per window
    ending at each hour with data in range, with the count of
    contributing hours, the exact distinct count, and the sketch
    estimate's 5%-tolerance check.

    Scale shape: the sketch build is one partial+final hourly
    aggregate over the raw scan; window fan-out explodes SKETCH rows
    (|hours| x {SW_HOURS} binaries), never events; each window's union
    re-aggregates <= {SW_HOURS} sketches; the exact side rides
    deduplicated (hour, user) pairs through the same bounded fan-out —
    an EVAL cost, as in agg_hll_sketch_union."""
    from .llm_ext8 import HLL_LG_K

    ev = table(spark, sf_dir, "events")
    # Hour bucket: Spark `div` and the oracle's `//` BOTH truncate
    # toward zero, so the bucketing agrees between engines even for
    # pre-1970 timestamps (the fixtures are post-epoch, where the two
    # idioms are trivially equal) — pinned by
    # tests/test_engine_semantics.py::test_hour_bucketing_agrees_pre_epoch.
    base = ev.select(
        F.expr("unix_micros(ts) div 3600000000").cast("long").alias("h"),
        "user_id")
    # pinned 1-row bound: consumed by both the sketch and exact sides,
    # and a re-derivation would cost a full events scan per consumer
    hmax = pin(base.agg(F.max("h").alias("hmax")))
    wexpr = f"sequence(h, least(h + {SW_HOURS - 1}, hmax))"
    swin = (base.groupBy("h")
            .agg(F.expr(f"hll_sketch_agg(user_id, {HLL_LG_K})").alias("sk"))
            .crossJoin(F.broadcast(hmax))
            .select(F.explode(F.expr(wexpr)).alias("w"), "sk")
            .groupBy("w")
            .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                 .alias("est"),
                 F.count("*").cast("long").alias("n_hours")))
    exact = (base.distinct()
             .crossJoin(F.broadcast(hmax))
             .select(F.explode(F.expr(wexpr)).alias("w"), "user_id")
             .groupBy("w")
             .agg(F.count_distinct("user_id").cast("long")
                  .alias("exact_users")))
    return (swin.join(exact, "w")
            .select(F.col("w").alias("window_hour"), "n_hours",
                    "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     / F.col("exact_users") <= F.lit(0.05))
                    .alias("estimate_within_5pct"))
            .orderBy("window_hour"))
