"""Round-4 LLM-pipeline additions: distributed PCA (power iteration over
quantized-exact matrix-vector products), corpus drift diagnostics (PSI
between the train/val splits), dedup-cascade and exact-substring-removal
accounting, MinHash-threshold / IVF-nprobe / PQ-distortion calibration
sweeps, quality-vs-duplication cross-correlation, greedy k-center
diversity coresets, water-filling and DoReMi-style token-budget
allocation, first-fit-decreasing sequence packing (applyInPandas with a
recursive-CTE oracle replay), GK-sketch percentile validation, per-source
PII audit rates, session path mining, sharded heavy hitters, and kNN
hubness histograms.

Registered AFTER the round-4 sampled prefix (registry.py bottom): the
driver's 50-entry snapshot this round is pinned to the llm_ext suite plus
the r3 red-row fixes; these rotate into the sample at r5+. Everything is
deterministic and oracle-checked like the rest of the suite.

The reference has none of this surface (its only analytics are streaming
counters, /root/reference/src/metrics.py; no embedding or corpus-level
ops) — this is part of the "beyond the reference" training-data pipeline
surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# The registry import comes FIRST among intra-package imports: importing
# THIS module directly (a test, a notebook) then initializes the whole
# query package in registry's canonical order before the .llm import
# below runs — without it, .llm would start initializing here, recurse
# into registry, and llm_ext's mid-module `from .llm import ...` would
# hit a partially-initialized llm (the same class as the knn_shared
# worker-import fix, from the other direction).
from ..registry import pin, register, spread, table

from ..functions.hashing import hash32_col, hash32_sql_duck
from ..functions.text import tokens_col
from ..operators import similarity as sim
from ..operators.dedup import connected_components, jaccard_sql
from .llm import NEAR_DUP_JACCARD

# --------------------------------------------- PCA via power iteration

PCA_ROUNDS = 3  # power-iteration rounds; error ~ (lambda2/lambda1)^rounds
_DIM = sim.EMBED_DIM


def _pca_v0(dim: int = _DIM) -> list[float]:
    """Pinned start direction: signs from md5 parity, magnitude
    1/sqrt(64) = 0.125 — an exact power of two, so every component is an
    exactly-representable double and round-1 arithmetic is bit-identical
    across engines (same trick as the JL projection weights)."""
    return [0.125 if sim._h32(f"pca0_{d}") % 2 == 0 else -0.125
            for d in range(dim)]


def _qsum_spark(expr) -> F.Column:
    """Exact distributed sum of a per-row double quantized to the 1e-6
    grid: floor(x*1e6+0.5) -> int64 -> order-free integer SUM. The same
    grid the Gram-matrix / logreg / PageRank oracles use — float addition
    order never enters the aggregate."""
    return F.sum(F.floor(expr * F.lit(1e6) + F.lit(0.5)).cast("long"))


def _qsum_duck(expr: str) -> str:
    # outer BIGINT cast: DuckDB sum(BIGINT) is HUGEINT (the r3 lesson)
    return f"CAST(sum(CAST(floor({expr} * 1e6 + 0.5) AS BIGINT)) AS BIGINT)"


def _pca_oracle(dim: int = _DIM, rounds: int = PCA_ROUNDS) -> str:
    """DuckDB replay of the whole training loop: mean -> center ->
    `rounds` x (dot, quantized per-dim sums, normalize) -> final scoring.
    Every v-CTE is MATERIALIZED — referenced once per element access, an
    inlined copy per reference would re-run the corpus aggregation 64x
    (the PageRank-oracle lesson)."""
    idx = range(1, dim + 1)
    ms = ", ".join(_qsum_duck(f"emb[{i}]") for i in idx)
    parts = [f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings),
    m AS MATERIALIZED (
        SELECT CAST(count(*) AS DOUBLE) AS n, [{ms}] AS ms FROM e),
    ce AS MATERIALIZED (
        SELECT vec_id,
               list_transform(range(1, {dim + 1}),
                              i -> e.emb[i] - CAST(m.ms[i] AS DOUBLE) / 1e6 / m.n)
                 AS cemb
        FROM e CROSS JOIN m)"""]
    for r in range(1, rounds + 1):
        if r == 1:
            dt = sim.dot_weights_sql(_pca_v0(dim), "cemb")
            src = "ce"
        else:
            dt = sim.dot_sql("cemb", "vv", dim)
            src = f"ce CROSS JOIN v{r - 1}"
        sv = ", ".join(_qsum_duck(f"dt * cemb[{i}]") for i in idx)
        ssq = "CAST(0.0 AS DOUBLE)"
        for i in idx:
            ssq = f"({ssq} + CAST(sv[{i}] AS DOUBLE) * CAST(sv[{i}] AS DOUBLE))"
        parts.append(f""",
    d{r} AS MATERIALIZED (SELECT vec_id, cemb, {dt} AS dt FROM {src}),
    s{r} AS MATERIALIZED (SELECT [{sv}] AS sv FROM d{r}),
    v{r} AS MATERIALIZED (
        SELECT list_transform(sv, x -> CAST(x AS DOUBLE) / nrm) AS vv
        FROM (SELECT sv, sqrt({ssq}) AS nrm FROM s{r}))""")
    parts.append(f"""
    SELECT vec_id,
           {sim.round6_stable_sql(sim.dot_sql('cemb', 'vv', dim))} AS pc1_score
    FROM ce CROSS JOIN v{rounds} ORDER BY vec_id""")
    return "".join(parts)


@register(
    "embed_pca_power_iteration",
    oracle=_pca_oracle(),
    tags=("llm", "pca", "iterative"),
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA: first principal component by power iteration,
    Gram-free — each round computes w = sum_x (x.v) x as ONE pass over the
    corpus (map-side partial aggregation of 64 int64 quantized partials),
    the driver carries only the 64 sums and renormalizes. Output is every
    vector's projection onto the learned component (the 1-D semantic
    coordinate used for diversity binning / coverage plots).

    Scale shape: per round one scan of the cached centered corpus and one
    64-value aggregate — no shuffle wider than the partial-agg combine, no
    driver-side data beyond 64 ints (same skeleton as operators/logreg.py
    training). The quantized grid keeps the distributed float-sum order
    out of the result, so the DuckDB oracle replays the ENTIRE loop —
    mean, centering, all 3 rounds, final scores — value-for-value.
    At 1e9+ rows the 1e-6 grid keeps |sum| < 2^63 for |contrib| <= 1e3;
    rescale the grid with corpus size if vectors are unnormalized."""
    e = pin(spread(table(spark, sf_dir, "embeddings"))
            .select("vec_id", sim.as_double(F.col("embedding")).alias("emb")))
    mr = e.agg(F.count("*").alias("n"),
               *[_qsum_spark(F.element_at("emb", i)).alias(f"s{i}")
                 for i in range(1, _DIM + 1)]).collect()[0]
    n = float(mr["n"])
    mean = [(float(mr[f"s{i}"]) / 1e6) / n for i in range(1, _DIM + 1)]
    mean_arr = F.array(*[F.lit(x) for x in mean])
    ce = pin(e.select(
        "vec_id", F.zip_with("emb", mean_arr, lambda a, b: a - b).alias("cemb")))

    v = _pca_v0()
    for _ in range(PCA_ROUNDS):
        varr = F.array(*[F.lit(x) for x in v])
        row = (ce.select("cemb", sim.dot(F.col("cemb"), varr).alias("dt"))
               .agg(*[_qsum_spark(F.col("dt") * F.element_at("cemb", i))
                      .alias(f"s{i}") for i in range(1, _DIM + 1)])
               .collect()[0])
        sv = [row[f"s{i}"] for i in range(1, _DIM + 1)]
        ss = 0.0
        for s in sv:
            ss = ss + float(s) * float(s)
        nrm = math.sqrt(ss)
        v = [float(s) / nrm for s in sv]

    varr = F.array(*[F.lit(x) for x in v])
    return (ce.select("vec_id",
                      sim.round6_stable(sim.dot(F.col("cemb"), varr))
                      .alias("pc1_score"))
            .orderBy("vec_id"))


# ------------------------------------------------- PSI drift diagnostic

_SPLIT_PCT = 95  # hash-mod train share, matching train_val_split


@register(
    "corpus_psi_drift",
    oracle=f"""
    WITH n AS (SELECT doc_id,
                      len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                        AS n_tok,
                      {hash32_sql_duck('CAST(doc_id AS VARCHAR)')} % 100
                        < {_SPLIT_PCT} AS is_train
               FROM documents),
    b AS (SELECT CASE WHEN n_tok <= 0 THEN -1
                      ELSE length(bin(n_tok)) - 1 END AS bucket,
                 is_train
          FROM n),
    c AS (SELECT bucket,
                 CAST(count(*) FILTER (WHERE is_train) AS BIGINT) AS n_train,
                 CAST(count(*) FILTER (WHERE NOT is_train) AS BIGINT) AS n_val
          FROM b GROUP BY 1),
    t AS (SELECT bucket, n_train, n_val,
                 CAST(sum(n_train) OVER () AS BIGINT) AS tot_train,
                 CAST(sum(n_val) OVER () AS BIGINT) AS tot_val,
                 CAST(count(*) OVER () AS BIGINT) AS nb
          FROM c),
    p AS (SELECT bucket, n_train, n_val,
                 CAST(floor(((n_train + 1) / CAST(tot_train + nb AS DOUBLE)
                             - (n_val + 1) / CAST(tot_val + nb AS DOUBLE))
                            * ln((n_train + 1) / CAST(tot_train + nb AS DOUBLE)
                                 / ((n_val + 1) / CAST(tot_val + nb AS DOUBLE)))
                            * 1e6 + 0.5) AS BIGINT) AS psi_contrib_ppm
          FROM t)
    SELECT bucket, n_train, n_val, psi_contrib_ppm,
           CAST(sum(psi_contrib_ppm) OVER () AS BIGINT) AS psi_total_ppm
    FROM p ORDER BY bucket
    """,
    tags=("llm", "drift-psi"),
)
def q_corpus_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the deterministic train/val
    splits over the power-of-two token-length histogram — the standard
    "did my split (or my new crawl) change the distribution" gate; PSI >
    0.1 total is the conventional drift alarm. Laplace-smoothed shares
    ((n+1)/(tot+n_buckets)) keep empty buckets finite.

    Scale shape: one scan -> one aggregate on a bit-length bucket key
    (bounded cardinality ~60 at any corpus size), windows run over the
    bucket table only. The ln() contributions are quantized to an int64
    ppm grid per BUCKET (not per doc) so cross-engine libm skew has one
    chance per bucket to land on a grid edge, and the TOTAL is an exact
    integer sum of the quantized contributions — order-free."""
    d = spread(table(spark, sf_dir, "documents"))
    n_tok = F.size(tokens_col(F.col("text")))
    is_train = (hash32_col(F.col("doc_id").cast("string")) % 100
                < F.lit(_SPLIT_PCT))
    bucket = (F.when(n_tok <= 0, F.lit(-1))
              .otherwise(F.length(F.bin(n_tok.cast("bigint"))) - 1))
    c = (d.select(bucket.alias("bucket"), is_train.alias("is_train"))
         .groupBy("bucket")
         .agg(F.count_if("is_train").alias("n_train"),
              F.count_if(~F.col("is_train")).alias("n_val")))
    w = Window.partitionBy()
    t = c.select(
        "bucket", "n_train", "n_val",
        F.sum("n_train").over(w).alias("tot_train"),
        F.sum("n_val").over(w).alias("tot_val"),
        F.count(F.lit(1)).over(w).alias("nb"))
    p_tr = (F.col("n_train") + 1) / (F.col("tot_train") + F.col("nb")).cast("double")
    p_va = (F.col("n_val") + 1) / (F.col("tot_val") + F.col("nb")).cast("double")
    contrib = F.floor((p_tr - p_va) * F.log(p_tr / p_va) * F.lit(1e6)
                      + F.lit(0.5)).cast("long")
    p = t.select("bucket", "n_train", "n_val",
                 contrib.alias("psi_contrib_ppm"))
    return (p.select("bucket", "n_train", "n_val", "psi_contrib_ppm",
                     F.sum("psi_contrib_ppm").over(w).alias("psi_total_ppm"))
            .orderBy("bucket"))


# --------------------------------------------- dedup cascade accounting

_CASCADE_NORM_RE = "[^a-zA-Z0-9]+"  # llm_ext._NORM_RE (kept literal: the
#                                     oracle embeds it with the 'g' flag)


def _cascade_oracle() -> str:
    from .llm import _SH_CTE
    return f"""
    {_SH_CTE.replace("WITH ", "WITH RECURSIVE ", 1)},
    k1 AS (SELECT doc_id, md5(lower(trim(text))) AS k FROM documents),
    g1 AS (SELECT k, min(doc_id) AS doc_id FROM k1 GROUP BY 1),
    k2 AS (SELECT d.doc_id,
                  md5(lower(trim(regexp_replace(d.text,
                        '{_CASCADE_NORM_RE}', ' ', 'g')))) AS k
           FROM documents d JOIN g1 USING (doc_id)),
    g2 AS (SELECT k, min(doc_id) AS doc_id FROM k2 GROUP BY 1),
    pairs AS (
        SELECT doc_a, doc_b
        FROM cand JOIN s sa ON sa.doc_id = doc_a
                  JOIN s sb ON sb.doc_id = doc_b
        WHERE {jaccard_sql('sa.sids', 'sb.sids')} >= {NEAR_DUP_JACCARD}
          AND doc_a IN (SELECT doc_id FROM g2)
          AND doc_b IN (SELECT doc_id FROM g2)),
    nodes AS (SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION SELECT doc_b AS doc_id FROM pairs)),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    ccx AS (SELECT src AS doc_id, min(dst) AS comp FROM reach GROUP BY 1),
    c0 AS (SELECT count(*) AS c FROM documents),
    c1 AS (SELECT count(*) AS c FROM g1),
    c2 AS (SELECT count(*) AS c FROM g2),
    c3 AS (SELECT count(*) AS c FROM ccx WHERE comp <> doc_id)
    SELECT * FROM (
        SELECT 1 AS stage_idx, 'exact' AS stage, c0.c AS n_in,
               c0.c - c1.c AS n_removed, c1.c AS n_out
        FROM c0, c1
        UNION ALL
        SELECT 2, 'normalized', c1.c, c1.c - c2.c, c2.c FROM c1, c2
        UNION ALL
        SELECT 3, 'near_dup', c2.c, c3.c, c2.c - c3.c FROM c2, c3
    ) ORDER BY stage_idx
    """


@register(
    "dedup_cascade_report",
    oracle=_cascade_oracle(),
    tags=("llm", "dedup-cascade"),
)
def q_dedup_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup funnel accounting: run the production cascade — exact
    (byte-identical) -> normalized (case/punct-collapsed) -> MinHash
    near-dup components — each stage over the previous stage's survivors,
    and report docs in / removed / out per stage. This is the table a
    curation run publishes so reviewers can see WHERE the corpus shrank
    (a spike in one stage = a crawler or threshold regression).

    Scale shape: stages 1-2 are digest-only groupBys (32-byte keys, one
    shuffle each); stage 3 reuses the banded MinHash pair pipeline +
    iterative components, with survivors filtered via semi-joins on ids.
    The final report is three 1-row aggregates cross-joined — constant
    data regardless of corpus size. Oracle replays the full cascade
    including the recursive-CTE transitive closure."""
    from .llm import _minhash_pairs

    d = table(spark, sf_dir, "documents")
    k1 = spread(d).select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("k"))
    g1 = pin(k1.groupBy("k").agg(F.min("doc_id").alias("doc_id")))

    norm = F.lower(F.trim(F.regexp_replace(F.col("text"),
                                           _CASCADE_NORM_RE, " ")))
    k2 = (d.join(g1.select("doc_id"), "doc_id", "semi")
          .select("doc_id", F.md5(norm).alias("k")))
    g2 = pin(k2.groupBy("k").agg(F.min("doc_id").alias("doc_id")))

    pairs = _minhash_pairs(spark, sf_dir, fast=False).select("doc_a", "doc_b")
    pairs2 = (pairs
              .join(g2.selectExpr("doc_id AS doc_a"), "doc_a", "semi")
              .join(g2.selectExpr("doc_id AS doc_b"), "doc_b", "semi"))
    cc = connected_components(pairs2)

    c0 = d.agg(F.count("*").alias("c0"))
    c1 = g1.agg(F.count("*").alias("c1"))
    c2 = g2.agg(F.count("*").alias("c2"))
    c3 = (cc.filter(F.col("comp") != F.col("doc_id"))
          .agg(F.count("*").alias("c3")))

    r1 = (c0.crossJoin(c1)
          .select(F.lit(1).alias("stage_idx"), F.lit("exact").alias("stage"),
                  F.col("c0").alias("n_in"),
                  (F.col("c0") - F.col("c1")).alias("n_removed"),
                  F.col("c1").alias("n_out")))
    r2 = (c1.crossJoin(c2)
          .select(F.lit(2).alias("stage_idx"),
                  F.lit("normalized").alias("stage"),
                  F.col("c1").alias("n_in"),
                  (F.col("c1") - F.col("c2")).alias("n_removed"),
                  F.col("c2").alias("n_out")))
    r3 = (c2.crossJoin(c3)
          .select(F.lit(3).alias("stage_idx"),
                  F.lit("near_dup").alias("stage"),
                  F.col("c2").alias("n_in"),
                  F.col("c3").alias("n_removed"),
                  (F.col("c2") - F.col("c3")).alias("n_out")))
    return r1.unionAll(r2).unionAll(r3).orderBy("stage_idx")


# ------------------------------------- MinHash threshold calibration sweep

_SWEEP_PCTS = (30, 40, 50, 60, 70, 80, 90)


def _sweep_oracle() -> str:
    from .llm import _SH_CTE
    th = ", ".join(str(t) for t in _SWEEP_PCTS)
    return f"""
    {_SH_CTE},
    jp AS (SELECT doc_a, doc_b,
                  CAST(floor({jaccard_sql('sa.sids', 'sb.sids')} * 1e6 + 0.5)
                       AS BIGINT) AS jppm
           FROM cand JOIN s sa ON sa.doc_id = doc_a
                     JOIN s sb ON sb.doc_id = doc_b),
    th AS (SELECT unnest([{th}]) AS threshold_pct),
    f AS (SELECT threshold_pct, doc_a, doc_b
          FROM jp CROSS JOIN th WHERE jppm >= threshold_pct * 10000),
    p AS (SELECT threshold_pct, CAST(count(*) AS BIGINT) AS n_pairs
          FROM f GROUP BY 1),
    dd AS (SELECT threshold_pct, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
           FROM (SELECT threshold_pct, unnest([doc_a, doc_b]) AS d FROM f)
           GROUP BY 1)
    SELECT p.threshold_pct, n_pairs, n_docs
    FROM p JOIN dd USING (threshold_pct) ORDER BY threshold_pct
    """


@register(
    "dedup_minhash_threshold_sweep",
    oracle=_sweep_oracle(),
    tags=("llm", "dedup-minhash-lsh", "calibration"),
)
def q_minhash_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold calibration for the MinHash stage: how many candidate
    pairs (and how many documents touched) survive at each Jaccard cut
    from 0.3 to 0.9 — the curve a curation team reads before fixing the
    production threshold (too low = corpus collapse, too high = dup leak).

    One banded-candidate pass computes exact Jaccard per pair (the same
    pipeline as dedup_minhash_lsh with the verify filter open), then a
    7-way threshold fan-out over the PAIR table only — corpus is scanned
    once regardless of how many thresholds are swept. Comparisons run on
    ppm-quantized integers, so the cut is engine-exact at every boundary."""
    from .llm import _minhash_pairs

    pairs = pin(_minhash_pairs(spark, sf_dir, fast=False, min_jaccard=0.0)
                .select("doc_a", "doc_b",
                        F.floor(F.col("jaccard") * F.lit(1e6) + F.lit(0.5))
                        .cast("long").alias("jppm")))
    th = F.explode(F.array(*[F.lit(t) for t in _SWEEP_PCTS]))
    f = (pairs.select("doc_a", "doc_b", "jppm", th.alias("threshold_pct"))
         .filter(F.col("jppm") >= F.col("threshold_pct") * 10000))
    p = f.groupBy("threshold_pct").agg(F.count("*").alias("n_pairs"))
    dd = (f.select("threshold_pct",
                   F.explode(F.array("doc_a", "doc_b")).alias("d"))
          .groupBy("threshold_pct")
          .agg(F.count_distinct("d").alias("n_docs")))
    return (p.join(dd, "threshold_pct")
            .select("threshold_pct", "n_pairs", "n_docs")
            .orderBy("threshold_pct"))


# ------------------------------- exact-substring removal impact per doc

_SPAN_K = 16  # llm.SUBSTR_SPAN_K — K-token spans, kept in sync


def _span_cov_ctes(max_doc_tokens: int | None = None) -> str:
    """The span-coverage CTE chain (t..a), shared by the removal-plan and
    quality-vs-dup oracles: per-doc duplicated K-token span positions and
    the exact union coverage of those overlapping spans.
    ``max_doc_tokens`` excludes over-length docs from ``t`` outright —
    the substring-APPLY oracle's single-row-size guard (its Spark twin
    filters identically); the plan/quality oracles pass None."""
    from ..operators.dedup import MERSENNE_P, SHINGLE_COMB, token_hashes_32_duck_sql
    k = _SPAN_K
    guard = ("" if max_doc_tokens is None else
             f"\n               WHERE len(regexp_extract_all(lower(text),"
             f" '[a-z0-9]+')) < {max_doc_tokens}")
    roll = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_slice(hs, u.p, u.p + {k} - 1)), "
            f"(acc, x) -> (acc * {SHINGLE_COMB} + x) % {MERSENNE_P})")
    return f"""
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
                        AS toks
               FROM documents{guard}),
    h AS (SELECT doc_id, {token_hashes_32_duck_sql('toks')} AS hs FROM t),
    g AS (SELECT doc_id, hs,
                 unnest(list_transform(range(1, len(hs) - {k} + 2),
                                       i -> {{'p': i}})) AS u
          FROM h WHERE len(hs) >= {k}),
    s AS (SELECT doc_id, u.p AS pos, {roll} AS gram FROM g),
    dup AS (SELECT gram FROM s GROUP BY gram
            HAVING count(DISTINCT doc_id) >= 2),
    sd AS (SELECT s.doc_id, s.pos FROM s JOIN dup USING (gram)),
    c AS (SELECT doc_id, pos,
                 lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM sd),
    a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
                 CAST(sum(CASE WHEN prev IS NULL THEN {k}
                               ELSE least({k}, pos - prev) END) AS BIGINT)
                   AS tokens_covered
          FROM c GROUP BY 1)"""


def _span_removal_oracle() -> str:
    return f"""
    {_span_cov_ctes()}
    SELECT h.doc_id,
           coalesce(a.n_dup_spans, 0) AS n_dup_spans,
           coalesce(a.tokens_covered, 0) AS tokens_covered,
           CAST(len(hs) AS BIGINT) AS n_tokens,
           coalesce(a.tokens_covered, 0) * 1000000
             // greatest(CAST(len(hs) AS BIGINT), 1) AS coverage_ppm
    FROM h LEFT JOIN a USING (doc_id) ORDER BY doc_id
    """


@register(
    "dedup_span_removal_plan",
    oracle=_span_removal_oracle(),
    tags=("llm", "dedup-substring", "removal"),
)
def q_span_removal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL side of exact-substring dedup: dedup_substring_spans
    finds cross-document K-token spans; this computes each document's
    removal impact — how many of its span positions are corpus-duplicated
    and how many tokens the UNION of those (overlapping) spans covers.
    coverage_ppm is the per-doc "memorization surface" a cut list is
    built from (RefinedWeb/exact-substring pipelines drop or trim docs
    past a coverage threshold).

    Interval-union without interval machinery: spans all have length K
    and positions are sorted per doc, so a span only ever overlaps its
    predecessor — union length = K for the first + min(K, gap) for each
    subsequent span, one lag() window per doc. Shuffles carry
    (gram, doc_id) then (doc_id, pos) — never text. Integer-exact
    throughout (coverage is integer ppm division)."""
    return _span_coverage_df(spark, sf_dir).orderBy("doc_id")


def _span_coverage_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_span_cov_ctes` + the final projection:
    (doc_id, n_dup_spans, tokens_covered, n_tokens, coverage_ppm)."""
    from ..operators.dedup import (
        MERSENNE_P,
        SHINGLE_COMB,
        token_hashes_32_col,
    )
    k = _SPAN_K
    d = spread(table(spark, sf_dir, "documents"))
    h = pin(d.select(
        "doc_id", token_hashes_32_col(F.col("text")).alias("hs")))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("hs") - k + 1),
        lambda i: F.aggregate(
            F.slice("hs", i, k), F.lit(0).cast("long"),
            lambda acc, x: (acc * SHINGLE_COMB + x) % MERSENNE_P))
    s = (h.select(
            "doc_id",
            F.posexplode(F.when(F.size("hs") >= k, grams)
                         .otherwise(F.array())).alias("pos0", "gram"))
         .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram"))
    s = pin(s)
    dup = (s.groupBy("gram").agg(F.count_distinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2).select("gram"))
    sd = s.join(dup, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    c = sd.withColumn("prev", F.lag("pos").over(w))
    a = (c.groupBy("doc_id")
         .agg(F.count("*").alias("n_dup_spans"),
              F.sum(F.when(F.col("prev").isNull(), F.lit(k))
                    .otherwise(F.least(F.lit(k), F.col("pos") - F.col("prev"))))
              .alias("tokens_covered")))
    base = h.select("doc_id", F.size("hs").cast("long").alias("n_tokens"))
    return (base.join(a, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
                    F.coalesce("tokens_covered", F.lit(0))
                    .alias("tokens_covered"),
                    "n_tokens",
                    F.expr("coalesce(tokens_covered, 0) * 1000000 "
                           "div greatest(n_tokens, 1)").alias("coverage_ppm")))


# --------------------------------- approx-percentile sketch validation


@register(
    "agg_percentile_approx_check",
    oracle=f"""
    WITH p AS (SELECT {sim.round6_stable_sql(
                    'quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50)')}
                      AS e50,
                      {sim.round6_stable_sql(
                    'quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.90)')}
                      AS e90,
                      {sim.round6_stable_sql(
                    'quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99)')}
                      AS e99
               FROM lineitem)
    SELECT * FROM (
        SELECT 50 AS p_pct, e50 AS exact6, TRUE AS approx_ok FROM p
        UNION ALL SELECT 90, e90, TRUE FROM p
        UNION ALL SELECT 99, e99, TRUE FROM p
    ) ORDER BY p_pct
    """,
    tags=("agg", "percentile-approx"),
)
def q_percentile_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production quantile path validated against the exact one:
    percentile_approx (GK sketch — bounded memory, mergeable, the ONLY
    viable percentile at 1e10 rows) next to the exact interpolated
    percentile, with a 5%-relative-tolerance boolean the oracle asserts
    TRUE (the agg_approx_distinct pattern: the sketch result itself is
    engine-specific, its ACCURACY CONTRACT is not). The exact values are
    also emitted and value-checked."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.agg(
        *[sim.round6_stable(
            F.expr(f"percentile(CAST(l_extendedprice AS DOUBLE), "
                   f"{p / 100.0}D)")).alias(f"e{p}")
          for p in (50, 90, 99)],
        *[F.expr(f"approx_percentile(CAST(l_extendedprice AS DOUBLE), "
                 f"{p / 100.0}D, 10000)").alias(f"a{p}")
          for p in (50, 90, 99)])
    rows = [
        agg.select(F.lit(p).alias("p_pct"),
                   F.col(f"e{p}").alias("exact6"),
                   (F.abs(F.col(f"a{p}") - F.col(f"e{p}"))
                    <= 0.05 * F.abs(F.col(f"e{p}"))).alias("approx_ok"))
        for p in (50, 90, 99)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("p_pct")


# --------------------------------------------- PII compliance report


def _pii_oracle() -> str:
    from .llm import EMAIL_RE, URL_RE
    return f"""
    WITH f AS (SELECT source,
                      len(regexp_extract_all(text, '{EMAIL_RE}')) > 0 AS he,
                      len(regexp_extract_all(text, '{URL_RE}')) > 0 AS hu
               FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE he) AS BIGINT) AS n_with_email,
           CAST(count(*) FILTER (WHERE hu) AS BIGINT) AS n_with_url,
           CAST(count(*) FILTER (WHERE he) AS BIGINT) * 1000000
             // count(*) AS email_rate_ppm,
           CAST(count(*) FILTER (WHERE hu) AS BIGINT) * 1000000
             // count(*) AS url_rate_ppm
    FROM f GROUP BY source ORDER BY source
    """


@register(
    "text_pii_rate_by_source",
    oracle=_pii_oracle(),
    tags=("llm", "pii-report"),
)
def q_pii_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure report: how many documents carry emails /
    URLs and at what rate — the compliance table a redaction rollout is
    planned from (text_redact_pii is the ACTION; this is the audit).
    One scan, counts aggregate on the source key; rates are integer ppm."""
    from .llm import EMAIL_RE, URL_RE

    d = spread(table(spark, sf_dir, "documents"))
    has_email = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(EMAIL_RE), 0)) > 0
    has_url = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(URL_RE), 0)) > 0
    return (d.select("source", has_email.alias("he"), has_url.alias("hu"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.count_if("he").alias("n_with_email"),
                 F.count_if("hu").alias("n_with_url"))
            .select("source", "n_docs", "n_with_email", "n_with_url",
                    F.expr("n_with_email * 1000000 div n_docs")
                    .alias("email_rate_ppm"),
                    F.expr("n_with_url * 1000000 div n_docs")
                    .alias("url_rate_ppm"))
            .orderBy("source"))


# ------------------------------- excess-loss source reweighting (DoReMi)

DOREMI_ETA = 1.0  # multiplicative-weights step on excess loss


@register(
    "curation_doremi_weights",
    oracle=f"""
    WITH t AS (SELECT source,
                      unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                        AS tok
               FROM documents),
    lm AS (SELECT tok, count(*) AS n_tok FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n_total FROM lm),
    s AS (SELECT t.source,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(CAST(floor((ln(CAST(tot.n_total AS DOUBLE))
                                      - ln(CAST(lm.n_tok AS DOUBLE)))
                                     * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                   AS nllq
          FROM t JOIN lm USING (tok) CROSS JOIN tot
          GROUP BY 1),
    g AS (SELECT source, n_tokens, nllq,
                 CAST(sum(n_tokens) OVER () AS BIGINT) AS tot_tokens,
                 CAST(sum(nllq) OVER () AS BIGINT) AS tot_nllq
          FROM s),
    x AS (SELECT source, n_tokens,
                 CAST(nllq AS DOUBLE) / 1e6 / n_tokens AS mean_nll,
                 CAST(nllq AS DOUBLE) / 1e6 / n_tokens
                   - CAST(tot_nllq AS DOUBLE) / 1e6 / tot_tokens AS excess,
                 CAST(n_tokens AS DOUBLE) / tot_tokens AS share
          FROM g),
    w AS (SELECT source, n_tokens, mean_nll, excess,
                 CAST(floor(share * exp({DOREMI_ETA!r} * excess) * 1e9
                            + 0.5) AS BIGINT) AS wq
          FROM x)
    SELECT source, n_tokens,
           {sim.round6_stable_sql('mean_nll')} AS mean_nll6,
           {sim.round6_stable_sql('excess')} AS excess6,
           wq * 1000000 // CAST(sum(wq) OVER () AS BIGINT) AS weight_ppm
    FROM w ORDER BY source
    """,
    tags=("llm", "mixture-doremi"),
)
def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-flavored mixture reweighting: upweight the sources the
    corpus LM finds HARD (positive excess mean NLL vs the corpus mean),
    starting from token-share baselines — w_s ∝ share_s·exp(η·excess_s),
    reported as normalized ppm. The static one-step form of the
    multiplicative-weights update (the full method re-trains between
    steps; the update rule and its exactness story are identical).

    Exactness: per-token ln() contributions quantize to an int64 grid
    BEFORE the per-source sum (order-free; the same discipline as the
    JS-divergence query), means/excesses are then doubles derived from
    exact integers, exp() is quantized per SOURCE (bounded rows), and
    the final normalization is integer ppm division. Scale shape: one
    token-keyed LM aggregate + one (source, token)-keyed scoring join —
    both map-side partial; windows run over the source table only."""
    from ..functions.text import tokens_col

    d = spread(table(spark, sf_dir, "documents"))
    t = d.select("source", F.explode(tokens_col(F.col("text"))).alias("tok"))
    lm = t.groupBy("tok").agg(F.count("*").alias("n_tok"))
    tot = lm.agg(F.sum("n_tok").cast("bigint").alias("n_total"))
    nll_q = F.floor(
        (F.log(F.col("n_total").cast("double"))
         - F.log(F.col("n_tok").cast("double"))) * F.lit(1e6)
        + F.lit(0.5)).cast("long")
    s = (t.join(lm, "tok").crossJoin(F.broadcast(tot))
         .groupBy("source")
         .agg(F.count("*").alias("n_tokens"),
              F.sum(nll_q).alias("nllq")))
    wall = Window.partitionBy()
    g = s.select(
        "source", "n_tokens", "nllq",
        F.sum("n_tokens").over(wall).alias("tot_tokens"),
        F.sum("nllq").over(wall).alias("tot_nllq"))
    mean_nll = F.expr("CAST(nllq AS DOUBLE) / 1e6 / n_tokens")
    excess = F.expr("CAST(nllq AS DOUBLE) / 1e6 / n_tokens"
                    " - CAST(tot_nllq AS DOUBLE) / 1e6 / tot_tokens")
    x = g.select("source", "n_tokens",
                 mean_nll.alias("mean_nll"), excess.alias("excess"),
                 F.expr("CAST(n_tokens AS DOUBLE) / tot_tokens")
                 .alias("share"))
    w = x.select(
        "source", "n_tokens", "mean_nll", "excess",
        F.floor(F.col("share") * F.exp(F.lit(DOREMI_ETA) * F.col("excess"))
                * F.lit(1e9) + F.lit(0.5)).cast("long").alias("wq"))
    return (w.select(
                "source", "n_tokens",
                sim.round6_stable(F.col("mean_nll")).alias("mean_nll6"),
                sim.round6_stable(F.col("excess")).alias("excess6"),
                F.expr("wq * 1000000 div sum(wq) OVER ()")
                .alias("weight_ppm"))
            .orderBy("source"))


# ------------------------------------------- kNN hubness diagnostic


def _hubness_oracle() -> str:
    from .knn_shared import _KNN_CTE
    return f"""
    {_KNN_CTE},
    ind AS (SELECT e.vec_id,
                   coalesce(k.c, 0) AS in_degree
            FROM (SELECT vec_id FROM embeddings) e
            LEFT JOIN (SELECT dst, CAST(count(*) AS BIGINT) AS c
                       FROM knn GROUP BY 1) k ON k.dst = e.vec_id)
    SELECT in_degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM ind GROUP BY 1 ORDER BY in_degree
    """


@register(
    "graph_knn_hubness",
    oracle=_hubness_oracle(),
    tags=("llm", "knn-graph", "hubness"),
)
def q_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic over the k-NN graph: the IN-degree histogram
    (out-degree is K by construction; in-degree is not). A heavy tail
    here is the classic high-dimensional ANN failure mode — a few hub
    vectors appear in everyone's neighbor list and drag retrieval
    quality — and the fix (re-centering, cosine vs dot) is chosen from
    this table. Nodes nobody points at (in-degree 0) are included via
    the left join.

    Scale shape: reuses the bucket-bounded kNN build (one pinned LSH
    bucket self-join), then two small aggregates on ids only."""
    from .knn_shared import _knn_graph_df

    knn = _knn_graph_df(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings").select("vec_id")
    indeg = knn.groupBy("dst").agg(F.count("*").alias("c"))
    ind = (e.join(indeg, e["vec_id"] == indeg["dst"], "left")
           .select(F.coalesce("c", F.lit(0)).alias("in_degree")))
    return (ind.groupBy("in_degree").agg(F.count("*").alias("n_nodes"))
            .orderBy("in_degree"))


# ------------------------------------- PQ quantization distortion report


def _pq_distortion_oracle() -> str:
    from ..operators import kmeans as km
    from ..operators.similarity import PQ_K, PQ_M, PQ_SUB, _l2_expr_sql
    r6 = sim.round6_stable_sql
    errs = []
    for s in range(PQ_M):
        sl = f"list_slice(demb, {s * PQ_SUB + 1}, {(s + 1) * PQ_SUB})"
        dists = (f"list_transform(range(1, {PQ_K + 1}), "
                 f"k -> {_l2_expr_sql(sl, f'cb3[{s + 1}][k]')})")
        errs.append(f"list_min({dists}) AS e{s}")
    qs = ", ".join(
        f"CAST(sum(CAST(floor(e{s} * 1e6 + 0.5) AS BIGINT)) AS BIGINT)"
        f" AS q{s}" for s in range(PQ_M))
    rows = "\n        UNION ALL ".join(
        f"SELECT {s + 1} AS subspace, n AS n_vectors, "
        f"{r6(f'CAST(q{s} AS DOUBLE) / 1e6 / n')} AS mean_distortion6 "
        f"FROM a" for s in range(PQ_M))
    return f"""
    WITH e AS (SELECT vec_id, {sim.as_double_sql('embedding')} AS demb
               FROM embeddings),
    {km.pq_train_cb_cte_sql()},
    d AS (SELECT vec_id, {', '.join(errs)} FROM e CROSS JOIN cbrow),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n, {qs} FROM d)
    SELECT * FROM ({rows}) ORDER BY subspace
    """


@register(
    "sim_pq_distortion_report",
    oracle=_pq_distortion_oracle(),
    tags=("llm", "ann-pq", "calibration"),
)
def q_pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index-quality report: mean squared reconstruction distortion
    per subspace — the number that says whether the trained codebook
    actually fits the data (a subspace whose distortion dwarfs the others
    is under-trained or hides correlated dimensions, and is why OPQ-style
    rotations exist). Read next to sim_ann_pq's recall: distortion is the
    cause, recall the symptom.

    Per vector the distortion IS the assignment distance (min over the 16
    centroids of the subspace L2), so no codes are materialized — one
    scan against the broadcast codebook, per-(vector, subspace) errors
    quantized to an int64 grid, 8 exact sums + a count. The oracle
    replays codebook training CTE-for-CTE like the other PQ queries."""
    from ..operators import kmeans as km
    from ..operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUB,
        _arr_lit,
        _l2_fold_expr,
    )

    e = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", sim.as_double(F.col("embedding")).alias("demb"))
    cb = km.train_pq_codebook(e)
    errs = []
    for s in range(PQ_M):
        sl = f"slice(demb, {s * PQ_SUB + 1}, {PQ_SUB})"
        dists = "array(" + ", ".join(
            _l2_fold_expr(sl, _arr_lit(cb[s][c])) for c in range(PQ_K)) + ")"
        errs.append(F.expr(f"array_min({dists})").alias(f"e{s}"))
    d = e.select("vec_id", *errs)
    a = d.agg(
        F.count("*").alias("n"),
        *[F.sum(F.floor(F.col(f"e{s}") * F.lit(1e6) + F.lit(0.5))
                .cast("long")).alias(f"q{s}") for s in range(PQ_M)])
    rows = [
        a.select(F.lit(s + 1).alias("subspace"),
                 F.col("n").alias("n_vectors"),
                 sim.round6_stable(
                     F.expr(f"CAST(q{s} AS DOUBLE) / 1e6 / n"))
                 .alias("mean_distortion6"))
        for s in range(PQ_M)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("subspace")


# ------------------------------------------ IVF nprobe recall sweep

NPROBE_SWEEP = (1, 2, 4, 8)
_SWEEP_NQ = 10  # query vectors (vec_id < 10, matching sim_ann_ivf)


def _nprobe_sweep_oracle() -> str:
    from ..operators import kmeans as km
    from .llm import IVF_NLIST
    nps = ", ".join(str(x) for x in NPROBE_SWEEP)
    maxp = max(NPROBE_SWEEP)
    return f"""
    WITH e AS (SELECT vec_id, {sim.as_double_sql('embedding')} AS demb
               FROM embeddings),
    n AS (SELECT vec_id, demb, {sim.norm_sql('demb')} AS nrm FROM e),
    {km.ivf_train_cte_sql(IVF_NLIST)},
    cent AS (SELECT cent_id, c_demb, {sim.norm_sql('c_demb')} AS c_nrm
             FROM tcent),
    ranked AS MATERIALIZED (
        SELECT n.vec_id, n.demb, n.nrm, cent.cent_id,
               row_number() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY {sim.dot_sql('n.demb', 'cent.c_demb')}
                            / (n.nrm * cent.c_nrm) DESC, cent.cent_id) AS rc
        FROM n CROSS JOIN cent),
    assign AS (SELECT vec_id, demb, nrm, cent_id FROM ranked WHERE rc = 1),
    probes AS (SELECT vec_id AS query_id, demb AS q_demb, nrm AS q_nrm,
                      cent_id, rc AS prc
               FROM ranked WHERE rc <= {maxp} AND vec_id < {_SWEEP_NQ}),
    cand AS MATERIALIZED (
        SELECT p.query_id, p.prc, a.vec_id AS neighbor_id,
               round({sim.dot_sql('p.q_demb', 'a.demb')}
                     / (p.q_nrm * a.nrm), 6) AS cosine
        FROM probes p JOIN assign a
          ON a.cent_id = p.cent_id AND a.vec_id != p.query_id),
    np AS (SELECT unnest([{nps}]) AS nprobe),
    topk AS (SELECT nprobe, query_id, neighbor_id FROM (
                 SELECT np.nprobe, c.query_id, c.neighbor_id,
                        row_number() OVER (
                            PARTITION BY np.nprobe, c.query_id
                            ORDER BY c.cosine DESC, c.neighbor_id) AS rn
                 FROM cand c CROSS JOIN np WHERE c.prc <= np.nprobe)
             WHERE rn <= 5),
    brute AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({sim.dot_sql('q.demb', 'x.demb')}
                                      / (q.nrm * x.nrm), 6) DESC,
                                x.vec_id) AS rn
            FROM n q JOIN n x ON x.vec_id != q.vec_id
            WHERE q.vec_id < {_SWEEP_NQ})
        WHERE rn <= 5),
    hits AS (SELECT t.nprobe, CAST(count(*) AS BIGINT) AS n_hits
             FROM topk t JOIN brute b USING (query_id, neighbor_id)
             GROUP BY 1),
    qs AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS nq FROM brute)
    SELECT np.nprobe, coalesce(h.n_hits, 0) AS n_hits,
           coalesce(h.n_hits, 0) * 1000000 // (5 * qs.nq) AS recall_ppm
    FROM np LEFT JOIN hits h ON h.nprobe = np.nprobe CROSS JOIN qs
    ORDER BY np.nprobe
    """


@register(
    "sim_ann_nprobe_sweep",
    oracle=_nprobe_sweep_oracle(),
    tags=("llm", "ann-ivf", "calibration"),
)
def q_ann_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cost/recall calibration: recall@5 against brute force at
    nprobe in {1,2,4,8} — the curve that fixes the production probe count
    (each step doubles scan cost for diminishing recall). The ANN
    counterpart of dedup_minhash_threshold_sweep.

    One index build serves every sweep point: candidates carry the PROBE
    RANK of their list, so "nprobe = p" is a filter (prc <= p) over one
    materialized candidate table — the corpus is scanned once for all
    sweep points, and the brute-force reference once. recall_ppm is
    integer arithmetic over exact hit counts."""
    from ..operators import kmeans as km
    from .llm import IVF_NLIST

    maxp = max(NPROBE_SWEEP)
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("demb"))
    n = pin(e.select("vec_id", "demb", sim.norm(F.col("demb")).alias("nrm")))
    cents = km.train_ivf_centroids(e, IVF_NLIST)
    cent = spark.createDataFrame(
        [(i, cents[i]) for i in range(IVF_NLIST)],
        "cent_id int, c_demb array<double>",
    ).withColumn("c_nrm", sim.norm(F.col("c_demb")))
    w = Window.partitionBy("vec_id").orderBy(
        (sim.dot(F.col("demb"), F.col("c_demb"))
         / (F.col("nrm") * F.col("c_nrm"))).desc(), "cent_id")
    ranked = (n.crossJoin(F.broadcast(cent))
              .withColumn("rc", F.row_number().over(w)))
    assign = ranked.filter(F.col("rc") == 1).select(
        "vec_id", "demb", "nrm", "cent_id")
    probes = (ranked.filter((F.col("rc") <= maxp)
                            & (F.col("vec_id") < _SWEEP_NQ))
              .select(F.col("vec_id").alias("query_id"),
                      F.col("demb").alias("q_demb"),
                      F.col("nrm").alias("q_nrm"),
                      F.col("cent_id").alias("p_cent_id"),
                      F.col("rc").alias("prc")))
    cand = pin(
        F.broadcast(probes)
        .join(assign, (F.col("cent_id") == F.col("p_cent_id"))
              & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", "prc", F.col("vec_id").alias("neighbor_id"),
                sim.cosine(sim.dot(F.col("q_demb"), F.col("demb")),
                           F.col("q_nrm"), F.col("nrm")).alias("cosine")))
    wnp = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id")
    topk = (cand.select(
                "*", F.explode(F.array(*[F.lit(p) for p in NPROBE_SWEEP]))
                .alias("nprobe"))
            .filter(F.col("prc") <= F.col("nprobe"))
            .withColumn("rn", F.row_number().over(wnp))
            .filter(F.col("rn") <= 5)
            .select("nprobe", "query_id", "neighbor_id"))
    q = (n.filter(F.col("vec_id") < _SWEEP_NQ)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("demb").alias("q_demb"),
                 F.col("nrm").alias("q_nrm")))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id")
    brute = pin(
        F.broadcast(q)
        .join(n, F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                sim.cosine(sim.dot(F.col("q_demb"), F.col("demb")),
                           F.col("q_nrm"), F.col("nrm")).alias("cosine"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id"))
    hits = (topk.join(brute, ["query_id", "neighbor_id"])
            .groupBy("nprobe").agg(F.count("*").alias("n_hits")))
    nps = spark.createDataFrame([(p,) for p in NPROBE_SWEEP], "nprobe int")
    qs = brute.agg(F.count_distinct("query_id").alias("nq"))
    return (nps.join(hits, "nprobe", "left")
            .crossJoin(F.broadcast(qs))
            .select("nprobe",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.expr("coalesce(n_hits, 0) * 1000000 div (5 * nq)")
                    .alias("recall_ppm"))
            .orderBy("nprobe"))


# ----------------------------- first-fit-decreasing sequence packing


def _ffd_oracle() -> str:
    from .llm import PACK_SEQ_LEN, PACK_SHARDS
    from ..functions.hashing import hash32_sql_duck
    cap, sh = PACK_SEQ_LEN, PACK_SHARDS
    return f"""
    WITH RECURSIVE b AS (
        SELECT doc_id,
               {hash32_sql_duck('CAST(doc_id AS VARCHAR)')} % {sh} AS shard,
               coalesce(CAST(ceil(length(text) / 4.0) AS BIGINT), 0) AS tok
        FROM documents),
    o AS (SELECT shard, doc_id, tok,
                 CAST(row_number() OVER (PARTITION BY shard
                                         ORDER BY tok DESC, doc_id)
                      AS BIGINT) AS rn
          FROM b),
    rec AS (
        SELECT shard, CAST(0 AS BIGINT) AS rn,
               CAST([] AS BIGINT[]) AS fills, CAST([] AS BIGINT[]) AS nd
        FROM (SELECT DISTINCT shard FROM o)
        UNION ALL
        SELECT o.shard, o.rn,
               CASE WHEN p IS NULL OR p = 0
                    THEN rec.fills || [o.tok]
                    ELSE list_transform(range(1, len(rec.fills) + 1),
                                        i -> CASE WHEN i = p
                                                  THEN rec.fills[i] + o.tok
                                                  ELSE rec.fills[i] END)
               END,
               CASE WHEN p IS NULL OR p = 0
                    THEN rec.nd || [CAST(1 AS BIGINT)]
                    ELSE list_transform(range(1, len(rec.nd) + 1),
                                        i -> CASE WHEN i = p
                                                  THEN rec.nd[i] + 1
                                                  ELSE rec.nd[i] END)
               END
        FROM rec JOIN o ON o.shard = rec.shard AND o.rn = rec.rn + 1
        CROSS JOIN LATERAL (
            SELECT list_position(
                list_transform(rec.fills, f -> f + o.tok <= {cap}),
                true) AS p) l),
    last AS (SELECT shard, max(rn) AS mrn FROM rec GROUP BY 1),
    fin AS (SELECT rec.shard, rec.fills, rec.nd
            FROM rec JOIN last ON rec.shard = last.shard
                              AND rec.rn = last.mrn),
    u AS (SELECT shard,
                 unnest(list_transform(range(1, len(fills) + 1),
                        i -> {{'b': i, 'f': fills[i], 'n': nd[i]}})) AS x
          FROM fin)
    SELECT shard, CAST(x.b AS BIGINT) AS bin_id, x.n AS n_docs,
           x.f AS n_tokens,
           x.f * 1000000 // {cap} AS fill_ppm
    FROM u ORDER BY shard, bin_id
    """


@register(
    "pack_sequences_first_fit",
    oracle=_ffd_oracle(),
    tags=("llm", "packing-ffd", "pandas-udf"),
)
def q_pack_first_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing bin packing per shard — the HIGH-FILL layout
    for document-intact sequence packing (pack_sequences_doc_intact keeps
    arrival order and leaves holes; FFD sorts by size and back-fills, the
    classic 11/9-OPT guarantee). Inherently sequential within a shard, so
    this is the designed showcase for the custom-operator escape hatch:
    an applyInPandas (Arrow-batched) FFD per shard, NOT a window trick.

    Scale shape: one shuffle on the shard key, then each shard's packing
    runs independently in a single pandas batch (at 100 TB: ~100k shards,
    each a bounded-size group — the same layout the parquet writer
    produces). The DuckDB oracle replays the per-shard sequential loop as
    a recursive CTE over (rank, bin-fill-list) state, so even the greedy
    placement decisions are value-checked. Integer-exact throughout."""
    import pandas as pd

    from .llm import PACK_SEQ_LEN, PACK_SHARDS
    from ..functions.hashing import hash32_col

    cap = PACK_SEQ_LEN
    d = spread(table(spark, sf_dir, "documents"))
    b = d.select(
        "doc_id",
        (hash32_col(F.col("doc_id").cast("string")) % PACK_SHARDS)
        .alias("shard"),
        F.coalesce(F.ceil(F.length("text") / 4.0).cast("long"), F.lit(0))
        .alias("tok"))

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tok", "doc_id"], ascending=[False, True])
        fills: list[int] = []
        ndocs: list[int] = []
        for tok in pdf["tok"]:
            t = int(tok)
            for i, f in enumerate(fills):
                if f + t <= cap:
                    fills[i] = f + t
                    ndocs[i] += 1
                    break
            else:
                fills.append(t)
                ndocs.append(1)
        shard = int(pdf["shard"].iloc[0])
        return pd.DataFrame({
            "shard": [shard] * len(fills),
            "bin_id": list(range(1, len(fills) + 1)),
            "n_docs": ndocs,
            "n_tokens": fills,
        })

    packed = b.groupBy("shard").applyInPandas(
        ffd, schema="shard long, bin_id long, n_docs long, n_tokens long")
    return (packed.select(
                "shard", "bin_id", "n_docs", "n_tokens",
                F.expr(f"n_tokens * 1000000 div {cap}").alias("fill_ppm"))
            .orderBy("shard", "bin_id"))


# ----------------------------- quality x duplication cross-diagnostic


def _quality_vs_dup_oracle() -> str:
    from ..operators.textstats import quality_sql
    qs = quality_sql("text")["quality_score"]
    r6 = sim.round6_stable_sql
    num = ("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))")
    vx = ("(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
    vy = ("(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
          " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))")
    return f"""
    {_span_cov_ctes()},
    cov AS (SELECT h.doc_id,
                   coalesce(a.tokens_covered, 0) * 1000000
                     // greatest(CAST(len(hs) AS BIGINT), 1) AS cov_ppm
            FROM h LEFT JOIN a USING (doc_id)),
    q AS (SELECT doc_id,
                 CAST(floor(({qs}) * 1e6 + 0.5) AS BIGINT) AS qx
          FROM documents),
    j AS (SELECT q.doc_id, qx, cov_ppm FROM q JOIN cov USING (doc_id)),
    b AS (SELECT {r6('quantile_cont(qx, 0.25)')} AS b1,
                 {r6('quantile_cont(qx, 0.5)')} AS b2,
                 {r6('quantile_cont(qx, 0.75)')} AS b3
          FROM j),
    mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(qx) AS BIGINT) AS sx,
                  CAST(sum(cov_ppm) AS BIGINT) AS sy,
                  CAST(sum(qx * cov_ppm) AS BIGINT) AS sxy,
                  CAST(sum(qx * qx) AS BIGINT) AS sxx,
                  CAST(sum(cov_ppm * cov_ppm) AS BIGINT) AS syy
           FROM j),
    r AS (SELECT CASE WHEN {vx} * {vy} = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE {r6(f'{num} / sqrt({vx} * {vy})')} END
                   AS pearson_r6
          FROM mo)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(cov_ppm) AS BIGINT) // count(*) AS mean_cov_ppm,
           pearson_r6
    FROM (SELECT j.*, CASE WHEN qx <= b1 THEN 'q1' WHEN qx <= b2 THEN 'q2'
                           WHEN qx <= b3 THEN 'q3' ELSE 'q4' END AS bin
          FROM j CROSS JOIN b) CROSS JOIN r
    GROUP BY bin, pearson_r6 ORDER BY bin
    """


@register(
    "curation_quality_vs_dup",
    oracle=_quality_vs_dup_oracle(),
    tags=("llm", "curation", "cross-signal"),
)
def q_quality_vs_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-signal diagnostic: does LOW quality predict HIGH duplication?
    Joins the per-doc quality score (ppm grid) with the duplicated-span
    coverage (dedup_span_removal_plan's cov_ppm) and reports mean coverage
    per quality quartile plus the corpus-wide Pearson correlation — the
    table that decides whether one gate can stand in for the other (a
    strong negative r means the quality cut already removes most dup mass).

    Exactness: both signals are int64 grids, so the five moment sums are
    exact order-free integers; the correlation is then assembled in double
    FROM those exact sums (n*sxy etc. would overflow int64 past ~sf0.1,
    and products of exactly-represented doubles are correctly rounded
    identically in both engines). Quartile boundaries follow the
    curation_quality_quartiles broadcast-percentile pattern. At 1e9+ docs
    shrink the grids (1e3) to keep the moment sums under 2^53."""
    from ..operators.textstats import quality_cols

    d = spread(table(spark, sf_dir, "documents"))
    q = d.select(
        "doc_id",
        F.floor(quality_cols(F.col("text"))["quality_score"] * F.lit(1e6)
                + F.lit(0.5)).cast("long").alias("qx"))
    cov = _span_coverage_df(spark, sf_dir).select(
        "doc_id", F.col("coverage_ppm").alias("cov_ppm"))
    j = pin(q.join(cov, "doc_id"))
    b = j.agg(
        sim.round6_stable(F.expr("percentile(qx, 0.25D)")).alias("b1"),
        sim.round6_stable(F.expr("percentile(qx, 0.5D)")).alias("b2"),
        sim.round6_stable(F.expr("percentile(qx, 0.75D)")).alias("b3"))
    mo = j.agg(
        F.count("*").alias("n"),
        F.sum("qx").alias("sx"),
        F.sum("cov_ppm").alias("sy"),
        F.sum(F.col("qx") * F.col("cov_ppm")).alias("sxy"),
        F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
        F.sum(F.col("cov_ppm") * F.col("cov_ppm")).alias("syy"))
    num = ("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))")
    vx = ("(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
    vy = ("(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
          " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))")
    r = mo.select(
        F.when(F.expr(f"{vx} * {vy}") == 0, F.lit(0.0).cast("double"))
        .otherwise(sim.round6_stable(F.expr(f"{num} / sqrt({vx} * {vy})")))
        .alias("pearson_r6"))
    binned = (j.crossJoin(F.broadcast(b))
              .withColumn("bin",
                          F.when(F.col("qx") <= F.col("b1"), "q1")
                          .when(F.col("qx") <= F.col("b2"), "q2")
                          .when(F.col("qx") <= F.col("b3"), "q3")
                          .otherwise("q4"))
              .crossJoin(F.broadcast(r)))
    return (binned.groupBy("bin", "pearson_r6")
            .agg(F.count("*").alias("n_docs"),
                 F.expr("CAST(sum(cov_ppm) AS BIGINT) div count(*)")
                 .alias("mean_cov_ppm"))
            .select("bin", "n_docs", "mean_cov_ppm", "pearson_r6")
            .orderBy("bin"))


# ------------------------------------------ greedy k-center coreset

KCENTER_K = 8  # centers; selection cost is K corpus passes


def _kcenter_oracle(k: int = KCENTER_K, dim: int = _DIM) -> str:
    """Replay the greedy farthest-point loop: seed = min vec_id, then
    round r picks argmax of the running min squared distance (ties to the
    lower vec_id). Center CTEs are MATERIALIZED — each is referenced per
    element by the next round's distance expression."""
    parts = [f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings),
    b AS MATERIALIZED (
        SELECT vec_id, emb, {sim.dot_sql('emb', 'emb', dim)} AS sq FROM e),
    c1 AS MATERIALIZED (
        SELECT vec_id AS cid, emb AS cemb, sq AS csq FROM b
        ORDER BY vec_id LIMIT 1),
    m1 AS MATERIALIZED (
        SELECT b.vec_id, b.emb, b.sq,
               b.sq - 2 * {sim.dot_sql('b.emb', 'c1.cemb', dim)} + c1.csq AS md
        FROM b CROSS JOIN c1)"""]
    for r in range(2, k + 1):
        parts.append(f""",
    c{r} AS MATERIALIZED (
        SELECT vec_id AS cid, emb AS cemb, sq AS csq, md AS seldist
        FROM m{r - 1} ORDER BY md DESC, vec_id LIMIT 1),
    m{r} AS MATERIALIZED (
        SELECT m.vec_id, m.emb, m.sq,
               least(m.md,
                     m.sq - 2 * {sim.dot_sql('m.emb', 'c.cemb', dim)} + c.csq)
                 AS md
        FROM m{r - 1} m CROSS JOIN c{r} c)""")
    sel = ["SELECT 1 AS center_rank, cid AS vec_id, "
           "CAST(0.0 AS DOUBLE) AS sel_dist6 FROM c1"]
    for r in range(2, k + 1):
        sel.append(f"SELECT {r}, cid, {sim.round6_stable_sql('seldist')} "
                   f"FROM c{r}")
    parts.append("\n    " + "\n    UNION ALL ".join(sel)
                 + "\n    ORDER BY center_rank")
    return "".join(parts)


@register(
    "sample_coreset_kcenter",
    oracle=_kcenter_oracle(),
    tags=("llm", "coreset", "iterative"),
)
def q_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity coreset by greedy k-center (farthest-point traversal):
    seed with the lowest vec_id, then repeatedly add the vector farthest
    (squared L2) from every chosen center — the classic 2-approximation
    that picks a maximally-spread exemplar set for eval panels / seed
    pools, complementing sample_cluster_medoids (which picks TYPICAL
    members; k-center picks EXTREME ones, covering the corpus hull).

    Scale shape: K corpus passes, each a map-only distance update against
    ONE new broadcast center plus a 1-row argmax reduce (TakeOrdered);
    the driver carries one 64-float center per round. The running min
    distance folds incrementally — round r computes ONE new dot product
    per row, not r of them. Exact IEEE doubles end to end (dot folds are
    order-pinned), so the oracle replays every selection decision."""
    e = pin(spread(table(spark, sf_dir, "embeddings"))
            .select("vec_id", sim.as_double(F.col("embedding")).alias("emb")))
    b = pin(e.select("vec_id", "emb",
                     sim.dot(F.col("emb"), F.col("emb")).alias("sq")))

    seed = b.orderBy("vec_id").limit(1).collect()[0]
    centers = [(1, seed["vec_id"], 0.0)]
    cemb, csq = list(seed["emb"]), float(seed["sq"])

    cur = b.select(
        "vec_id", "emb", "sq",
        (F.col("sq")
         - F.lit(2.0) * sim.dot(F.col("emb"),
                                F.array(*[F.lit(x) for x in cemb]))
         + F.lit(csq)).alias("md"))
    for r in range(2, KCENTER_K + 1):
        cur = pin(cur)
        far = cur.orderBy(F.col("md").desc(), "vec_id").limit(1).collect()[0]
        centers.append((r, far["vec_id"], float(far["md"])))
        cemb, csq = list(far["emb"]), float(far["sq"])
        cur = cur.select(
            "vec_id", "emb", "sq",
            F.least(
                F.col("md"),
                F.col("sq")
                - F.lit(2.0) * sim.dot(F.col("emb"),
                                       F.array(*[F.lit(x) for x in cemb]))
                + F.lit(csq)).alias("md"))

    spark_rows = [(r, int(v), d) for r, v, d in centers]
    out = spark.createDataFrame(
        spark_rows, "center_rank int, vec_id long, sel_dist double")
    return (out.select("center_rank", "vec_id",
                       sim.round6_stable(F.col("sel_dist")).alias("sel_dist6"))
            .orderBy("center_rank"))


# --------------------------------------- water-filling mixture allocation

WF_TARGET_PCT = 50  # global token budget = 50% of the corpus


def waterfill_alloc_sql(n_cte: str, target_pct: int = WF_TARGET_PCT) -> str:
    """The water-filling allocation over any ``n(source, n_tokens)``
    relation — parameterized so the hypothesis property test can hammer
    the SAME SQL over adversarial VALUES tables (tests/test_properties).

    Allocation keys off the RANK relative to the break point (rk >=
    first_capped), not off each row's own ``fits`` flag: for ranks below
    the break the fits chain guarantees cum <= budget, and the capped
    suffix then splits budget - cum_full exactly, so sum(allocated) ==
    budget holds BY CONSTRUCTION — even if integer-floor effects ever
    produced a non-monotone fits column, which the real-division
    monotonicity argument doesn't strictly cover."""
    return f"""
    WITH n AS ({n_cte}),
    t AS (SELECT source, n_tokens,
                 CAST(sum(n_tokens) OVER () * {target_pct} // 100
                      AS BIGINT) AS budget,
                 CAST(count(*) OVER () AS BIGINT) AS m,
                 CAST(row_number() OVER (ORDER BY n_tokens, source)
                      AS BIGINT) AS rk,
                 CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
                                          ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS cum
          FROM n),
    f AS (SELECT *,
                 n_tokens <= (budget - (cum - n_tokens)) // (m - rk + 1)
                   AS fits
          FROM t),
    brk AS (SELECT coalesce(min(rk) FILTER (WHERE NOT fits), max(m) + 1)
                     AS first_capped
            FROM f),
    lvl AS (SELECT b.first_capped,
                   coalesce((SELECT max(cum) FROM f
                             WHERE rk < b.first_capped), 0) AS cum_full,
                   (SELECT budget FROM f LIMIT 1) AS budget,
                   (SELECT m FROM f LIMIT 1) AS m
            FROM brk b),
    a AS (SELECT f.source, f.n_tokens, f.rk,
                 f.rk >= l.first_capped AS capped,
                 CASE WHEN f.rk < l.first_capped THEN f.n_tokens
                      ELSE (l.budget - l.cum_full) // (l.m - l.first_capped + 1)
                           + CASE WHEN f.rk - l.first_capped
                                       < (l.budget - l.cum_full)
                                         % (l.m - l.first_capped + 1)
                                  THEN 1 ELSE 0 END
                 END AS allocated
          FROM f CROSS JOIN lvl l)
    SELECT source, n_tokens, allocated, capped,
           allocated * 1000000 // greatest(n_tokens, 1) AS fill_ppm
    FROM a ORDER BY source
    """


_WF_N_CTE = """SELECT source,
                      CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT))
                           AS BIGINT) AS n_tokens
               FROM documents GROUP BY 1"""


@register(
    "curation_mixture_waterfill",
    oracle=waterfill_alloc_sql(_WF_N_CTE),
    tags=("llm", "mixture-waterfill"),
)
def q_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources by WATER-FILLING: small
    sources are taken whole, large ones are capped at a common level
    chosen so the allocations sum exactly to the global budget (50% of
    corpus tokens) — the standard "cap the dominant crawl, keep the long
    tail" mixing rule, solved in closed form (no iteration): sort sources
    by size ascending; source i fits whole iff n_i <= (remaining budget)/
    (remaining sources) — a monotone condition, so the first failure
    marks the capped suffix, which splits the remaining budget evenly
    with the integer remainder going to the lowest-ranked capped sources.
    Every step is integer window arithmetic; sum(allocated) == budget is
    asserted by a property test.

    Scale shape: one corpus scan to the per-source token table (bounded
    cardinality), then windows over that tiny table — the allocation is
    O(sources) regardless of corpus size."""
    d = spread(table(spark, sf_dir, "documents"))
    n = d.groupBy("source").agg(
        F.sum(F.ceil(F.length("text") / 4.0).cast("long")).alias("n_tokens"))
    wall = Window.partitionBy()
    word = Window.partitionBy().orderBy("n_tokens", "source")
    wcum = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = n.select(
        "source", "n_tokens",
        F.expr(f"sum(n_tokens) OVER () * {WF_TARGET_PCT} div 100")
        .alias("budget"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.row_number().over(word).cast("long").alias("rk"),
        F.sum("n_tokens").over(wcum).alias("cum"))
    f = t.withColumn(
        "fits",
        F.col("n_tokens")
        <= F.expr("(budget - (cum - n_tokens)) div (m - rk + 1)"))
    # the capped suffix starts at the first rank that does not fit; the
    # 1-row boundary aggregate broadcasts back over the source table, and
    # cum_full (cumulative tokens BEFORE the break) is computed from rk <
    # first_capped in a second tiny pass — the exact expression the oracle
    # uses, sidestepping any reliance on fits-monotonicity under floors
    brk = f.agg(
        F.coalesce(F.min(F.when(~F.col("fits"), F.col("rk"))),
                   F.max("m") + 1).alias("first_capped"))
    fb = f.crossJoin(F.broadcast(brk))
    cumf = fb.agg(
        F.coalesce(F.max(F.when(F.col("rk") < F.col("first_capped"),
                                F.col("cum"))), F.lit(0)).alias("cum_full"))
    # allocation keys off rank-vs-break, not per-row fits — see
    # waterfill_alloc_sql: sum(allocated) == budget by construction
    a = (fb.crossJoin(F.broadcast(cumf))
         .withColumn(
             "allocated",
             F.when(F.col("rk") < F.col("first_capped"), F.col("n_tokens"))
             .otherwise(F.expr(
                 "(budget - cum_full) div (m - first_capped + 1)"
                 " + CASE WHEN rk - first_capped <"
                 " (budget - cum_full) % (m - first_capped + 1)"
                 " THEN 1 ELSE 0 END"))))
    return (a.select(
                "source", "n_tokens", "allocated",
                (F.col("rk") >= F.col("first_capped")).alias("capped"),
                F.expr("allocated * 1000000 div greatest(n_tokens, 1)")
                .alias("fill_ppm"))
            .orderBy("source"))


# -------------------------------------------- session path mining

PATH_LEN = 4     # leading event types per session
PATH_TOP = 20    # report head


@register(
    "events_session_paths",
    oracle=f"""
    WITH o AS (SELECT user_id, ts, event_id, event_type,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                    event_id) AS prev_ts
               FROM events),
    f AS (SELECT user_id, ts, event_id, event_type,
                 CASE WHEN prev_ts IS NULL
                        OR epoch(ts) - epoch(prev_ts) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM o),
    s AS (SELECT user_id, ts, event_id, event_type,
                 CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY
                                             ts, event_id
                                             ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_id
          FROM f),
    p AS (SELECT user_id, session_id,
                 array_to_string(
                     list_slice(list(event_type ORDER BY ts, event_id),
                                1, {PATH_LEN}), '>') AS path
          FROM s GROUP BY 1, 2)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT {PATH_TOP}
    """,
    tags=("events", "session-paths"),
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining lite: the most common leading event-type PATHS
    (first 4 events) across lag-gap sessions — the "what do users actually
    do first" table funnels are designed from. Reuses the
    events_sessions_lag_gap sessionization (30-min gap, ts/event_id tie
    order).

    Scale shape: the per-session ordered path is an array_sort over a
    collect_list of (ts, event_id, type) structs — grouped per session,
    never a global sort; the path head is TakeOrdered (orderBy+limit).
    Ties inside one timestamp break on event_id, so the path string is
    deterministic and the oracle's ordered list() replays it exactly."""
    ev = spread(table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_s = F.when(
        F.col("prev_ts").isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800),
        1).otherwise(0)
    s = (ev.withColumn("prev_ts", F.lag("ts").over(w))
         .withColumn("new_session", new_s)
         .withColumn("session_id", F.sum("new_session").over(wrun)))
    p = (s.groupBy("user_id", "session_id")
         .agg(F.collect_list(F.struct("ts", "event_id", "event_type"))
              .alias("evs"))
         .select(F.concat_ws(
             ">",
             F.slice(F.transform(F.array_sort("evs"),
                                 lambda x: x["event_type"]),
                     1, PATH_LEN)).alias("path")))
    return (p.groupBy("path").agg(F.count("*").alias("n_sessions"))
            .orderBy(F.col("n_sessions").desc(), "path")
            .limit(PATH_TOP))


# ------------------------------------- sharded heavy-hitters (top users)

HH_TOP = 10    # report head
HH_PER_SHARD = 10  # per-shard candidate width
HH_SHARDS = 32
# Exactness argument (a true top-K user cannot be pruned because sharding
# is BY the key) requires every shard to surface at least HH_TOP
# candidates — raising HH_TOP without HH_PER_SHARD would silently break it.
# Explicit raise, not `assert`: the guard must survive `python -O`.
if HH_PER_SHARD < HH_TOP:
    raise ValueError("per-shard width must cover the report head "
                     f"(HH_PER_SHARD={HH_PER_SHARD} < HH_TOP={HH_TOP})")


@register(
    "events_heavy_hitters",
    oracle=f"""
    WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1)
    SELECT CAST(row_number() OVER (ORDER BY n_events DESC, user_id)
                AS BIGINT) AS rank,
           user_id, n_events
    FROM c ORDER BY n_events DESC, user_id LIMIT {HH_TOP}
    """,
    tags=("events", "heavy-hitters"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-activity users via SHARDED candidate generation: count per
    user (keys hash-colocate, so each user's count is exact), keep each
    shard's top-10 with a bounded per-shard window, then rank the
    32x10 candidate pool globally. Because sharding is BY the key, a true
    top-10 user can only be missed if 10 larger users share its shard —
    the oracle computes the true top-10 directly, so the row goes red if
    the prune ever drops one (the verification face of the pattern).

    Scale shape: at 1e10 keys the full ranked sort never happens — the
    shard window bounds the final gather to shards x 10 rows. The count
    aggregation itself is the one real shuffle; everything after operates
    on the candidate pool."""
    from ..functions.hashing import hash32_col

    ev = spread(table(spark, sf_dir, "events"))
    c = (ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
         .withColumn("shard",
                     hash32_col(F.col("user_id").cast("string"))
                     % HH_SHARDS))
    wsh = Window.partitionBy("shard").orderBy(
        F.col("n_events").desc(), "user_id")
    cand = (c.withColumn("srk", F.row_number().over(wsh))
            .filter(F.col("srk") <= HH_PER_SHARD))
    wg = Window.partitionBy().orderBy(F.col("n_events").desc(), "user_id")
    return (cand.select("user_id", "n_events")
            .orderBy(F.col("n_events").desc(), "user_id")
            .limit(HH_TOP)
            .select(F.row_number().over(wg).cast("long").alias("rank"),
                    "user_id", "n_events")
            .orderBy("rank"))
