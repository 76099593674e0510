"""Round-7 operator extensions: winnowing fingerprint overlap,
sorted-neighborhood dedup blocking, Kneser-Ney bigram scoring, MMR
diverse reranking, Neyman-allocated stratified sampling, aspect-ratio
batch bucketing for multimodal training, closed-form CUSUM drift
monitoring, MTLD lexical diversity, IDF-weighted Jaccard verification,
unigram-LM tokenizer Viterbi segmentation, and Kleinberg-style
two-state burst detection.

Registered into the r7 sampled prefix (registry bottom; these eleven
names plus the changed ``media_phash_near_dup`` and 38 oldest-certified
r2-era queries fill the driver's 50-query snapshot window). Style
contract matches llm_ext/llm_ext2/llm_ext3: every computed column
aliased identically on both engines, rational arithmetic or
int-quantized sums wherever a value crosses an aggregation
(cross-engine FP-order independence), round6_stable for the few
unavoidable libm calls, scalar output columns only (driver-canon safe),
DECIMAL(38,0)/HUGEINT for any product of two corpus-scale int64s.

Reference parity note: the reference (an asyncio NATS enrichment daemon,
/root/reference/src/service.py) has no analytics surface; these
operators extend the engine along the LLM-training-data axis the build
brief names as first-class (near-dup detection, record-linkage blocking,
LM-based quality scoring, diversity-aware retrieval, stratified corpus
sampling, multimodal batch construction).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Registry import FIRST among intra-package imports (worker re-import
# ordering; see llm_ext2.py's header note).
from ..registry import REGISTRY, pin, register, spread, table

from ..functions.hashing import hash32_col, hash32_sql_duck
from ..functions.text import TOKEN_RE, tokens_col
from ..operators import similarity as sim

_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"


# --------------------------------------------- winnowing fingerprints

# Schleimer et al.'s winnowing (the MOSS fingerprint scheme): hash every
# k-gram, slide a window of WIN_W k-gram positions, keep each window's
# minimum hash (rightmost position on ties — the paper's rule), dedup.
# Guarantees any shared run of >= w + k - 1 tokens shares a fingerprint
# (a complete window fits inside the shared region in both streams, its
# content is identical, and the rightmost-min rule is position-relative),
# at ~2/(w+1) the fingerprint density of full k-gram shingling.
#
# One-window-pass formulation: pack (hash, position) into a single
# sortable int u = h * 2^21 + (2^20 - i); the leading-window MIN of u is
# then the chosen (hash, rightmost-tie) of that window directly, and the
# fingerprint is u div 2^21 — no per-window argmax needed. (A previous
# trailing-running-min variant LOST the guarantee: context before a
# shared run could shadow the in-run minimum in one stream only —
# caught by test_winnowing_shared_run_guarantee, hypothesis.)
WIN_K = 3          # tokens per k-gram
WIN_W = 4          # winnowing window (k-gram positions)
WIN_POS_BITS = 21  # tie-field width; docs with >= 2^20 k-grams are
                   # filtered out (enforced in-query on both engines)
WIN_HH_DOCS = 8    # fingerprint doc-frequency cap (boilerplate guard)
WIN_MIN_SHARED = 2  # pairs must share >= 2 fingerprints


@register(
    "dedup_winnowing_overlap",
    oracle=None,  # set below
    tags=("llm", "dedup-winnowing"),
)
def q_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap detection: hash token 3-grams,
    winnow via the classic rule — each complete WIN_W-position window
    contributes its minimum hash, rightmost on ties (computed in ONE
    leading-window min over the packed (hash, position) int; see the
    constant block above) — then count shared fingerprints per doc
    pair. Output pairs sharing >= WIN_MIN_SHARED prints with their
    containment (shared / smaller fingerprint set) in ppm.

    Scale shape: winnowing shrinks the shingle stream ~2/(W+1) before
    anything shuffles; the pair join runs on fingerprint HASHES only
    (never text), and fingerprints seen in > WIN_HH_DOCS docs are
    dropped first — the boilerplate heavy-hitter guard that keeps
    candidate generation linear (same discipline as
    text_boilerplate_ngrams). Per-doc winnow is one partitioned window,
    no cross-doc state."""
    d = spread(table(spark, sf_dir, "documents"))
    t = d.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    g = (t.filter(F.size("toks") >= WIN_K)
         .select("doc_id", "toks",
                 F.explode(F.sequence(
                     F.lit(1), F.size("toks") - (WIN_K - 1))).alias("i"))
         .select("doc_id", "i",
                 hash32_col(F.concat_ws(" ", *[
                     F.element_at("toks", F.col("i") + j)
                     for j in range(WIN_K)])).alias("h")))
    tie_mod = 1 << WIN_POS_BITS
    u = (F.col("h") * tie_mod + (F.lit(tie_mod // 2) - F.col("i")))
    wdoc = Window.partitionBy("doc_id")
    wlead = (Window.partitionBy("doc_id").orderBy("i")
             .rowsBetween(0, WIN_W - 1))
    # np < 2^(POS_BITS-1) guard: the packed tie field is (2^20 - i), so a
    # doc with >= 2^20 k-grams would drive it negative and corrupt both
    # the recovered hash (wm div 2^21) and the rightmost-tie rule — on
    # BOTH engines identically, which parity would mask. Such docs are
    # excluded outright (none exist in any fixture; at real scale a >1M-
    # token doc belongs in a length-capped preprocessing tier anyway).
    fp = (g.select("doc_id", "i", u.alias("u"),
                   F.count("*").over(wdoc).alias("np"))
          .select("doc_id", "i", "np",
                  F.min("u").over(wlead).alias("wm"))
          .filter((F.col("i") <= F.col("np") - (WIN_W - 1))
                  & (F.col("np") < F.lit(tie_mod // 2)))
          .select("doc_id",
                  F.expr(f"wm div {tie_mod}").alias("h")).distinct())
    fp = pin(fp)
    dc = fp.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("nfp"))
    keep = (fp.groupBy("h").agg(F.count("*").alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= WIN_HH_DOCS))
            .select("h"))
    use = fp.join(keep, "h")
    a = use.select(F.col("doc_id").alias("doc_a"), "h")
    b = use.select(F.col("doc_id").alias("doc_b"), "h")
    pairs = (a.join(b, "h")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").cast("bigint").alias("n_shared"))
             .filter(F.col("n_shared") >= WIN_MIN_SHARED))
    fa = dc.select(F.col("doc_id").alias("doc_a"), F.col("nfp").alias("fa"))
    fb = dc.select(F.col("doc_id").alias("doc_b"), F.col("nfp").alias("fb"))
    return (pairs.join(fa, "doc_a").join(fb, "doc_b")
            .select("doc_a", "doc_b", "n_shared",
                    F.expr("n_shared * 1000000 div least(fa, fb)")
                    .cast("bigint").alias("overlap_ppm"))
            .orderBy("doc_a", "doc_b"))


def _winnowing_oracle() -> str:
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(WIN_K))
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, i, {hash32_sql_duck(gram)} AS h
          FROM (SELECT doc_id, toks,
                       unnest(range(1, len(toks) - {WIN_K - 2})) AS i
                FROM t WHERE len(toks) >= {WIN_K})),
    fp AS (SELECT DISTINCT doc_id,
                  wm // {1 << WIN_POS_BITS} AS h
           FROM (
               SELECT doc_id, i, np,
                      min(u) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN CURRENT ROW
                                   AND {WIN_W - 1} FOLLOWING) AS wm
               FROM (SELECT doc_id, i,
                            h * {1 << WIN_POS_BITS}
                              + ({1 << (WIN_POS_BITS - 1)} - i) AS u,
                            count(*) OVER (PARTITION BY doc_id) AS np
                     FROM g))
           WHERE i <= np - {WIN_W - 1}
             AND np < {1 << (WIN_POS_BITS - 1)}),
    dc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
           FROM fp GROUP BY 1),
    keep AS (SELECT h FROM fp GROUP BY h
             HAVING count(*) BETWEEN 2 AND {WIN_HH_DOCS}),
    use AS (SELECT fp.doc_id, fp.h FROM fp JOIN keep USING (h)),
    pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(count(*) AS BIGINT) AS n_shared
              FROM use a JOIN use b
                ON a.h = b.h AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= {WIN_MIN_SHARED})
    SELECT doc_a, doc_b, n_shared,
           CAST(n_shared * 1000000 // least(fa.nfp, fb.nfp) AS BIGINT)
             AS overlap_ppm
    FROM pairs JOIN dc fa ON fa.doc_id = pairs.doc_a
               JOIN dc fb ON fb.doc_id = pairs.doc_b
    ORDER BY doc_a, doc_b
    """


REGISTRY["dedup_winnowing_overlap"].oracle = _winnowing_oracle()


# ---------------------------------------- sorted-neighborhood blocking

# Classic sorted-neighborhood record linkage (Hernandez & Stolfo): sort
# on a normalized key, compare only rows within a sliding window. Here
# the window is confined to 2-char key blocks so the rank window is a
# partitioned (parallel) window, never a global single-partition sort —
# the standard "blocked SNM" compromise at scale.
SNM_KEYLEN = 32     # normalized sort-key prefix length
SNM_BLOCKLEN = 2    # block = leading chars of the key (window never spans)
SNM_WINDOW = 4      # neighborhood: pairs within rank distance 1..3
SNM_DUP_PPM = 300_000  # token-Jaccard >= 0.3 -> flagged duplicate


@register(
    "dedup_sorted_neighborhood",
    oracle=None,  # set below
    tags=("llm", "dedup-snm"),
)
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup blocking: normalize each doc to an
    alphanumeric sort key, rank within 2-char key blocks, pair rows
    within rank distance < SNM_WINDOW, then verify each pair with exact
    distinct-token Jaccard (ppm). Emits every neighborhood pair with
    its similarity and an is_dup flag at the 0.3 threshold — the
    blocking-quality report a linkage pipeline tunes against.

    Scale shape: one shuffle on the block key, a parallel per-block
    rank window (blocks bound window state; no global ordering), and a
    rank-distance self-join that emits <= W-1 pairs per row — linear in
    corpus size, never all-pairs. The Jaccard verify joins distinct-
    token ARRAYS to the pair list by doc id and intersects per pair —
    work bounded by candidate count x doc length, immune to the token-
    frequency blowup an exploded token-equi-join suffers on stopwords
    (observed 10x on the exploded form at sf0.1)."""
    d = spread(table(spark, sf_dir, "documents"))
    keyed = d.select(
        "doc_id",
        F.substring(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""),
                    1, SNM_KEYLEN).alias("k"))
    keyed = keyed.withColumn(
        "blk", F.substring("k", 1, SNM_BLOCKLEN))
    rn = F.row_number().over(
        Window.partitionBy("blk").orderBy("k", "doc_id"))
    r = pin(keyed.select("doc_id", "blk", rn.alias("rn")))
    a = r.select(F.col("doc_id").alias("doc_a"), "blk",
                 F.col("rn").alias("ra"))
    b = r.select(F.col("doc_id").alias("doc_b"), "blk",
                 F.col("rn").alias("rb"))
    cand = (a.join(b, "blk")
            .filter((F.col("rb") > F.col("ra"))
                    & (F.col("rb") - F.col("ra") < SNM_WINDOW))
            .select("doc_a", "doc_b"))
    dt = pin(d.select(
        "doc_id",
        F.array_distinct(tokens_col(F.col("text"))).alias("dtoks")))
    ta = dt.select(F.col("doc_id").alias("doc_a"),
                   F.col("dtoks").alias("da"))
    tb = dt.select(F.col("doc_id").alias("doc_b"),
                   F.col("dtoks").alias("db"))
    j = (cand.join(ta, "doc_a").join(tb, "doc_b")
         .select("doc_a", "doc_b",
                 F.size(F.array_intersect("da", "db")).cast("bigint")
                 .alias("inter"),
                 F.size("da").cast("bigint").alias("na"),
                 F.size("db").cast("bigint").alias("nb")))
    jac = F.expr("inter * 1000000 div greatest(na + nb - inter, 1)")
    return (j.select(
        "doc_a", "doc_b",
        jac.cast("bigint").alias("jaccard_ppm"),
        (jac >= SNM_DUP_PPM).cast("int").alias("is_dup"))
        .orderBy("doc_a", "doc_b"))


def _snm_oracle() -> str:
    return f"""
    WITH keyed AS (
        SELECT doc_id,
               substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                      1, {SNM_KEYLEN}) AS k
        FROM documents),
    r AS (SELECT doc_id, substr(k, 1, {SNM_BLOCKLEN}) AS blk,
                 row_number() OVER (
                     PARTITION BY substr(k, 1, {SNM_BLOCKLEN})
                     ORDER BY k, doc_id) AS rn
          FROM keyed),
    cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM r a JOIN r b
               ON a.blk = b.blk AND b.rn > a.rn
              AND b.rn - a.rn < {SNM_WINDOW}),
    dt AS (SELECT doc_id, list_distinct({_TOKS}) AS dtoks
           FROM documents),
    j AS (SELECT c.doc_a, c.doc_b,
                 CAST(len(list_intersect(a.dtoks, b.dtoks)) AS BIGINT)
                   AS inter,
                 CAST(len(a.dtoks) AS BIGINT) AS na,
                 CAST(len(b.dtoks) AS BIGINT) AS nb
          FROM cand c JOIN dt a ON a.doc_id = c.doc_a
                      JOIN dt b ON b.doc_id = c.doc_b)
    SELECT doc_a, doc_b,
           CAST(inter * 1000000 // greatest(na + nb - inter, 1) AS BIGINT)
             AS jaccard_ppm,
           CAST(inter * 1000000 // greatest(na + nb - inter, 1)
                >= {SNM_DUP_PPM} AS INT) AS is_dup
    FROM j ORDER BY doc_a, doc_b
    """


REGISTRY["dedup_sorted_neighborhood"].oracle = _snm_oracle()


# ------------------------------------------ Kneser-Ney bigram scoring

# Interpolated Kneser-Ney — the smoothing used by the KenLM-style models
# that production quality filters (CCNet et al.) score documents with.
# Upgrade over text_bigram_lm_score's Jelinek-Mercer mix: absolute
# discounting plus a CONTINUATION unigram (how many distinct contexts a
# word follows), which stops high-frequency-but-context-bound words
# ("francisco") inflating backoff mass.
KN_D = "CAST(0.75 AS DOUBLE)"   # absolute discount, pinned
KN_QUANT = 1e12                 # per-term ln() quantization grid


@register(
    "text_kneser_ney_bigram",
    oracle=None,  # set below
    tags=("llm", "lm-score", "kneser-ney"),
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring: train corpus bigram
    counts, per-context distinct-follower counts, and continuation
    counts; score each doc by mean negative log-likelihood of its
    bigrams under p(w2|w1) = (c12 - D)/c1 + D*(N1+(w1,*)/c1) *
    (N1+(*,w2)/|bigram types|). Every bigram observed in a doc is in
    the corpus counts, so c12 >= 1 > D keeps all probabilities
    positive without extra flooring.

    Scale shape: three vocabulary-keyed aggregates with map-side
    partials (bigram counts, context stats, continuation counts), then
    the doc's bigram stream joins them on natural keys (AQE splits the
    stopword-head skew); the per-doc reduce carries one exact int64.
    Each ln() term is quantized to a 1e-12 grid and summed as int64
    (same discipline as text_bigram_lm_score) so partition order can't
    move the sum and a 1-ulp libm difference is absorbed by the 6-dp
    rounding."""
    d = spread(table(spark, sf_dir, "documents"))
    t = d.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    bg = (t.filter(F.size("toks") >= 2)
          .select("doc_id", "toks",
                  F.explode(F.sequence(F.lit(1),
                                       F.size("toks") - 1)).alias("i"))
          .select("doc_id",
                  F.element_at("toks", F.col("i")).alias("w1"),
                  F.element_at("toks", F.col("i") + 1).alias("w2")))
    bg = pin(bg)
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    big = pin(big)
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"),
                                F.count("*").alias("nf"))
    cont = big.groupBy("w2").agg(F.count("*").alias("nb"))
    types = big.agg(F.count("*").cast("bigint").alias("n_types"))
    disc = F.expr(KN_D)
    term = F.log(
        ((F.col("c12").cast("double") - disc) / F.col("c1"))
        + ((disc * (F.col("nf") / F.col("c1").cast("double")))
           * (F.col("nb") / F.col("n_types").cast("double"))))
    terms = (bg.join(big, ["w1", "w2"])
             .join(ctx, "w1")
             .join(cont, "w2")
             .crossJoin(F.broadcast(types))
             .select("doc_id",
                     F.floor(term * F.lit(KN_QUANT) + F.lit(0.5))
                     .cast("long").alias("tq")))
    scored = terms.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("tq").cast("bigint").alias("s"))
    return (d.select("doc_id").join(scored, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_bigrams", F.lit(0)).cast("bigint")
                .alias("n_bigrams"),
                sim.round6_stable(
                    F.when(F.col("n_bigrams") > 0,
                           -((F.col("s") / F.lit(KN_QUANT))
                             / F.col("n_bigrams")))
                    .otherwise(F.lit(0.0))).alias("kn_nll"))
            .orderBy("doc_id"))


def _kn_oracle() -> str:
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
           FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
                 FROM t WHERE len(toks) >= 2)),
    big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS nf
            FROM big GROUP BY 1),
    cont AS (SELECT w2, count(*) AS nb FROM big GROUP BY 1),
    types AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM big),
    terms AS (
        SELECT bg.doc_id,
               CAST(floor(
                 ln(((CAST(big.c12 AS DOUBLE) - {KN_D}) / ctx.c1)
                    + (({KN_D} * (ctx.nf / CAST(ctx.c1 AS DOUBLE)))
                       * (cont.nb / CAST(types.n_types AS DOUBLE))))
                 * {KN_QUANT!r} + 0.5) AS BIGINT) AS tq
        FROM bg JOIN big USING (w1, w2) JOIN ctx USING (w1)
                JOIN cont USING (w2) CROSS JOIN types),
    scored AS (SELECT doc_id, count(*) AS n_bigrams,
                      CAST(sum(tq) AS BIGINT) AS s FROM terms GROUP BY 1)
    SELECT d.doc_id,
           CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           {sim.round6_stable_sql(
               'CASE WHEN s.n_bigrams > 0 '
               f'THEN -((s.s / {KN_QUANT!r}) / s.n_bigrams) '
               'ELSE 0.0 END')} AS kn_nll
    FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    ORDER BY d.doc_id
    """


REGISTRY["text_kneser_ney_bigram"].oracle = _kn_oracle()


# ------------------------------------------------ MMR diverse rerank

# Maximal Marginal Relevance (Carbonell & Goldstein): greedy selection
# maximizing lambda*relevance - (1-lambda)*max-similarity-to-selected.
# lambda = 0.7 is applied as integer weights 7/3 on ppm-quantized
# cosines, so the greedy argmax is exact integer comparison on both
# engines (ties break on vec_id).
# Constants live in operators/similarity (a leaf module) so sibling
# query modules can embed the same literals without importing THIS
# module at import time (worker re-import safety; see the note above
# PINNED_QUERY_VEC). Aliased here for this module's queries and tests.
MMR_QUERY = sim.PINNED_QUERY_VEC
MMR_QNORM = sim.PINNED_QUERY_NORM
MMR_CAND = 24   # relevance-pruned rerank pool
MMR_K = 8       # selections

MMR_SCHEMA = StructType([
    StructField("step", LongType()),
    StructField("vec_id", LongType()),
    StructField("rel_ppm", LongType()),
    StructField("mmr_score", LongType()),
])


@register(
    "sim_mmr_diverse_topk",
    oracle=None,  # set below
    tags=("llm", "similarity", "mmr", "rerank"),
)
def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware retrieval: score the corpus against a pinned
    query vector, prune to the MMR_CAND most relevant, then greedily
    select MMR_K results maximizing 7*rel_ppm - 3*max_sim_ppm (MMR,
    lambda=0.7 in integer ppm arithmetic). The greedy runs over the
    bounded candidate pool in a single cogrouped applyInPandas — the
    standard retrieve-then-rerank shape, where stage 1 is distributed
    and exact and stage 2 touches only O(CAND^2) integers.

    Scale shape: the relevance scan broadcasts one literal vector and
    never shuffles the corpus; the prune is TakeOrdered (top-CAND);
    pairwise sims exist only among the 24 survivors (a broadcast
    nested-loop over the bounded pool — Catalyst folds the constant
    join key; never a corpus cartesian); the greedy is driver-free and
    engine-exact because every compared quantity is an int64. The
    oracle replays the identical greedy via a recursive CTE carrying
    the selected-id list."""
    import pandas as pd

    e = spread(table(spark, sf_dir, "embeddings"))
    demb = sim.as_double(F.col("embedding"))
    scored = e.select(
        "vec_id", demb.alias("demb"),
        sim.norm(demb).alias("nrm"),
        F.floor(
            (sim.dot(sim.plane_lit(MMR_QUERY), demb)
             / (F.lit(MMR_QNORM) * sim.norm(demb)))
            * F.lit(1e6) + F.lit(0.5)).cast("long").alias("rel_ppm"))
    cand = pin(scored.orderBy(F.col("rel_ppm").desc(), "vec_id")
               .limit(MMR_CAND))
    a = cand.select(F.lit(1).alias("g"), F.col("vec_id").alias("va"),
                    F.col("demb").alias("da"), F.col("nrm").alias("na"))
    b = cand.select(F.lit(1).alias("g"), F.col("vec_id").alias("vb"),
                    F.col("demb").alias("db"), F.col("nrm").alias("nb"))
    pairs = (a.join(b, "g")
             .filter(F.col("va") != F.col("vb"))
             .select(
                 F.lit(1).alias("g"), "va", "vb",
                 F.floor(
                     (sim.dot(F.col("da"), F.col("db"))
                      / (F.col("na") * F.col("nb")))
                     * F.lit(1e6) + F.lit(0.5)).cast("long")
                 .alias("sim_ppm")))
    cg = cand.select(F.lit(1).alias("g"), "vec_id", "rel_ppm")

    def greedy(cand_pdf: pd.DataFrame, pair_pdf: pd.DataFrame) -> pd.DataFrame:
        rel = {int(v): int(r)
               for v, r in zip(cand_pdf["vec_id"], cand_pdf["rel_ppm"])}
        sm = {(int(x), int(y)): int(s)
              for x, y, s in zip(pair_pdf["va"], pair_pdf["vb"],
                                 pair_pdf["sim_ppm"])}
        selected: list[int] = []
        rows = []
        for step in range(1, min(MMR_K, len(rel)) + 1):
            best = None
            for u in sorted(rel):
                if u in selected:
                    continue
                mx = max((sm[(u, s)] for s in selected), default=0)
                score = 7 * rel[u] - 3 * mx
                if best is None or score > best[0]:
                    best = (score, u)
            selected.append(best[1])
            rows.append((step, best[1], rel[best[1]], best[0]))
        return pd.DataFrame(rows, columns=[f.name for f in MMR_SCHEMA.fields])

    return (cg.groupBy("g")
            .cogroup(pairs.groupBy("g"))
            .applyInPandas(lambda lk, rk: greedy(lk, rk), MMR_SCHEMA)
            .orderBy("step"))


def _mmr_oracle() -> str:
    qdot = sim.dot_weights_sql(MMR_QUERY, "demb")
    vnorm = f"sqrt({sim.dot_sql('demb', 'demb')})"
    return f"""
    WITH RECURSIVE
    e AS (SELECT vec_id, {sim.as_double_sql('embedding')} AS demb
          FROM embeddings),
    scored AS (
        SELECT vec_id, demb, {vnorm} AS nrm,
               CAST(floor(
                   ({qdot} / (CAST('{MMR_QNORM!r}' AS DOUBLE) * {vnorm}))
                   * 1e6 + 0.5) AS BIGINT) AS rel_ppm
        FROM e),
    cand AS (SELECT vec_id, demb, nrm, rel_ppm FROM scored
             ORDER BY rel_ppm DESC, vec_id LIMIT {MMR_CAND}),
    pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(floor(
                   ({sim.dot_sql('a.demb', 'b.demb')} / (a.nrm * b.nrm))
                   * 1e6 + 0.5) AS BIGINT) AS sim_ppm
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
    sel(step, vec_id, rel_ppm, mmr_score, ids) AS (
        (SELECT 1, vec_id, rel_ppm, 7 * rel_ppm, [vec_id] FROM cand
         ORDER BY rel_ppm DESC, vec_id LIMIT 1)
        UNION ALL
        (SELECT s.step + 1, nxt.vec_id, nxt.rel_ppm, nxt.score,
                list_append(s.ids, nxt.vec_id)
         FROM sel s, LATERAL (
            SELECT c.vec_id, c.rel_ppm,
                   7 * c.rel_ppm - 3 * max(p.sim_ppm) AS score
            FROM cand c JOIN pairs p
              ON p.va = c.vec_id AND list_contains(s.ids, p.vb)
            WHERE NOT list_contains(s.ids, c.vec_id)
            GROUP BY c.vec_id, c.rel_ppm
            ORDER BY score DESC, c.vec_id LIMIT 1) nxt
         WHERE s.step < {MMR_K}))
    SELECT CAST(step AS BIGINT) AS step, CAST(vec_id AS BIGINT) AS vec_id,
           CAST(rel_ppm AS BIGINT) AS rel_ppm,
           CAST(mmr_score AS BIGINT) AS mmr_score
    FROM sel ORDER BY step
    """


REGISTRY["sim_mmr_diverse_topk"].oracle = _mmr_oracle()


# ------------------------------------------- Neyman-allocated sampling

# Neyman (optimal) allocation for stratified sampling: sample budget per
# stratum proportional to N_h * S_h (stratum size x within-stratum std
# of the measured variable) — the variance-minimizing allocation, vs the
# size-proportional allocation sample_stratified uses.
NEYMAN_BUDGET = 200   # total docs to sample


@register(
    "sample_neyman_allocation",
    oracle=None,  # set below
    tags=("llm", "sampling", "neyman"),
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocated stratified sample over sources: per-source doc
    count, exact integer variance of n_chars (n*sum(v^2) - sum(v)^2 in
    DECIMAL(38,0) — v up to 1e6 chars at 1e10 docs needs ~1e32, far
    past int64), allocation = budget * N_h*std_h / sum, capped at N_h,
    then a realized deterministic hash-ordered sample per source with
    its achieved mean length.

    Exactness: the variance numerator is exact 128-bit integer; it
    reaches double via a VARCHAR round-trip (string->double parse is
    correctly rounded in both engines where DECIMAL->DOUBLE is not —
    see dot_weights_sql's note); sqrt is IEEE-correctly-rounded by
    mandate; the remaining /, *, + sequence is pinned. Allocations are
    integer div on DECIMAL(38,0). Scale shape: one groupBy(source)
    with map-side partials, totals via a window over the ~|sources|-row
    aggregate, and a per-source rank window for the realized draw —
    all source-partitioned, no global sort."""
    d = spread(table(spark, sf_dir, "documents"))
    v = F.col("n_chars").cast("bigint")
    s = (d.select("source", v.alias("v"))
         .groupBy("source")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum("v").cast("bigint").alias("sv"),
              F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)"))
              .cast("decimal(38,0)").alias("svv")))
    s = s.withColumn(
        "std_micro",
        F.expr("CAST(floor(sqrt(CAST(CAST("
               "CAST(n AS DECIMAL(38,0)) * svv"
               " - CAST(sv AS DECIMAL(38,0)) * sv"
               " AS STRING) AS DOUBLE)) / n * 1e6 + 0.5) AS BIGINT)"))
    s = s.withColumn(
        "weight", F.expr("CAST(n AS DECIMAL(38,0)) * std_micro"))
    wall = Window.partitionBy()
    g = s.withColumn("tw", F.sum("weight").over(wall))
    alloc = g.select(
        "source", F.col("n").alias("n_docs"), "std_micro",
        F.least(
            F.col("n"),
            F.expr(f"CAST(CAST({NEYMAN_BUDGET} AS DECIMAL(38,0)) * weight"
                   " div greatest(tw, 1) AS BIGINT)"))
        .cast("bigint").alias("alloc_docs"))
    rnw = Window.partitionBy("source").orderBy(
        hash32_col(F.concat(F.lit("neyman_"),
                            F.col("doc_id").cast("string"))), "doc_id")
    picked = (d.select("source", "doc_id", v.alias("v"))
              .withColumn("rn", F.row_number().over(rnw))
              .join(alloc.select("source", "alloc_docs"), "source")
              .filter(F.col("rn") <= F.col("alloc_docs"))
              .groupBy("source")
              .agg(F.count("*").cast("bigint").alias("n_sampled"),
                   F.sum("v").cast("bigint").alias("ssum")))
    return (alloc.join(picked, "source", "left")
            .select(
                "source", "n_docs", "std_micro", "alloc_docs",
                F.coalesce("n_sampled", F.lit(0)).cast("bigint")
                .alias("n_sampled"),
                F.expr("CAST(coalesce(ssum, 0) * 1000000"
                       " div greatest(coalesce(n_sampled, 0), 1)"
                       " AS BIGINT)").alias("sample_mean_chars_ppm"))
            .orderBy("source"))


def _neyman_oracle() -> str:
    hkey = hash32_sql_duck("'neyman_' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sv,
               sum(CAST(n_chars AS HUGEINT) * n_chars) AS svv
        FROM documents GROUP BY 1),
    w AS (SELECT source, n, sv, svv,
                 CAST(floor(sqrt(CAST(CAST(
                     CAST(n AS HUGEINT) * svv
                     - CAST(sv AS HUGEINT) * sv
                     AS VARCHAR) AS DOUBLE)) / n * 1e6 + 0.5) AS BIGINT)
                   AS std_micro
          FROM s),
    g AS (SELECT *, CAST(n AS HUGEINT) * std_micro AS weight,
                 sum(CAST(n AS HUGEINT) * std_micro) OVER () AS tw
          FROM w),
    alloc AS (SELECT source, n AS n_docs, std_micro,
                     CAST(least(CAST(n AS HUGEINT),
                          CAST({NEYMAN_BUDGET} AS HUGEINT) * weight
                          // greatest(tw, 1)) AS BIGINT) AS alloc_docs
              FROM g),
    rnk AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS v,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY {hkey}, doc_id) AS rn
            FROM documents),
    picked AS (SELECT r.source,
                      CAST(count(*) AS BIGINT) AS n_sampled,
                      CAST(sum(r.v) AS BIGINT) AS ssum
               FROM rnk r JOIN alloc a ON a.source = r.source
               WHERE r.rn <= a.alloc_docs GROUP BY 1)
    SELECT a.source, a.n_docs, a.std_micro, a.alloc_docs,
           CAST(coalesce(p.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(coalesce(p.ssum, 0) * 1000000
                // greatest(coalesce(p.n_sampled, 0), 1) AS BIGINT)
             AS sample_mean_chars_ppm
    FROM alloc a LEFT JOIN picked p ON p.source = a.source
    ORDER BY a.source
    """


REGISTRY["sample_neyman_allocation"].oracle = _neyman_oracle()


# --------------------------------------- aspect-ratio batch bucketing

# Aspect-ratio bucketing for image-model training (the SDXL-style batch
# construction rule): images batch only with same-aspect peers, so each
# image snaps to the nearest of a pinned bucket list and batches fill
# within (bucket). Aspect is compared in exact ppm integers.
ASPECT_BUCKETS = [("1:1", 1, 1), ("3:4", 3, 4), ("4:3", 4, 3),
                  ("9:16", 9, 16), ("16:9", 16, 9)]
ASPECT_BATCH = 8  # images per training batch


@register(
    "media_aspect_bucket_batches",
    oracle=None,  # set below
    tags=("llm", "multimodal", "aspect-bucket"),
)
def q_aspect_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucket batching over binary media: decode metadata
    via the Arrow-batched mapInPandas stub (operators/multimodal
    .media_metadata), snap each image's width/height ratio (ppm) to
    the nearest pinned aspect bucket (|aspect - bucket| in exact
    integers, ties to the earlier bucket), assign doc_id-ordered
    batches of ASPECT_BATCH within each bucket, and report per bucket:
    image count, batch count, tail-batch fill, and mean absolute
    aspect deviation (ppm).

    Scale shape: payloads never shuffle — metadata rows (ints) do; the
    bucket snap is a 5-way literal explode + per-doc min window (no
    join against a bucket table needed at any scale); batch assignment
    is one bucket-partitioned rank window (buckets bound window state).
    The oracle replays the md5 stub arithmetic byte-for-byte."""
    from ..operators.multimodal import media_metadata, with_payload
    d = with_payload(spread(table(spark, sf_dir, "documents")))
    meta = media_metadata(d).select(
        "doc_id",
        F.expr("CAST(fake_width AS BIGINT) * 1000000"
               " div fake_height").alias("aspect_ppm"))
    snapped = meta.select(
        "doc_id", "aspect_ppm",
        F.posexplode(F.array(*[
            F.lit(w * 1_000_000 // h) for _, w, h in ASPECT_BUCKETS
        ])).alias("bi", "bppm"))
    snapped = snapped.select(
        "doc_id", "bi",
        F.abs(F.col("aspect_ppm") - F.col("bppm")).cast("bigint")
        .alias("dist"))
    pick = (snapped
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("doc_id").orderBy("dist", "bi")))
            .filter(F.col("rn") == 1)
            .select("doc_id", "bi", "dist"))
    batched = pick.withColumn(
        "batch_id", F.expr(f"(row_number() OVER (PARTITION BY bi"
                           f" ORDER BY doc_id) - 1) div {ASPECT_BATCH}"))
    rep = (batched.groupBy("bi")
           .agg(F.count("*").cast("bigint").alias("n_images"),
                (F.max("batch_id") + 1).cast("bigint").alias("n_batches"),
                F.sum("dist").cast("bigint").alias("sdist"),
                F.max("batch_id").cast("bigint").alias("mb")))
    bucket_name = F.element_at(
        F.array(*[F.lit(nm) for nm, _, _ in ASPECT_BUCKETS]),
        F.col("bi").cast("int") + 1)
    return (rep.select(
        bucket_name.alias("bucket"),
        "n_images", "n_batches",
        (F.col("n_images") - F.col("mb") * ASPECT_BATCH).cast("bigint")
        .alias("tail_fill"),
        F.expr("sdist div n_images").cast("bigint").alias("mad_ppm"))
        .orderBy("bucket"))


def _aspect_oracle() -> str:
    buckets = ", ".join(f"({i}, '{nm}', {w * 1_000_000 // h})"
                        for i, (nm, w, h) in enumerate(ASPECT_BUCKETS))
    return f"""
    WITH meta AS (
        SELECT doc_id,
               CAST(64 + CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)
                    % 1920 AS BIGINT) * 1000000
               // CAST(64 + (CAST('0x' || substr(md5(text), 1, 8)
                             AS BIGINT) // 1920) % 1080 AS BIGINT)
                 AS aspect_ppm
        FROM documents),
    b(bi, bucket, bppm) AS (SELECT * FROM (VALUES {buckets})),
    snapped AS (SELECT doc_id, bi, bucket,
                       CAST(abs(aspect_ppm - bppm) AS BIGINT) AS dist
                FROM meta CROSS JOIN b),
    pick AS (SELECT doc_id, bi, bucket, dist FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                            ORDER BY dist, bi) AS rn
                 FROM snapped) WHERE rn = 1),
    batched AS (SELECT *, (row_number() OVER (PARTITION BY bi
                           ORDER BY doc_id) - 1) // {ASPECT_BATCH}
                       AS batch_id
                FROM pick)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(max(batch_id) + 1 AS BIGINT) AS n_batches,
           CAST(count(*) - max(batch_id) * {ASPECT_BATCH} AS BIGINT)
             AS tail_fill,
           CAST(sum(dist) // count(*) AS BIGINT) AS mad_ppm
    FROM batched GROUP BY bucket ORDER BY bucket
    """


REGISTRY["media_aspect_bucket_batches"].oracle = _aspect_oracle()


# ------------------------------------------------ CUSUM drift monitor

# One-sided CUSUM (Page 1954) over daily event volumes — the classic
# sequential change detector. The recurrence s_i = max(0, s_{i-1} + x_i)
# has the exact closed form s_i = prefix_i - min(0, min_{j<=i} prefix_j),
# which turns the "sequential" detector into two ordered windows — fully
# parallel per monitored key, exact integer arithmetic throughout.
CUSUM_H_NUM = 1   # drift threshold = (NUM/DEN) x mean daily volume,
CUSUM_H_DEN = 2   # i.e. flag when cumulative excess > half a mean day


def cusum_over_daily(daily: DataFrame) -> DataFrame:
    """The CUSUM closed form over a (event_type, day, n) aggregate —
    shared by the batch query below and the streaming monitor
    (foreachBatch over a complete-mode aggregate snapshot; see
    tests/test_streaming.py::test_streaming_cusum_drift_matches_batch),
    so both faces compute the identical statistic."""
    wtype = Window.partitionBy("event_type")
    word = (Window.partitionBy("event_type").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, 0))
    t = (daily
         .withColumn("total", F.sum("n").over(wtype).cast("bigint"))
         .withColumn("days", F.count("*").over(wtype).cast("bigint")))
    p = t.withColumn(
        "prefix",
        F.sum(F.col("n") * F.col("days") - F.col("total")).over(word)
        .cast("bigint"))
    s = p.withColumn(
        "cusum",
        F.col("prefix")
        - F.least(F.lit(0).cast("bigint"), F.min("prefix").over(word)))
    return s.select(
        "event_type", "day", "n", "cusum",
        (F.col("cusum") * CUSUM_H_DEN > F.col("total") * CUSUM_H_NUM)
        .cast("int").alias("is_drift"))



@register(
    "events_cusum_drift",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    t AS (SELECT *,
                 CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                   AS total,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS days
          FROM daily),
    p AS (SELECT *,
                 CAST(sum(n * days - total) OVER (
                     PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS prefix
          FROM t),
    s AS (SELECT *,
                 prefix - least(CAST(0 AS BIGINT), min(prefix) OVER (
                     PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS cusum
          FROM p)
    SELECT event_type, day, n, cusum,
           CAST(cusum * {CUSUM_H_DEN} > total * {CUSUM_H_NUM} AS INT)
             AS is_drift
    FROM s ORDER BY event_type, day
    """,
    tags=("llm", "events", "cusum", "drift"),
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM drift detection on daily volumes: excess
    x_d = n_d*days - total (the integer-exact form of n_d - mean), the
    clamped cumulative sum via its prefix-minus-running-min closed form,
    and a drift flag when the statistic exceeds (1/2) x mean daily
    volume (both sides scaled by `days`, so every comparison is int64).

    Scale shape: one map-side-partial groupBy to (type, day) rows, then
    two stacked windows on ONE (event_type) partitioning — the per-type
    totals ride the same partition as unbounded aggregates. The
    sequential recurrence never executes sequentially: the closed form
    makes CUSUM embarrassingly parallel per key (and re-runnable on
    every streaming micro-batch snapshot — cusum_over_daily)."""
    e = spread(table(spark, sf_dir, "events"))
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count("*").cast("bigint").alias("n")))
    return cusum_over_daily(daily).orderBy("event_type", "day")


# ------------------------------------------------ MTLD lexical diversity

# MTLD (McCarthy & Jarvis 2010): scan tokens, count "factors" — maximal
# prefixes whose type-token ratio stays above 0.720 — plus a partial
# credit for the unfinished tail; MTLD = tokens / factors. The scan is
# inherently sequential PER DOCUMENT (the reset depends on every prior
# token in the factor), so it runs as an Arrow-batched per-doc Python
# loop; the oracle replays the same automaton as a recursive CTE
# carrying the current factor's type list.
MTLD_THR_NUM = 720    # factor completes when types/tokens <= 0.720
MTLD_THR_DEN = 1000

MTLD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_tokens", LongType()),
    StructField("n_factors", LongType()),
    StructField("mtld_ppm", LongType()),
])


def _mtld_of(toks: list[str]) -> tuple[int, int, int]:
    """(n_tokens, whole_factors, mtld_ppm) — exact integer arithmetic;
    shared by the Spark UDF and the unit-test reference."""
    w, cur, cur_n = 0, set(), 0
    for tok in toks:
        cur.add(tok)
        cur_n += 1
        if len(cur) * MTLD_THR_DEN <= cur_n * MTLD_THR_NUM:
            w, cur, cur_n = w + 1, set(), 0
    n = len(toks)
    rem = MTLD_THR_DEN - MTLD_THR_NUM  # 280: 1 - threshold, scaled
    denom = w * rem * cur_n + MTLD_THR_DEN * (cur_n - len(cur))
    if cur_n > 0 and denom > 0:
        ppm = n * rem * cur_n * 1_000_000 // denom
    elif cur_n == 0 and w > 0:
        ppm = n * 1_000_000 // w
    else:
        ppm = 0
    return n, w, ppm


@register(
    "text_mtld_diversity",
    oracle=None,  # set below
    tags=("llm", "text-quality", "mtld"),
)
def q_mtld_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTLD lexical diversity per document — the length-robust
    vocabulary-richness score (plain TTR collapses as docs grow; MTLD's
    factor count does not), a standard text-quality feature next to the
    LM scores. Forward pass only; all arithmetic is integer-exact
    (threshold comparison as types*1000 <= tokens*720, the final
    division as one int64 ratio in ppm), so both engines agree
    bit-for-bit.

    Scale shape: embarrassingly parallel map-only plan — one Arrow
    batch iterator, no shuffle at all; the sequential dependency is
    confined to a single document. The oracle replays the automaton as
    a recursive CTE (bounded by max tokens/doc) carrying the factor's
    type list."""
    import re as _re

    import pandas as pd

    d = spread(table(spark, sf_dir, "documents"))

    def score(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                toks = _re.findall("[a-z0-9]+", (text or "").lower())
                n, w, ppm = _mtld_of(toks)
                rows.append((int(did), n, w, ppm))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MTLD_SCHEMA.fields])

    return (d.select("doc_id", "text")
            .mapInPandas(score, MTLD_SCHEMA)
            .orderBy("doc_id"))


def _mtld_oracle() -> str:
    rem = MTLD_THR_DEN - MTLD_THR_NUM
    return f"""
    WITH RECURSIVE t AS MATERIALIZED (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    st(doc_id, i, n, cur_list, cur_n, w) AS (
        SELECT doc_id, 0, len(toks), CAST([] AS VARCHAR[]), 0, 0 FROM t
        UNION ALL
        SELECT doc_id, i + 1, n,
               CASE WHEN done THEN CAST([] AS VARCHAR[]) ELSE nl END,
               CASE WHEN done THEN 0 ELSE nn END,
               CASE WHEN done THEN w + 1 ELSE w END
        FROM (
            SELECT s.doc_id, s.i, s.n, s.w, nl, nn,
                   len(nl) * {MTLD_THR_DEN} <= nn * {MTLD_THR_NUM} AS done
            FROM (
                SELECT st.*, 
                       CASE WHEN list_contains(st.cur_list,
                                               t.toks[st.i + 1])
                            THEN st.cur_list
                            ELSE list_append(st.cur_list,
                                             t.toks[st.i + 1]) END AS nl,
                       st.cur_n + 1 AS nn
                FROM st JOIN t USING (doc_id) WHERE st.i < st.n) s)),
    fin AS (SELECT * FROM st WHERE i = n)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(w AS BIGINT) AS n_factors,
           CAST(CASE
             WHEN cur_n > 0 AND (w * {rem} * cur_n
                  + {MTLD_THR_DEN} * (cur_n - len(cur_list))) > 0
             THEN CAST(n AS BIGINT) * {rem} * cur_n * 1000000
                  // (w * {rem} * cur_n
                      + {MTLD_THR_DEN} * (cur_n - len(cur_list)))
             WHEN cur_n = 0 AND w > 0
             THEN CAST(n AS BIGINT) * 1000000 // w
             ELSE 0 END AS BIGINT) AS mtld_ppm
    FROM fin ORDER BY doc_id
    """


REGISTRY["text_mtld_diversity"].oracle = _mtld_oracle()


# --------------------------------------- IDF-weighted Jaccard verify

# Weighted near-dup verification: rare shingles should count more than
# stopwords when deciding whether two banded candidates are duplicates.
# Weighted Jaccard = sum(idf over intersection) / sum(idf over union),
# with per-token idf = ln(N/df) quantized to an int64 ppm grid before
# ANY sum (FP-order-free, the house discipline).


@register(
    "dedup_idf_weighted_jaccard",
    oracle=None,  # set below
    tags=("llm", "dedup", "weighted-jaccard"),
)
def q_idf_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted Jaccard over MinHash-banded candidates: the verify
    stage that down-weights boilerplate/stopword overlap (which plain
    set Jaccard counts equally) — two docs sharing only frequent tokens
    score near 0 here while sharing rare content scores near 1.

    Scale shape: candidates come from the banded LSH join (bounded,
    never all-pairs); token df is one vocabulary-keyed aggregate with
    map-side partials; the intersection weights flow as (token, int64)
    pairs joined to the candidate list BY DOC ID first — text never
    shuffles, and the token join is bounded by candidate count x doc
    length."""
    from .llm import _minhash_pairs

    cand = _minhash_pairs(spark, sf_dir, fast=False, min_jaccard=0.0) \
        .select("doc_a", "doc_b")
    d = table(spark, sf_dir, "documents")
    dt = pin(d.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_col(F.col("text"))))
        .alias("tok")))
    dfc = dt.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    nd = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    w = (dfc.crossJoin(F.broadcast(nd))
         .select("tok",
                 F.floor(F.log(F.col("n_docs").cast("double")
                               / F.col("df")) * F.lit(1e6) + F.lit(0.5))
                 .cast("bigint").alias("w")))
    dtw = pin(dt.join(w, "tok"))
    tw = dtw.groupBy("doc_id").agg(F.sum("w").cast("bigint").alias("tw"))
    a = dtw.select(F.col("doc_id").alias("doc_a"), "tok",
                   F.col("w").alias("wa"))
    b = dtw.select(F.col("doc_id").alias("doc_b"), "tok")
    iw = (cand.join(a, "doc_a").join(b, ["doc_b", "tok"])
          .groupBy("doc_a", "doc_b")
          .agg(F.sum("wa").cast("bigint").alias("iw")))
    ta = tw.select(F.col("doc_id").alias("doc_a"), F.col("tw").alias("twa"))
    tb = tw.select(F.col("doc_id").alias("doc_b"), F.col("tw").alias("twb"))
    j = (cand.join(iw, ["doc_a", "doc_b"], "left")
         .join(ta, "doc_a").join(tb, "doc_b")
         .select("doc_a", "doc_b",
                 F.coalesce("iw", F.lit(0)).cast("bigint").alias("iw"),
                 "twa", "twb"))
    return (j.select(
        "doc_a", "doc_b", F.col("iw").alias("inter_w"),
        F.expr("iw * 1000000 div greatest(twa + twb - iw, 1)")
        .cast("bigint").alias("wjaccard_ppm"))
        .orderBy("doc_a", "doc_b"))


def _idf_jaccard_oracle() -> str:
    from .llm import _SH_CTE
    return f"""
    {_SH_CTE},
    dl AS (SELECT doc_id, list_distinct(toks) AS dtoks FROM t),
    dt AS (SELECT doc_id, unnest(dtoks) AS tok FROM dl),
    dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    w AS (SELECT tok,
                 CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1e6 + 0.5)
                      AS BIGINT) AS w
          FROM dfc CROSS JOIN nd),
    tw AS (SELECT dt.doc_id, CAST(sum(w.w) AS BIGINT) AS tw
           FROM dt JOIN w USING (tok) GROUP BY 1),
    pairtok AS (SELECT c.doc_a, c.doc_b,
                       unnest(list_intersect(a.dtoks, b.dtoks)) AS tok
                FROM cand c JOIN dl a ON a.doc_id = c.doc_a
                            JOIN dl b ON b.doc_id = c.doc_b),
    iw AS (SELECT doc_a, doc_b, CAST(sum(w.w) AS BIGINT) AS iw
           FROM pairtok JOIN w USING (tok) GROUP BY 1, 2),
    j AS (SELECT c.doc_a, c.doc_b,
                 CAST(coalesce(i.iw, 0) AS BIGINT) AS iw,
                 ta.tw AS twa, tb.tw AS twb
          FROM cand c LEFT JOIN iw i
            ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          JOIN tw ta ON ta.doc_id = c.doc_a
          JOIN tw tb ON tb.doc_id = c.doc_b)
    SELECT doc_a, doc_b, iw AS inter_w,
           CAST(iw * 1000000 // greatest(twa + twb - iw, 1) AS BIGINT)
             AS wjaccard_ppm
    FROM j ORDER BY doc_a, doc_b
    """


REGISTRY["dedup_idf_weighted_jaccard"].oracle = _idf_jaccard_oracle()


# --------------------------------- unigram tokenizer Viterbi segmentation

# SentencePiece-style unigram-LM segmentation: a piece vocabulary scored
# by corpus frequency, and per-word Viterbi decoding that picks the
# max-likelihood split. This is the E-step / apply-step of unigram
# tokenizer training — the missing member next to the BPE train/apply
# operators. All scores are ln(count/total) quantized to an int64 ppm
# grid, so the DP argmax is exact integer comparison on both engines
# (ties: longer piece wins, pinned in both DPs). Residual cross-engine
# risk, documented rather than claimed away: the ln() itself comes from
# each engine's libm (JVM Math.log / DuckDB / CPython math.log), none
# guaranteed identically rounded; a 1-ulp difference landing exactly on
# a floor(x*1e6+0.5) grid boundary would flip one quantized score by 1
# and could change a decoded path discretely. Never observed at any
# tested SF; the quantization makes it a measure-zero boundary event,
# not an impossibility.
UNI_MAX_PIECE = 4     # max piece length (chars)
UNI_VOCAB_K = 64      # multi-char pieces kept (all single chars always kept)
UNI_WORDS_K = 50      # words segmented (top by corpus frequency)
UNI_WORD_MAXLEN = 16  # DP depth cap

UNI_SCHEMA = StructType([
    StructField("word", StringType()),
    StructField("n_pieces", LongType()),
    StructField("seg", StringType()),
    StructField("score_ppm", LongType()),
])


@register(
    "tokenizer_unigram_viterbi",
    oracle=None,  # set below
    tags=("llm", "tokenizer", "unigram", "viterbi"),
)
def q_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer segmentation: build a piece vocabulary
    (every corpus character plus the UNI_VOCAB_K most frequent 2-4 char
    substrings, counts weighted by word frequency), score pieces by
    quantized ln(count/total), then Viterbi-decode the UNI_WORDS_K most
    frequent words into their max-likelihood piece sequences. Single
    chars in the vocabulary guarantee every word segments.

    Scale shape: vocabulary training is two corpus-wide vocabulary-keyed
    aggregates with map-side partials (word counts, then piece counts —
    the explode is bounded by 4 x word length); the piece total is a
    broadcast single row; decoding runs on the bounded word panel in one
    cogrouped applyInPandas against the broadcast vocabulary — exactly
    how a tokenizer trainer distributes counting and localizes decoding.
    The oracle replays the identical DP as a recursive CTE carrying the
    per-prefix best-score and segmentation lists."""
    import pandas as pd

    d = spread(table(spark, sf_dir, "documents"))
    wc = pin(d.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
             .groupBy("tok").agg(F.count("*").cast("bigint").alias("c")))
    pieces = (wc.select(
        "tok", "c",
        F.explode(F.sequence(F.lit(1), F.length("tok"))).alias("i"))
        .select("tok", "c", "i",
                F.explode(F.sequence(
                    F.lit(1),
                    F.least(F.lit(UNI_MAX_PIECE),
                            F.length("tok") - F.col("i") + 1))).alias("l"))
        .select(F.expr("substring(tok, i, l)").alias("piece"), "c")
        .groupBy("piece").agg(F.sum("c").cast("bigint").alias("cnt")))
    pieces = pin(pieces)
    chars = pieces.filter(F.length("piece") == 1)
    multi = (pieces.filter(F.length("piece") >= 2)
             .orderBy(F.col("cnt").desc(), "piece").limit(UNI_VOCAB_K))
    vocab = pin(chars.unionByName(multi))
    tot = vocab.agg(F.sum("cnt").cast("bigint").alias("tot"))
    scored = (vocab.crossJoin(F.broadcast(tot))
              .select(F.lit(1).alias("g"), "piece",
                      F.floor(F.log(F.col("cnt").cast("double")
                                    / F.col("tot")) * F.lit(1e6)
                              + F.lit(0.5)).cast("bigint")
                      .alias("s")))
    words = (wc.filter(F.length("tok") <= UNI_WORD_MAXLEN)
             .orderBy(F.col("c").desc(), "tok").limit(UNI_WORDS_K)
             .select(F.lit(1).alias("g"), F.col("tok").alias("word")))

    def decode(words_pdf: pd.DataFrame, vocab_pdf: pd.DataFrame) -> pd.DataFrame:
        sc = {p: int(s) for p, s in zip(vocab_pdf["piece"], vocab_pdf["s"])}
        rows = []
        for word in words_pdf["word"]:
            n = len(word)
            best = [None] * (n + 1)
            seg = [""] * (n + 1)
            best[0] = 0
            for i in range(1, n + 1):
                # longer piece wins ties: iterate l descending, keep
                # strictly-greater values (matches the oracle's
                # ORDER BY val DESC, l DESC LIMIT 1)
                for l in range(min(UNI_MAX_PIECE, i), 0, -1):
                    j = i - l
                    piece = word[j:i]
                    if best[j] is None or piece not in sc:
                        continue
                    val = best[j] + sc[piece]
                    if best[i] is None or val > best[i]:
                        best[i] = val
                        seg[i] = piece if j == 0 else seg[j] + "|" + piece
            rows.append((word, seg[n].count("|") + 1, seg[n], best[n]))
        return pd.DataFrame(
            rows, columns=[f.name for f in UNI_SCHEMA.fields])

    return (words.groupBy("g")
            .cogroup(scored.groupBy("g"))
            .applyInPandas(lambda w, v: decode(w, v), UNI_SCHEMA)
            .orderBy("word"))


def _unigram_oracle() -> str:
    # NO "AS MATERIALIZED" anywhere in this chain: in this DuckDB build,
    # materializing ANY CTE inside this WITH RECURSIVE silently empties the
    # recursion's output (0 rows, no error — observed on wc/pieces and on
    # the full chain). The un-materialized form is <1 s at sf0.1, so the
    # usual inline-reevaluation concern does not bite here.
    return f"""
    WITH RECURSIVE
    wc AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY 1),
    pieces AS (
        SELECT substr(tok, i, l) AS piece, CAST(sum(c) AS BIGINT) AS cnt
        FROM (SELECT tok, c, i.i, l.l
              FROM wc,
                   LATERAL (SELECT unnest(range(1, length(tok) + 1))
                            AS i) i,
                   LATERAL (SELECT unnest(range(1, least({UNI_MAX_PIECE},
                                length(tok) - i.i + 1) + 1)) AS l) l)
        GROUP BY 1),
    vocab0 AS (
        SELECT piece, cnt FROM pieces WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM pieces WHERE length(piece) >= 2
            ORDER BY cnt DESC, piece LIMIT {UNI_VOCAB_K})),
    vocab AS (
        -- score column deliberately NOT named "s": the recursive alias
        -- below is `st s`, and DuckDB's binder resolves `s.bests` against
        -- a same-named COLUMN in scope first (observed Binder Error).
        SELECT piece,
               CAST(floor(ln(CAST(cnt AS DOUBLE)
                             / (SELECT sum(cnt) FROM vocab0)) * 1e6
                          + 0.5) AS BIGINT) AS sc
        FROM vocab0),
    words AS (
        SELECT tok AS word FROM wc WHERE length(tok) <= {UNI_WORD_MAXLEN}
        ORDER BY c DESC, tok LIMIT {UNI_WORDS_K}),
    lens(x) AS (SELECT unnest(range(1, {UNI_MAX_PIECE} + 1))),
    st(word, i, n, bests, segs) AS (
        SELECT word, 0, length(word), [CAST(0 AS BIGINT)],
               [CAST('' AS VARCHAR)]
        FROM words
        UNION ALL
        SELECT s.word, s.i + 1, s.n,
               list_append(s.bests, nxt.val),
               list_append(s.segs, nxt.seg)
        FROM st s, LATERAL (
            SELECT s.bests[s.i + 2 - t.x] + v.sc AS val,
                   CASE WHEN s.i + 1 - t.x = 0 THEN v.piece
                        ELSE s.segs[s.i + 2 - t.x] || '|' || v.piece
                   END AS seg
            FROM lens t, vocab v
            WHERE s.i + 1 - t.x >= 0
              AND v.piece = substr(s.word, s.i + 2 - t.x, t.x)
            ORDER BY val DESC, t.x DESC LIMIT 1) nxt
        WHERE s.i < s.n)
    SELECT word,
           CAST(length(segs[n + 1])
                - length(replace(segs[n + 1], '|', '')) + 1 AS BIGINT)
             AS n_pieces,
           segs[n + 1] AS seg,
           bests[n + 1] AS score_ppm
    FROM st WHERE i = n ORDER BY word
    """


REGISTRY["tokenizer_unigram_viterbi"].oracle = _unigram_oracle()


# --------------------------------------- two-state burst detection

# Kleinberg's burst automaton (2-state variant): a base-rate state and
# an elevated-rate state (BURST_S x the user's base rate); each
# inter-event gap pays the negative log-likelihood of its state's
# exponential density, entering the burst state pays a ln(n) transition
# toll. Viterbi decodes the min-cost state path per user. Costs are
# quantized to an int64 1e-6 grid BEFORE the DP, so every comparison —
# and therefore the decoded path — is exact integer arithmetic on both
# engines (ties prefer the base state / base predecessor, pinned).
# Residual cross-engine risk (same caveat as the unigram tokenizer
# above): the ln() terms come from CPython math.log here and DuckDB's
# libm in the oracle; a 1-ulp rounding difference landing exactly on a
# floor(x*1e6+0.5) grid boundary would shift one quantized cost by 1
# and could flip a decoded path. Never observed at any tested SF —
# documented as a boundary event, not claimed impossible.
BURST_S = 2          # burst-state rate multiplier
BURST_INF = 10 ** 15  # "unreachable" start cost for the burst state

BURST_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_gaps", LongType()),
    StructField("n_bursts", LongType()),
    StructField("burst_gaps", LongType()),
    StructField("path_cost_q", LongType()),
])


def _burst_decode(gaps_us: list[int]) -> tuple[int, int, int, int]:
    """(n_gaps, n_bursts, burst_gaps, path_cost_q) — exact integer DP;
    shared by the Spark UDF and the unit-test reference."""
    n = len(gaps_us)
    if n == 0:
        return 0, 0, 0, 0
    T = max(sum(gaps_us), 1)
    lam0 = n / T
    lam1 = BURST_S * lam0
    lnl0, lnl1 = math.log(lam0), math.log(lam1)
    trans = math.floor(math.log(n) * 1e6 + 0.5)
    c0, c1 = 0, BURST_INF
    b0 = b1 = r0 = r1 = 0
    for g in gaps_us:
        g = float(g)
        k0 = math.floor((lam0 * g - lnl0) * 1e6 + 0.5)
        k1 = math.floor((lam1 * g - lnl1) * 1e6 + 0.5)
        nc0 = min(c0, c1) + k0
        nb0, nr0 = (b0, r0) if c0 <= c1 else (b1, r1)
        enter = c0 + trans
        nc1 = min(enter, c1) + k1
        nb1, nr1 = (b0 + 1, r0 + 1) if enter <= c1 else (b1, r1 + 1)
        c0, c1, b0, b1, r0, r1 = nc0, nc1, nb0, nb1, nr0, nr1
    if c0 <= c1:
        return n, b0, r0, c0
    return n, b1, r1, c1


@register(
    "events_kleinberg_burst",
    oracle=None,  # set below
    tags=("llm", "events", "burst-detection", "viterbi"),
)
def q_kleinberg_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burst detection over inter-event gaps: Kleinberg's
    two-state automaton Viterbi-decoded with integer-quantized costs.
    Reports each user's burst-episode count, gaps spent in the burst
    state, and the decoded path cost — the activity-burst face of the
    bot/anomaly family (CUSUM watches volume drift; this finds rate
    EPISODES inside one user's own timeline).

    Scale shape: ONE shuffle on user_id into applyInPandas groups —
    thousands of users decode in parallel, each DP bounded by that
    user's event count; per-user constants (base rate, tolls) derive
    from exact int64 gap sums. The oracle replays the DP as a
    pure-scalar recursive CTE over per-user gap arrays (no LATERAL),
    with the burst state seeded at an integer infinity."""
    import pandas as pd

    e = spread(table(spark, sf_dir, "events"))

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # exact integer microseconds regardless of pandas' ns/us unit
        us = pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
        gaps = [us[i + 1] - us[i] for i in range(len(us) - 1)]
        n, b, r, c = _burst_decode(gaps)
        return pd.DataFrame(
            [(int(pdf["user_id"].iloc[0]), n, b, r, c)],
            columns=[f.name for f in BURST_SCHEMA.fields])

    return (e.select("user_id", "ts", "event_id")
            .groupBy("user_id")
            .applyInPandas(decode, BURST_SCHEMA)
            .orderBy("user_id"))


def _burst_oracle() -> str:
    return f"""
    WITH RECURSIVE
    ts AS (SELECT user_id, epoch_us(ts) AS us
           FROM events),
    ug AS (
        SELECT user_id,
               list_transform(range(1, len(l)), i -> l[i + 1] - l[i])
                 AS gaps,
               CAST(len(l) - 1 AS BIGINT) AS n
        FROM (SELECT user_id, list(us ORDER BY us) AS l
              FROM ts GROUP BY 1)),
    uc AS (
        SELECT user_id, gaps, n,
               CAST(n AS DOUBLE)
                 / greatest(CAST(list_sum(gaps) AS BIGINT), 1) AS lam0,
               {BURST_S} * (CAST(n AS DOUBLE)
                 / greatest(CAST(list_sum(gaps) AS BIGINT), 1)) AS lam1,
               CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
                 AS trans
        FROM ug WHERE n > 0),
    st(user_id, i, n, c0, c1, b0, b1, r0, r1) AS (
        SELECT user_id, 0, n, CAST(0 AS BIGINT),
               CAST({BURST_INF} AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        FROM uc
        UNION ALL
        SELECT q.user_id, q.i + 1, q.n,
               least(q.c0, q.c1) + q.k0,
               least(q.c0 + q.trans, q.c1) + q.k1,
               CASE WHEN q.c0 <= q.c1 THEN q.b0 ELSE q.b1 END,
               CASE WHEN q.c0 + q.trans <= q.c1
                    THEN q.b0 + 1 ELSE q.b1 END,
               CASE WHEN q.c0 <= q.c1 THEN q.r0 ELSE q.r1 END,
               CASE WHEN q.c0 + q.trans <= q.c1
                    THEN q.r0 + 1 ELSE q.r1 + 1 END
        FROM (
            SELECT s.*, u.trans,
                   CAST(floor((u.lam0 * CAST(u.gaps[s.i + 1] AS DOUBLE)
                               - ln(u.lam0)) * 1e6 + 0.5) AS BIGINT)
                     AS k0,
                   CAST(floor((u.lam1 * CAST(u.gaps[s.i + 1] AS DOUBLE)
                               - ln(u.lam1)) * 1e6 + 0.5) AS BIGINT)
                     AS k1
            FROM st s JOIN uc u USING (user_id)
            WHERE s.i < s.n) q),
    fin AS (SELECT user_id, n,
                   CASE WHEN c0 <= c1 THEN b0 ELSE b1 END AS n_bursts,
                   CASE WHEN c0 <= c1 THEN r0 ELSE r1 END AS burst_gaps,
                   CASE WHEN c0 <= c1 THEN c0 ELSE c1 END AS path_cost_q
            FROM st WHERE i = n),
    everyone AS (SELECT DISTINCT user_id FROM events)
    SELECT e.user_id,
           CAST(coalesce(f.n, 0) AS BIGINT) AS n_gaps,
           CAST(coalesce(f.n_bursts, 0) AS BIGINT) AS n_bursts,
           CAST(coalesce(f.burst_gaps, 0) AS BIGINT) AS burst_gaps,
           CAST(coalesce(f.path_cost_q, 0) AS BIGINT) AS path_cost_q
    FROM everyone e LEFT JOIN fin f ON f.user_id = e.user_id
    ORDER BY e.user_id
    """


REGISTRY["events_kleinberg_burst"].oracle = _burst_oracle()
