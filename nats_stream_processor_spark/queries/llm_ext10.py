"""Round-11 operators: substring-dedup curation faces.

Certification status (the honest-labeling house rule):

- ``dedup_max_duplicated_run`` — written in round 11 and INSIDE the
  r11 sampled window (formal row expected in the round it was
  written).

``dedup_substring_spans`` (queries/llm.py) answers "which K-token
spans repeat across documents"; the curation decision a dedup pipeline
actually takes ("drop doc B — it is a near-verbatim extract of A")
needs the MAXIMAL duplicated run between each document pair: the
longest stretch of consecutive shared spans. This module computes it
without suffix arrays or automata — a position-keyed span match plus
gaps-and-islands on match diagonals, the distributed reformulation of
the diagonal-runs view of longest-common-substring: a common run of
length L tokens is exactly L - K + 1 consecutive span matches on one
diagonal (pa - pb constant), so per-diagonal islands of consecutive
positions recover every maximal run exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Registry import FIRST among intra-package imports (worker re-import
# ordering; see llm_ext2.py's header note).
from ..registry import register, spread, table

from ..operators.dedup import (
    MERSENNE_P as _P,
    SHINGLE_COMB as _COMB,
    token_hashes_32_col,
    token_hashes_32_duck_sql,
)
from ..functions.text import tokens_col

# ----------------------------- maximal duplicated run per doc pair

# Same span construction as dedup_substring_spans (K consecutive token
# hashes folded by the exact-int64 rolling polynomial), but keeping the
# span's POSITION: span p of doc d covers tokens [p, p + MR_K). Two
# docs sharing spans at positions (pa, pb) and (pa+1, pb+1) share a
# K+1-token run — consecutive matches on the diagonal pa - pb — so the
# maximal duplicated run in TOKENS is (longest island of consecutive pa
# per (pair, diagonal)) + K - 1. Docs shorter than MR_K tokens carry no
# spans and cannot participate (a sub-K duplicate is below the
# granularity this operator is defined at — dedup_ngram_jaccard covers
# that regime).
MR_K = 16  # tokens per span (= SUBSTR_SPAN_K; same dedup granularity)


@register(
    "dedup_max_duplicated_run",
    oracle=f"""
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    h AS (SELECT doc_id, {token_hashes_32_duck_sql('toks')} AS hs FROM t
          WHERE len(toks) >= {MR_K}),
    g AS (SELECT doc_id,
                 list_transform(
                     range(1, len(hs) - {MR_K} + 2),
                     i -> list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                                      list_slice(hs, i, i + {MR_K} - 1)),
                         (acc, x) -> (acc * {_COMB} + x) % {_P})) AS spans
          FROM h),
    sp AS (SELECT doc_id, unnest(range(0, len(spans))) AS pos,
                  unnest(spans) AS span_id
           FROM g),
    ns AS (SELECT doc_id, CAST(len(spans) AS BIGINT) AS n_spans FROM g),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pa, a.pos - b.pos AS diag
          FROM sp a JOIN sp b
            ON a.span_id = b.span_id AND a.doc_id < b.doc_id),
    r AS (SELECT doc_a, doc_b, diag,
                 pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                         ORDER BY pa) AS isl
          FROM m),
    runs AS (SELECT doc_a, doc_b, diag, isl,
                    count(*) AS run_len
             FROM r GROUP BY doc_a, doc_b, diag, isl),
    pairs AS (SELECT doc_a, doc_b,
                     CAST(max(run_len) AS BIGINT) AS max_run_spans,
                     CAST(sum(run_len) AS BIGINT) AS n_shared_positions
              FROM runs GROUP BY doc_a, doc_b)
    SELECT p.doc_a, p.doc_b, p.n_shared_positions, p.max_run_spans,
           CAST(p.max_run_spans + {MR_K} - 1 AS BIGINT) AS max_run_tokens,
           p.max_run_spans = least(na.n_spans, nb.n_spans)
               AS full_containment
    FROM pairs p JOIN ns na ON na.doc_id = p.doc_a
                 JOIN ns nb ON nb.doc_id = p.doc_b
    ORDER BY doc_a, doc_b
    """,
    tags=("llm", "dedup-substring", "gaps-and-islands"),
)
def q_max_duplicated_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token run per document pair (module comment
    above): one row per pair sharing at least one {MR_K}-token span,
    with the total shared span matches, the longest consecutive run in
    spans and in tokens, and the superstring-extract flag — TRUE when
    the maximal run covers the smaller document's ENTIRE span sequence
    (its text is a contiguous substring of the other, up to the
    tokenizer; the curation signal "drop B, keep A").

    Scale shape: span ids with positions are O(n_tokens) JVM
    expressions per doc (no Python); the pair match is an equi-join on
    span_id — candidates bounded by cross-doc span multiplicity, the
    same blocking discipline as dedup_containment, never all-pairs —
    and every shuffle carries (span_id, doc_id, pos) ints, never text.
    The islands window is partitioned by (pair, diagonal): its
    per-partition row count is bounded by the shorter document's span
    count, the per-doc-window license every text operator here uses
    (no burst-chunking needed — the key cannot concentrate mass beyond
    one document's length, unlike the event-time sessionization in
    llm_ext8). Run totals come out of two partial+final aggregates on
    pair keys; the n_spans join is id-keyed."""
    d = spread(table(spark, sf_dir, "documents"))
    hs = token_hashes_32_col(F.col("text"))
    k = MR_K
    grams = F.transform(
        F.sequence(F.lit(1), F.size(hs) - k + 1),
        lambda i: F.aggregate(
            F.slice(hs, i, k), F.lit(0).cast("long"),
            lambda acc, x: (acc * _COMB + x) % _P),
    )
    sp = d.select(
        "doc_id",
        F.posexplode(F.when(F.size(hs) >= k, grams).otherwise(F.array()))
        .alias("pos", "span_id"))
    # n_spans needs only the token COUNT (len - K + 1) — no second md5
    # pass over the corpus
    ns = (d.select("doc_id",
                   (F.size(tokens_col(F.col("text"))) - k + 1)
                   .cast("long").alias("n_spans"))
          .filter(F.col("n_spans") >= 1))
    a = sp.select(F.col("doc_id").alias("doc_a"),
                  F.col("pos").alias("pa"), "span_id")
    b = sp.select(F.col("doc_id").alias("doc_b"),
                  F.col("pos").alias("pb"), "span_id")
    m = (a.join(b, "span_id")
         .filter(F.col("doc_a") < F.col("doc_b"))
         .select("doc_a", "doc_b", "pa",
                 (F.col("pa") - F.col("pb")).alias("diag")))
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (m.withColumn("isl", F.col("pa") - F.row_number().over(w))
            .groupBy("doc_a", "doc_b", "diag", "isl")
            .agg(F.count("*").alias("run_len")))
    pairs = (runs.groupBy("doc_a", "doc_b")
             .agg(F.max("run_len").cast("long").alias("max_run_spans"),
                  F.sum("run_len").cast("long")
                  .alias("n_shared_positions")))
    na = ns.select(F.col("doc_id").alias("doc_a"),
                   F.col("n_spans").alias("n_spans_a"))
    nb = ns.select(F.col("doc_id").alias("doc_b"),
                   F.col("n_spans").alias("n_spans_b"))
    return (pairs.join(na, "doc_a").join(nb, "doc_b")
            .select("doc_a", "doc_b", "n_shared_positions",
                    "max_run_spans",
                    (F.col("max_run_spans") + k - 1).cast("long")
                    .alias("max_run_tokens"),
                    (F.col("max_run_spans")
                     == F.least("n_spans_a", "n_spans_b"))
                    .alias("full_containment"))
            .orderBy("doc_a", "doc_b"))
