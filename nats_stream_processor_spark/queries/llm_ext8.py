"""Round-9 operators beyond the graph-ANN pair (llm_ext7): shot-level
multimodal curation. Registers inside the r9 sampled window, so each
operator expects its formal driver row in the round it was written.
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
