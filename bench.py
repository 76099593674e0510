"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": "...", "rows_per_sec": {...}}

Execution is forced with the noop sink (full computation, no driver-side
materialization) so timings reflect the distributed plan, not collect().

Baseline context (BASELINE.md): the reference sustains ~30 enriched
posts/s on ~3.5 vCPU (~8.6 rows/s/core). enrich_flagship here processes
the whole documents corpus; its rows/s is the apples-to-apples number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per major subsystem (enrichment pipeline, core agg,
# star join, window rank, event-time windows, near-dup LSH, ANN, text
# stats). Keys are registry names.
HEADLINE = [
    "enrich_flagship",
    "agg_pricing_summary",
    "join_revenue_by_region",
    "window_topk_orders_per_segment",
    "events_tumbling_hourly",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "sim_cosine_topk",
    "sim_ann_ivf",
    "events_funnel",
    "dedup_components",
    "text_token_stats",
    "quality_filter_pipeline",
    "media_frame_sample",
]


def stream_posts_per_sec(spark, sf_dir: str) -> tuple[float, int]:
    """The reference's headline metric, measured on OUR streaming path:
    documents corpus as JSON posts -> file-source stream (availableNow) ->
    permissive decode -> sentiment -> gate -> topics -> enrich ->
    watermarked dedup -> foreachBatch sink. Returns (posts/s, n_posts).
    Runs twice and reports the warm pass (cluster steady state never pays
    the one-time streaming-plan codegen)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from nats_stream_processor_spark.streaming.pipeline import (
        decode_posts,
        enrich_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = f"{tmp}/src"
        (docs.selectExpr(
            "concat('at://bench/', cast(doc_id AS string)) AS uri",
            "cast(doc_id AS string) AS cid",
            "'did:plc:bench' AS author",
            "text",
        ).select(F.to_json(F.struct("uri", "cid", "author", "text"))
                 .alias("value"))
         .write.mode("overwrite").text(src))

        def one_pass(i: int) -> float:
            enriched = enrich_stream(decode_posts(
                spark.readStream.format("text").load(src)))
            t0 = time.time()
            q = (enriched.writeStream
                 .foreachBatch(lambda bdf, bid: bdf.write.format("noop")
                               .mode("overwrite").save())
                 .option("checkpointLocation", f"{tmp}/ckpt{i}")
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            return time.time() - t0

        one_pass(0)
        # best-of-3 warm passes, like the batch side (streaming passes are
        # short, so a single host-load spike skews any one of them)
        dt = min(one_pass(1), one_pass(2), one_pass(3))
        return round(n / dt, 1), n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nats_stream_processor_spark import registry
    from nats_stream_processor_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> tuple[float, int]:
        # Time construction + execution: iterative queries (connected
        # components) and trained ones (PQ codebook collect) do real work
        # while BUILDING the DataFrame, not just in the final action.
        t0 = time.time()
        df = registry.REGISTRY[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        return dt, -1

    # Warmup pass: run every headline query once, unmeasured. The first
    # execution of a plan shape pays JVM JIT + whole-stage-codegen
    # compilation (5-8 s for the wide LSH/enrichment classes) — cluster
    # steady-state never sees that. Then two measured passes, keeping the
    # per-query MINIMUM: the host is shared and transient external load
    # regularly inflates a random query by several seconds; min-of-2 is
    # the standard noise-floor estimate.
    registry.REGISTRY["sort_global_topk_orders"].fn(spark, sf_dir).write.mode(
        "overwrite").format("noop").save()
    for name in HEADLINE:
        run(name)

    # min-of-3 measured passes: host-load spikes (r2 measured a 15x
    # inflation on a single query inside one pass) outlast a 2-pass window.
    queries: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            dt, _ = run(name)
            queries[name] = round(min(dt, queries.get(name, dt)), 3)

    # Enrichment throughput vs the reference's per-pod posts/s claim.
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    enrich_rows_per_sec = round(n_docs / max(queries["enrich_flagship"], 1e-9), 1)
    stream_rps, _ = stream_posts_per_sec(spark, sf_dir)

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        # streaming_posts: apples-to-apples with BASELINE.md's 20-40
        # posts/s/pod (~8.6/s/core) — same decode->classify->gate->
        # classify->enrich->dedup pipeline, on Structured Streaming.
        "rows_per_sec": {"enrich_flagship_docs": enrich_rows_per_sec,
                         "streaming_posts": stream_rps},
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
