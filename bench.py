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
    "text_token_stats",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nats_stream_processor_spark import registry
    from nats_stream_processor_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> tuple[float, int]:
        df = registry.REGISTRY[name].fn(spark, sf_dir)
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        return dt, -1

    # Warmup pass: run every headline query once, unmeasured. The first
    # execution of a plan shape pays JVM JIT + whole-stage-codegen
    # compilation (5-8 s for the wide LSH/enrichment classes) — cluster
    # steady-state never sees that, so we measure the second, warm pass.
    registry.REGISTRY["sort_global_topk_orders"].fn(spark, sf_dir).write.mode(
        "overwrite").format("noop").save()
    for name in HEADLINE:
        run(name)

    queries: dict[str, float] = {}
    for name in HEADLINE:
        dt, _ = run(name)
        queries[name] = round(dt, 3)

    # Enrichment throughput vs the reference's per-pod posts/s claim.
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    enrich_rows_per_sec = round(n_docs / max(queries["enrich_flagship"], 1e-9), 1)

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "rows_per_sec": {"enrich_flagship_docs": enrich_rows_per_sec},
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
