"""Round-16 optimization profiling harness (same methodology as
tools/profile_r15.py).

For each named query: time DataFrame CONSTRUCTION (driver-side work:
planning, any licensed driver loops like k-means training or CC rounds)
and EXECUTION (noop sink) separately, capture the formatted physical
plan, and count plan features (Exchange / join strategies / Python eval
nodes / scans). Writes plans to plans/r16/<query>_<tag>.txt.

    python tools/profile_r16.py before enrich_flagship dedup_components ...
    python tools/profile_r16.py after --all-headline
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
        python tools/profile_r16.py ivf_before sim_ivf_rebalance ...
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "enrich_flagship", "agg_pricing_summary", "join_revenue_by_region",
    "window_topk_orders_per_segment", "events_tumbling_hourly",
    "dedup_minhash_lsh", "dedup_minhash_lsh_fast", "sim_cosine_topk",
    "sim_ann_ivf", "events_funnel", "dedup_components", "text_token_stats",
    "quality_filter_pipeline", "media_frame_sample",
]

FEATURES = {
    "exchanges": r"Exchange ",
    "broadcast_exch": r"BroadcastExchange",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "arrow_py": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow",
    "batch_py": r"BatchEvalPython",
    "scans": r"Scan parquet|FileScan parquet",
    "sorts": r"\bSort \[",
    "windows": r"\bWindow \[|RunningWindowFunction",
    "inmem": r"InMemoryTableScan|TableCacheQueryStage",
    "existing_rdd": r"ExistingRDD|LogicalRDD|Scan ExistingRDD",
}


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: profile_r16.py <tag> [--all-headline | name ...]",
              file=sys.stderr)
        return 2
    tag = sys.argv[1]
    names = [n for n in sys.argv[2:] if n != "--all-headline"]
    if "--all-headline" in sys.argv[2:] and names:
        print("--all-headline ignores explicit names; pass one or the "
              "other", file=sys.stderr)
        return 2
    if not names:
        names = HEADLINE
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nats_stream_processor_spark import registry
    from nats_stream_processor_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    # Warmup: one unmeasured pass (JIT/codegen), same as bench.py.
    for n in names:
        df = registry.REGISTRY[n].fn(spark, sf)
        df.write.mode("overwrite").format("noop").save()

    rows = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"r16-profile:{n}")
        best = None
        for _ in range(3):
            t0 = time.time()
            df = registry.REGISTRY[n].fn(spark, sf)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            cur = (t2 - t0, t1 - t0, t2 - t1)
            if best is None or cur[0] < best[0]:
                best = cur
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(plans_dir, f"{n}_{tag}.txt"), "w") as f:
            f.write(plan)
        feats = {k: len(re.findall(p, plan)) for k, p in FEATURES.items()}
        rows[n] = {"total": round(best[0], 3), "build": round(best[1], 3),
                   "exec": round(best[2], 3), **feats}
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(rows, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
