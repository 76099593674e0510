"""Worker process for the sharded oracle-parity sweep.

tests/test_oracle_parity.py::test_query_matches_oracle checks every
registry query against its DuckDB oracle at sf0.001. Run serially on one
session-scoped SparkSession the sweep takes ~25+ minutes and ages a
single JVM through ~270 query plans (the r15 driver verify died of
exactly that: the 30-minute budget expired mid-suite and the in-flight
test took the blame). The sharded runner keeps the SAME per-query checks
and test count but fans the sweep out over a few short-lived worker
processes — each with a fresh JVM and its own DuckDB — so the suite fits
the verify window and no session serves more than its shard.

Protocol: argv = [sf_dir, name, name, ...]; one JSON line per query on
stdout: {"name": ..., "problem": null | str, "sec": float,
"cartesian": bool | null}. The cartesian flag is the query's simple
physical plan probed for CartesianProduct (captured from the DataFrame
the parity check already built — see check_oracle.check_one), so the
registry-wide cartesian audit in tests/test_plan_audit.py rides this
sweep instead of re-building all 273 plans serially. A worker that
dies mid-shard has reported every query it finished; the parent marks
the rest failed with this process's stderr tail.

Run one shard by hand:

    python tests/_parity_worker.py /root/testdata/sf0.001 dedup_components
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tools"))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from check_oracle import check_one, make_duck

    from nats_stream_processor_spark.config import SparkEngineConf
    from nats_stream_processor_spark.session import get_spark

    # Same session shape as the old fixture (tests/conftest.py): small
    # local session — few cores/partitions keeps JVM startup and shuffle
    # overhead low at sf0.001 while exercising the same plans.
    spark = get_spark(
        SparkEngineConf(master="local[4]", shuffle_partitions=4),
        **{
            "spark.sql.warehouse.dir":
                f"/tmp/spark_graft_warehouse_parity_{os.getpid()}",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = make_duck(sf_dir)
    rc = 0
    for name in names:
        t0 = time.time()
        sink: dict = {}
        try:
            problem = check_one(spark, con, name, sf_dir, plan_sink=sink)
        except Exception as ex:  # check_one catches engine errors itself
            problem = f"worker exception: {type(ex).__name__}: {str(ex)[:300]}"
        if problem:
            rc = 1
        print(json.dumps({"name": name, "problem": problem,
                          "sec": round(time.time() - t0, 2),
                          "cartesian": sink.get("cartesian")}), flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
