"""Driver-side publish path — TESTS AND DEBUGGING ONLY.

This collects every micro-batch onto the driver and hands rows to an
arbitrary Python callable, which is exactly what a production sink must
never do (the driver becomes the throughput ceiling and a single point of
memory pressure). The production path is streaming/pipeline.py NatsSink ->
format("nats"), where each writer partition publishes from its executor
worker. This module exists so tests can capture published messages
in-process and so bespoke one-off sinks have an escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_publish_batch(publisher):
    """foreachBatch function: serialize each enriched row to JSON and hand
    it to ``publisher(subject, json_payload, msg_id)`` on the driver."""

    def publish_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.withColumn(
                "__payload", F.to_json(F.struct(*[
                    c for c in batch_df.columns if c != "route_subject"
                ]))
            )
            .select(
                "route_subject", "__payload",
                F.when(
                    F.col("uri").isNotNull() & F.col("cid").isNotNull(),
                    F.concat_ws(":", "uri", "cid"),
                ).alias("__msg_id"),
            )
            .collect()  # driver-side by design: debug/test sink only
        )
        for r in rows:
            publisher(r["route_subject"], r["__payload"], r["__msg_id"])

    return publish_batch
