"""Streaming observability (M1-M6, reference: src/metrics.py +
src/service.py:174-253) via Spark's native mechanisms:

- M1 counters: `df.observe` named aggregations — evaluated inside the
  stream, surfaced per micro-batch on the listener (no extra pass).
- M3 rate ticks: `inputRowsPerSecond` / `processedRowsPerSecond` straight
  from StreamingQueryProgress — what the reference's 20 s stats loop
  computes by diffing Prometheus counters.
- M6 consumer lag: sources[].numInputRows + backlog metrics when the
  source reports them.
- M2/M4/M5 (histogram / top-k topics / sentiment distribution): side
  aggregation queries on the same stream (windows.py) — label-partitioned
  streaming state, the analog of the reference's label-partitioned
  Prometheus counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from ..functions.sentiment import confidence_gate
from ..functions.text import non_empty_text


def observe_pipeline_counters(df: DataFrame, name: str = "pipeline") -> DataFrame:
    """Attach M1 counters (processed/published split) to any stage of the
    pipeline; values arrive in QueryProgress.observedMetrics[name]."""
    has_text = non_empty_text(F.coalesce(F.col("text"), F.lit("")))
    counters = [
        F.count(F.lit(1)).alias("n_processed"),
        F.count(F.when(~has_text, 1)).alias("n_empty_text"),
    ]
    if "sentiment" in df.columns:
        counters += [
            F.count(F.when(~confidence_gate("sentiment"), 1)).alias("n_gated"),
            F.count(F.when(confidence_gate("sentiment"), 1)).alias("n_published"),
        ]
    return df.observe(name, *counters)


@dataclass
class ProgressRecord:
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    processed_rows_per_second: float
    batch_duration_ms: int
    observed_metrics: dict


@dataclass
class MetricsListener(StreamingQueryListener):
    """Collects per-batch progress — rates (M3), durations (M2's timing
    histograms), observed counters (M1) — the Spark-native replacement for
    the reference's Prometheus registry + 20 s stats loop."""

    records: list = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        observed = {}
        try:
            for name, row in (p.observedMetrics or {}).items():
                observed[name] = row.asDict()
        except Exception:
            pass
        self.records.append(
            ProgressRecord(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                input_rows_per_second=p.inputRowsPerSecond or 0.0,
                processed_rows_per_second=p.processedRowsPerSecond or 0.0,
                batch_duration_ms=(p.durationMs or {}).get("triggerExecution", 0),
                observed_metrics=observed,
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def totals(self) -> dict:
        return {
            "n_batches": len(self.records),
            "total_input_rows": sum(r.num_input_rows for r in self.records),
        }
