"""Arbitrary stateful streaming operators (applyInPandasWithState) —
SURVEY.md §2B "Arbitrary stateful ops".

running_label_counts reproduces the reference's label-partitioned running
counters (sentiment_predictions_total{sentiment} etc., reference:
src/metrics.py:5-39) as managed per-key state: each micro-batch emits the
updated cumulative count per key. State is partitioned by the key (scales
horizontally) and, unlike the Prometheus counters, survives restarts via
the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "label string, n_total long, n_batch long"
STATE_SCHEMA = "n long"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n_batch = 0
    for pdf in pdfs:
        n_batch += len(pdf)
    (prev,) = state.get if state.exists else (0,)
    total = prev + n_batch
    state.update((total,))
    yield pd.DataFrame({
        "label": [key[0]], "n_total": [total], "n_batch": [n_batch],
    })


# Runtime requirement for transformWithState's python<->JVM state protocol;
# without it the v2 API is defined but cannot execute (tests skip).
try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    HAVE_PROTOBUF = True
except ImportError:  # pragma: no cover - container has no protobuf
    HAVE_PROTOBUF = False

try:  # Spark >= 4.0 arbitrary-state v2 (transformWithState)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LabelCountProcessor(StatefulProcessor):
        """transformWithStateInPandas version of the running counters —
        the arbitrary-state v2 API: named state variables on a handle,
        lazy iterator output, RocksDB-backed state with fine-grained
        changelog checkpointing (the scale path for large keyspaces,
        where applyInPandasWithState's HDFS-backed snapshot per batch
        becomes the bottleneck)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n_batch = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            total = prev + n_batch
            self._count.update((total,))
            yield pd.DataFrame({
                "label": [key[0]], "n_total": [total], "n_batch": [n_batch],
            })

        def close(self) -> None:
            pass

    def running_label_counts_v2(df: DataFrame, label_col: str) -> DataFrame:
        """running_label_counts on the transformWithState API. Requires the
        RocksDB state store provider (set it on the session conf)."""
        return (
            df.select(df[label_col].alias("label"))
            .groupBy("label")
            .transformWithStateInPandas(
                LabelCountProcessor(),
                outputStructType=OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
except ImportError:  # pragma: no cover - older Spark
    running_label_counts_v2 = None


def running_label_counts(df: DataFrame, label_col: str) -> DataFrame:
    """Per-label cumulative counts as a stateful stream transform. Output
    mode: update (one row per key per batch that saw the key)."""
    # rename before grouping: applyInPandasWithState can't resolve an
    # aliased grouping expression
    return (
        df.select(df[label_col].alias("label"))
        .groupBy("label")
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
