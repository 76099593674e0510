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
