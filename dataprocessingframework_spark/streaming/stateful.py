"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (§2.12); this is the engine's
native surface for arbitrary keyed state — the escape hatch when
built-in windows/dedup can't express the semantics (running per-key
aggregates with custom update rules, cross-batch counters, sessionized
feature extraction for training pipelines).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running per-user (count, sum) maintained across micro-batches —
    state lives in the streaming state store, emitted per batch.

    On a batch DataFrame this degrades to the equivalent groupBy (same
    output schema), so one definition serves tests and production.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy(F.col(key_col).alias("user_id")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).cast("double").alias("total_value"),
        )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
