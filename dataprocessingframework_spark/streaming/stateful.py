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


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # epoch seconds
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def stateful_sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
) -> DataFrame:
    """Gap-based sessionization with explicit keyed state — the
    streaming twin of the batch lag/cumsum formulation (ev_sessionize;
    identical close rule: a gap STRICTLY greater than ``gap_sec``
    starts a new session, unlike session_window's >=).

    Streaming: per-key state is one open session (start, last, n);
    CLOSED sessions emit as append-mode rows the moment a later event
    arrives past the gap, and the final open session emits on
    event-time timeout once the watermark passes last+gap. State is
    O(active keys), emission is exactly-once per closed session.

    On a batch DataFrame this degrades to the window formulation with
    the same output schema — one definition serves tests, backfill,
    and production streams.
    """
    if not events.isStreaming:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(key_col).orderBy(ts_col)
        epoch = F.col(ts_col).cast("long")
        prev = F.lag(epoch).over(w)
        is_new = F.when(
            prev.isNull() | ((epoch - prev) > gap_sec), F.lit(1)
        ).otherwise(F.lit(0))
        wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sess = events.select(
            F.col(key_col).alias("user_id"),
            epoch.alias("__t"),
            is_new.alias("__new"),
        ).withColumn("__sid", F.sum("__new").over(
            Window.partitionBy("user_id").orderBy("__t").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ))
        return sess.groupBy("user_id", "__sid").agg(
            F.min("__t").alias("session_start"),
            F.max("__t").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        ).drop("__sid")

    def update(key, pdfs, state: GroupState):
        uid = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int, int]] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(
                (pdf[ts_col].astype("int64") // 1_000_000_000).tolist()
            )
        for t in sorted(ts_all):
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_sec:
                closed.append((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        state.update((start, last, n))
        state.setTimeoutTimestamp((last + gap_sec + 1) * 1000)
        if closed:
            u, s, e, c = zip(*closed)
            yield pd.DataFrame(
                {
                    "user_id": list(u),
                    "session_start": list(s),
                    "session_end": list(e),
                    "n_events": list(c),
                }
            )

    return (
        events.withWatermark(ts_col, f"{gap_sec} seconds")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
