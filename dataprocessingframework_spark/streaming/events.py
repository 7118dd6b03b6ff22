"""Streaming surface (§2.12) — entirely NEW relative to the reference,
which is batch-only over closed datasets. Structured Streaming gives
this for free; these helpers pin down the engine's event-time
semantics and work identically on batch AND streaming DataFrames
(the batch path is what the DuckDB oracle checks — see queries.py
f_time_bucket).

Incremental-append ingestion (the closest thing the reference has:
shards resume-from-last-shard, `writers/shards_writer.py:92-119`)
becomes `readStream` over a dataset directory: new shard files are
discovered per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "15 minutes",
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregate. Works on batch df too
    (watermark is a no-op in batch, letting one definition serve both
    the oracle check and the stream)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ]
    keys = [F.window(ts_col, window).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    agg_cols = [c for c in out.columns if c != "w" and c not in (group_cols or [])]
    return out.select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        *(group_cols or []),
        *agg_cols,
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(ts_col, window, slide).alias("w"),
            *[F.col(c) for c in (group_cols or [])],
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            *(group_cols or []),
            "cnt",
        )
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    key_col: str = "user_id",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows keyed by user — sessionization of the events
    stream (gap-based, Spark-native)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, join_keys: list[str], how: str = "inner"
) -> DataFrame:
    """Stream-static dimension enrichment: join each micro-batch against
    a static DataFrame. The static side is broadcast — no streaming
    state, no watermark interaction; Spark re-plans the join per
    micro-batch so a refreshed dim table (e.g. a reloaded Delta/parquet
    snapshot) is picked up on the next batch. Works identically on a
    batch DataFrame, which is what the oracle checks.
    """
    return events.join(F.broadcast(dim), on=join_keys, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Time-interval stream-stream inner join: right events within
    [left_ts, left_ts + horizon] for the same key (click-attribution
    topology). Both sides are watermarked and the range condition is
    closed on both ends, so Spark can bound join state: a buffered left
    row is dropped once the right watermark passes l_ts + horizon —
    state is O(horizon x rate), not O(stream). The two ts columns must
    be pre-renamed distinct (no ambiguity inside the join condition).
    Works identically on batch DataFrames, which the oracle checks.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    r = right.withColumnRenamed(key, "__rkey")
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {horizon}"))
    )
    return left.join(r, cond).drop("__rkey")


def stream_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stateful exact dedup within the watermark horizon — the streaming
    twin of exact_dedup (operators/dedup.py)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)


def windowed_psi(
    events: DataFrame,
    baseline: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "1 hour",
    lo: float = 0.0,
    hi: float = 500.0,
    bins: int = 10,
    smooth: float = 0.5,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-tumbling-window drift monitor: PSI of ``value_col``'s
    distribution in each event-time window against a STATIC baseline
    sample — the streaming tripwire that pages before a bad upstream
    poisons a continuously-ingested corpus.

    Streaming-safe by construction: the per-window bin histogram is
    computed as ``bins`` conditional sums inside ONE watermarked
    windowed aggregation (no chained stateful operators), and the
    baseline collapses to a single broadcast row of smoothed bin
    fractions joined on a constant key (stream-static broadcast
    join). Everything after the aggregation is a narrow projection.
    Works identically on a batch DataFrame, which the oracle checks.

    Returns (win_start, n_events, psi) per window, Laplace-smoothed
    like operators/drift.psi (empty bins finite).
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if hi <= lo:
        raise ValueError("hi must be > lo")
    width = (hi - lo) / bins

    def bucket(col):
        return F.least(
            F.greatest(F.floor((col.cast("double") - lo) / width), F.lit(0)),
            F.lit(bins - 1),
        )

    base_row = (
        baseline.select(bucket(F.col(value_col)).alias("bin"))
        .groupBy()
        .agg(
            *[
                (
                    F.sum(
                        F.when(F.col("bin") == i, 1).otherwise(0)
                    ).cast("double")
                    + F.lit(smooth)
                ).alias(f"_c{i}")
                for i in range(bins)
            ]
        )
        .select(
            F.lit(1).alias("_k"),
            F.array(*[F.col(f"_c{i}") for i in range(bins)]).alias("bc"),
        )
        .select(
            "_k",
            F.transform(
                F.col("bc"),
                lambda c: c
                / F.aggregate(F.col("bc"), F.lit(0.0), lambda a, x: a + x),
            ).alias("base_frac"),
        )
    )

    ev = events
    if ev.isStreaming:
        ev = ev.withWatermark(ts_col, watermark)
    hist = (
        ev.select(F.col(ts_col), bucket(F.col(value_col)).alias("bin"))
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            *[
                F.sum(F.when(F.col("bin") == i, 1).otherwise(0)).alias(
                    f"_b{i}"
                )
                for i in range(bins)
            ],
        )
    )
    win_counts = hist.select(
        F.col("w.start").alias("win_start"),
        "n_events",
        F.array(
            *[
                (F.col(f"_b{i}").cast("double") + F.lit(smooth))
                for i in range(bins)
            ]
        ).alias("wc"),
        F.lit(1).alias("_k"),
    )
    tot = F.aggregate(F.col("wc"), F.lit(0.0), lambda a, x: a + x)
    win_frac = win_counts.select(
        "win_start",
        "n_events",
        F.transform(F.col("wc"), lambda c: c / tot).alias("win_frac"),
        "_k",
    )
    joined = win_frac.join(F.broadcast(base_row), on="_k")
    term = F.zip_with(
        F.col("win_frac"),
        F.col("base_frac"),
        lambda pw, pb: (pw - pb) * (F.log(pw) - F.log(pb)),
    )
    return joined.select(
        "win_start",
        "n_events",
        F.round(
            F.aggregate(term, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("psi"),
    )
