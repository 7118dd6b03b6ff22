"""Partitioning helpers for compute-bound narrow stages.

A parquet scan's task count is bounded by its files' row-group splits;
a single-row-group file (or a heavily filtered input) arrives as ONE
partition, and any CPU-heavy narrow stage stacked on it (per-token md5
explodes, minhash folds, per-row scoring) then runs on one core no
matter how many the cluster has. ``fan_out`` pays one small round-robin
shuffle of the (skinny) input to unlock full-width execution of
everything above it — and, because both consumers of a forked lineage
hang off the same exchange, Spark's exchange reuse also collapses
double-computation of the stage below the fork.

At 100 TB this is a no-op by construction: real tables arrive with
thousands of row-group splits, so the partition count is already at or
above the session's parallelism and the input is returned unchanged.
The helper exists for the skinny-scan tail cases — small dimension
corpora, single-file extracts, post-filter remnants — where serial
execution of a wide-CPU stage is the actual bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


_BYTE_SUFFIX = {
    "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}

_DEFAULT_PARTITION_BYTES = 134217728  # Spark's maxPartitionBytes default


def partition_budget_bytes(spark) -> int:
    """``spark.sql.files.maxPartitionBytes`` as an int — Spark reports
    it in its byte-string form ('128m', '134217728b', plain digits).
    An unparseable form falls back to the Spark default rather than
    raising: this feeds a skip-HEURISTIC, never correctness."""
    raw = str(
        spark.conf.get(
            "spark.sql.files.maxPartitionBytes",
            str(_DEFAULT_PARTITION_BYTES),
        )
    ).strip().lower()
    try:
        for suffix in sorted(_BYTE_SUFFIX, key=len, reverse=True):
            if raw.endswith(suffix):
                return int(raw[: -len(suffix)]) * _BYTE_SUFFIX[suffix]
        return int(raw)
    except ValueError:
        return _DEFAULT_PARTITION_BYTES


def fan_out(
    df: DataFrame,
    min_fraction: float = 0.5,
    skip_below_bytes: int | None = None,
) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff its current partition count is below
    ``min_fraction`` of it; otherwise return ``df`` unchanged.
    Row-content neutral: safe above any partition-agnostic operator.

    ``skip_below_bytes``: also skip when the optimizer's size estimate
    for ``df`` is below this many bytes — an input smaller than one
    partition budget arrives as one partition because it is SMALL, not
    because it is under-split, and paying a full shuffle to
    parallelize a sub-partition amount of narrow work loses (measured:
    the r15 minhash A/B, PLANS.md). Callers with genuinely heavy
    per-row work should leave it None.
    """
    # size gate FIRST: it reads the optimizer's estimate (analysis
    # only), while the partition-count probe below (`df.rdd`) forces
    # full PHYSICAL planning of the subtree at construction time —
    # on the common sub-budget path the cheap check short-circuits
    # the expensive one. Outcome-equivalent: both paths return df
    # unchanged whenever either gate fires.
    if skip_below_bytes is not None:
        try:
            size = int(
                df._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        except Exception:  # noqa: BLE001 — stats unavailable: fan out
            size = None
        if size is not None and 0 <= size < skip_below_bytes:
            return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, int(target * min_fraction)):
        return df
    return df.repartition(target)
