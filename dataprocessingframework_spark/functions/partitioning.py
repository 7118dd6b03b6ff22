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


def fan_out(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff its current partition count is below
    ``min_fraction`` of it; otherwise return ``df`` unchanged.
    Row-content neutral: safe above any partition-agnostic operator.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, int(target * min_fraction)):
        return df
    return df.repartition(target)
