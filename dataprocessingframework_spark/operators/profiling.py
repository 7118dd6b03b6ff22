"""Dataset profiling — one-pass column statistics for pipeline triage.

A 100 TB curation run starts with "what's in this table": row counts,
cardinalities, null fractions, ranges. All computed in ONE aggregate
pass (single shuffle of partial aggregates), never collected per-row.
For quick interactive profiling at extreme scale, `approximate=True`
swaps exact distinct counts for HLL sketches
(`approx_count_distinct`, constant memory per column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approximate: bool = False,
) -> DataFrame:
    """Single-row profile: per column — non-null count, distinct count,
    null count, and min/max/avg for numeric columns."""
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approximate
        else (lambda c: F.countDistinct(c))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}_non_null"))
        aggs.append(distinct(c).alias(f"{c}_distinct"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls")
        )
        if c in numeric:
            aggs += [
                F.min(c).alias(f"{c}_min"),
                F.max(c).alias(f"{c}_max"),
                F.round(F.avg(c), 4).alias(f"{c}_avg"),
            ]
    return df.agg(*aggs)


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Fixed-width histogram: (bucket, lo, hi, cnt), bucket 0..n-1 plus
    -1/n overflow rows for out-of-range values. One partial/final
    aggregate — the shuffle carries n_buckets rows per task regardless
    of input size.

    Bucket = floor((v - lo) / width) with IEEE double math, identical
    on any engine — deliberately not width_bucket(), whose boundary
    semantics differ across engines.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got lo={lo}, hi={hi}")
    width = (hi - lo) / n_buckets
    bucket = (
        F.when(F.col(col) < lo, F.lit(-1))
        .when(F.col(col) >= hi, F.lit(n_buckets))
        .otherwise(F.floor((F.col(col) - lo) / width))
        .cast("long")
    )
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * width, 4).alias("bucket_lo"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * width, 4).alias(
                "bucket_hi"
            ),
            "cnt",
        )
        .orderBy("bucket")
    )
