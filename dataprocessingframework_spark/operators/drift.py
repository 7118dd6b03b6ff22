"""Distribution-drift diagnostics between corpus slices/releases.

A continuously-ingesting 100 TB corpus needs cheap statistical
tripwires: "did this source's length distribution shift since the
last release?" before a bad crawl poisons a training mix. Two
standard public metrics plus an inequality audit:

- ``ks_statistic``: two-sample Kolmogorov-Smirnov D = max |ECDF_a -
  ECDF_b|. Exact, rank-based — one union + one sort-shuffle on the
  value column; no binning choices to tune.
- ``psi``: Population Stability Index over fixed bins, the
  industry-standard drift score (sum over bins of
  (pa - pb) * ln(pa / pb)). One aggregate pass per side over
  engine-portable floor bins; bins are Laplace-smoothed so empty
  bins never produce infinities.
- ``gini``: concentration/inequality coefficient from the grouped
  closed form — the "how skewed is the token budget" audit.

Both return tiny DataFrames (one row / one row per bin) — nothing is
collected; both are linear and shuffle only group-sized state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_statistic(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Two-sample KS statistic between ``a`` and ``b`` on
    ``value_col``.

    Formulation: both samples collapse FIRST to per-distinct-value
    counts per side (one map-side-combinable groupBy — the only
    full-data shuffle), then the running ECDFs are prefix sums over
    the DISTINCT-VALUE table. The unpartitioned window therefore runs
    over value-cardinality rows, not data rows — fine for discrete /
    integer-ish columns (lengths, counts, scores) whose cardinality is
    bounded; for an unbounded continuous column at scale, quantize
    first (or use :func:`psi`, which bins by construction). Evaluating
    at each distinct value is exact: ECDF differences change only at
    observed values.

    Returns one row: (n_a, n_b, ks_d).
    """
    ta = a.select(F.col(value_col).cast("double").alias("v")).withColumn(
        "_s", F.lit(0)
    )
    tb = b.select(F.col(value_col).cast("double").alias("v")).withColumn(
        "_s", F.lit(1)
    )
    u = ta.unionByName(tb)
    per_v = u.groupBy("v").agg(
        F.sum(F.when(F.col("_s") == 0, 1).otherwise(0)).alias("_da"),
        F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("_db"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    per_v = per_v.select(
        "v",
        F.sum("_da").over(w).alias("_ca"),
        F.sum("_db").over(w).alias("_cb"),
    )
    totals = u.groupBy().agg(
        F.sum(F.when(F.col("_s") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("n_b"),
    )
    return (
        per_v.crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("_ca") / F.col("n_a") - F.col("_cb") / F.col("n_b")
            ).alias("_d"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.round(F.max("_d"), 6).alias("ks_d"))
    )


def psi(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Population Stability Index of ``b`` against baseline ``a`` over
    ``bins`` equal-width bins on [lo, hi] (values clamped into the
    edge bins, so the score is total-mass-correct for outliers).

    Laplace smoothing ``smooth`` is added to every bin count before
    normalizing, so an empty bin contributes a large-but-finite term
    instead of +inf. Returns one row (psi, n_a, n_b). Rule of thumb
    (public convention): <0.1 stable, 0.1-0.25 drifting, >0.25 major.
    """
    if hi <= lo:
        raise ValueError("hi must be > lo")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    width = (hi - lo) / bins

    def binned(df: DataFrame, name: str) -> DataFrame:
        bucket = F.least(
            F.greatest(
                F.floor((F.col(value_col).cast("double") - lo) / width),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
        return df.select(bucket.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(name)
        )

    ca, cb = binned(a, "ca"), binned(b, "cb")
    allbins = ca.sparkSession.range(bins).select(F.col("id").alias("bin"))
    j = (
        allbins.join(ca, on="bin", how="left")
        .join(cb, on="bin", how="left")
        .select(
            "bin",
            (F.coalesce(F.col("ca"), F.lit(0)) + smooth).alias("ca"),
            (F.coalesce(F.col("cb"), F.lit(0)) + smooth).alias("cb"),
        )
    )
    tot = j.groupBy().agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            ((F.col("ca") / F.col("ta")) - (F.col("cb") / F.col("tb")))
            .alias("_diff"),
            (
                F.log(F.col("ca") / F.col("ta"))
                - F.log(F.col("cb") / F.col("tb"))
            ).alias("_lr"),
            (F.col("ta") - F.lit(smooth * bins)).alias("_na"),
            (F.col("tb") - F.lit(smooth * bins)).alias("_nb"),
        )
        .groupBy()
        .agg(
            F.round(F.sum(F.col("_diff") * F.col("_lr")), 6).alias("psi"),
            F.first("_na").cast("long").alias("n_a"),
            F.first("_nb").cast("long").alias("n_b"),
        )
    )


def gini(df: DataFrame, value_col: str) -> DataFrame:
    """Gini coefficient of ``value_col`` (0 = perfectly equal, ->1 =
    fully concentrated) — the budget-concentration metric for corpus
    audits ("do 1% of sources carry 90% of the tokens?").

    Closed form over the per-distinct-value count table: with S the
    value sum, n the row count, c_v the count of value v and C_v the
    running count through v (ascending), G = sum_v v*c_v*(2*C_v -
    c_v + 1) / (n*S) - (n+1)/n — algebraically identical to the
    sorted-rank formula (2*sum i*x_i)/(n*S) - (n+1)/n with ties
    grouped. Same scale posture as :func:`ks_statistic`: the full data
    collapses to per-value counts in ONE map-side-combinable groupBy;
    the running-count window sees only the distinct-value table.
    Requires non-negative values; returns one row (n, gini).
    """
    per_v = (
        df.select(F.col(value_col).cast("double").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "v", "c", F.sum("c").over(w).alias("_cum")
    )
    return cum.groupBy().agg(
        F.sum("c").cast("long").alias("n"),
        F.round(
            F.sum(
                F.col("v") * F.col("c") * (2 * F.col("_cum") - F.col("c") + 1)
            )
            / (F.sum("c") * F.sum(F.col("v") * F.col("c")))
            - (F.sum("c") + 1) / F.sum("c"),
            6,
        ).alias("gini"),
    )
