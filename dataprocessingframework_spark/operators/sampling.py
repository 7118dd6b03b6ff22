"""Sampling operators for reproducible pipeline runs at scale.

The reference's sampling surface is ``df.sample`` (one random row,
``DPF/processors/processor.py:295-320``) and the full-shuffle stage
(``pipelines/pipeline_stages.py:27-34``) — both seed-dependent and
engine-local. A 100 TB pipeline additionally needs:

- ``hash_sample``: DETERMINISTIC sampling — keep a row iff
  ``hash64(key) % denom < num``. No RNG state, no seed plumbing; the
  same rows are selected on any engine, any partitioning, any rerun
  (md5-derived hash — bit-identical in Spark, DuckDB, Python). This is
  how reproducible holdout/eval splits are actually cut from training
  corpora: membership is a pure function of the key.
- ``stratified_sample``: per-stratum fractions via ``sampleBy``
  (seeded Bernoulli per row; approximate sizes) — the quick
  inspection path, not the reproducible-split path.

Both are narrow (filter / per-row Bernoulli): no shuffle, fully
pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataprocessingframework_spark.functions.hashing import hash64


def hash_sample_pred(
    key: Column | str, num: int = 1, denom: int = 20, salt: str = ""
) -> Column:
    """Boolean predicate: row in the num/denom hash-sample of key.

    Rows with ``hash64(salt||key) % denom < num`` are kept. Disjoint
    train/eval splits come from the SAME salt with complementary
    bucket ranges (num=19 keeps buckets 0-18; its complement is
    buckets 19+); DIFFERENT salts give statistically independent
    samples of the same data.
    """
    c = F.col(key) if isinstance(key, str) else key
    keyed = F.concat(F.lit(salt), c.cast("string")) if salt else c.cast("string")
    return hash64(keyed) % denom < num


def hash_sample(
    df: DataFrame,
    key_col: str,
    num: int = 1,
    denom: int = 20,
    salt: str = "",
) -> DataFrame:
    """Deterministic num/denom sample by key hash (see module doc)."""
    return df.filter(hash_sample_pred(key_col, num, denom, salt))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (seeded, approximate sizes)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, int],
    denom: int = 100,
    salt: str = "",
) -> DataFrame:
    """DETERMINISTIC stratified sample: per-stratum keep rates over the
    same engine-portable key hash as :func:`hash_sample`.

    ``rates`` maps stratum value -> numerator out of ``denom`` (e.g.
    ``{"en": 50, "de": 100}`` keeps half the English docs and all the
    German ones — the standard up/down-weighting move when balancing a
    multilingual corpus). Unlisted strata are DROPPED (rate 0).
    Membership is a pure function of (salt, key), so the same rows
    survive on any engine, partitioning, or rerun. Still a narrow
    filter: no shuffle, pushdown-friendly.
    """
    pairs: list[Column] = []
    for stratum, num in rates.items():
        pairs += [F.lit(stratum), F.lit(int(num))]
    num_col = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)), F.lit(0)
    )
    c = F.col(key_col).cast("string")
    keyed = F.concat(F.lit(salt), c) if salt else c
    return df.filter(hash64(keyed) % denom < num_col)


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    denom: int = 1_000_000,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source rebalancing: sample so group g's share
    of the output follows p_g ~ n_g^alpha (the multilingual sampling
    exponent of mBERT/XLM-R/mT5, public), with total output ~=
    ``target_fraction`` of the input. alpha=1 preserves shares, 0
    equalizes; over-represented groups are down-sampled, small groups
    kept whole (a filter cannot up-sample, so rates cap at 1 — the
    usual data-mixing convention).

    Per-group keep rates are DERIVED FROM THE DATA inside the plan:
    one tiny groupBy(strata) count (map-side combined), a scalar
    total, then the rate table — group-cardinality rows — broadcasts
    back onto the corpus, where membership is the same engine-portable
    integral-threshold hash predicate as :func:`hash_sample`
    (``hash64 % denom < floor(rate * denom)``). The corpus itself is
    never shuffled: count-side shuffle volume is one row per
    (task x group).
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_g"))
    tot = counts.agg(
        F.sum("n_g").alias("n_tot"),
        F.sum(F.pow("n_g", F.lit(alpha))).alias("z"),
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            strata_col,
            F.least(
                F.lit(1.0),
                F.lit(target_fraction)
                * F.col("n_tot")
                * F.pow("n_g", F.lit(alpha))
                / F.col("z")
                / F.col("n_g"),
            ).alias("__keep_rate"),
        )
    )
    c = F.col(key_col).cast("string")
    keyed = F.concat(F.lit(salt), c) if salt else c
    # eqNullSafe: a null stratum is a group like any other (groupBy
    # keeps it); a plain equi-join would silently drop those rows
    rates = rates.withColumnRenamed(strata_col, "__strata")
    return (
        df.join(
            F.broadcast(rates),
            F.col(strata_col).eqNullSafe(F.col("__strata")),
        )
        .filter(
            hash64(keyed) % denom
            < F.floor(F.col("__keep_rate") * denom).cast("long")
        )
        .drop("__keep_rate", "__strata")
    )


def per_group_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY min(k, n_g) rows per group, chosen pseudo-randomly but
    deterministically: rank rows within each group by the portable key
    hash and keep the first k. The fixed-size-per-stratum eval-subset
    primitive (hash_sample gives fixed RATES, this gives fixed
    COUNTS). One shuffle on the group key; the per-group sort ranks
    within partitions only — no global order.
    """
    from pyspark.sql import Window

    c = F.col(key_col).cast("string")
    keyed = F.concat(F.lit(salt), c) if salt else c
    w = Window.partitionBy(strata_col).orderBy(
        hash64(keyed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: tuple[tuple[str, int], ...] = (
        ("train", 90),
        ("val", 5),
        ("test", 5),
    ),
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic named train/val/test assignment: bucket =
    hash64(salt||key) % total_weight, mapped to the first split whose
    cumulative weight exceeds it. Pure function of the key — the same
    row lands in the same split on any engine, partitioning, or rerun,
    and disjointness/coverage are structural. Narrow (no shuffle);
    the assignment column is codegen'd JVM-side.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(w for _, w in splits)
    c = F.col(key_col).cast("string")
    keyed = F.concat(F.lit(salt), c) if salt else c
    bucket = hash64(keyed) % total
    chain = None
    acc = 0
    for name, w in splits[:-1]:
        acc += w
        cond = bucket < acc
        chain = (
            F.when(cond, F.lit(name))
            if chain is None
            else chain.when(cond, F.lit(name))
        )
    last = F.lit(splits[-1][0])
    chain = last if chain is None else chain.otherwise(last)
    return df.withColumn(out_col, chain)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int = 100,
    salt: str = "ws|",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: k rows, inclusion odds
    proportional to ``weight_col``, deterministic and engine-portable.

    Efraimidis-Spirakis A-ES (public algorithm, Inf. Process. Lett.
    2006): each row gets key = -ln(u)/w with u ~ U(0,1]; the k
    SMALLEST keys form an exact weighted sample without replacement.
    Instead of an RNG, u is derived from the portable md5 hash of the
    row id (``(hash64(salt||id) % p + 1) / (p+1)`` with p = 1e9+7), so
    the selected set is a pure function of the ids — reproducible
    across engines, partitionings and reruns, like :func:`hash_sample`
    but weight-aware. Rows with non-positive weight are excluded.

    Scale shape: the key is a narrow codegen projection and Spark
    plans ``orderBy(key).limit(k)`` as TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver — so there is
    no global sort and no shuffle of the data itself at any input
    size. (Ties in the float key are broken identically everywhere
    because keys are hash-distinct with probability ~1.)
    """
    p = 1_000_000_007
    u = (
        (hash64(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % p)
        + F.lit(1.0)
    ) / F.lit(float(p + 1))
    key = -F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_aes_key", key)
        .orderBy("_aes_key")
        .limit(k)
        .drop("_aes_key")
    )
