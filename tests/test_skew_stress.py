"""Skew stress harness (VERDICT r5 item 6).

The scale guards — LSH ``max_bucket_size`` star-collapse, blocked
pair generation, salted joins — are exercised elsewhere on benign
sf0.001 data. These tests synthesize DELIBERATELY pathological
inputs (a near-dup family thousands of members strong, a join key
holding 20% of the fact rows) and assert the bounded-work properties
directly: candidate counts stay linear, no single task owns the hot
bucket's quadratic pair emission, no single reducer owns the hot
key. Each assertion fails if its guard is removed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataprocessingframework_spark.operators import dedup
from dataprocessingframework_spark.operators.joins import salted_join


def _family_docs(spark, family: int, distinct: int):
    """``family`` identical boilerplate docs + ``distinct`` unique
    docs (distinct enough that they share no 5-word shingle)."""
    fam = spark.range(family).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate footer text repeated on every page"
              ).alias("text"),
    )
    uniq = spark.range(family, family + distinct).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{i}_"), F.col("id").cast("string"))
                for i in range(8)
            ],
        ).alias("text"),
    )
    return fam.unionByName(uniq)


def test_star_collapse_bounds_hot_family(spark):
    """A 5000-member identical-text family forms one bucket per band;
    the clique is 12.5M pairs. With the cap, each band's bucket
    star-collapses to family-1 pairs and first-colliding-band
    emission keeps only band 0's copy — candidate output must stay
    LINEAR in the family size. Removing max_bucket_size (or the
    star-collapse branch) explodes this to the 12.5M clique and the
    bound fails."""
    fam = 5000
    docs = _family_docs(spark, fam, 200)
    cand = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=4,
        max_bucket_size=100,
    )
    n = cand.count()
    # star: fam-1 pairs (+ nothing from the unique docs); generous
    # headroom for band-boundary effects, but far below quadratic
    assert fam - 1 <= n <= 5 * fam, n
    # transitive closure must still recover the FULL family as one
    # cluster — the collapse trades pair volume, not connectivity
    cc = dedup.connected_components(cand)
    top = (
        cc.groupBy("cluster").count().orderBy(F.desc("count")).first()
    )
    assert top["count"] == fam


def test_blocked_pair_gen_no_hot_task(spark):
    """With the cap DISABLED, a 4000-member bucket emits its 8M-pair
    clique — but the blocked generator must spread the emission over
    many tasks: chunk the sorted ids, repartition the (chunk_i,
    chunk_j) rows, explode per block. No output partition may own
    more than half the pairs (removing the pre-explode repartition
    puts the whole bucket's emission in ONE task and this fails)."""
    fam = 4000
    docs = _family_docs(spark, fam, 50)
    cand = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=4,
        max_bucket_size=None,
    )
    per_part = (
        cand.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in per_part)
    biggest = max(r["n"] for r in per_part)
    assert total == fam * (fam - 1) // 2, total
    assert len(per_part) >= 2
    assert biggest <= 0.5 * total, (biggest, total)


@pytest.fixture()
def no_aqe(spark):
    """AQE's runtime skew-split would mask a broken salt, and a
    broadcast join would dodge the key shuffle entirely (salting
    exists for the joins that CANNOT broadcast: big dims, streaming);
    pin the static shuffled-join behavior."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def test_salted_join_spreads_hot_key(no_aqe):
    """Fact table with key 0 at 20% frequency (10k of 50k rows)
    joining a 100-key dim: after salting, no reducer may hold the
    whole hot key. An unsalted hash join puts all 10k hot rows in
    one partition; salt=16 must cut the max well below that. Result
    set must equal the plain join (salt is invisible in values)."""
    spark = no_aqe
    fact = spark.range(50_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    hot = fact.filter(F.col("k") == 0).count()
    assert hot == 10_000

    salted = salted_join(fact, dim, on="k", salt=16)

    def hot_per_partition(joined):
        return (
            joined.withColumn("p", F.spark_partition_id())
            .filter(F.col("k") == 0)
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    spread = hot_per_partition(salted)
    assert sum(r["n"] for r in spread) == hot
    # the hot key must be SPLIT across reducers: no partition holds
    # more than half of it (unsalted: ONE partition holds all 10k,
    # which is what the plain-join control below demonstrates)
    assert len(spread) >= 2
    assert max(r["n"] for r in spread) <= 0.5 * hot, spread

    control = hot_per_partition(fact.join(dim, on="k"))
    assert max(r["n"] for r in control) == hot, control

    plain = fact.join(dim, on="k")
    assert salted.count() == plain.count()
    assert (
        salted.exceptAll(plain).count() == 0
        and plain.exceptAll(salted).count() == 0
    )
