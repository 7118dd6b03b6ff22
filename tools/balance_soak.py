"""Quantizer-balance soak (r12): does hot-cell splitting buy probe
latency and gate economy on REAL embedding data?

Setup that produces real catch-all mega-cells: the sf embeddings
table under a deliberately COARSE seeded quantizer (n_cells=8 —
the shape of an under-provisioned quantizer on a grown corpus, the
operational situation balance_centroids exists for). Splitting
targets max_cell <= ceil(N/8) (the perfectly-even size).

Measured before vs after (same data, same probes; every timing is
min-of-2 in the same JVM so codegen warm-up doesn't bias the later
variant):
  * max/avg cell and imbalance;
  * 50-query ivf_topk_from_index probe batch, n_probe=4 (probe cost
    follows the largest probed cell);
  * one incremental_semantic_dedup_sq8 batch (shortlist mass follows
    probed-cell mass).

Planted-geometry caveat measured separately: direction-tight density
spikes are UNSPLITTABLE under argmax-dot (documented in
balance_centroids) — this soak is the realistic coarse-quantizer
case, where splitting works. Results recorded in PLANS.md
("r12 balance soak"). Not a CI test.

Usage: python tools/balance_soak.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dataprocessingframework_spark.operators.similarity import (  # noqa: E402
    _ivf_centroids,
    assign_cells,
    balance_centroids,
    incremental_semantic_dedup_sq8,
    ivf_topk_from_index,
    load_sq8_bounds,
    materialize_ivf_index,
    norm,
)
from dataprocessingframework_spark.session import get_spark  # noqa: E402


def cell_shape(df, cents):
    nz = df.select(
        F.col("vec_id").alias("bid"),
        F.col("embedding").alias("bv"),
        norm(F.col("embedding")).alias("bn"),
    ).filter(F.col("bn") > 0)
    sizes = [
        r.n
        for r in assign_cells(nz, cents, "bid", "bv", impl="blas")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    return max(sizes), sum(sizes) / len(sizes)


def min2(fn):
    ts = []
    for _ in range(2):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 2))
    return min(ts)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="balance-soak")
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .cache()
    )
    n = df.count()
    cap = (n + 7) // 8
    queries = df.limit(50).cache()
    queries.count()
    batch = df.filter(F.col("vec_id") % 100 == 1).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    ).cache()
    batch.count()

    cents0 = _ivf_centroids(df, "vec_id", "embedding", 8, iters=0,
                            impl="blas")
    mx0, avg0 = cell_shape(df, cents0)
    print(f"n={n} cap={cap}")
    print(f"before: cells=8 max_cell={mx0} avg={avg0:.0f} "
          f"(imbalance {mx0/avg0:.1f}x)")

    stats: list = []
    t0 = time.time()
    bal = balance_centroids(
        df, cents0, max_cell_rows=cap, rounds=8,
        impl="blas", round_stats=stats,
    )
    t_bal = round(time.time() - t0, 2)
    mx1, avg1 = cell_shape(df, bal)
    print(f"after:  cells={len(bal)} max_cell={mx1} avg={avg1:.0f} "
          f"(imbalance {mx1/avg1:.1f}x) balance_wall={t_bal}s "
          f"rounds={len(stats)} "
          f"trajectory={[s['max_cell'] for s in stats]}")

    for tag, cents in (("before", cents0), ("after", bal)):
        table = f"t_balsoak_{tag}"
        t0 = time.time()
        idx, _ = materialize_ivf_index(
            df, table, centroids=cents, impl="blas",
            num_buckets=16, sq8=True,
            path=f"/root/repo/.scratch/balsoak_{tag}",
        )
        build = round(time.time() - t0, 2)
        bounds = load_sq8_bounds(spark, table)
        probe = min2(
            lambda: ivf_topk_from_index(
                idx, cents, queries, k=10, n_probe=4,
                sq8_bounds=bounds,
            ).write.format("noop").mode("overwrite").save()
        )
        gate = min2(
            lambda: incremental_semantic_dedup_sq8(
                batch, df, cents, idx, bounds,
                threshold=0.95, n_probe=4, impl="blas",
            ).write.format("noop").mode("overwrite").save()
        )
        print(f"{tag}: build={build}s probe50(min2)={probe}s "
              f"gate_batch(min2)={gate}s")
    import shutil
    for tag in ("before", "after"):
        for sfx in ("", "_centroids", "_sq8"):
            spark.sql(f"DROP TABLE IF EXISTS t_balsoak_{tag}{sfx}")
            shutil.rmtree(
                f"/root/repo/.scratch/balsoak_{tag}{sfx}",
                ignore_errors=True,
            )


if __name__ == "__main__":
    main()
