"""r10 soak: k-center selection at realistic coreset k.

The registry/bench cover kcenter_select at k=8; a 100 TB data-pruning
pass wants k in the hundreds-to-thousands, where the risks are the k
sequential driver round-trips and the `least`-nested min-distance
lineage (truncated every ``checkpoint_every`` rounds by
localCheckpoint). This soak measures wall(k) along a k ladder for
each checkpoint cadence and prints ONE JSON LINE PER RUN immediately
(the first version buffered everything to the end and a timeout ate
40 minutes of signal). The marginal per-round cost between ladder
steps is the number to watch: flat marginals mean the lineage bound
holds; growing marginals mean the cadence re-analyzes too large an
expression tree per round. Paste the lines into PLANS.md.

Usage: python tools/kcenter_soak.py [sf_dir] [scale] [max_k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataprocessingframework_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    max_k = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = get_spark(app_name="kcenter-soak", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    from dataprocessingframework_spark.operators.similarity import (
        kcenter_select,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if scale > 1:
        n0 = emb.count()
        reps = spark.range(scale).select(F.col("id").alias("rep"))
        # per-copy deterministic perturbation so replicas are distinct
        # points, not exact dups the greedy pick would never select
        emb = emb.crossJoin(reps).select(
            (F.col("vec_id") + F.col("rep") * n0).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + ((F.col("rep") * 31 + i) % 97).cast("float") / 9700.0,
            ).alias("embedding"),
        )
    emb = emb.cache()
    n = emb.count()

    ks = [k for k in (32, 64, 128, 256, 512) if k <= max_k]
    for ce, bm in ((16, 1), (64, 1), (16, 16)):
        prev_k, prev_wall = 0, 0.0
        for k in ks:
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            n_sel = kcenter_select(
                emb, k=k, checkpoint_every=ce, batch_m=bm
            ).count()
            wall = time.time() - t0
            assert n_sel == k, (n_sel, k)
            print(
                json.dumps(
                    {
                        "soak": "kcenter",
                        "rows": n,
                        "checkpoint_every": ce,
                        "batch_m": bm,
                        "k": k,
                        "wall_s": round(wall, 2),
                        "marginal_s_per_round": round(
                            (wall - prev_wall) / (k - prev_k), 3
                        ),
                    }
                ),
                flush=True,
            )
            prev_k, prev_wall = k, wall


if __name__ == "__main__":
    main()
