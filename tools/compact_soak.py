"""r9 soak: maintained-index append fragmentation vs compaction.

Simulates a day of index-backed ingest: build a cell-bucketed IVF
index, apply N small appends (each adds one file per non-empty
bucket — the micro-batch maintenance step of
streaming.incremental_semantic_ingest), then measure probe latency
on the fragmented index, compact with
sources.compact.compact_bucketed_index, and measure again. Records
the file counts and min-of-3 probe times; paste the JSON line into
PLANS.md.

Usage: python tools/compact_soak.py [n_appends] [sf_dir] [scale]

``scale`` replicates the embeddings table with distinct vec_ids
(same move as tools/ann_probe_soak.py) so the soak runs at the
100k+-row index shape where file-count fragmentation dominates probe
latency, not at sf0.01's 500 rows.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataprocessingframework_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="compact-soak", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    from dataprocessingframework_spark.operators.similarity import (
        ivf_topk_from_index,
        materialize_ivf_index,
    )
    from dataprocessingframework_spark.sources.compact import (
        _table_location,
        compact_bucketed_index,
        dataset_file_stats,
    )

    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    base = tempfile.mkdtemp(prefix="compact_soak_")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if scale > 1:
        n0 = emb.count()
        reps = spark.range(scale).select(F.col("id").alias("rep"))
        emb = emb.crossJoin(reps).select(
            (F.col("vec_id") + F.col("rep") * n0).alias("vec_id"),
            "embedding",
        )
    n = emb.count()
    seed = emb.filter(F.col("vec_id") % (n_appends + 1) == 0)
    qs = emb.filter(F.col("vec_id") < 16)

    t0 = time.time()
    idx, cents = materialize_ivf_index(
        seed, "t_soak_idx", n_cells=32, iters=1, num_buckets=64,
        path=f"{base}/idx",
    )
    build_s = time.time() - t0

    t0 = time.time()
    for i in range(1, n_appends + 1):
        materialize_ivf_index(
            emb.filter(F.col("vec_id") % (n_appends + 1) == i),
            "t_soak_idx",
            mode="append",
        )
    append_s = time.time() - t0

    def probe_min3() -> float:
        best = float("inf")
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t = time.time()
            ivf_topk_from_index(
                spark.table("t_soak_idx"), cents, qs, k=5, n_probe=4
            ).count()
            best = min(best, time.time() - t)
        return best

    files_frag, bytes_frag = dataset_file_stats(
        spark, _table_location(spark, "t_soak_idx")
    )
    probe_frag = probe_min3()

    t0 = time.time()
    files_compact = compact_bucketed_index(spark, "t_soak_idx")
    compact_s = time.time() - t0
    probe_compact = probe_min3()

    print(json.dumps({
        "soak": "compact_bucketed_index",
        "sf_dir": sf_dir,
        "rows": n,
        "n_appends": n_appends,
        "build_s": round(build_s, 2),
        "append_total_s": round(append_s, 2),
        "files_fragmented": files_frag,
        "files_after_compact": files_compact,
        "bytes": bytes_frag,
        "probe_fragmented_s": round(probe_frag, 3),
        "probe_compacted_s": round(probe_compact, 3),
        "compact_s": round(compact_s, 2),
    }))
    for t in ("t_soak_idx", "t_soak_idx_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
