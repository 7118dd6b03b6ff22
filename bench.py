"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query selection spans the engine's cost classes: columnar scan+agg,
multi-way shuffle joins, window functions, streaming-shape event agg,
text analytics projection, MinHash/LSH dedup, and embedding ANN.
Results are materialized with count()/collect-free noop writes where the
output is large, so timings measure the distributed pipeline, not driver
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from dataprocessingframework_spark import queries as q  # noqa: E402
from dataprocessingframework_spark.operators import dedup, similarity  # noqa: E402
from dataprocessingframework_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    """Materialize without driver collection."""
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark):
    """name -> thunk; each thunk fully materializes its pipeline."""

    def small(fn):
        return lambda: fn(spark, SF_DIR).toPandas()

    def big(fn):
        return lambda: _noop(fn(spark, SF_DIR))

    return {
        # relational core
        "q1_pricing_summary": small(q.q_h1_pricing_summary),
        "q3_top_orders": small(q.q_h3_top_orders),
        "q5_region_revenue": small(q.q_h5_region_revenue),
        "group_agg": small(q.q_a3_group_agg),
        "window_topn": small(q.q_window_topn),
        "update_columns": small(q.q_w4_update_columns),
        # events / streaming shape
        "event_window_agg": small(q.q_f_time_bucket),
        # event analytics (lag/cumsum windows + session agg, one
        # user_id exchange — the sessionization cost class)
        "event_sessionize": big(q.q_ev_sessionize),
        # text analytics (narrow projection, codegen)
        "text_quality": big(lambda s, d: q.q_tx_quality(s, d)),
        # flagship curation pipeline (features -> filter -> dedup -> stats)
        "pipeline_curation": small(q.q_pipeline_curation),
        # v2 flagship: gate -> exact dedup -> stride-1 span removal ->
        # report (the composed multi-tier cost)
        "pipeline_curation_v2": small(q.q_pipeline_curation_v2),
        # dedup sketches at scale
        "minhash_signatures": big(
            lambda s, d: dedup.minhash_signatures(
                q.T(s, d, "documents"), "text", "doc_id", num_hashes=16
            )
        ),
        # PRODUCTION shape: default bucket cap + 64-bit prefix bucket
        # keys. The uncapped md5-string variant was dropped from the
        # bench in r5 (VERDICT r4 item 2): its uncapped collect_set
        # arrays made trial-3 timings degrade 8.5x from GC pressure in
        # one JVM — it remains oracle-checked (dd_lsh_candidates) but
        # is not a headline perf entry. Name kept from r4 for
        # round-over-round comparability.
        "minhash_lsh_candidates_capped": big(
            lambda s, d: dedup.minhash_lsh_candidates(
                q.T(s, d, "documents"), "text", "doc_id",
                num_hashes=16, bands=4,
            )
        ),
        # LSH candidates -> exact-Jaccard verification (pair-driven
        # intersection, linear in |candidates|; the word-keyed shape
        # this replaced ran 82s on this corpus — r5). New in r5.
        "jaccard_verify_lsh": big(
            lambda s, d: dedup.jaccard_pairs(
                q.T(s, d, "documents"), "text", "doc_id", threshold=0.5,
                candidates=dedup.minhash_lsh_candidates(
                    q.T(s, d, "documents"), "text", "doc_id",
                    num_hashes=16, bands=4,
                ),
            )
        ),
        # corpus boilerplate removal (tile df join-back + ordered
        # reassembly — the 3-linear-shuffle text-mutation cost class)
        "text_remove_dup_passages": big(q.q_tx_remove_dup_passages),
        # stride-1 exact-span dedup (ExactSubstr class: ~1 gram/token,
        # span-merge window, array join-back — the heaviest text path)
        "text_remove_dup_spans": big(q.q_tx_remove_dup_spans),
        # embedding similarity
        "ann_topk_cosine": small(q.q_emb_topk),
        "ann_topk_blas": small(
            lambda s, d: similarity.cosine_topk(
                q.T(s, d, "embeddings"),
                q.T(s, d, "embeddings").filter(F.col("vec_id") < 50),
                k=10,
                impl="blas",
            )
        ),
        "ann_lsh_topk": big(
            lambda s, d: similarity.lsh_topk(
                q.T(s, d, "embeddings"),
                q.T(s, d, "embeddings").filter(F.col("vec_id") < 50),
                k=10,
                broadcast_queries=True,  # known-small probe batch
            )
        ),
        "ann_ivf_topk": small(q.q_emb_ivf_topk),
        # multi-table LSH (OR-amplification, r6): L=3 plane tables,
        # one (table, bucket) equi-join, skinny-pair dedup pre-ranking
        "ann_lsh_multi_topk": big(
            lambda s, d: similarity.lsh_topk_multi(
                q.T(s, d, "embeddings"),
                q.T(s, d, "embeddings").filter(F.col("vec_id") < 50),
                k=10,
                n_tables=3,
                broadcast_queries=True,
            )
        ),
        # connected components over the LSH candidate graph (r6:
        # large-star/small-star default) — the transitive-dedup step
        "cc_clusters_star": big(
            lambda s, d: dedup.connected_components(
                dedup.minhash_lsh_candidates(
                    q.T(s, d, "documents"), "text", "doc_id",
                    num_hashes=16, bands=4,
                ),
                all_nodes=q.T(s, d, "documents").select("doc_id"),
            )
        ),
        # temporal join (union-window asof, one shuffle)
        "asof_join": small(q.q_j_asof),
    }


def main() -> None:
    spark = get_spark(app_name="dpf-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the JVM, parquet footer caches, and Python UDF workers
    # outside the timed region
    q.T(spark, SF_DIR, "lineitem").count()
    import pandas as pd  # noqa: F401

    spark.range(1000).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    for name, thunk in bench_queries(spark).items():
        # isolate queries: persisted intermediates from earlier queries
        # (LSH bucket tables etc.) otherwise pile up and add eviction
        # pressure, inflating later timings run-to-run
        spark.catalog.clearCache()
        # drop accumulated JVM garbage (codegen classes, shuffle file
        # buffers, noop-write leftovers from earlier queries): without
        # this, the late ANN-tier queries measure 3-8x slower in the
        # full run than in isolation purely from GC pressure
        spark.sparkContext._jvm.System.gc()
        runs = []
        for _ in range(3):  # min-of-3: local[32] on tiny data is noisy
            t0 = time.time()
            thunk()
            runs.append(round(time.time() - t0, 3))
        # adaptive extension (r6): a single shared JVM sporadically
        # runs fresh whole-stage-codegen classes at low JIT tier right
        # after the codegen-rich LSH queries churn the code cache —
        # task executor-time inflates ~6x (measured: 133s vs 23s task
        # time, 467 CPU-s in-JVM during an 18s wall spike, near-zero
        # GC / Python CPU) and decays over ~30s. See PLANS.md
        # "bench variance root cause". The minima stay correct, but
        # with only 3 trials a spike cluster can leave the min itself
        # one-sample-thin; keep sampling until the spread is sane or
        # the sample is big enough to trust the min regardless.
        while max(runs) / min(runs) > 2.0 and len(runs) < 6:
            t0 = time.time()
            thunk()
            runs.append(round(time.time() - t0, 3))
        # per-trial times recorded so a one-off outlier in the minima
        # (e.g. background contention) is self-diagnosing in the
        # BENCH_r{N}.json artifact rather than needing a re-run
        trials[name] = runs
        timings[name] = min(runs)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "trials": trials,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
