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

PER-TIER JVM ISOLATION (r7, VERDICT r6 item 1): queries are grouped
into cost-class tiers and each tier runs in its OWN subprocess (fresh
Python + fresh JVM). Rationale, measured across r5/r6 (PLANS.md "bench
variance root cause"): in one shared JVM, the codegen-rich LSH/span
tier churns the JIT code cache, and queries that run AFTER it execute
fresh whole-stage-codegen classes at a low JIT tier for ~30-60s —
task executor-time inflates ~6x (467 in-JVM CPU-s during an 18s wall
spike, GC/pyCPU/IO flat). That tainted the ANN minima (ann_topk_cosine
0.67->1.08s r5->r6) and left text_remove_dup_spans with an 18x trial
spread even under the r6 adaptive-extension mitigation. With a fresh
JVM per tier, each tier pays only its OWN warm-up (inside the untimed
warm-up block + absorbed by min-of-N), never another tier's code-cache
fallout.

Usage:
    python bench.py                 # all tiers, one combined JSON line
    python bench.py --tier ann      # one tier inline (iteration aid)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# tier -> ordered query names; every bench_queries() key appears in
# exactly one tier (asserted in main). Tier granularity = the cost
# classes whose codegen/JIT footprints were observed to interact.
TIERS: dict[str, list[str]] = {
    "relational": [
        "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
        "group_agg", "window_topn", "update_columns", "asof_join",
    ],
    "events": ["event_window_agg", "event_sessionize"],
    "text": [
        "text_quality", "pipeline_curation", "pipeline_curation_v2",
        "text_pack_sequences",
    ],
    "dedup": [
        "minhash_signatures", "minhash_lsh_candidates_capped",
        "jaccard_verify_lsh", "cc_clusters_star",
    ],
    "spans": ["text_remove_dup_passages", "text_remove_dup_spans"],
    "ann": [
        "ann_topk_cosine", "ann_topk_blas", "ann_lsh_topk",
        "ann_ivf_topk", "ann_lsh_multi_topk", "ann_index_probe",
        "ann_ivf_index_probe", "ann_ivf_sq8_probe",
        "ann_ivf_sq8_index_build", "ann_ivf_pq_probe",
        "ann_ivf_pq_rerank",
        "ann_gate_sq8",
        "ann_kcenter",
        "ann_kcenter_batched",
    ],
    # native shards lifecycle (r14, VERDICT r13 item 8): the DSv2
    # commit-protocol write and the one-tar-per-partition media read —
    # regressions in the new lifecycle surface in BENCH_r{N} instead
    # of living only in the soak's PLANS.md record
    "shards": [
        "shards_write_native", "shards_read_media_native",
        # metadata-only scan routes (r16, VERDICT r15 item 6):
        # legacy = JVM csv glob with per-read inference (the pre-DSv2
        # implementation), native = JVM csv with the published
        # _schema.json pinned (read_metadata_shards engine="jvm"),
        # dsv2 = the Python DataSource route (the Arrow hop priced
        # honestly)
        "shards_read_meta_legacy", "shards_read_meta_native",
        "shards_read_meta_dsv2",
    ],
}

# Post-warm-up settle (seconds) for the codegen-rich tiers: the JIT
# spike mechanism decays with WALL TIME (~30-60s) as the C2 compile
# queue drains, so a pause between a query's untimed warm-up and its
# timed trials absorbs the churn the warm-up itself just triggered.
# Measured A/B (r7, clean machine): without settle, one ~3-8x spike
# lands somewhere in the dedup/spans tier on most runs (14.9s spans
# trial right after warm-up; 10.1s cc trial mid-sequence); the other
# four tiers never spike. Applied per-query within the listed tiers
# only (+~50s total bench wall time).
TIER_SETTLE_SEC: dict[str, int] = {"dedup": 8, "spans": 8}

# Per-query untimed warm-up passes before the timed trials. The dedup
# tier gets TWO (r15): its recorded first trials have run ~2x the
# eventual min for several rounds (r14 minhash_signatures
# [2.08, 2.00, 1.42]) — one warm-up + settle doesn't fully drain the
# minhash/LSH codegen churn the way it does for the other tiers.
TIER_WARMUP_RUNS: dict[str, int] = {"dedup": 2}


def _noop(df) -> None:
    """Materialize without driver collection."""
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, extra: dict[str, float], only: set[str] | None):
    """name -> thunk; each thunk fully materializes its pipeline.

    ``extra`` collects untimed one-off setup costs (index builds);
    ``only`` restricts which setup blocks run (a tier subprocess must
    not build another tier's fixtures). ``only=None`` is name-discovery
    mode: return every bench-query name without touching ``spark`` or
    running any setup block (used by main's tier-coverage assert).
    """
    discover = only is None
    from pyspark.sql import functions as F

    from dataprocessingframework_spark import queries as q
    from dataprocessingframework_spark.operators import (
        dedup,
        similarity,
        text_analysis,
    )

    def small(fn):
        return lambda: fn(spark, SF_DIR).toPandas()

    def big(fn):
        return lambda: _noop(fn(spark, SF_DIR))

    out = {
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
        # registry-only text tier floor (r17, VERDICT r16 item 7): the
        # loader-layout sequence packer — md5-sharded running-sum bins.
        # First timed coverage for the tokenize/pack cost class that
        # was previously plan-audit only; operator body identical to
        # the tx_pack_sequences oracle query minus its presentation
        # orderBy (noop sink per guide §1.4).
        "text_pack_sequences": big(
            lambda s, d: text_analysis.pack_sequences(
                q.T(s, d, "documents"), context_len=1024
            )
        ),
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
        # raw IVF probe, same shape/params the entry has benched since
        # r4 (q_emb_ivf_topk itself now ALSO computes the exact
        # brute-force recall verification for its r13 oracle — that
        # would double this entry's cost and break its history)
        "ann_ivf_topk": big(
            lambda s, d: similarity.ivf_topk(
                q.T(s, d, "embeddings"),
                q.T(s, d, "embeddings").filter(F.col("vec_id") < 10),
                k=5,
                n_cells=16,
                n_probe=4,
            )
        ),
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

    # Amortized ANN read path (r7, VERDICT r6 item 4): materialize the
    # (tbl,bucket)-bucketed multi-table index ONCE (cost recorded in
    # extra, not in the per-query minima), then time ONLY the probe —
    # the production repeated-probe shape where the build is amortized
    # over many query batches. Compare against ann_lsh_multi_topk,
    # which rebuilds everything inline per probe batch.
    out["ann_kcenter"] = small(q.q_emb_kcenter)
    # pooled batched k-center (r10): the large-k production path —
    # k=64 in k/batch_m=4 rounds; tracks the per-round fixed-cost
    # amortization the r10 soak measured (7.7x at k=256)
    out["ann_kcenter_batched"] = lambda: similarity.kcenter_select(
        q.T(spark, SF_DIR, "embeddings"), k=64, batch_m=16
    ).toPandas()
    if discover:
        # names only, never run
        out["ann_index_probe"] = lambda: None
        out["ann_ivf_index_probe"] = lambda: None
        out["ann_ivf_sq8_probe"] = lambda: None
        out["ann_ivf_sq8_index_build"] = lambda: None
        out["ann_ivf_pq_probe"] = lambda: None
        out["ann_ivf_pq_rerank"] = lambda: None
        out["ann_gate_sq8"] = lambda: None
        out["shards_write_native"] = lambda: None
        out["shards_read_media_native"] = lambda: None
        out["shards_read_meta_legacy"] = lambda: None
        out["shards_read_meta_native"] = lambda: None
        out["shards_read_meta_dsv2"] = lambda: None
        return out

    # Native shards lifecycle (r14): media-shaped documents (binary
    # content keyed by name) through the DSv2 commit-protocol writer
    # and the one-tar-per-partition reader. The WRITE entry times the
    # full job incl. the driver-side rename commit (the protocol's
    # price); the READ entry times metadata+bytes in one scan over a
    # fixture built once in extra.
    _SHARD_READ_ENTRIES = {
        "shards_read_media_native",
        "shards_read_meta_legacy",
        "shards_read_meta_native",
        "shards_read_meta_dsv2",
    }
    if ({"shards_write_native"} | _SHARD_READ_ENTRIES) & set(only):
        import shutil
        import uuid

        from dataprocessingframework_spark.sources.shards_source import (
            register_shards_source,
        )

        register_shards_source(spark)
        media_df = q.T(spark, SF_DIR, "documents").select(
            F.concat(F.col("doc_id").cast("string"), F.lit(".txt")).alias(
                "name"
            ),
            "lang",
            "source",
            "n_chars",
            F.encode("text", "UTF-8").alias("content"),
        )
        shards_tag = uuid.uuid4().hex[:8]
        sh_paths = []
        if "shards_write_native" in only:
            wdir = f"/root/repo/.scratch/bench_shards_w_{shards_tag}"
            sh_paths.append(wdir)

            def shards_write():
                (
                    media_df.repartition(8)
                    .write.format("dpf_shards")
                    .option("max_files_in_shard", "1000")
                    .mode("overwrite")
                    .save(wdir)
                )

            out["shards_write_native"] = shards_write
        if _SHARD_READ_ENTRIES & set(only):
            rdir = f"/root/repo/.scratch/bench_shards_r_{shards_tag}"
            sh_paths.append(rdir)
            t0 = time.time()
            (
                media_df.repartition(8)
                .write.format("dpf_shards")
                .option("max_files_in_shard", "1000")
                .mode("append")
                .save(rdir)
            )
            extra["shards_read_fixture_build"] = round(time.time() - t0, 3)

            def shards_read():
                (
                    spark.read.format("dpf_shards")
                    .load(rdir)
                    .agg(
                        F.sum(F.length("content")).alias("content_bytes"),
                        F.count(F.lit(1)).alias("n"),
                    )
                    .collect()
                )

            if "shards_read_media_native" in only:
                out["shards_read_media_native"] = shards_read

            # metadata-only scan routes over the same fixture: the
            # identical aggregate through three plans
            from dataprocessingframework_spark.sources.reader import (
                DatasetReader,
            )

            def _meta_agg(df):
                df.agg(
                    F.sum("n_chars").alias("sum_chars"),
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct("split_name").alias("n_shards"),
                ).collect()

            def meta_legacy():
                # the pre-DSv2 implementation: csv glob + per-read
                # inference pass + input_file_name split_name
                df = (
                    spark.read.options(
                        header=True, inferSchema=True, multiLine=True,
                        escape='"',
                    )
                    .csv(os.path.join(rdir, "*.csv"))
                    .withColumn(
                        "split_name",
                        F.regexp_extract(
                            F.input_file_name(), r"([^/]+)\.csv$", 1
                        ),
                    )
                )
                _meta_agg(df)

            def meta_native():
                _meta_agg(
                    DatasetReader(spark)
                    .read_metadata_shards(rdir, engine="jvm")
                    .df
                )

            def meta_dsv2():
                _meta_agg(
                    DatasetReader(spark)
                    .read_metadata_shards(rdir, engine="dsv2")
                    .df
                )

            if "shards_read_meta_legacy" in only:
                out["shards_read_meta_legacy"] = meta_legacy
            if "shards_read_meta_native" in only:
                out["shards_read_meta_native"] = meta_native
            if "shards_read_meta_dsv2" in only:
                out["shards_read_meta_dsv2"] = meta_dsv2

        prev_sh_cleanup = extra.get("_cleanup")

        def shards_cleanup():
            if prev_sh_cleanup is not None:
                prev_sh_cleanup()
            for p in sh_paths:
                shutil.rmtree(p, ignore_errors=True)

        extra["_cleanup"] = shards_cleanup
    if "ann_index_probe" in only:
        import shutil
        import uuid

        tag = uuid.uuid4().hex[:8]
        table = f"bench_ann_idx_{tag}"
        path = f"/root/repo/.scratch/bench_ann_idx_{tag}"
        emb = q.T(spark, SF_DIR, "embeddings")
        t0 = time.time()
        idx = similarity.materialize_lsh_ann_index(
            emb, table, num_buckets=32, path=path
        )
        extra["ann_index_build"] = round(time.time() - t0, 3)

        def probe():
            _noop(
                similarity.lsh_topk_from_index(
                    idx,
                    q.T(spark, SF_DIR, "embeddings").filter(
                        F.col("vec_id") < 50
                    ),
                    k=10,
                    n_tables=3,
                    broadcast_queries=True,
                )
            )

        out["ann_index_probe"] = probe

        def cleanup():
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            shutil.rmtree(path, ignore_errors=True)

        extra["_cleanup"] = cleanup  # popped before serialization

    # Amortized IVF read path (r8): train the quantizer + materialize
    # the cell-bucketed inverted lists ONCE (extra), then time ONLY
    # the probe — the second production ANN serving shape, alongside
    # the LSH index probe above.
    if "ann_ivf_index_probe" in only:
        import shutil
        import uuid

        ivf_tag = uuid.uuid4().hex[:8]
        ivf_table = f"bench_ivf_idx_{ivf_tag}"
        ivf_path = f"/root/repo/.scratch/bench_ivf_idx_{ivf_tag}"
        emb2 = q.T(spark, SF_DIR, "embeddings")
        t0 = time.time()
        ivf_idx, _ = similarity.materialize_ivf_index(
            emb2, ivf_table, n_cells=16, iters=1,
            num_buckets=16, path=ivf_path,
        )
        cents = similarity.load_ivf_centroids(spark, ivf_table)
        extra["ann_ivf_index_build"] = round(time.time() - t0, 3)

        def ivf_probe():
            _noop(
                similarity.ivf_topk_from_index(
                    ivf_idx,
                    cents,
                    q.T(spark, SF_DIR, "embeddings").filter(
                        F.col("vec_id") < 50
                    ),
                    k=10,
                    n_probe=4,
                )
            )

        out["ann_ivf_index_probe"] = ivf_probe

        prev_cleanup = extra.get("_cleanup")

        def ivf_cleanup():
            if prev_cleanup is not None:
                prev_cleanup()
            spark.sql(f"DROP TABLE IF EXISTS {ivf_table}")
            spark.sql(f"DROP TABLE IF EXISTS {ivf_table}_centroids")
            shutil.rmtree(ivf_path, ignore_errors=True)
            shutil.rmtree(f"{ivf_path}_centroids", ignore_errors=True)

        extra["_cleanup"] = ivf_cleanup

    # SQ8-compressed IVF read path (r10): same serving shape with the
    # index stored as packed codes (~3x smaller scan payload — what
    # the probe reads at 100 TB); build in extra, probe timed, index
    # bytes recorded so the compression ratio is tracked per round.
    if "ann_ivf_sq8_probe" in only:
        import shutil
        import uuid

        sq8_tag = uuid.uuid4().hex[:8]
        sq8_table = f"bench_sq8_idx_{sq8_tag}"
        sq8_path = f"/root/repo/.scratch/bench_sq8_idx_{sq8_tag}"
        emb3 = q.T(spark, SF_DIR, "embeddings")
        t0 = time.time()
        sq8_idx, _ = similarity.materialize_ivf_index(
            emb3, sq8_table, n_cells=16, iters=1,
            num_buckets=16, path=sq8_path, sq8=True,
        )
        sq8_cents = similarity.load_ivf_centroids(spark, sq8_table)
        sq8_bounds = similarity.load_sq8_bounds(spark, sq8_table)
        extra["ann_ivf_sq8_build"] = round(time.time() - t0, 3)
        from dataprocessingframework_spark.sources.compact import (
            _table_location,
            dataset_file_stats,
        )

        _, sq8_bytes = dataset_file_stats(
            spark, _table_location(spark, sq8_table)
        )
        extra["ann_ivf_sq8_bytes"] = sq8_bytes

        def sq8_probe():
            _noop(
                similarity.ivf_topk_from_index(
                    sq8_idx,
                    sq8_cents,
                    q.T(spark, SF_DIR, "embeddings").filter(
                        F.col("vec_id") < 50
                    ),
                    k=10,
                    n_probe=4,
                    sq8_bounds=sq8_bounds,
                )
            )

        out["ann_ivf_sq8_probe"] = sq8_probe

        prev_cleanup2 = extra.get("_cleanup")

        def sq8_cleanup():
            if prev_cleanup2 is not None:
                prev_cleanup2()
            for t in (sq8_table, f"{sq8_table}_centroids",
                      f"{sq8_table}_sq8"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            for sfx in ("", "_centroids", "_sq8"):
                shutil.rmtree(f"{sq8_path}{sfx}", ignore_errors=True)

        extra["_cleanup"] = sq8_cleanup

    # Timed SQ8 index BUILD (r17, VERDICT r16 item 7): the build IS
    # the ingest path at 100 TB, but it only ever appeared as an
    # untimed extra — which is how its 2.4-3.4x inverse-scaling defect
    # (fixed this round) stayed driver-invisible for two rounds. Each
    # trial trains + encodes + writes a FRESH index (mode=overwrite,
    # its own table; the probe entries above keep their stable index).
    if "ann_ivf_sq8_index_build" in only:
        import shutil
        import uuid

        bld_tag = uuid.uuid4().hex[:8]
        bld_table = f"bench_sq8_bld_{bld_tag}"
        bld_path = f"/root/repo/.scratch/bench_sq8_bld_{bld_tag}"
        emb_bld = q.T(spark, SF_DIR, "embeddings")

        def sq8_index_build():
            similarity.materialize_ivf_index(
                emb_bld, bld_table, n_cells=16, iters=1,
                num_buckets=16, path=bld_path, sq8=True,
            )

        out["ann_ivf_sq8_index_build"] = sq8_index_build

        prev_cleanup_bld = extra.get("_cleanup")

        def bld_cleanup():
            if prev_cleanup_bld is not None:
                prev_cleanup_bld()
            for t in (bld_table, f"{bld_table}_centroids",
                      f"{bld_table}_sq8"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            for sfx in ("", "_centroids", "_sq8"):
                shutil.rmtree(f"{bld_path}{sfx}", ignore_errors=True)

        extra["_cleanup"] = bld_cleanup

    # IVF-PQ read path (r10): the 16B-payload rung of the compression
    # ladder; blas encode at build, reconstruction-lookup probe.
    if {"ann_ivf_pq_probe", "ann_ivf_pq_rerank"} & set(only):
        import shutil
        import uuid

        pq_tag = uuid.uuid4().hex[:8]
        pq_table = f"bench_pq_idx_{pq_tag}"
        pq_path = f"/root/repo/.scratch/bench_pq_idx_{pq_tag}"
        emb4 = q.T(spark, SF_DIR, "embeddings")
        t0 = time.time()
        pq_idx, pq_cents, pq_books = similarity.materialize_pq_index(
            emb4, pq_table, n_cells=16, iters=1,
            num_buckets=16, path=pq_path,
        )
        extra["ann_ivf_pq_build"] = round(time.time() - t0, 3)
        from dataprocessingframework_spark.sources.compact import (
            _table_location as _tl2,
            dataset_file_stats as _dfs2,
        )

        _, pq_bytes = _dfs2(spark, _tl2(spark, pq_table))
        extra["ann_ivf_pq_bytes"] = pq_bytes

        def pq_probe():
            _noop(
                similarity.ivf_pq_topk_from_index(
                    pq_idx,
                    pq_cents,
                    pq_books,
                    q.T(spark, SF_DIR, "embeddings").filter(
                        F.col("vec_id") < 50
                    ),
                    k=10,
                    n_probe=4,
                )
            )

        out["ann_ivf_pq_probe"] = pq_probe

        # the production serving shape (r11): PQ shortlist=100 from
        # the compressed index, then exact re-rank of only those
        # candidates against the full-precision corpus (broadcast
        # semi-lookup — corpus never scanned at full precision)
        def pq_rerank():
            _noop(
                similarity.ivf_pq_topk_rerank(
                    pq_idx,
                    pq_cents,
                    pq_books,
                    q.T(spark, SF_DIR, "embeddings").filter(
                        F.col("vec_id") < 50
                    ),
                    q.T(spark, SF_DIR, "embeddings"),
                    k=10,
                    shortlist=100,
                    n_probe=4,
                )
            )

        out["ann_ivf_pq_rerank"] = pq_rerank

        prev_cleanup3 = extra.get("_cleanup")

        def pq_cleanup():
            if prev_cleanup3 is not None:
                prev_cleanup3()
            for t in (pq_table, f"{pq_table}_centroids",
                      f"{pq_table}_pq"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            for sfx in ("", "_centroids", "_pq"):
                shutil.rmtree(f"{pq_path}{sfx}", ignore_errors=True)

        extra["_cleanup"] = pq_cleanup

    # SQ8 compressed semantic-dedup gate (r12): THE production
    # dedup-ingest shape at 100 TB — per arriving batch, shortlist on
    # the packed-code index (sound derived margin), exact-recheck the
    # shortlist against the float corpus via broadcast semi-lookup.
    # Index build + batch construction in extra (untimed, amortized
    # across the stream); timed = one batch through the gate, blas.
    if "ann_gate_sq8" in only:
        import shutil
        import uuid

        g_tag = uuid.uuid4().hex[:8]
        g_table = f"bench_gate_sq8_{g_tag}"
        g_path = f"/root/repo/.scratch/bench_gate_sq8_{g_tag}"
        emb5 = q.T(spark, SF_DIR, "embeddings").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        t0 = time.time()
        g_idx, _ = similarity.materialize_ivf_index(
            emb5, g_table, n_cells=16, iters=1,
            num_buckets=16, path=g_path, sq8=True,
        )
        g_cents = similarity.load_ivf_centroids(spark, g_table)
        g_bounds = similarity.load_sq8_bounds(spark, g_table)
        g_batch = q._perturbed_gate_batch(emb5, emb5.count()).cache()
        g_batch.count()
        extra["ann_gate_sq8_setup"] = round(time.time() - t0, 3)

        def gate_sq8():
            _noop(
                similarity.incremental_semantic_dedup_sq8(
                    g_batch, emb5, g_cents, g_idx, g_bounds,
                    threshold=0.95, n_probe=2, impl="blas",
                )
            )

        out["ann_gate_sq8"] = gate_sq8

        prev_cleanup4 = extra.get("_cleanup")

        def gate_cleanup():
            if prev_cleanup4 is not None:
                prev_cleanup4()
            g_batch.unpersist()
            for t in (g_table, f"{g_table}_centroids",
                      f"{g_table}_sq8"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            for sfx in ("", "_centroids", "_sq8"):
                shutil.rmtree(f"{g_path}{sfx}", ignore_errors=True)

        extra["_cleanup"] = gate_cleanup
    return {k: v for k, v in out.items() if k in only}


def trial_spread(runs: list[float]) -> float:
    """max/min of a query's timed trials — the contamination metric.
    A settled query on an idle machine stays under ~2x (JIT noise);
    r10/r11 both saw background contention land single 3-30x outlier
    trials that min-of-trials absorbs but that poison every future
    BENCH comparison, and detection was manual prose in PLANS.md.
    >3x is mechanically CONTAMINATED (r12, VERDICT r11 item 5)."""
    return max(runs) / min(runs)


CONTAMINATION_SPREAD = 3.0
CONTAMINATION_RESETTLE_SEC = 10


def resolve_contamination(
    runs: list[float], rerun: list[float]
) -> tuple[list[float], bool]:
    """Decide what a contaminated query's final trial set is, given
    the post-resettle re-run: a clean re-run REPLACES the tainted set
    (its minima carry no contention); a still-noisy re-run means the
    machine is busy — keep ALL evidence and flag the query. Pure so
    the planted-outlier unit test can pin the policy."""
    if trial_spread(rerun) <= CONTAMINATION_SPREAD:
        return rerun, False
    return runs + rerun, True


# Pathological-JVM guard (r17): twice this round a spans-tier JVM
# inside a FULL bench run recorded UNIFORMLY catastrophic trials —
# text_remove_dup_spans [39.1, 67.7, 46.4] s at 8 cores with an idle
# canary (0.38) and 1.4% steal, and [50.2, 35.4, 35.9] s at 32 cores —
# on code byte-identical to the r16-judged HEAD that measures ~2.0 s
# (35+ solo spans-tier runs never reproduced it; the state is sticky
# for the LIFE of that JVM, the r16 interpreted-planner signature
# magnitude). Uniform slowness evades the spread detector above
# (spread 1.7x < 3x), and min-of-N cannot recover INSIDE a
# pathological JVM — the only remedy is a fresh one. The guard:
# an entry whose recorded min is both > PATHOLOGICAL_ABS_SEC and
# > PATHOLOGICAL_CANARY_RATIO x its tier's ambient canary triggers ONE
# re-spawn of that tier's subprocess; per-entry minima are taken
# across both legs and EVERY trial from both legs stays recorded.
# Thresholds sit between the extremes with wide margin: the worst
# legitimate reading this round was jaccard_verify_lsh at ~15x its
# tier canary under a host burst (and < 8 s at every core count with
# a quiet canary), while the pathological readings were ~100x.
PATHOLOGICAL_ABS_SEC = 8.0
PATHOLOGICAL_CANARY_RATIO = 30.0


def pathological_entries(
    queries: dict[str, float], canary: float | None
) -> list[str]:
    """Entries whose recorded min bears the pathological-JVM
    signature (catastrophic AND far outside the ambient band the
    canary establishes). Pure so the unit test can pin the policy."""
    if not canary or canary <= 0:
        return []
    return sorted(
        n
        for n, v in queries.items()
        if v > PATHOLOGICAL_ABS_SEC
        and v > PATHOLOGICAL_CANARY_RATIO * canary
    )


def merge_tier_results(first: dict, rerun: dict) -> dict:
    """Merge a tier re-spawn into the first leg: per-entry min of the
    recorded minima (both legs computed the full pipeline from the
    parquet inputs), trials CONCATENATED so both legs stay on the
    record, contaminated flags unioned, and the re-run's extras kept
    under a ``_rerun`` suffix (setup costs/canary of the second JVM)."""
    merged_queries = {
        n: min(v, rerun["queries"].get(n, v))
        for n, v in first["queries"].items()
    }
    merged_trials = {
        n: t + rerun.get("trials", {}).get(n, [])
        for n, t in first["trials"].items()
    }
    extra = dict(first.get("extra", {}))
    for k, v in rerun.get("extra", {}).items():
        extra[f"{k}_rerun"] = v
    return {
        "queries": merged_queries,
        "trials": merged_trials,
        "extra": extra,
        "contaminated": sorted(
            set(first.get("contaminated", []))
            | set(rerun.get("contaminated", []))
        ),
    }


def run_tier(
    names: list[str],
    settle_sec: int = 0,
    warmup_runs: int = 1,
    tier_name: str = "",
) -> dict:
    """Run the named queries in THIS process (one fresh JVM) and
    return {"queries": minima, "trials": per-trial, "extra": setup}."""
    from dataprocessingframework_spark import queries as q
    from dataprocessingframework_spark.session import get_spark

    spark = get_spark(
        app_name="dpf-spark-bench",
        extra_conf={
            # whole-stage codegen emits many classes; the JVM default
            # ReservedCodeCacheSize (240m) exhausts under the LSH/span
            # tiers, triggering code-cache flushing and re-JIT — the
            # measured mechanism behind the recurring 6x trial spikes
            # (PLANS.md "bench variance root cause"). 512m keeps every
            # tier's compiled methods resident. CICompilerCount=12
            # (vs the sizing default) drains the C2 compile queue the
            # codegen-rich tiers flood ~3x faster; measured A/B on
            # the dedup+spans tiers: worst trial spread 1.8x/3.0x
            # with 12 threads vs 2.7x/8.4x without, minima unchanged.
            # -XX:-DontCompileHugeMethods (r16): two Catalyst planning
            # methods exceed HotSpot's 8000-bytecode JIT ceiling
            # (DataSourceV2Strategy::apply 10221 B, ResolveSession-
            # Catalog 10058 B, PrintCompilation) and by default run
            # INTERPRETED forever; AQE re-plans per stage, so on
            # plan-heavy queries (spans tier) the interpreted planner
            # randomly dominates wall time — measured bimodality:
            # 4 of 6 unflagged spans-tier runs degraded (trials up to
            # 45 s vs a 1.8 s floor, idle canary), 9 of 9 flagged
            # runs stayed under 3.5 s (OPTIMIZATION_r16.md).
            "spark.driver.extraJavaOptions": (
                "-XX:ReservedCodeCacheSize=512m -XX:CICompilerCount=12 "
                "-XX:-DontCompileHugeMethods "
                + os.environ.get("SPARK_GRAFT_BENCH_JVM_OPTS", "")
            ).strip(),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the JVM, parquet footer caches, and Python UDF workers
    # outside the timed region
    q.T(spark, SF_DIR, "lineitem").count()
    import pandas as pd  # noqa: F401

    spark.range(1000).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    extra: dict = {}

    # ambient canary (r15, VERDICT r14 item 6): a fixed seeded
    # in-memory aggregation that touches NO repo code and no files —
    # the only thing that can move it across rounds is the machine.
    # Recorded per tier as extra["canary_<tier>"] in BENCH_r{N}, so a
    # creeping entry can be adjudicated by dividing its cross-round
    # ratio by its tier's canary ratio (machine drift cancels) instead
    # of needing a hand-run worktree A/B (normalization recipe in
    # PLANS.md "r15 ambient canary").
    def _canary() -> None:
        (
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr(
                "id % 9973 AS k", "(id * 2654435761) % 1000003 AS v"
            )
            .groupBy("k")
            .agg({"v": "sum"})
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    _canary()  # untimed: absorb its own codegen
    c_runs = []
    for _ in range(3):
        t0 = time.time()
        _canary()
        c_runs.append(round(time.time() - t0, 3))
    extra[f"canary_{tier_name or 'tier'}"] = min(c_runs)

    # host-steal telemetry (r16): the canary runs ONCE at tier start,
    # so an external CPU burst that lands mid-tier is invisible to it
    # (observed: idle canary, 3-30x trial spikes). /proc/stat's STEAL
    # delta over the WHOLE tier is the unambiguous external-CPU-
    # contention record — sampled here and differenced after the last
    # query below, as extra["steal_pct_<tier>"] (percent of total cpu
    # time stolen from the guest while the tier ran). Straight-line,
    # not try/finally: a raising thunk aborts the whole tier
    # subprocess and no JSON is emitted at all, so there is no
    # partial artifact to annotate. CPU steal only — iowait
    # contention needs a different probe (not recorded).
    def _cpu_totals() -> tuple[int, int] | None:
        try:
            with open("/proc/stat") as f:
                v = list(map(int, f.readline().split()[1:9]))
            return sum(v), v[7]  # total jiffies, steal jiffies
        except Exception:  # noqa: BLE001 — non-Linux: skip telemetry
            return None
    _cpu0 = _cpu_totals()

    thunks = bench_queries(spark, extra, set(names))
    missing = [n for n in names if n not in thunks]
    assert not missing, f"unknown bench queries: {missing}"

    timings: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    contaminated: list[str] = []
    for name in names:  # preserve tier order
        thunk = thunks[name]
        # isolate queries: persisted intermediates from earlier queries
        # (LSH bucket tables etc.) otherwise pile up and add eviction
        # pressure, inflating later timings run-to-run
        spark.catalog.clearCache()
        # drop accumulated JVM garbage (codegen classes, shuffle file
        # buffers, noop-write leftovers from earlier queries)
        spark.sparkContext._jvm.System.gc()
        # per-QUERY untimed warm-up (r7): one run of THIS query before
        # its timed trials absorbs its own Janino compile + first JIT
        # pass, which used to land in trial 1 and blow the max/min
        # spread past 2x. Warming the whole tier up-front was tried
        # and REJECTED (measured: running every ANN query once before
        # timing left the JVM in a deopt/compile-queue storm that
        # inflated ann_topk_cosine's timed minima 7x) — each query
        # warms only itself, in tier order, like a shared-JVM run
        # would, but with cross-tier isolation intact. warmup_runs>1
        # for tiers whose first trials persistently overshoot (see
        # TIER_WARMUP_RUNS).
        for _ in range(warmup_runs):
            thunk()
        # codegen-rich tiers: let the C2 compile queue the warm-up
        # just filled drain BEFORE timing (see TIER_SETTLE_SEC)
        if settle_sec:
            time.sleep(settle_sec)
        runs = []
        for _ in range(3):  # min-of-3: local[32] on tiny data is noisy
            t0 = time.time()
            thunk()
            runs.append(round(time.time() - t0, 3))
        # adaptive extension (r6): within a tier, fresh codegen classes
        # can still run one trial at a low JIT tier; keep sampling
        # until the spread is sane or the sample size makes the min
        # trustworthy regardless. Cross-TIER contamination is gone by
        # construction (fresh JVM per tier, r7).
        while max(runs) / min(runs) > 2.0 and len(runs) < 6:
            t0 = time.time()
            thunk()
            runs.append(round(time.time() - t0, 3))
        # mechanical contamination handling (r12): if the spread is
        # still past 3x after adaptive extension, something outside
        # the query (background contention, another JVM) hit a trial.
        # Flag it, let the machine settle, and take one fresh
        # trial set — exactly the manual procedure PLANS.md
        # prescribed since r10, now in code so BENCH artifacts are
        # trustworthy without a judge re-run.
        if trial_spread(runs) > CONTAMINATION_SPREAD:
            print(
                f"CONTAMINATED {name}: trial spread "
                f"{trial_spread(runs):.1f}x {runs} — resettling and "
                f"re-running",
                file=sys.stderr,
            )
            time.sleep(CONTAMINATION_RESETTLE_SEC)
            rerun = []
            for _ in range(3):
                t0 = time.time()
                thunk()
                rerun.append(round(time.time() - t0, 3))
            runs, still_bad = resolve_contamination(runs, rerun)
            if still_bad:
                contaminated.append(name)
        # per-trial times recorded so a one-off outlier in the minima
        # (e.g. background contention) is self-diagnosing in the
        # BENCH_r{N}.json artifact rather than needing a re-run
        trials[name] = runs
        timings[name] = min(runs)

    _cpu1 = _cpu_totals()
    if _cpu0 is not None and _cpu1 is not None and _cpu1[0] > _cpu0[0]:
        extra[f"steal_pct_{tier_name or 'tier'}"] = round(
            100.0 * (_cpu1[1] - _cpu0[1]) / (_cpu1[0] - _cpu0[0]), 2
        )

    cleanup = extra.pop("_cleanup", None)
    if cleanup is not None:
        cleanup()
    return {
        "queries": timings,
        "trials": trials,
        "extra": extra,
        "contaminated": contaminated,
    }


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--tier":
        tier = sys.argv[2]
        result = run_tier(
            TIERS[tier],
            TIER_SETTLE_SEC.get(tier, 0),
            TIER_WARMUP_RUNS.get(tier, 1),
            tier,
        )
        print(json.dumps(result))
        return

    # parent: one fresh subprocess (= fresh JVM) per tier, stdout
    # captured and merged; stderr (Spark logs) passes through
    all_names = [n for names in TIERS.values() for n in names]
    assert len(all_names) == len(set(all_names)), "query in two tiers"
    # coverage, not just uniqueness: a bench_queries() key omitted
    # from TIERS would otherwise silently never be benchmarked
    known = set(bench_queries(None, {}, None))
    assert set(all_names) == known, (
        f"TIERS/bench_queries mismatch: "
        f"unbenchmarked={sorted(known - set(all_names))} "
        f"unknown={sorted(set(all_names) - known)}"
    )

    timings: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    extra: dict[str, float] = {}
    contaminated: list[str] = []
    def run_tier_subprocess(tier: str) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tier", tier],
            stdout=subprocess.PIPE,
            text=True,
            env=os.environ.copy(),
            check=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.strip()][-1]
        return json.loads(line)

    for tier in TIERS:
        result = run_tier_subprocess(tier)
        bad = pathological_entries(
            result["queries"], result.get("extra", {}).get(f"canary_{tier}")
        )
        if bad:
            # sticky pathological JVM state suspected (see the guard's
            # rationale above resolve_contamination): one fresh-JVM
            # re-spawn of the whole tier, both legs on the record
            print(
                f"WARNING: pathological tier JVM suspected "
                f"(entries >{PATHOLOGICAL_CANARY_RATIO}x tier canary "
                f"and >{PATHOLOGICAL_ABS_SEC}s): {bad} — re-spawning "
                f"tier '{tier}' once in a fresh JVM",
                file=sys.stderr,
            )
            result = merge_tier_results(result, run_tier_subprocess(tier))
            result["extra"][f"jvm_rerun_{tier}"] = 1
        timings.update(result["queries"])
        trials.update(result["trials"])
        extra.update(result.get("extra", {}))
        contaminated.extend(result.get("contaminated", []))
    if contaminated:
        print(
            f"WARNING: contaminated even after resettle+re-run "
            f"(spread >{CONTAMINATION_SPREAD}x): {contaminated} — "
            f"minima recorded but treat comparisons with suspicion",
            file=sys.stderr,
        )

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    # Two lines, detail FIRST and the contract line LAST (r17, VERDICT
    # r16 items 2/7-of-"what's wrong"): the external driver stores only
    # a ~2000-char TAIL of stdout, and the r15 artifact's single fat
    # line (queries+trials+extra, ~5 KB) fell out of that window
    # mid-dict — which cost the driver the ENTIRE r15->r16
    # round-over-round comparison (PERF_r16 prev_bench_ok=false). The
    # per-trial arrays and untimed extras move to a preceding
    # "bench_detail" line (same content, still machine-readable;
    # tools/bench_compare.py extracts either shape), and the final
    # line keeps exactly the contract fields — small enough that the
    # tail always contains it whole (asserted in
    # tests/test_bench_harness.py with headroom).
    print(
        json.dumps(
            {
                "bench_detail": {
                    "trials": trials,
                    # untimed one-off setup costs (e.g. the bucketed
                    # ANN index build that ann_index_probe amortizes)
                    "extra": extra,
                }
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                # queries whose trial spread stayed >3x even after a
                # mechanical resettle+re-run (r12); [] = trustworthy
                "contaminated": contaminated,
                "isolation": "per-tier JVM (fresh subprocess per tier)",
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
