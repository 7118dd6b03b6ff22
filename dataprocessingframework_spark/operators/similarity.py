"""Embedding similarity search over an ``array<float>`` column.

Two paths, mirroring how a 100 TB pipeline actually runs ANN:

- ``cosine_topk``: brute-force exact top-k. The query side is small and
  broadcast, so the big side streams through one narrow stage — no
  shuffle of the corpus, cost O(corpus x queries). This is the baseline
  and the verifier for the approximate path.
- ``lsh_topk``: random-hyperplane LSH. Corpus and queries are bucketed
  by sign-pattern of dot products against shared deterministic
  hyperplanes; only same-bucket pairs are scored. Sub-linear scored
  pairs at the cost of recall; multiple tables raise recall.

Dot products run JVM-side via ``aggregate(zip_with(...))`` — no Python
in the hot loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataprocessingframework_spark.functions.hashing import hash64_py


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<numeric> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _driver_meta_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Driver-local metadata rows (quantizer matrices, SQ8 bounds, PQ
    codebooks — KB-scale BY CONSTRUCTION, never corpus-bounded) as a
    ONE-partition DataFrame.

    Why not plain ``spark.createDataFrame(rows)``: that parallelizes
    the list into ``defaultParallelism`` Python-RDD slices, and the
    single write task of the companion-table ``saveAsTable`` then
    drains those slices SEQUENTIALLY — one Python worker launch per
    slice (~150 ms each). Measured r17 on the sq8 index build: the two
    companion writes cost 2 x 4.7 s at local[32] vs 2 x 1.2 s at
    local[8] — the whole 2.4-3.4x inverse-scaling signal on the build
    extras (BENCH_r16 vs BENCH_r16_c8), reproduced and pinned in
    plans/r17/. One slice is the size-derived partitioning for
    driver-held metadata at ANY cluster width; a 16-row write is
    0.35 s either way after this."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema=schema
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _per_query_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k over (q_id, nbr_id, cos_raw) score rows — the
    TakeOrdered discipline, delegated to Catalyst.

    The ``row_number() <= k`` filter triggers Spark's
    ``InferWindowGroupLimit`` rule (3.5+), which plans a map-side
    ``WindowGroupLimit ... Partial`` BELOW the q_id exchange: each map
    partition sorts locally (spillable) and forwards at most k rows
    per query, so the reduce side receives n_map_partitions x k rows
    per query — never a corpus-sized score set in one q_id partition.
    ``tests/test_plans.py::test_cosine_topk_window_not_over_raw_scores``
    pins the partial group-limit so a refactor that defeats the rule
    (e.g. k above spark.sql.window.group.limit.threshold, default
    1000, or a non-rank filter shape) is caught.
    """
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "nbr_id", F.round("cos_raw", 4).alias("cos"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    impl: str = "jvm",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Returns (q_id, nbr_id, cos) — cos rounded to 4 decimals for stable
    comparison; ranking uses the unrounded value with nbr_id tiebreak.
    Self-pairs excluded. Queries are broadcast: the corpus never
    shuffles, and top-k selection is two-level — a map-side partial
    WindowGroupLimit (see ``_per_query_topk``) keeps only k rows per
    (map partition, query) before the q_id exchange, so no single
    partition ever holds a corpus-sized score set.

    impl='jvm' (default): sequential-fold dot product in whole-stage
    codegen — bit-reproducible against the DuckDB oracle.
    impl='blas': Arrow-batched numpy matmul against a broadcast query
    matrix — ~2-3x faster warm and the winner at scale (SIMD, batch
    amortization); float summation order differs, so scores can drift
    in the last ulp — use for production ANN, jvm for exact parity.

    Zero-norm vectors (all-zero embeddings — a real artifact of
    failed encoders) are EXCLUDED on both sides in both impls: their
    cosine is 0/0 = NaN, which Spark's/DuckDB's descending sort ranks
    above every real neighbor while numpy comparisons drop it — the
    one place the two impls could diverge (ADVICE r5). Filtering is
    the only semantics under which 'top-k by cosine' is well-defined.
    """
    if impl == "blas":
        return _cosine_topk_blas(corpus, queries, id_col, vec_col, k)
    # norms are precomputed per SIDE, not per pair: the corpus norm fold
    # runs once per corpus row instead of once per (corpus x query) pair
    # — same fold order, bit-identical values, ~2x less codegen work
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    ).filter(F.col("q_norm") > 0)
    # NB: no fan_out here — measured at sf0.1, repartitioning the
    # (small) embedding corpus costs more than the serial fold saves;
    # at real scale the corpus arrives with its own splits anyway
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    ).filter(F.col("c_norm") > 0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("nbr_id") != F.col("q_id"))
        .select(
            "q_id",
            "nbr_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_raw"),
        )
    )
    return _per_query_topk(scored, k)


def _cosine_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Vectorized scoring: the (small) query side becomes a broadcast
    numpy matrix; each Arrow batch of the corpus is one BLAS matmul.
    The corpus never shuffles, and each batch emits only its own
    top-(k+1) candidates per query (``np.argpartition``, with exact
    boundary-tie inclusion), so the per-query top-k window downstream
    sees at most ~(k+1) x n_batches rows per query — never a
    corpus-sized score set in one partition. (+1 absorbs the one
    self-pair a batch can contain, which is filtered after.)"""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    qp = queries.select(id_col, vec_col).toPandas()
    qm = np.stack(qp[vec_col].values).astype(np.float64)
    qnorm = np.linalg.norm(qm, axis=1)
    keep = qnorm > 0  # zero-norm queries excluded (see cosine_topk)
    qn = qm[keep] / qnorm[keep, None]
    q_ids = qp[id_col].values[keep]
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, qn))

    schema = StructType(
        [
            StructField("q_id", LongType()),
            StructField("nbr_id", LongType()),
            StructField("cos_raw", DoubleType()),
        ]
    )

    def score(pdfs):
        ids, qmat = bq.value
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            c = np.stack(pdf[vec_col].values).astype(np.float64)
            cnorm = np.linalg.norm(c, axis=1)
            ck = cnorm > 0  # zero-norm corpus rows excluded
            if not ck.any():
                continue
            cn = c[ck] / cnorm[ck, None]
            sims = cn @ qmat.T  # (batch, nq)
            nbr = pdf[id_col].values[ck]
            n, m = sims.shape
            kk = min(k + 1, n)
            if n <= kk:
                yield pd.DataFrame(
                    {
                        "q_id": np.repeat(ids, n),
                        "nbr_id": np.tile(nbr, m),
                        "cos_raw": sims.T.ravel(),
                    }
                )
                continue
            # kth-largest score per query; keep every row >= it so an
            # exact tie at the boundary can never evict the candidate
            # the (cos desc, nbr_id asc) global tiebreak would keep
            kth = np.partition(sims, n - kk, axis=0)[n - kk]  # (m,)
            out_q, out_n, out_s = [], [], []
            for j in range(m):
                sel = np.nonzero(sims[:, j] >= kth[j])[0]
                out_q.append(np.full(len(sel), ids[j]))
                out_n.append(nbr[sel])
                out_s.append(sims[sel, j])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "nbr_id": np.concatenate(out_n),
                    "cos_raw": np.concatenate(out_s),
                }
            )

    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(score, schema)
        .filter(F.col("nbr_id") != F.col("q_id"))
    )
    return _per_query_topk(scored, k)


def _hyperplanes(
    dim: int, n_planes: int, table: int = 0
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from the md5 hash chain
    (no RNG state, reproducible across engines/runs). ``table`` salts
    the chain so multi-table LSH gets independent plane sets; table 0
    keeps the original unsalted strings, so single-table callers (and
    their recorded oracles) are unchanged."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            key = (
                f"plane:{p}:{d}"
                if table == 0
                else f"plane:{table}:{p}:{d}"
            )
            h = hash64_py(key)
            row.append((h % 2_000_001) / 1_000_000.0 - 1.0)  # [-1, 1]
        planes.append(row)
    return planes


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p = (vec . plane_p) >= 0.

    The plane matrix enters the plan as ONE nested-array Literal and
    the per-plane dots as a ``transform`` over it — NOT as an unrolled
    per-element expression forest. The unrolled form was n_planes x
    dim literal nodes (512 per table at the 8x64 default), and since
    expression IDs differ per DataFrame construction, Catalyst
    re-analyzed (and codegen re-compiled) that forest on EVERY probe
    batch — measured as ~2s/trial of fixed planning cost on the
    repeated-probe path (PLANS.md "r8 compact LSH bucket expression").
    Value-identical to the unrolled form: the inner fold is the same
    sequential aggregate(zip_with) as :func:`dot`, and the bit
    accumulation folds p ascending, so every oracle hash is unchanged.
    """
    # _nested_array_lit: ONE parsed-SQL py4j call for the whole plane
    # matrix. F.lit(nested_list) recurses into a py4j call per element
    # (~512 per 8x64 table), which cProfile showed as ~0.33 s of
    # driver-side construction per call — and this helper runs once
    # per table per SIDE, so the 3-table probe paid ~2 s of pure py4j
    # chatter per trial (guide §5: the driver should do almost no
    # work). Parsed doubles are bit-identical (repr round-trip).
    scores = F.transform(
        _nested_array_lit([[float(x) for x in plane] for plane in planes]),
        lambda p: dot(vec, p),
    )
    # long literals directly (the F.lit int path produced ints that
    # were then coerced long inside the fold — same values, same
    # result type)
    powers = F.expr(
        "array(" + ",".join(f"{2**p}L" for p in range(len(planes))) + ")"
    )
    return F.aggregate(
        F.zip_with(
            scores,
            powers,
            lambda s, w: F.when(s >= 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    probe_radius: int = 1,
    broadcast_threshold: int = 100_000,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing a probed LSH bucket.

    With n_planes=8 the corpus splits into <=256 buckets, cutting scored
    pairs ~256x. ``probe_radius=1`` is multi-probe LSH (Lv et al. 2007,
    public): each QUERY also probes the n_planes buckets at Hamming
    distance 1 from its own — the likeliest homes of near neighbors
    that fell on the other side of one hyperplane. Only the (tiny)
    query side fans out x(n_planes+1); the corpus keeps exactly one
    bucket per row, so each candidate pair still arises once and the
    corpus-side shuffle volume is unchanged. probe_radius=0 restores
    single-bucket probing. At 100 TB the shape stays the only viable
    one: bucket assignment is a narrow map, the join is an equi-join
    on bucket (shuffle on bucket id, AQE-skew-splittable).

    Comparability note: the default changed 0 -> 1 in round 3, so
    lsh_topk recall and bench timings before/after that round are not
    directly comparable (the query side scores ~(n_planes+1)x more
    candidate pairs; recall only improves).

    The query side is broadcast only while its post-probe row count
    stays under ``broadcast_threshold``; a large probe batch (say 10M
    rows against a corpus) instead flows through a plain equi-join on
    bucket, which shuffles both sides but cannot OOM the driver or
    executors on broadcast materialization. The auto-decision costs a
    count() action (one query-side scan); ``broadcast_queries``
    True/False skips it when the caller knows the batch size class.
    """
    if probe_radius not in (0, 1):
        raise ValueError("probe_radius must be 0 or 1")
    planes = _hyperplanes(dim, n_planes)
    # norms precomputed per SIDE (as in cosine_topk): the fold runs once
    # per row, not once per same-bucket pair
    # zero-norm rows are dropped on BOTH sides (as in cosine_topk):
    # cos = 0/0 = NaN would sort first under F.desc and displace real
    # neighbors from the top-k
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    ).filter(F.col("q_norm") > 0)
    if probe_radius == 1:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(2**p).cast("long"))
                for p in range(n_planes)
            ],
        )
        q = q.select(
            "q_id", "q_vec", "q_norm", F.explode(probes).alias("bucket")
        )
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    ).filter(F.col("c_norm") > 0)
    fanout = (n_planes + 1) if probe_radius == 1 else 1
    # broadcast_queries=None auto-decides via a count() of the query
    # side — that action is a full query-side scan, so callers that
    # already KNOW their probe batch is small (or huge) pass
    # True/False and skip the extra job
    if broadcast_queries is None:
        broadcast_queries = queries.count() * fanout <= broadcast_threshold
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = (
        c.join(q_side, on="bucket")
        .filter(F.col("nbr_id") != F.col("q_id"))
        .select(
            "q_id",
            "nbr_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_raw"),
        )
    )
    # _per_query_topk's map-side partial WindowGroupLimit keeps a hot
    # bucket (skewed sign-pattern) from funneling its full membership
    # through one q_id partition
    return _per_query_topk(scored, k)


def _probe_structs(
    vec: Column,
    tables: list[list[list[float]]],
    n_planes: int,
    probe_radius: int,
) -> Column:
    """array<struct<tbl,bucket>> for the query side (with probes)."""
    elems = []
    for t, planes in enumerate(tables):
        b = lsh_bucket_expr(vec, planes)
        masks = [F.lit(0).cast("long")]
        if probe_radius == 1:
            masks += [F.lit(2**p).cast("long") for p in range(n_planes)]
        elems += [
            F.struct(
                F.lit(t).alias("tbl"),
                b.bitwiseXOR(m).alias("bucket"),
            )
            for m in masks
        ]
    return F.array(*elems)


def _bucket_structs(
    vec: Column, tables: list[list[list[float]]]
) -> Column:
    """array<struct<tbl,bucket>> for the corpus side (one per table)."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_expr(vec, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )


def lsh_topk_multi(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 3,
    probe_radius: int = 1,
    broadcast_threshold: int = 100_000,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Multi-table hyperplane LSH ANN: L independent plane sets, a
    candidate passes if it shares a (probed) bucket with the query in
    ANY table (classic LSH OR-amplification — Indyk–Motwani; the
    production knob for raising recall without the exponential
    radius-2 probe blowup). Table 0 uses the same planes as
    :func:`lsh_topk`, so the single-table candidate set is a strict
    subset and recall can only improve.

    Scale shape: both sides explode x ``n_tables`` (a query also
    x(n_planes+1) under multi-probe) and meet in ONE equi-join on the
    (table, bucket) composite key — shuffle volume is L x the
    single-table path, linear and AQE-skew-splittable, never
    all-pairs. Duplicate candidates (pairs colliding in several
    tables) are scored cheaply per collision, then deduped on the
    SKINNY (q_id, nbr_id, score) relation before ranking — vectors
    never travel through the dedup shuffle. The final ranking reuses
    _per_query_topk's map-side partial WindowGroupLimit.
    """
    if probe_radius not in (0, 1):
        raise ValueError("probe_radius must be 0 or 1")
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    tables = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]

    def probe_structs(vec: Column) -> Column:
        return _probe_structs(vec, tables, n_planes, probe_radius)

    def bucket_structs(vec: Column) -> Column:
        return _bucket_structs(vec, tables)

    # zero-norm rows dropped BEFORE the explode (one filter per row,
    # not per probe) — NaN cosines would outrank real neighbors
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.explode(probe_structs(F.col(vec_col))).alias("pr"),
    ).filter(F.col("q_norm") > 0).select(
        "q_id", "q_vec", "q_norm", "pr.tbl", "pr.bucket"
    )
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
        F.explode(bucket_structs(F.col(vec_col))).alias("pr"),
    ).filter(F.col("c_norm") > 0).select(
        "nbr_id", "c_vec", "c_norm", "pr.tbl", "pr.bucket"
    )
    fanout = n_tables * ((n_planes + 1) if probe_radius == 1 else 1)
    if broadcast_queries is None:
        broadcast_queries = queries.count() * fanout <= broadcast_threshold
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = (
        c.join(q_side, on=["tbl", "bucket"])
        .filter(F.col("nbr_id") != F.col("q_id"))
        .select(
            "q_id",
            "nbr_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_raw"),
        )
        # two exchanges ((q_id, nbr_id) dedup, then q_id ranking) are
        # DELIBERATE: collapsing them to one repartition(q_id) was
        # A/B'd 8% faster at sf0.1 but concentrates a hot query's
        # entire candidate set in one task — the (q_id, nbr_id)
        # spread + map-side partial WindowGroupLimit is the skew
        # guard at scale (measured-and-rejected, PLANS.md r8)
        .dropDuplicates(["q_id", "nbr_id"])
    )
    return _per_query_topk(scored, k)


def lsh_ann_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 3,
) -> DataFrame:
    """(tbl, bucket, id, vec, vnorm) rows — the MATERIALIZABLE half of
    multi-table ANN (the embedding twin of dedup.lsh_index). In
    continuous ingestion this table is written once per corpus and
    appended per accepted batch; each probe batch then joins it on
    (tbl, bucket) instead of re-hashing the corpus. Norms are
    precomputed so probes never touch raw corpus vectors twice.
    Zero-norm rows are excluded at build time (their cosine is NaN
    against every query — same semantics as cosine_topk/lsh_topk)."""
    tables = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("vnorm"),
        F.explode(_bucket_structs(F.col(vec_col), tables)).alias("bb"),
    ).filter(F.col("vnorm") > 0).select(
        F.col("bb.tbl").alias("tbl"),
        F.col("bb.bucket").alias("bucket"),
        id_col,
        vec_col,
        "vnorm",
    )


def materialize_lsh_ann_index(
    corpus: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 3,
    num_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize :func:`lsh_ann_index` hash-BUCKETED on (tbl,
    bucket) and return the re-read table. Physical bucketing matches
    :func:`lsh_topk_from_index`'s probe keys, so the probe join plans
    with NO Exchange on the index side — the corpus index is never
    reshuffled per query batch (pinned by tests/test_bucketed.py).
    The caller must pass the SAME (dim, n_planes, n_tables) to
    lsh_topk_from_index; size ``num_buckets`` so one bucket fits an
    executor (thousands at 100 TB, not 32)."""
    from dataprocessingframework_spark.sources.bucketed import (
        write_bucketed,
    )

    idx = lsh_ann_index(corpus, id_col, vec_col, dim, n_planes, n_tables)
    write_bucketed(
        idx,
        table,
        ["tbl", "bucket"],
        num_buckets=num_buckets,
        sort_cols=["tbl", "bucket"],
        path=path,
        mode=mode,
    )
    return corpus.sparkSession.table(table)


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated relation size — a driver-side stats lookup
    (file-size sum for file relations). Unlike ``df.inputFiles()``,
    this never ships a per-file list through py4j: the r8 soak
    measured ~5s of pure listing overhead per probe on a 26k-file
    index from the inputFiles()-based heuristic it replaces."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def lsh_topk_from_index(
    index: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 3,
    probe_radius: int = 1,
    broadcast_threshold: int = 100_000,
    broadcast_queries: bool | None = None,
    pushdown_probe_keys: bool = False,
    pushdown_key_cap: int = 4096,
) -> DataFrame:
    """:func:`lsh_topk_multi` against a prebuilt (tbl, bucket) index —
    the repeated-probe production path. (dim, n_planes, n_tables,
    probe_radius semantics) must match the index build. Same output
    as lsh_topk_multi on the same corpus (pinned by tests).

    ``pushdown_probe_keys=True`` collects the batch's distinct
    (tbl, bucket) probe keys driver-side (bounded by |queries| x
    fanout, hard-capped by ``pushdown_key_cap``) and pushes them into
    the index scan as per-table ``bucket IN (...)`` predicates. The
    index files are sorted by (tbl, bucket)
    (:func:`materialize_lsh_ann_index`), so parquet row-group stats
    prune everything outside the probed buckets — probe cost scales
    with touched buckets, not corpus size, which is the whole point
    of the index at 100 TB. Semantics-preserving: the inner probe
    join already discards index rows outside the probed keys.

    Default OFF, by measurement: on local NVMe with a warm page
    cache the bytes this filter avoids reading/decoding cost less
    than its fixed ~0.4s driver-side keys-collect job at every shape
    tested (index sizes 2 MB - 2.7 GB, probe batches touching
    8 - 80 %% of buckets; PLANS.md "r8 ANN probe soak"). Opt in where
    scan bytes are genuinely expensive — cold data on object storage,
    or indexes orders of magnitude past the testable range — and the
    probed fraction is small."""
    if probe_radius not in (0, 1):
        raise ValueError("probe_radius must be 0 or 1")
    tables = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.explode(
            _probe_structs(F.col(vec_col), tables, n_planes, probe_radius)
        ).alias("pr"),
    ).filter(F.col("q_norm") > 0).select(
        "q_id", "q_vec", "q_norm", "pr.tbl", "pr.bucket"
    )
    fanout = n_tables * ((n_planes + 1) if probe_radius == 1 else 1)
    if broadcast_queries is None:
        broadcast_queries = queries.count() * fanout <= broadcast_threshold
    q_side = F.broadcast(q) if broadcast_queries else q

    probe_filter = None
    if pushdown_probe_keys:
        # one tiny job over the (broadcast-sized) query batch; cap+1
        # rows bound the driver collect even if the caller passed an
        # unexpectedly wide batch with pushdown forced on
        keys = (
            q.select("tbl", "bucket")
            .distinct()
            .limit(pushdown_key_cap + 1)
            .collect()
        )
        if len(keys) <= pushdown_key_cap:
            by_tbl: dict[int, list[int]] = {}
            for r in keys:
                by_tbl.setdefault(r.tbl, []).append(r.bucket)
            for tbl, buckets in sorted(by_tbl.items()):
                clause = (F.col("tbl") == tbl) & F.col("bucket").isin(
                    buckets
                )
                probe_filter = (
                    clause
                    if probe_filter is None
                    else probe_filter | clause
                )
    # Defensive: indexes materialized before the zero-norm exclusion
    # landed in lsh_ann_index may still hold vnorm=0 rows, whose NaN
    # cosines would sort ABOVE every real neighbor under F.desc. The
    # predicate is a cheap scan-side filter and does not disturb the
    # exchange-free bucketed probe join.
    if probe_filter is not None:
        index = index.filter(probe_filter)
    c = index.filter(F.col("vnorm") > 0).select(
        "tbl",
        "bucket",
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("vnorm").alias("c_norm"),
    )
    scored = (
        c.join(q_side, on=["tbl", "bucket"])
        .filter(F.col("nbr_id") != F.col("q_id"))
        .select(
            "q_id",
            "nbr_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_raw"),
        )
        # two exchanges ((q_id, nbr_id) dedup, then q_id ranking) are
        # DELIBERATE: collapsing them to one repartition(q_id) was
        # A/B'd 8% faster at sf0.1 but concentrates a hot query's
        # entire candidate set in one task — the (q_id, nbr_id)
        # spread + map-side partial WindowGroupLimit is the skew
        # guard at scale (measured-and-rejected, PLANS.md r8)
        .dropDuplicates(["q_id", "nbr_id"])
    )
    return _per_query_topk(scored, k)


def _salt_cell_blocks(
    c: DataFrame,
    b: DataFrame,
    id_col: str,
    key: str,
    max_rows: int | None,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Bound cogroup-group size for an existential corpus-vs-batch
    gate: corpus ``key`` groups above ``max_rows`` are hash-salted
    into ceil(n/max_rows) sub-blocks (on ``id_col``), and every batch
    probe row fans to every sub-block of its key. applyInPandas
    materializes a whole group in one Python worker, so without this
    a quantizer mega-cell is an executor OOM regardless of matmul
    chunking. The gate verdict is existential (ANY corpus hit), so
    corpus-side splitting never changes results. The sub-block bound
    is in expectation (hash split, like every salted join): ~max_rows
    per block with sqrt-order variance, not a hard ceiling.

    Returns (salted corpus, fanned batch, cogroup keys). ``max_rows``
    None disables (keys = [key] only)."""
    if max_rows is None:
        return c, b, [key]
    # one tiny agg (n_keys rows, broadcast) sizes the salt space per
    # key; groups at or under the cap keep n_salt=1 so the common
    # case adds no fan-out
    counts = c.groupBy(key).agg(
        F.ceil(F.count(F.lit(1)) / F.lit(int(max_rows)))
        .cast("int")
        .alias("n_salt")
    )
    c_g = (
        c.join(F.broadcast(counts), on=key)
        .withColumn(
            "salt", F.pmod(F.xxhash64(id_col), F.col("n_salt")).cast("int")
        )
        .drop("n_salt")
    )
    # left join: a batch key with no corpus rows has no count row —
    # coalesce to one (empty-corpus) sub-block
    b_g = (
        b.join(F.broadcast(counts), on=key, how="left")
        .withColumn(
            "salt",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1
                )
            ),
        )
        .drop("n_salt")
    )
    return c_g, b_g, [key, "salt"]


def _salt_self_join_blocks(
    a: DataFrame,
    b: DataFrame,
    key: str,
    max_rows: int | None,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Bound cogroup-group size for a same-key self-join pair listing:
    ``key`` groups above ``max_rows`` split into n_salt hash blocks
    per side, and each side fans across the OTHER side's salt, so the
    ordered pair (x, y) meets in exactly the one group
    (key, salt(x), salt(y)) — no duplicate pairs, no lost pairs.
    Replication per side is n_salt (group count n_salt^2, each
    bounded). Expected-size bound, as in :func:`_salt_cell_blocks`.

    ``a`` must carry ``id_a`` and ``b`` ``id_b`` for the salt hash.
    Returns (salted a, salted b, cogroup keys)."""
    if max_rows is None:
        return a, b, [key]
    counts = a.groupBy(key).agg(
        F.ceil(F.count(F.lit(1)) / F.lit(int(max_rows)))
        .cast("int")
        .alias("n_salt")
    )
    fan = F.explode(F.sequence(F.lit(0), F.col("n_salt") - 1))
    a_g = (
        a.join(F.broadcast(counts), on=key)
        .withColumn(
            "sa", F.pmod(F.xxhash64("id_a"), F.col("n_salt")).cast("int")
        )
        .withColumn("sb", fan)
        .drop("n_salt")
    )
    b_g = (
        b.join(F.broadcast(counts), on=key)
        .withColumn(
            "sb", F.pmod(F.xxhash64("id_b"), F.col("n_salt")).cast("int")
        )
        .withColumn("sa", fan)
        .drop("n_salt")
    )
    return a_g, b_g, [key, "sa", "sb"]


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    exact: bool = False,
    impl: str = "jvm",
    max_bucket_rows: int | None = 100_000,
) -> DataFrame:
    """Embedding near-duplicate pairs (id_a < id_b, cos >= threshold).

    exact=True does the full self-join (verification path); default uses
    LSH buckets so only same-bucket pairs are scored.

    impl='jvm' (default): per-pair codegen fold — fold-order-exact vs
    the DuckDB oracles. impl='blas' (bucketed path only): each LSH
    bucket is scored as ONE cogrouped numpy matmul, the same
    per-cell-matmul shape (and the same measured >=45x class of win
    on 10^8-pair workloads) as incremental_semantic_dedup's blas
    gate. Last-ulp float summation differences vs the fold —
    production path; rounding is half-away-from-zero to match the
    JVM path's HALF_UP ``F.round`` even on exact .00005 ties.

    ``max_bucket_rows`` (default ON, blas path) bounds per-task
    memory: applyInPandas materializes a whole cogroup in one Python
    worker, so a hot LSH bucket (near-dup-heavy corpora concentrate)
    would otherwise OOM an executor. Buckets above the cap are hash-
    salted into sub-blocks on BOTH sides and every (salt_a, salt_b)
    sub-block pair is scored, so each ordered pair (id_a < id_b)
    meets in exactly one group — semantics-free blocking of the
    self-join, the same discipline as the LSH tier's
    ``max_bucket_size``. The matmul additionally chunks so the sims
    matrix stays <=2^24 doubles (~128 MB) per step."""
    # per-side norm precompute (as in cosine_topk): the norm fold runs
    # once per row, not once per candidate pair — bit-identical values
    # zero-norm rows excluded on both sides: their cosine is NaN, and
    # Spark comparisons treat NaN as GREATER than any number, so an
    # all-zero embedding would otherwise "near-duplicate" everything
    # it shares a bucket with (numpy would silently disagree)
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    ).filter(F.col("na") > 0)
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    ).filter(F.col("nb") > 0)
    if exact:
        pairs = a.crossJoin(b)
    else:
        planes = _hyperplanes(dim, n_planes)
        a = a.withColumn("bucket", lsh_bucket_expr(F.col("va"), planes))
        b = b.withColumn("bucket", lsh_bucket_expr(F.col("vb"), planes))
        if impl == "blas":
            import numpy as np
            import pandas as pd

            a_g, b_g, keys = _salt_self_join_blocks(
                a, b, "bucket", max_bucket_rows
            )

            def score(apdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
                empty = pd.DataFrame(
                    {
                        "id_a": pd.Series([], dtype="int64"),
                        "id_b": pd.Series([], dtype="int64"),
                        "cos": pd.Series([], dtype="float64"),
                    }
                )
                if len(apdf) == 0 or len(bpdf) == 0:
                    return empty
                bm = np.stack(bpdf["vb"].values).astype(np.float64)
                bn = bpdf["nb"].values.astype(np.float64)
                ib = bpdf["id_b"].values
                out = []
                step = max(1, (1 << 24) // len(bpdf))
                for lo in range(0, len(apdf), step):
                    am = np.stack(
                        apdf["va"].values[lo : lo + step]
                    ).astype(np.float64)
                    an = apdf["na"].values[lo : lo + step].astype(
                        np.float64
                    )
                    ia = apdf["id_a"].values[lo : lo + step]
                    sims = (am @ bm.T) / np.outer(an, bn)
                    ai, bi = np.nonzero(
                        (sims >= threshold) & (ia[:, None] < ib[None, :])
                    )
                    if len(ai) == 0:
                        continue
                    s = sims[ai, bi]
                    out.append(
                        pd.DataFrame(
                            {
                                "id_a": ia[ai].astype("int64"),
                                "id_b": ib[bi].astype("int64"),
                                # half-AWAY-FROM-ZERO to match the JVM
                                # path's F.round (HALF_UP) on exact
                                # .00005 ties — np.round is half-even
                                "cos": np.sign(s)
                                * np.floor(np.abs(s) * 1e4 + 0.5)
                                / 1e4,
                            }
                        )
                    )
                return pd.concat(out) if out else empty

            return (
                a_g.groupby(*keys)
                .cogroup(b_g.groupby(*keys))
                .applyInPandas(
                    score, schema="id_a long, id_b long, cos double"
                )
            )
        pairs = a.join(b, on="bucket")
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            ).alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cos"))
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean embedding, long format (label, pos, centroid).

    The supervised sibling of the IVF coarse quantizer: class
    prototypes for centroid-distance outlier pruning and per-topic
    corpus balancing. Long format keeps it oracle-checkable
    value-by-value (no float-array stringification ambiguity).

    Shape at 100 TB: posexplode multiplies rows by dim, but every
    (label, pos) partial sum is map-side combined, so the shuffle
    carries only n_labels x dim aggregate rows per task — the corpus
    itself never moves. This beats an array-valued groupBy(label)
    agg of F.transform sums, which would put whole vectors in the
    aggregation buffer without partial aggregation over elements.
    """
    ex = df.select(
        label_col, F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    return (
        ex.groupBy(label_col, "pos")
        # + 0.0 folds IEEE -0.0 to +0.0: each engine's last-ulp sum
        # noise around a true-zero mean otherwise rounds to ±0.0 on
        # DIFFERENT sides, and "%.4f" renders the sign (r6 sf0.1 find)
        .agg(
            (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("centroid"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select(
            F.col(label_col).cast("long").alias("label"),
            F.col("pos").cast("long").alias("pos"),
            "centroid",
            "n_vecs",
        )
        .orderBy("label", "pos")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# --------------------------------------------------------------------------


def _ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    iters: int,
    impl: str = "jvm",
) -> list[list[float]]:
    """Deterministic coarse centroids.

    Init: the n_cells corpus vectors with the smallest md5-derived hash
    of their id — a seedless, engine-portable random sample. Then
    ``iters`` distributed Lloyd rounds (assign by max cosine → new
    centroid = normalized mean of the cell, computed via posexplode +
    groupBy(cell, pos) — one shuffle per round whose volume is
    n_cells × dim rows after partial aggregation). Only the
    n_cells × dim centroid matrix ever reaches the driver.
    """
    from dataprocessingframework_spark.functions.hashing import hash64

    seed_rows = (
        corpus.select(
            F.col(vec_col).alias("v"),
            hash64(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_cells)
        .collect()
    )
    cents = [[float(x) for x in r["v"]] for r in seed_rows]

    for _ in range(iters):
        assigned = assign_cells(
            corpus, cents, id_col, vec_col, n_probe=1, impl=impl
        )
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        new = []
        for c, old in enumerate(cents):
            if c in by_cell:
                vec = [by_cell[c][p] for p in range(len(old))]
                n = sum(x * x for x in vec) ** 0.5 or 1.0
                new.append([x / n for x in vec])
            else:
                new.append(old)  # empty cell keeps its seed
        cents = new
    return cents


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    n_probe: int = 1,
    impl: str = "jvm",
) -> DataFrame:
    """Attach the top-n_probe nearest-centroid cell ids to each row.

    impl='jvm': centroids are literal arrays — cell scoring is a narrow
    projection in whole-stage codegen (n_cells dot products per row),
    no join, no shuffle. impl='blas': one numpy matmul per Arrow batch
    against the (n_cells × dim) centroid matrix — ~10× faster when
    n_cells × dim work per row outgrows the codegen fold. Both are
    narrow (no shuffle) and deterministic; ties break toward the lower
    cell id. Returns the input columns plus ``cell`` (exploded when
    n_probe > 1).
    """
    if impl == "blas":
        return _assign_cells_blas(df, centroids, vec_col, n_probe)
    # centroid matrix as ONE nested-array Literal, not an unrolled
    # n_cells x dim expression forest — same per-construction
    # analysis/codegen rationale (and value-identical fold) as
    # lsh_bucket_expr; the transform index replaces F.lit(i)
    scores = F.transform(
        _nested_array_lit([[float(x) for x in c] for c in centroids]),
        lambda c, i: F.struct(
            dot(F.col(vec_col), c).alias("s"), i.alias("c")
        ),
    )
    top = F.slice(F.array_sort(scores, lambda a, b: F.when(a["s"] > b["s"], -1).when(a["s"] < b["s"], 1).otherwise(0)), 1, n_probe)
    out = df.withColumn("_cells", F.transform(top, lambda t: t["c"]))
    if n_probe == 1:
        return out.withColumn("cell", F.col("_cells")[0]).drop("_cells")
    return out.withColumn("cell", F.explode("_cells")).drop("_cells")


def _assign_cells_blas(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """Arrow-batched centroid assignment: each batch is one (batch ×
    n_cells) matmul. Narrow (no shuffle); ties break to the lower cell
    id (stable argsort), matching the JVM comparator."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cmat = np.array(centroids, dtype=np.float64)
    schema = StructType(df.schema.fields + [StructField("cell", IntegerType())])

    def go(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].values).astype(np.float64)
            sims = v @ cmat.T
            if n_probe == 1:
                out = pdf.copy()
                out["cell"] = sims.argmax(axis=1).astype("int32")
            else:
                top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
                out = pdf.loc[pdf.index.repeat(n_probe)].reset_index(drop=True)
                out["cell"] = top.ravel().astype("int32")
            yield out

    return df.mapInPandas(go, schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 1,
    impl: str = "blas",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer (the FAISS-style
    scale path, alongside lsh_topk): corpus rows are assigned to their
    nearest of n_cells centroids; each query probes its n_probe nearest
    cells and scores only that fraction of the corpus (~n_probe/n_cells
    of it, data permitting).

    All heavy steps are narrow maps (cell assignment is codegen'd dot
    products against literal centroids); the only shuffles are the
    centroid means (n_cells × dim rows) and the per-query top-k window.
    Recall is tunable via n_probe; n_probe = n_cells degenerates to the
    exact result.

    ``centroids`` short-circuits the coarse-quantizer build: production
    serving trains the quantizer ONCE per corpus snapshot (or loads it
    from the feature store) and reuses it for every probe batch —
    recomputing per query batch would re-run the Lloyd rounds and the
    seed collect against 100 TB each time.
    """
    cents = centroids or _ivf_centroids(
        corpus, id_col, vec_col, n_cells, iters, impl=impl
    )
    # norms are computed on each side BEFORE the cell join: a corpus
    # row meets every query probing its cell and a broadcast query
    # meets every corpus row in its probed cells, so folding the
    # norms per joined PAIR (the old cosine(q, c) expression) paid
    # each 64-element fold |pairs|/|rows| times over — same fix as
    # the materialized-index probe (value-identical: same fold over
    # the same row's data, just evaluated once)
    c = assign_cells(
        corpus.select(
            F.col(id_col).alias("nbr_id"),
            F.col(vec_col).alias("c_vec"),
            norm(F.col(vec_col)).alias("c_norm"),
        ),
        cents,
        "nbr_id",
        "c_vec",
        n_probe=1,
        impl=impl,
    )
    q = assign_cells(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_norm"),
        ),
        cents,
        "q_id",
        "q_vec",
        n_probe=n_probe,
        impl=impl,
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("nbr_id") != F.col("q_id"))
        .select(
            "q_id",
            "nbr_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_raw"),
        )
    )
    # _per_query_topk's map-side partial WindowGroupLimit keeps a fat
    # IVF cell from funneling its full membership through one q_id
    # partition
    return _per_query_topk(scored, k)


SQ8_LEVELS = 256
_SQ8_PER_WORD = 7  # codes per packed long: 7x8=56 bits — the top
# byte of a full 8 would set bit 63 and make the word sign-dependent,
# which DuckDB BIGINT shifts and ANSI-mode addition both reject;
# 7-per-long keeps every word positive and the packing bit-portable


def _sq8_bounds(corpus: DataFrame, vec_col: str) -> tuple[list, list]:
    """Per-dimension (mins, maxs) over the corpus — ONE posexplode +
    groupBy(pos) pass collapsing to two dim-length lists on the
    driver (dim-bounded, never corpus-bounded)."""
    rows = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .orderBy("pos")
        .collect()
    )
    return [float(r.mn) for r in rows], [float(r.mx) for r in rows]


def _finite_d(x: float, what: str) -> str:
    """repr-literal a double for SQL interpolation, failing LOUDLY on
    non-finite input (ADVICE r16): ``repr(inf)`` would emit ``infD``
    and surface as an opaque ParseException where the old F.lit
    column-algebra path built a (still-wrong) plan. Same actionable
    contract as _nested_array_lit's guard. The repr round-trips
    binary64 exactly, so the parsed literal is bit-identical to the
    F.lit path."""
    import math

    x = float(x)
    if not math.isfinite(x):
        raise ValueError(
            f"non-finite {what} ({x!r}); repr-based SQL literals"
            " cannot encode NaN/Inf — clean the input vectors or"
            " rebuild the index bounds before probing"
        )
    return f"{x!r}D"


def _sq8_code_sql(vec_col: str, mins: list, maxs: list, i: int) -> str:
    """SQ8 code for dimension i as a SQL fragment: clamp(0, 255,
    floor((x-mn)/(mx-mn)*256)), 0 on degenerate dims — same pure
    floor arithmetic as quantize_embeddings, bit-portable across
    engines. The LOWER clamp matters only on the append path: a
    batch value below the STORED per-dim min would otherwise code
    negative and corrupt the packed word's neighboring bytes.

    A SQL string, not column algebra (r16): the py4j form cost ~10
    driver round-trips per dimension; parsing is one call for the
    whole pack/dequant expression. The parsed tree computes the
    identical arithmetic — `-`/`/`/`*` left-associate in both forms,
    `v[i]` is the same 0-based GetArrayItem, the mn/range literals
    are Python-computed doubles emitted as shortest-round-trip
    reprs, and floor(double) is BIGINT either way (the SQ8 probe
    parity tests and the emb_ivf_sq8_topk oracle pin bit-equality)."""
    mn, mx = mins[i], maxs[i]
    if mx <= mn:
        return "CAST(0 AS BIGINT)"
    return (
        "greatest(CAST(0 AS BIGINT), least("
        f"CAST({SQ8_LEVELS - 1} AS BIGINT), "
        f"FLOOR((CAST({vec_col}[{i}] AS DOUBLE)"
        f" - {_finite_d(mn, f'sq8 min[{i}]')})"
        f" / {_finite_d(mx - mn, f'sq8 range[{i}]')}"
        f" * {float(SQ8_LEVELS)!r}D)))"
    )


def _sq8_pack_expr(vec_col: str, mins: list, maxs: list) -> Column:
    """Pack the SQ8 codes 7-per-long into array<bigint> — a true
    (dim bytes)-per-row payload vs 4*dim for float32, independent of
    parquet encodings. Statically unrolled (dim is driver-known from
    the bounds), build-time only — probes never re-pack. ONE parsed
    SQL expression (r16, see _sq8_code_sql): the py4j column-algebra
    form issued ~10 round-trips per dimension per index build."""
    dim = len(mins)
    words = []
    for w in range(0, dim, _SQ8_PER_WORD):
        terms = ["CAST(0 AS BIGINT)"]
        for j, i in enumerate(range(w, min(w + _SQ8_PER_WORD, dim))):
            terms.append(
                f"shiftleft({_sq8_code_sql(vec_col, mins, maxs, i)},"
                f" {8 * j})"
            )
        words.append(" + ".join(terms))
    return F.expr(f"array({', '.join(words)})")


def _sq8_dequant_dot(
    vec_col: str, codes_col: str, mins: list, maxs: list
) -> Column:
    """Dot product of a float vector column against the packed SQ8
    codes' midpoint dequantization, as a statically UNROLLED
    left-nested sum: sum_i v[i] * (mn_i + (code_i + 0.5) * step_i).
    The left-to-right addition order matches both the aggregate-fold
    arithmetic and DuckDB's list_dot_product, so results are
    bit-identical across engines (the oracled probe pins this);
    unrolling skips the per-candidate dequant-array materialization
    and per-element HOF lambda overhead (measured 54.1s -> 33.1s on
    the 1M-row probe, PLANS.md "r10 SQ8 IVF index").

    Built as ONE parsed SQL expression (r16): the py4j column-algebra
    form cost ~8 driver round-trips per dimension per probe
    construction. The parsed tree is identical — `+` and `*` are
    left-associative in both forms, `v[i]` is the same 0-based
    GetArrayItem, and the mn/step literals are Python-computed doubles
    emitted as shortest-round-trip reprs either way."""
    dim = len(mins)
    terms = []
    for i in range(dim):
        w, j = divmod(i, _SQ8_PER_WORD)
        mn, mx = mins[i], maxs[i]
        step = (mx - mn) / float(SQ8_LEVELS)
        code = f"(shiftright({codes_col}[{w}], {8 * j}) & 255)"
        terms.append(
            f"CAST({vec_col}[{i}] AS DOUBLE) * "
            f"({_finite_d(mn, f'sq8 min[{i}]')}"
            f" + (CAST({code} AS DOUBLE) + 0.5D) * "
            f"{_finite_d(step, f'sq8 step[{i}]')})"
        )
    return F.expr(" + ".join(terms))


def sq8_gate_margin(
    mins: list, maxs: list, min_vnorm: float
) -> float:
    """A SOUND stage-1 margin for :func:`incremental_semantic_dedup_sq8`:
    with ``margin >= sq8_gate_margin(...)`` the two-stage compressed
    gate provably equals the exact gate.

    Derivation (all public linear algebra): midpoint dequantization
    puts each stored vector v̂ within step_i/2 of the true v per
    dimension (the clamp rails included: v == mx codes 255 and lands
    step/2 away; degenerate dims contribute 0), so
    ‖v − v̂‖₂ ≤ Δ := sqrt(Σ_i (step_i/2)²). For unit directions,
    ‖v/‖v‖ − v̂/‖v̂‖‖ ≤ 2‖v − v̂‖ / max(‖v‖, ‖v̂‖), and by
    Cauchy-Schwarz |cos(q,v) − cos(q,v̂)| is at most that. Taking
    ``min_vnorm`` = the smallest STORED vnorm in the index (≤ every
    max(‖v‖, ‖v̂‖)) gives the corpus-wide bound 2Δ/min_vnorm. The
    bound is deliberately not tight — last-ulp differences in how two
    engines evaluate it cannot make it unsound."""
    import math

    delta2 = 0.0
    for mn, mx in zip(mins, maxs):
        if mx > mn:
            step = (mx - mn) / float(SQ8_LEVELS)
            delta2 += (step / 2.0) ** 2
    if min_vnorm <= 0:
        raise ValueError(
            f"min_vnorm must be positive, got {min_vnorm}"
        )
    return 2.0 * math.sqrt(delta2) / float(min_vnorm)


def load_sq8_bounds(
    spark: SparkSession, table: str
) -> tuple[list, list]:
    """(mins, maxs) persisted by materialize_ivf_index(sq8=True)."""
    rows = spark.table(f"{table}_sq8").collect()
    if len(rows) != 1:
        raise ValueError(
            f"{table}_sq8 must hold exactly one bounds row, got "
            f"{len(rows)}; rebuild via materialize_ivf_index(sq8=True)"
        )
    r = rows[0]
    return [float(x) for x in r.mins], [float(x) for x in r.maxs]


def load_prefix_dims(spark: SparkSession, table: str) -> tuple[int, int]:
    """(prefix_dims, full_dim) persisted by
    materialize_ivf_index(prefix_dims=...)."""
    rows = spark.table(f"{table}_prefix").collect()
    if len(rows) != 1:
        raise ValueError(
            f"{table}_prefix must hold exactly one geometry row, got"
            f" {len(rows)}; rebuild via"
            " materialize_ivf_index(prefix_dims=...)"
        )
    return int(rows[0].dims), int(rows[0].full_dim)


def _nested_array_lit(mat: list[list[float]]) -> Column:
    """A k x d nested-array literal that enters the UNOPTIMIZED plan
    as two nodes: ``from_json('<matrix json>', 'array<array<double>>')``
    over one string literal. The optimizer's ConstantFolding collapses
    it to a single folded array Literal before execution (verified in
    the optimized plan), so no row ever parses JSON.

    Why not the obvious forms: ``F.lit(nested_list)`` issues a py4j
    call per element — a 256 x 8 PQ codebook cost ~14 s of driver-side
    plan CONSTRUCTION per probe (measured r8). The r8 fix (one parsed
    ``array(array(...))`` SQL expression) killed the py4j cost but
    still put ~k x d CreateArray/Literal NODES into the analyzed
    plan, and the analyzer re-walks the whole tree on EVERY subsequent
    DataFrame op — the 16-codebook PQ probe paid ~0.13 s per op
    across ~15 ops (~2 s/probe of pure re-analysis, measured r16).
    The folded-at-optimization form keeps analysis O(1) in matrix
    size.

    Exactness: ``json.dumps`` emits Python ``repr`` floats (shortest
    round-tripping decimal) and Jackson's double parsing is correctly
    rounded, so the folded doubles are bit-identical to the F.lit
    path."""
    import json
    import math

    for row in mat:
        for x in row:
            if not math.isfinite(float(x)):
                raise ValueError(
                    "non-finite value in centroid/codebook matrix"
                    f" ({x!r}); JSON/repr-based literals cannot encode"
                    " NaN/Inf — clean the seed embeddings or drop the"
                    " degenerate row before building the index"
                )
    return F.from_json(
        F.lit(json.dumps([[float(x) for x in row] for row in mat])),
        "array<array<double>>",
    )


def _pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    k: int,
    refine_iters: int = 0,
    train_rows: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks. Default (``refine_iters=0``):
    the k corpus vectors with the smallest md5-derived id hash (the
    same seedless portable sample as _ivf_centroids), each split into
    m sub-vectors — codebooks[s][c] is codeword c of subspace s. No
    Lloyd refinement, so every downstream code assignment is pure
    portable arithmetic and the whole PQ path carries a FULL
    cross-engine oracle. Only k x dim doubles reach the driver.

    ``refine_iters=N`` is the production-quality path: per subspace,
    N rounds of Lloyd (k-means assign + mean update) over a BOUNDED
    deterministic training sample — the ``train_rows`` (default
    256*k, the FAISS max_points_per_centroid convention) smallest
    hash-ordered vectors, collected once via TakeOrdered. The seeded
    books are the measured recall FLOOR on unclustered data
    (0.35-0.66 direct at sf0.1, PLANS.md); real-world embedding
    corpora are clustered, and Lloyd codebooks are where PQ earns its
    compression (Jegou et al. 2011 trains exactly this way). Empty
    clusters keep their previous codeword, so every iteration is
    deterministic given the sample; refined books use float64 numpy
    and therefore DROP the cross-engine oracle guarantee — the
    oracled registry query stays at refine_iters=0. Driver transfer
    is train_rows x dim doubles (256*256 x 64 = 32 MB), independent
    of corpus size — sample-trained codebooks are the standard at
    billion scale; training never scans the full corpus."""
    from dataprocessingframework_spark.functions.hashing import hash64

    n_train = k if not refine_iters else max(
        k, train_rows if train_rows is not None else 256 * k
    )
    rows = (
        corpus.select(
            F.col(vec_col).alias("v"),
            hash64(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_train)
        .collect()
    )
    vecs = [[float(x) for x in r["v"]] for r in rows]
    dim = len(vecs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sd = dim // m
    books = [
        [vec[s * sd : (s + 1) * sd] for vec in vecs[:k]]
        for s in range(m)
    ]
    if not refine_iters:
        return books
    import numpy as np

    train = np.array(vecs, dtype=np.float64)
    refined: list[list[list[float]]] = []
    for s in range(m):
        X = train[:, s * sd : (s + 1) * sd]
        C = np.array(books[s], dtype=np.float64)
        x2 = (X * X).sum(axis=1)[:, None]
        for _ in range(refine_iters):
            d = x2 - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
            a = np.argmin(d, axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=len(C)).astype(np.float64)
            live = counts > 0
            C[live] = sums[live] / counts[live, None]
        refined.append([[float(x) for x in row] for row in C])
    return refined


def _pq_code_exprs(
    vec_col: str, codebooks: list[list[list[float]]]
) -> list[Column]:
    """Per-subspace PQ code: argmin_k squared L2 distance between the
    sub-vector and codeword k, ties to the lower k (array_min over
    (dist, k) structs — field order IS the tiebreak). Each subspace's
    codebook ships as ONE nested-array literal (compact-literal
    pattern); the scan stays a narrow projection."""
    m = len(codebooks)
    sd = len(codebooks[0][0])

    def scorer(sub):
        # closure factory: a `sub=sub` default param would change the
        # lambda's arity and break PySpark's HOF argument counting
        return lambda cw, kk: F.struct(
            F.aggregate(
                F.zip_with(sub, cw, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            kk.alias("k"),
        )

    exprs = []
    for s in range(m):
        sub = F.slice(F.col(vec_col), s * sd + 1, sd)
        scores = F.transform(
            _nested_array_lit(codebooks[s]), scorer(sub)
        )
        exprs.append(F.array_min(scores)["k"].cast("long"))
    return exprs


def load_pq_codebooks(
    spark: SparkSession, table: str
) -> list[list[list[float]]]:
    """Codebooks persisted by :func:`materialize_pq_index` —
    m x k x subdim, always driver-sized."""
    rows = spark.table(f"{table}_pq").orderBy("s", "c").collect()
    books: list[list[list[float]]] = []
    for r in rows:
        if r.s == len(books):
            books.append([])
        if r.s != len(books) - 1 or r.c != len(books[-1]):
            raise ValueError(
                f"{table}_pq rows are not contiguous (s={r.s}, c={r.c})"
                " — corrupted or double-written; rebuild via"
                " materialize_pq_index"
            )
        books[-1].append([float(x) for x in r.codeword])
    return books


def materialize_pq_index(
    corpus: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 1,
    impl: str = "blas",
    centroids: list[list[float]] | None = None,
    num_buckets: int = 16,
    path: str | None = None,
    mode: str = "overwrite",
    m: int = 8,
    k_codes: int = 256,
    refine_iters: int = 0,
    balance_cell_rows: int | None = None,
) -> tuple[DataFrame, list[list[float]], list[list[list[float]]]]:
    """IVF-PQ: the canonical billion-scale ANN layout (Jegou et al.
    2011) Spark-first — inverted lists bucketed on ``cell`` exactly
    like :func:`materialize_ivf_index`, but each vector stored as m
    product-quantization codes packed 7-per-bigint: dim=64, m=8 is
    8 code bytes -> 2 bigints = 16 B payload vs 256 B float32 (16x;
    measured on-disk ratio in PLANS.md "r10 IVF-PQ index"). SQ8
    (~4x) keeps per-dim resolution; PQ trades more accuracy for
    another 4x — the right rung when the index must live on object
    storage or fit a memory budget.

    Codebooks are md5-seeded corpus sub-vectors by default, so code
    assignment is portable argmin arithmetic and the
    ``emb_ivf_pq_topk`` registry query carries a FULL DuckDB oracle.
    ``refine_iters=N`` runs N Lloyd rounds per subspace over a
    bounded hash-ordered training sample (production recall path —
    see :func:`_pq_codebooks`; trades away the cross-engine oracle,
    keep 0 for oracle-checked uses).
    ``vnorm`` stores the RECONSTRUCTION's norm (probe cosines are
    consistent for what the index holds). ``mode='append'`` reuses
    the persisted centroids AND codebooks — re-seeding on a batch
    would shift the code space under existing rows. Probe via
    :func:`ivf_pq_topk_from_index`. ``balance_cell_rows``: as in
    :func:`materialize_ivf_index` — fresh builds only, runs
    :func:`balance_centroids` after training so the persisted
    quantizer is the balanced one."""
    from dataprocessingframework_spark.sources.bucketed import (
        write_bucketed,
    )

    spark = corpus.sparkSession
    if mode == "append" and balance_cell_rows is not None:
        raise ValueError(
            "balance_cell_rows is a fresh-build option: rebalancing"
            " under an existing index would reassign cells without"
            " rewriting stored rows — rebuild instead"
        )
    if k_codes > 256:
        raise ValueError(
            f"k_codes={k_codes} > 256: PQ codes are packed one byte"
            " each (7 per bigint); codes >= 256 would silently"
            " corrupt neighboring bytes in the packed word"
        )
    if mode == "append":
        if centroids is None:
            centroids = load_ivf_centroids(spark, table)
        cents = centroids
        books = load_pq_codebooks(spark, table)
        # The stored index defines the geometry: ignore the caller's
        # m (default 8) and derive it from the persisted codebooks —
        # an append encoded with a mismatched subspace count would
        # write corrupt codes/vnorm, the exact drift append mode
        # exists to prevent.
        m = len(books)
        first = corpus.select(F.size(vec_col)).first()
        if first is not None and first[0] != m * len(books[0][0]):
            raise ValueError(
                f"append batch dim {first[0]} != index geometry"
                f" m={m} x subdim={len(books[0][0])} for {table}"
            )
        desc = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        buckets = [r for r in desc if r.col_name == "Num Buckets"]
        if buckets:
            num_buckets = int(buckets[0].data_type)
        path = None
    else:
        cents = centroids or _ivf_centroids(
            corpus, id_col, vec_col, n_cells, iters, impl=impl
        )
        if balance_cell_rows is not None:
            cents = balance_centroids(
                corpus, cents, balance_cell_rows,
                rounds=8, id_col=id_col, vec_col=vec_col, impl=impl,
            )
        nz = corpus.select(
            F.col(id_col).alias("pid"),
            F.col(vec_col).alias("pv"),
            norm(F.col(vec_col)).alias("pn"),
        ).filter(F.col("pn") > 0)
        k_eff = min(k_codes, nz.count())
        books = _pq_codebooks(
            nz, "pid", "pv", m, k_eff, refine_iters=refine_iters
        )
    sd = len(books[0][0])
    assigned = assign_cells(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            norm(F.col(vec_col)).alias("vnorm"),
        ).filter(F.col("vnorm") > 0),
        cents,
        "vec_id",
        "embedding",
        n_probe=1,
        impl=impl,
    )
    n_words = (m + _SQ8_PER_WORD - 1) // _SQ8_PER_WORD
    if impl == "jvm":
        # expression encode: portable argmin arithmetic, the
        # oracle-exact path. Interpreted-HOF cost is ~28 ms/row
        # (k_codes folds per subspace per row) — fine for the
        # oracled registry query, wrong for a production build;
        # the blas default below is ~100x faster per batch.
        assigned = assigned.withColumn(
            "pq_codes", F.array(*_pq_code_exprs("embedding", books))
        )
        words = []
        for w in range(0, m, _SQ8_PER_WORD):
            expr = F.lit(0).cast("long")
            for j, s in enumerate(range(w, min(w + _SQ8_PER_WORD, m))):
                expr = expr + F.shiftleft(F.col("pq_codes")[s], 8 * j)
            words.append(expr)
        recon = F.concat(
            *[
                F.element_at(
                    _nested_array_lit(books[s]),
                    (F.col("pq_codes")[s] + 1).cast("int"),
                )
                for s in range(m)
            ]
        )
        idx = assigned.select(
            "cell",
            "vec_id",
            F.array(*words).alias("codes"),
            norm(recon).alias("vnorm"),
            # per-row reconstruction residual ||v - v̂||: the sound
            # per-vector margin input for the compressed PQ gate
            # (8 B/row; see incremental_semantic_dedup_pq)
            norm(
                F.zip_with(
                    F.col("embedding"), recon, lambda a, b: a - b
                )
            ).alias("resid"),
        )
    else:
        # Arrow-batched numpy encode (production default): per batch,
        # per subspace ONE ||sub||^2 - 2 sub@CB^T + ||CB||^2 distance
        # matrix and a vectorized argmin (np ties -> first index =
        # lowest codeword, same tiebreak as the expression path).
        # Distances accumulate in a different order than the JVM
        # fold, so a code can differ only on an exact inter-codeword
        # distance tie — use impl='jvm' for oracle-exact parity.
        import numpy as np
        import pandas as pd

        b_books = [
            np.array(books[s], dtype=np.float64) for s in range(m)
        ]
        b_norm2 = [(b * b).sum(axis=1) for b in b_books]

        def encode(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vm = np.stack(
                    [np.asarray(v, dtype=np.float64)
                     for v in pdf["embedding"]]
                )
                words = np.zeros((len(pdf), n_words), dtype=np.int64)
                recon = np.empty_like(vm)
                for s in range(m):
                    sub = vm[:, s * sd : (s + 1) * sd]
                    d = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2.0 * (sub @ b_books[s].T)
                        + b_norm2[s][None, :]
                    )
                    cs = np.argmin(d, axis=1)
                    recon[:, s * sd : (s + 1) * sd] = b_books[s][cs]
                    words[:, s // _SQ8_PER_WORD] |= cs << (
                        8 * (s % _SQ8_PER_WORD)
                    )
                yield pd.DataFrame(
                    {
                        "cell": pdf["cell"].values,
                        "vec_id": pdf["vec_id"].values,
                        "codes": [w.tolist() for w in words],
                        "vnorm": np.linalg.norm(recon, axis=1),
                        "resid": np.linalg.norm(vm - recon, axis=1),
                    }
                )

        idx = assigned.select("cell", "vec_id", "embedding").mapInPandas(
            encode,
            schema="cell int, vec_id long, codes array<bigint>,"
            " vnorm double, resid double",
        )
    write_bucketed(
        idx,
        table,
        ["cell"],
        num_buckets=num_buckets,
        sort_cols=["cell"],
        path=path,
        mode=mode,
    )
    if mode != "append":
        cent_rows = [
            (c, [float(x) for x in vec]) for c, vec in enumerate(cents)
        ]
        cent_df = _driver_meta_df(
            spark, cent_rows, "cell int, centroid array<double>"
        )
        w0 = cent_df.write.mode(mode).format("parquet")
        if path:
            w0 = w0.option("path", f"{path}_centroids")
        w0.saveAsTable(f"{table}_centroids")
        book_rows = [
            (s, c, books[s][c])
            for s in range(len(books))
            for c in range(len(books[s]))
        ]
        book_df = _driver_meta_df(
            spark, book_rows, "s int, c int, codeword array<double>"
        )
        wb = book_df.write.mode(mode).format("parquet")
        if path:
            wb = wb.option("path", f"{path}_pq")
        wb.saveAsTable(f"{table}_pq")
    return spark.table(table), cents, books


def ivf_pq_topk_from_index(
    index: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    impl: str = "jvm",
    pushdown_probe_cells: bool = False,
) -> DataFrame:
    """Probe a :func:`materialize_pq_index` table: queries assign to
    their n_probe nearest cells (narrow map, driver-held centroid
    matrix), broadcast-join the index on ``cell``, and score
    asymmetrically — original query vector against the PQ
    reconstruction, rebuilt per candidate as one codebook lookup per
    subspace (element_at on a nested-array literal indexed by the
    unpacked code) with a statically unrolled multiply-add chain in
    dim order, so the summation order matches the build-side
    reconstruction-norm fold and the DuckDB oracle bit-for-bit. No
    UDF anywhere; query norms materialize once on the broadcast
    side."""
    m = len(codebooks)
    sd = len(codebooks[0][0])
    q = assign_cells(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        ),
        centroids,
        "q_id",
        "q_vec",
        n_probe=n_probe,
        impl=impl,
    ).withColumn("q_norm", norm(F.col("q_vec")))
    if pushdown_probe_cells:
        cells = [r.cell for r in q.select("cell").distinct().collect()]
        index = index.filter(F.col("cell").isin(cells))
    # reconstruction as ONE codebook lookup per subspace, then a flat
    # dim-order dot fold. Each k x subdim codebook literal appears
    # exactly ONCE — an earlier unrolled-sum variant referenced the
    # lookup per DIMENSION, duplicating every nested-array literal
    # sd times, and Catalyst analysis + janino paid for a 131k-node
    # literal forest per probe (the r8 compact-literal lesson, again;
    # the flat fold also keeps the oracle's exact summation order)
    recon = F.concat(
        *[
            F.element_at(
                _nested_array_lit(codebooks[s]),
                (
                    F.shiftright(
                        F.col("codes")[s // _SQ8_PER_WORD],
                        8 * (s % _SQ8_PER_WORD),
                    ).bitwiseAND(F.lit(255))
                    + 1
                ).cast("int"),
            )
            for s in range(m)
        ]
    )
    c = index.filter(F.col("vnorm") > 0).select(
        "cell",
        F.col("vec_id").alias("nbr_id"),
        recon.alias("c_vec"),
        F.col("vnorm").alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("nbr_id") != F.col("q_id"))
        .select(
            "q_id",
            "nbr_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_raw"),
        )
        .dropDuplicates(["q_id", "nbr_id"])
    )
    return _per_query_topk(scored, k)


def ivf_pq_topk_rerank(
    index: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 50,
    n_probe: int = 4,
    impl: str = "jvm",
) -> DataFrame:
    """Two-stage IVF-PQ serving — the standard FAISS recipe: the
    compressed index generates a ``shortlist`` of candidates per
    query (reading ~16 B/vector), then ONLY those candidates' original
    float vectors are fetched and exactly re-ranked to top-k. On the
    repo's unclustered worst-case embeddings, PQ top-10 directly is
    0.35-0.66 recall, but shortlist=100 + re-rank recovers 0.86-0.99
    of exact (PLANS.md "r10 IVF-PQ index") — compression costs only
    shortlist coverage, not ranking quality.

    Scale shape: the shortlist (|queries| x shortlist rows, skinny)
    BROADCASTS into the corpus join, so the full-precision corpus is
    touched only through a broadcast-hash semi-lookup of candidate
    ids — at 100 TB the re-rank reads shortlist-many vectors per
    query, not the corpus."""
    short = ivf_pq_topk_from_index(
        index, centroids, codebooks, queries,
        id_col, vec_col, k=shortlist, n_probe=n_probe, impl=impl,
    ).select("q_id", "nbr_id")
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    ).filter(F.col("c_norm") > 0)
    qv = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    scored = (
        c.join(F.broadcast(short), on="nbr_id")
        .join(F.broadcast(qv), on="q_id")
        .select(
            "q_id",
            "nbr_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_raw"),
        )
    )
    return _per_query_topk(scored, k)


def update_hot_lineage(
    sizes: dict[int, int],
    max_cell_rows: int,
    hot_state: dict[int, tuple[int, int]],
    unsplittable: dict[int, int],
) -> tuple[dict[int, tuple[int, int]], set[int]]:
    """Per-round lineage bookkeeping for :func:`balance_centroids`.

    Pure driver-side arithmetic over the n_cells-bounded ``sizes``
    map: for every still-hot cell, compare its size against its
    lineage reference (``hot_state``: cell -> (reference size,
    consecutive no-progress rounds)) and classify it — fresh (first
    attempt, or real progress made), ``stuck`` (kept >=95% of its
    reference once: escalate to the mean-sideways split), or
    ``unsplittable`` (no progress twice: stop burning rounds on it).

    Mutates ``unsplittable`` in place. A marked cell that gained
    >5% new mass since the mark has its mark cleared AND its
    lineage reset (``ref = None``), so the retry gets one full
    fresh hash-pair -> mean-sideways escalation cycle. Without the
    reset the retry path is dead: the stale lineage carries
    cons >= 2, and growth always satisfies n >= 0.95*ref, so the
    cell would be re-marked in the same pass before any split ran
    (ADVICE r12).

    Returns ``(new_hot_state, stuck)``.
    """
    stuck: set[int] = set()
    new_state: dict[int, tuple[int, int]] = {}
    for c, n in sizes.items():
        if n <= max_cell_rows:
            continue
        ref = hot_state.get(c)
        if c in unsplittable and n > 1.05 * unsplittable[c]:
            del unsplittable[c]  # new mass arrived: retry it
            ref = None  # fresh lineage: full escalation cycle
        if ref is not None and n >= 0.95 * ref[0]:
            cons = ref[1] + 1
            if cons >= 2:
                unsplittable[c] = n
            else:
                stuck.add(c)
        else:
            cons = 0
        new_state[c] = (n, cons)
    return new_state, stuck


def balance_centroids(
    corpus: DataFrame,
    centroids: list[list[float]],
    max_cell_rows: int,
    rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "jvm",
    round_stats: list | None = None,
) -> list[list[float]]:
    """Split HOT quantizer cells by seeding new centroids inside them
    (r12) — the fix-at-source companion to the gates' salting caps:
    salting bounds per-TASK memory when a mega-cell exists, but every
    probe of that cell still scans all of it; splitting the cell
    makes the quantizer itself balanced, so probe latency and gate
    candidate sets shrink at the source. The IVF skew risk at 100 TB
    is exactly this (`ivf_cell_stats` is the detector; this is the
    repair).

    Per round: assign the corpus to its nearest centroid (one narrow
    argmax-dot pass, no shuffle), count cells (map-side-combined,
    n_cells-bounded), and for every cell with more than
    ``max_cell_rows`` rows pick that cell's 2 md5-hash-order seed
    ROWS as replacement centroids — seed 1 replaces the hot
    centroid in place, seed 2 appends (in ascending hot-cell order,
    so ids are deterministic). All portable arithmetic (same
    hash-order seeding as :func:`_ivf_centroids`, same argmax-dot +
    lower-cell tiebreak as :func:`assign_cells`), so the whole
    trajectory is DuckDB-replayable — the ``emb_ivf_balance``
    registry query carries a FULL oracle. Only the seed rows (2 per
    hot cell, <= 2 x n_cells) ever reach the driver, and the seed
    window's rn<=2 plans a MAP-SIDE ``WindowGroupLimit Partial``
    below the cell exchange (plan-verified), so even the mega-cell
    being split ships only per-task top-2 rows — the hot cell never
    shuffles whole.

    Stops early when no cell is hot, and tracks per-cell progress
    through the split LINEAGE (a split's surviving mass can land on
    either child, including the freshly appended id — both inherit
    the parent's reference size): a DIRECTION-TIGHT cell is
    unsplittable by
    any two in-cell seed rows under argmax-dot — the separator
    dot(v, a−b)=0 passes through the origin, and a tight
    same-direction cluster far from the origin lies entirely on one
    side (measured: a 5.8k-row planted cluster oscillated ±10 rows
    across 8 hash-pair rounds). A hot cell that keeps >=95% of its
    size for a round escalates to the MEAN-SIDEWAYS split: with μ =
    the cell's vector mean and side = seed1 − proj_μ(seed1), the
    pair (μ+side, μ−side) has a−b = 2·side exactly ⊥ μ, so the
    boundary cuts the cluster through its middle on sideways noise
    (numpy-verified 50.2/49.8 on the oscillating cluster; equal
    norms, so no norm bias; in-cell mass still beats foreign
    centroids). Still pure portable arithmetic — one extra
    posexplode-avg over the stuck cells' rows. A cell stuck even
    after its mean-sideways round (side = 0: identical vectors) is
    marked unsplittable and excluded (until a later round moves >5%
    new mass into it, which clears the mark and retries — shifted
    boundaries can make a once-tight cell diverse) — the gates'
    salting caps remain its backstop. ``rounds`` caps the attempts
    and ``round_stats`` (pass a list) records per round
    ``{round, n_cells, hot_cells, max_cell, reflected,
    unsplittable}`` (the last updated after the split loop, so
    'provably unsplittable' and 'budget exhausted' read differently
    in the ledger). Returns the new centroid list — persist it by
    passing ``centroids=`` to :func:`materialize_ivf_index` /
    :func:`materialize_pq_index` (probes reload it from the
    ``_centroids`` table, so the split quantizer is what every later
    batch probes)."""
    from dataprocessingframework_spark.functions.hashing import hash64

    cents = [[float(x) for x in c] for c in centroids]
    nz = corpus.select(
        F.col(id_col).alias("bid"),
        F.col(vec_col).cast("array<double>").alias("bv"),
        norm(F.col(vec_col)).alias("bn"),
    ).filter(F.col("bn") > 0)
    # hot-cell LINEAGE state: current cell id -> (reference size,
    # consecutive no-progress rounds). A split's surviving mass can
    # land on EITHER child — the replaced parent id or the appended
    # id (measured: a dominant-norm seed2 takes the whole cell, so
    # the hot mass hops to a brand-new id every round, which any
    # per-id tracker misses) — so after a split BOTH children
    # inherit the parent's reference size and counter.
    hot_state: dict[int, tuple[int, int]] = {}
    # cell id -> size at the moment it was marked unsplittable; a
    # later round that moves meaningfully MORE mass into the cell
    # (boundaries shift when other centroids are replaced) clears
    # the mark and retries — the new mass may be diverse and
    # splittable even though the original was not
    unsplittable: dict[int, int] = {}
    for r in range(rounds):
        assigned = assign_cells(nz, cents, "bid", "bv", n_probe=1,
                                impl=impl)
        sizes = {
            row.cell: row.n
            for row in assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # per-lineage progress: a hot cell that kept >=95% of its
        # ancestor's size made no real progress — escalate it to the
        # mean-sideways split; stuck even after that round, mark it
        # unsplittable and stop burning rounds on it (the gates'
        # salting caps remain its backstop).
        hot_state, stuck = update_hot_lineage(
            sizes, max_cell_rows, hot_state, unsplittable
        )
        hot = sorted(
            c
            for c, n in sizes.items()
            if n > max_cell_rows and c not in unsplittable
        )
        if round_stats is not None:
            round_stats.append(
                {
                    "round": r,
                    "n_cells": len(cents),
                    "hot_cells": len(hot),
                    "max_cell": max(sizes.values()) if sizes else 0,
                    "reflected": len(stuck & set(hot)),
                    "unsplittable": len(unsplittable),
                }
            )
        if not hot:
            break
        w = Window.partitionBy("cell").orderBy("h", "bid")
        seeds = (
            assigned.filter(F.col("cell").isin(hot))
            .withColumn("h", hash64(F.col("bid").cast("string")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("cell", "rn", "bv")
            .collect()
        )
        by_cell: dict[int, dict[int, list[float]]] = {}
        for row in seeds:
            by_cell.setdefault(int(row.cell), {})[int(row.rn)] = [
                float(x) for x in row.bv
            ]
        mus: dict[int, list[float]] = {}
        stuck_hot = sorted(stuck & set(hot))
        if stuck_hot:
            # per-cell vector means for the escalated cells: one
            # posexplode-avg over only those cells' rows, a
            # |stuck| x dim result
            acc: dict[int, dict[int, float]] = {}
            for row in (
                assigned.filter(F.col("cell").isin(stuck_hot))
                .select("cell", F.posexplode("bv").alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.avg("x").alias("m"))
                .collect()
            ):
                acc.setdefault(int(row.cell), {})[int(row.pos)] = float(
                    row.m
                )
            mus = {
                c: [d[i] for i in range(len(d))] for c, d in acc.items()
            }
        new_cents = list(cents)
        appended = []
        for c in hot:
            picks = by_cell.get(c, {})
            if 1 not in picks:
                continue
            s1 = picks[1]
            if c in stuck:
                # hash pairs cannot cut this cell: mean-sideways
                # split — boundary exactly ⊥ the cell mean, cutting
                # a tight cluster through its middle
                mu = mus.get(c)
                if mu is None:
                    continue
                mn2 = sum(x * x for x in mu)
                if mn2 <= 0:
                    unsplittable[c] = sizes[c]
                    continue
                k2 = sum(a * b for a, b in zip(s1, mu)) / mn2
                side = [a - k2 * b for a, b in zip(s1, mu)]
                if all(x == 0.0 for x in side):
                    # no sideways component (identical-vector cell):
                    # provably uncuttable, stop trying
                    unsplittable[c] = sizes[c]
                    continue
                s1 = [m + s for m, s in zip(mu, side)]
                s2 = [m - s for m, s in zip(mu, side)]
            else:
                if 2 not in picks:
                    continue
                s2 = picks[2]
            child = len(cents) + len(appended)
            new_cents[c] = s1
            appended.append(s2)
            # both children inherit the lineage state: wherever the
            # surviving mass lands next round, it is measured
            # against THIS cell's size
            hot_state[child] = hot_state[c]
        if round_stats is not None and round_stats:
            # marks made inside the split loop (side == 0 cells)
            # must be ledger-visible: 'provably unsplittable' and
            # 'round budget exhausted' read differently
            round_stats[-1]["unsplittable"] = len(unsplittable)
        if not appended and all(
            new_cents[i] == cents[i] for i in range(len(cents))
        ):
            break  # nothing left that can move
        cents = new_cents + appended
    return cents


def materialize_ivf_index(
    corpus: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 1,
    impl: str = "blas",
    centroids: list[list[float]] | None = None,
    num_buckets: int = 16,
    path: str | None = None,
    mode: str = "overwrite",
    sq8: bool = False,
    clamp_stats: dict | None = None,
    balance_cell_rows: int | None = None,
    prefix_dims: int | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Persist the IVF inverted lists: every corpus vector with its
    nearest-centroid ``cell``, hash-BUCKETED on the single ``cell``
    column, plus the trained coarse quantizer in ``{table}_centroids``.

    Single-column bucketing on ``cell`` is deliberate: Spark's bucket
    pruning applies ``cell IN (...)`` probe filters at FILE
    granularity, so a probe batch reads only the bucket files holding
    its probed cells — ~n_probe/n_cells of a 100 TB index, which is
    the entire IVF bargain. Rows carry ``vnorm`` so corpus norms are
    computed once at build, not per probe batch; zero-norm vectors
    (undefined cosine) are excluded at build. The quantizer is
    trained once here (``iters`` Lloyd rounds — the expensive part at
    scale) and reloaded via :func:`load_ivf_centroids` for every
    later probe batch. Returns (index frame, centroids).

    ``sq8=True`` stores SQ8 scalar-quantized codes instead of the
    float vectors — at 100 TB the index IS the scan cost, and codes
    cut the stored payload ~3.6x (7 codes packed per bigint word;
    measured bytes in PLANS.md "r10 SQ8 IVF index"). Rows become
    (cell, vec_id, codes array<bigint>, vnorm) with ``vnorm`` the
    norm of the DEQUANTIZED midpoint vector, so probe cosines are
    internally consistent for the stored approximation; per-dim
    bounds persist in ``{table}_sq8`` and reload via
    :func:`load_sq8_bounds`. Cell assignment still uses the ORIGINAL
    vectors (the quantizer sees no distortion). Append mode reuses
    the STORED bounds — recomputing on a batch would shift the code
    grid under the existing rows. Probe via
    ``ivf_topk_from_index(..., sq8_bounds=load_sq8_bounds(...))``;
    ranking is approximate within quantization distortion
    (recall-vs-distortion pinned in tests), and the whole path stays
    floor-arithmetic portable — the ``emb_ivf_sq8_topk`` registry
    query carries a FULL DuckDB oracle.

    ``clamp_stats`` (sq8 only, r12 — the runtime signal for the
    append-drift caveat in :func:`incremental_semantic_dedup_sq8`):
    pass a dict and it is filled with ``n_rows`` (encoded rows),
    ``rows_clamped`` (rows with >= 1 dimension outside the stored
    bounds — those dims clamp to the code rails and their dequant
    error exceeds step/2, so the gate's derived margin no longer
    covers them) and ``dims_clamped`` (total such dims). One extra
    batch-sized agg, no corpus scan. Fresh builds report 0 by
    construction (bounds ARE the corpus min/max); a growing
    rows_clamped fraction across appends is the rebuild trigger —
    the failure direction until rebuild is MISSED duplicates, never
    false drops. :func:`streaming.curation.incremental_semantic_ingest`
    echoes this per batch via its ``clamp_log`` hook.

    ``prefix_dims=d_p`` (r13, mutually exclusive with ``sq8``) stores
    the PREFIX compression rung: rows become (cell, vec_id,
    ``prefix`` = the first d_p coordinates, ``rest_norm`` =
    ||v[d_p:]||, ``vnorm``) — a dim/d_p payload cut with NO training,
    codebooks, or quantization grid. The point is the per-pair
    Cauchy-Schwarz bound cos(b,v) <= (<b_p,v_p> + ||b_r||·||v_r||) /
    (||b||·||v||), which :func:`incremental_semantic_dedup_prefix`
    uses as a SOUND stage-1 margin (tighter than SQ8's global bound:
    it adapts per pair, and is exact when either remainder is zero).
    Matryoshka-trained embeddings concentrate mass in the prefix, so
    d_p = dim/4 typically keeps rest_norm/vnorm small and the bound
    tight; the ``{table}_prefix`` companion persists d_p for appends
    (:func:`load_prefix_dims`). Append mode validates the batch's
    vector length against the stored geometry, as SQ8/PQ do.

    ``balance_cell_rows`` (fresh builds only, r12): after training
    the quantizer, run :func:`balance_centroids` with this cap
    before encoding, so the PERSISTED quantizer is the balanced one
    — every later probe/gate/append inherits even cells without the
    caller composing the two calls. Ignored (error) in append mode:
    rebalancing under an existing index would move rows between
    cells without rewriting them."""
    if mode == "append" and balance_cell_rows is not None:
        raise ValueError(
            "balance_cell_rows is a fresh-build option: rebalancing"
            " under an existing index would reassign cells without"
            " rewriting stored rows — rebuild instead"
        )
    if sq8 and prefix_dims is not None:
        raise ValueError(
            "sq8 and prefix_dims are distinct compression rungs —"
            " pick one (stack them by materializing two indexes)"
        )
    from dataprocessingframework_spark.sources.bucketed import (
        write_bucketed,
    )

    if mode == "append":
        # appending a batch extends the inverted lists under the
        # EXISTING quantizer — retraining would silently shift cell
        # boundaries between the old rows and the new ones — and
        # under the existing bucket spec (Spark rejects a mismatch)
        if centroids is None:
            centroids = load_ivf_centroids(corpus.sparkSession, table)
        cents = centroids
        desc = corpus.sparkSession.sql(
            f"DESCRIBE FORMATTED {table}"
        ).collect()
        buckets = [r for r in desc if r.col_name == "Num Buckets"]
        if buckets:
            num_buckets = int(buckets[0].data_type)
        # the existing table's catalog location is authoritative for
        # appends — compact_bucketed_index relocates external index
        # tables, and passing the stale original path would fail the
        # location-match check
        path = None
        if sq8:
            mins, maxs = load_sq8_bounds(corpus.sparkSession, table)
            # same geometry guard as the PQ append path: the stored
            # bounds define dim; a batch with a different vector
            # length would pack null/truncated codes silently
            first = corpus.select(F.size(vec_col)).first()
            if first is not None and first[0] != len(mins):
                raise ValueError(
                    f"append batch dim {first[0]} != stored sq8"
                    f" bounds dim {len(mins)} for {table}"
                )
        existing_cols = corpus.sparkSession.table(table).columns
        if prefix_dims is not None or "rest_norm" in existing_cols:
            stored_dp, stored_dim = load_prefix_dims(
                corpus.sparkSession, table
            )
            known_full_dim = stored_dim
            if prefix_dims is not None and prefix_dims != stored_dp:
                raise ValueError(
                    f"append prefix_dims {prefix_dims} != stored"
                    f" {stored_dp} for {table} — the stored geometry"
                    " is authoritative"
                )
            prefix_dims = stored_dp
            first = corpus.select(F.size(vec_col)).first()
            if first is not None and first[0] != stored_dim:
                raise ValueError(
                    f"append batch dim {first[0]} != stored prefix"
                    f" geometry dim {stored_dim} for {table}"
                )
    else:
        cents = centroids or _ivf_centroids(
            corpus, id_col, vec_col, n_cells, iters, impl=impl
        )
        if balance_cell_rows is not None:
            cents = balance_centroids(
                corpus, cents, balance_cell_rows,
                rounds=8, id_col=id_col, vec_col=vec_col, impl=impl,
            )
        if sq8:
            mins, maxs = _sq8_bounds(
                corpus.select(
                    F.col(vec_col).alias("embedding"),
                    norm(F.col(vec_col)).alias("vnorm"),
                ).filter(F.col("vnorm") > 0),
                "embedding",
            )
    idx = assign_cells(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            norm(F.col(vec_col)).alias("vnorm"),
        ).filter(F.col("vnorm") > 0),
        cents,
        "vec_id",
        "embedding",
        n_probe=1,
        impl=impl,
    )
    if sq8 and clamp_stats is not None:
        # drift telemetry: count dims landing OUTSIDE the stored
        # bounds (they clamp to the code rails, where dequant error
        # exceeds step/2 and the gate margin is no longer sound).
        # For degenerate dims (mx <= mn, everything codes 0) any
        # x != mn is equally uncovered — the x<mn|x>mx test already
        # says exactly that. Statically unrolled like the pack expr;
        # one batch-sized agg.
        cexpr = None
        for i in range(len(mins)):
            x = F.col("embedding")[i].cast("double")
            t = F.when(
                (x < F.lit(mins[i])) | (x > F.lit(maxs[i])), 1
            ).otherwise(0)
            cexpr = t if cexpr is None else cexpr + t
        crow = (
            corpus.select(
                F.col(vec_col).alias("embedding"),
                norm(F.col(vec_col)).alias("vnorm"),
            )
            .filter(F.col("vnorm") > 0)
            .select(cexpr.alias("cd"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("cd") > 0, 1).otherwise(0)).alias("r"),
                F.sum("cd").alias("d"),
            )
            .collect()[0]
        )
        clamp_stats.update(
            n_rows=int(crow.n),
            rows_clamped=int(crow.r or 0),
            dims_clamped=int(crow.d or 0),
        )
    if sq8:
        # vnorm becomes the DEQUANTIZED vector's norm (direct
        # per-dim midpoint exprs — value-identical to unpacking the
        # codes; the pack/unpack round-trip itself is pinned by the
        # probe parity tests), so probe cosines are consistent with
        # what the index actually stores
        dim = len(mins)
        # one parsed SQL expression (r16, see _sq8_code_sql): the
        # py4j form issued ~15 round-trips per dimension per build
        deq = F.expr(
            "array(" + ", ".join(
                f"{_finite_d(mins[i], f'sq8 min[{i}]')} + "
                f"(CAST({_sq8_code_sql('embedding', mins, maxs, i)}"
                " AS DOUBLE) + 0.5D) * "
                + _finite_d(
                    (maxs[i] - mins[i]) / float(SQ8_LEVELS),
                    f"sq8 step[{i}]",
                )
                for i in range(dim)
            ) + ")"
        )
        idx = idx.select(
            "cell",
            "vec_id",
            _sq8_pack_expr("embedding", mins, maxs).alias("codes"),
            norm(deq).alias("vnorm"),
        )
    elif prefix_dims is not None:
        if mode == "append":
            # the append guard above already probed + validated the
            # batch dim against the stored geometry — don't pay a
            # second corpus job per ingest micro-batch
            full_dim = known_full_dim
        else:
            first = corpus.select(F.size(vec_col)).first()
            full_dim = (
                int(first[0]) if first is not None else prefix_dims + 1
            )
        if not (1 <= prefix_dims < full_dim):
            raise ValueError(
                f"prefix_dims must be in [1, dim): got {prefix_dims}"
                f" for dim {full_dim}"
            )
        idx = idx.select(
            "cell",
            "vec_id",
            F.expr(f"slice(embedding, 1, {prefix_dims})").alias("prefix"),
            norm(
                F.expr(
                    f"slice(embedding, {prefix_dims + 1},"
                    " size(embedding))"
                )
            ).alias("rest_norm"),
            "vnorm",
        )
    else:
        idx = idx.select("cell", "vec_id", "embedding", "vnorm")
    write_bucketed(
        idx,
        table,
        ["cell"],
        num_buckets=num_buckets,
        sort_cols=["cell"],
        path=path,
        mode=mode,
    )
    spark = corpus.sparkSession
    if mode != "append":  # append keeps the existing quantizer table
        cent_rows = [
            (c, [float(x) for x in vec]) for c, vec in enumerate(cents)
        ]
        cent_df = _driver_meta_df(
            spark, cent_rows, "cell int, centroid array<double>"
        )
        w = cent_df.write.mode(mode).format("parquet")
        if path:
            w = w.option("path", f"{path}_centroids")
        w.saveAsTable(f"{table}_centroids")
        if sq8:
            b_df = _driver_meta_df(
                spark,
                [(mins, maxs, SQ8_LEVELS)],
                "mins array<double>, maxs array<double>, levels int",
            )
            wb = b_df.write.mode(mode).format("parquet")
            if path:
                wb = wb.option("path", f"{path}_sq8")
            wb.saveAsTable(f"{table}_sq8")
        if prefix_dims is not None:
            p_df = _driver_meta_df(
                spark,
                [(int(prefix_dims), int(full_dim))],
                "dims int, full_dim int",
            )
            wp = p_df.write.mode(mode).format("parquet")
            if path:
                wp = wp.option("path", f"{path}_prefix")
            wp.saveAsTable(f"{table}_prefix")
    return spark.table(table), cents


def load_ivf_centroids(spark: SparkSession, table: str) -> list[list[float]]:
    """Reload the coarse quantizer persisted by
    :func:`materialize_ivf_index` (the n_cells x dim matrix — always
    driver-sized)."""
    rows = spark.table(f"{table}_centroids").orderBy("cell").collect()
    # a hard error, not an assert: under ``python -O`` asserts vanish,
    # and a corrupted/duplicated quantizer table would then silently
    # reorder cells and return wrong probe results
    if [r.cell for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"{table}_centroids cell ids are not contiguous 0..n-1: "
            f"{[r.cell for r in rows]!r} — quantizer table corrupted "
            "or double-written; rebuild via materialize_ivf_index"
        )
    return [[float(x) for x in r.centroid] for r in rows]


def ivf_cell_stats(
    assigned: DataFrame,
    n_cells: int,
    cell_col: str = "cell",
) -> DataFrame:
    """One-row cell-balance report over an IVF assignment or
    materialized index — the diagnostic a user needs BEFORE sizing
    ``n_cells``/``n_probe``/``max_cell_rows``: probe latency at scale
    is governed by the largest probed cell (each probe reads whole
    cell buckets), so a skewed quantizer quietly turns p50-fast
    probes into p99-slow ones, and the
    ``incremental_semantic_dedup(max_cell_rows=...)`` salting gate
    should be set from ``max_cell`` here, not guessed. Columns:
    ``n_rows, n_used, n_empty, min_cell, max_cell, avg_cell
    (round 4), top_share`` (largest cell's row fraction, round 4),
    ``imbalance`` (max/avg, round 4 — 1.0 is perfectly balanced;
    empty cells inflate it by shrinking the usable average).

    Scale shape: ONE map-side-combined groupBy(cell) count, then one
    aggregate over the ≤ ``n_cells``-row size table — never
    corpus-sized state, no driver loop. Works on any frame with a
    cell column: a fresh :func:`assign_cells` output, a
    :func:`materialize_ivf_index` table, or a PQ index."""
    sizes = assigned.groupBy(F.col(cell_col)).agg(
        F.count(F.lit(1)).alias("sz")
    )
    used = F.count(F.lit(1))
    return sizes.agg(
        F.sum("sz").alias("n_rows"),
        used.alias("n_used"),
        (F.lit(n_cells) - used).cast("long").alias("n_empty"),
        F.min("sz").alias("min_cell"),
        F.max("sz").alias("max_cell"),
        F.round(F.avg("sz"), 4).alias("avg_cell"),
        F.round(F.max("sz") / F.sum("sz"), 4).alias("top_share"),
        F.round(F.max("sz") / F.avg("sz"), 4).alias("imbalance"),
    )


def rebalance_trigger(
    assigned: DataFrame,
    imbalance_threshold: float,
    max_cell_rows: int,
    cell_col: str = "cell",
) -> dict:
    """Deterministic auto-rebalance DECISION for the skew-repair loop
    (r13 — VERDICT r12 item 4): given any frame with a cell column
    (a maintained index, a fresh :func:`assign_cells` output),
    compute the balance signal and decide whether a
    :func:`balance_centroids` rebuild is warranted. The glue between
    the detector (:func:`ivf_cell_stats`) and the repair
    (:func:`balance_centroids`) that
    ``incremental_semantic_ingest(rebalance_on_imbalance=...)``
    evaluates after every index append.

    ``imbalance`` is max/avg over NON-EMPTY cells (the
    ivf_cell_stats arithmetic — exact integer counts divided in
    float64, portable across engines). ``triggered`` requires BOTH
    ``imbalance > imbalance_threshold`` AND
    ``max_cell > max_cell_rows``: a skewed-but-tiny index needs no
    repair (nothing exceeds the cap, so balance_centroids would
    no-op), and a uniformly-huge one is a capacity problem a split
    cannot fix (splitting a balanced quantizer just reshuffles equal
    mass).

    Scale shape: ONE map-side-combined groupBy(cell) count and one
    aggregate over the ≤ n_cells-row size table; the single returned
    dict is the only driver-resident data."""
    row = (
        assigned.groupBy(F.col(cell_col))
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.sum("sz").alias("n_rows"),
            F.count(F.lit(1)).alias("n_used"),
            F.max("sz").alias("max_cell"),
            F.avg("sz").alias("avg_cell"),
        )
        .collect()[0]
    )
    n_rows = int(row.n_rows or 0)
    max_cell = int(row.max_cell or 0)
    imb = (
        float(row.max_cell) / float(row.avg_cell) if n_rows else 0.0
    )
    return {
        "n_rows": n_rows,
        "n_used": int(row.n_used or 0),
        "max_cell": max_cell,
        "avg_cell": float(row.avg_cell or 0.0),
        "imbalance": imb,
        "triggered": bool(
            imb > imbalance_threshold and max_cell > max_cell_rows
        ),
    }


def ivf_topk_from_index(
    index: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    impl: str = "blas",
    pushdown_probe_cells: bool = False,
    sq8_bounds: tuple[list, list] | None = None,
) -> DataFrame:
    """:func:`ivf_topk` against a prebuilt cell-bucketed index — the
    repeated-probe production path (same output as ivf_topk with the
    same ``centroids``/``n_probe``/``impl``, pinned by tests).

    Queries assign to their n_probe nearest cells (narrow map against
    the driver-held centroid matrix — no quantizer retraining), then
    broadcast-join the index on ``cell``. ``pushdown_probe_cells``
    pushes the batch's distinct probed cells into the index scan as a
    ``cell IN (...)`` predicate (always bounded by n_cells), which
    bucket-prunes whole files on the single-column-bucketed index.
    Default OFF for the same measured reason as
    lsh_topk_from_index's pushdown: warm-cache local scans are
    cheaper than the keys-collect job even at 7.6 %% touched cells on
    a 10M-row index (PLANS.md "r8 ANN probe soak"); opt in on
    cold/object storage with small probed fractions.

    ``sq8_bounds=(mins, maxs)`` (from :func:`load_sq8_bounds`) probes
    an index built with ``sq8=True``: candidate vectors rebuild from
    the packed codes via literal-shift codegen (no UDF) and score
    against the stored dequantized norm — cosines are exact for the
    stored approximation, ranking is approximate within quantization
    distortion."""
    q = assign_cells(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        ),
        centroids,
        "q_id",
        "q_vec",
        n_probe=n_probe,
        impl=impl,
    )
    if pushdown_probe_cells:
        cells = [r.cell for r in q.select("cell").distinct().collect()]
        index = index.filter(F.col("cell").isin(cells))
    if sq8_bounds is not None:
        mins, maxs = sq8_bounds
        if "codes" not in index.columns:
            raise ValueError(
                "sq8_bounds given but the index has no 'codes' column"
                " — build it with materialize_ivf_index(sq8=True)"
            )
        sq8_mode = True
    elif "codes" in index.columns:
        raise ValueError(
            "index stores SQ8 codes — pass sq8_bounds="
            "load_sq8_bounds(spark, table)"
        )
    else:
        sq8_mode = False
    # the query norm is computed on the BROADCAST side — it
    # materializes once per query row when the hash relation builds,
    # instead of re-running the 64-element fold per candidate row
    # (the join output is |candidates|, the broadcast side is |q|)
    q = q.withColumn("q_norm", norm(F.col("q_vec")))
    if sq8_mode:
        # score the packed codes with a statically UNROLLED sum:
        # sum_i q[i] * (mn_i + (code_i + 0.5) * step_i). Left-nested
        # additions keep the exact left-to-right summation order of
        # the aggregate fold (bit-identical results — the DuckDB
        # oracle pins this), while skipping the per-candidate array
        # materialization and the per-element HOF lambda overhead of
        # dot(q_vec, dequant_array) — together with the broadcast-side
        # q_norm, measured 54.1s -> 33.1s on the 1M-row probe
        # (PLANS.md "r10 SQ8 IVF index").
        cos_expr = _sq8_dequant_dot("q_vec", "codes", mins, maxs) / (
            F.col("q_norm") * F.col("c_norm")
        )
        c = index.filter(F.col("vnorm") > 0).select(
            "cell",
            F.col("vec_id").alias("nbr_id"),
            "codes",
            F.col("vnorm").alias("c_norm"),
        )
    else:
        cos_expr = dot(F.col("q_vec"), F.col("c_vec")) / (
            F.col("q_norm") * F.col("c_norm")
        )
        # defensive vnorm>0 (pre-fix persisted indexes), as in the
        # LSH probe
        c = index.filter(F.col("vnorm") > 0).select(
            "cell",
            F.col("vec_id").alias("nbr_id"),
            F.col("embedding").alias("c_vec"),
            F.col("vnorm").alias("c_norm"),
        )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("nbr_id") != F.col("q_id"))
        .select("q_id", "nbr_id", cos_expr.alias("cos_raw"))
        # a MAINTAINED index can hold duplicate (vec_id) rows after a
        # crash-replayed append (harmless to the existential gate, but
        # here a doubled neighbor would displace a distinct real one
        # from top-k) — same guard as the LSH probe's dedup
        .dropDuplicates(["q_id", "nbr_id"])
    )
    return _per_query_topk(scored, k)


def kcenter_select(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    checkpoint_every: int = 16,
    batch_m: int = 1,
    pool_factor: int = 4,
    round_stats: list | None = None,
) -> DataFrame:
    """Greedy farthest-point (k-center) selection over an embedding
    column — the classic diverse-coreset / data-pruning pick: start
    from a deterministic seed (min md5-hash id, the same seedless
    portable sample as the IVF quantizer) and repeatedly take the
    vector with the LARGEST cosine distance to the selected set.
    Returns (sel_rank, vec_id, dist): dist is the selection-time distance
    to the previously selected set (rounded 4; the seed reports the
    max cosine distance 2.0), i.e. the coverage-radius sequence —
    read row k's dist as "every remaining vector is within this of a
    center".

    Scale shape: each of the k rounds is one narrow map (update the
    running min-distance against ONE new center, shipped as a
    literal) plus one global argmax (orderBy-limit-1 = TakeOrdered,
    map-side top-1 per partition); only k single rows and the k x dim
    center matrix ever reach the driver. The min-distance column
    nests one `least` per round, so lineage grows with k —
    ``checkpoint_every`` truncates it with localCheckpoint for large
    k. Keep the cadence at (or below) the default: the r10 soak
    measured FLAT ~1.7s/round marginals at checkpoint_every=16 out
    to k=256 but 8s/round and climbing at 64 — Catalyst re-analysis
    of the un-truncated `least` tree is quadratic in segment depth
    (PLANS.md "r10 k-center soak"). Ties break to the lower id;
    zero-norm vectors are excluded (cosine undefined). Greedy
    k-center is the standard 2-approximation of the optimal cover
    (Gonzalez 1985).

    ``batch_m > 1`` is the large-k path: the per-round cost at
    batch_m=1 is ~one fixed Spark job latency, so exact greedy at
    k in the thousands means hours of sequential driver round-trips
    regardless of cluster size. Pooled batching cuts rounds k ->
    k/batch_m: each round collects the top ``pool_factor * batch_m``
    rows by current min-distance (one TakeOrdered, driver gets a
    pool of that bounded size with vectors) and runs exact greedy
    driver-side WITHIN the pool for batch_m picks — each pick
    updates the pool's min-distances against the freshly picked
    center, so a round never picks batch_m mutual near-duplicates
    (the failure mode of naive take-top-m). Approximation contract:
    a pick can differ from exact greedy only when the true farthest
    point of an intra-round step lies outside the pool; batch_m=1
    reproduces the exact trajectory and stays the default (and the
    oracle-checked path). Within-pool distance updates use float64
    numpy (same arithmetic, summation order may differ from the JVM
    fold in the last ulp).

    ``round_stats`` (batch_m>1 only, r12 — VERDICT r11 item 6, the
    mirror of the CC contraction hook): pass a list and each pooled
    round appends ``{round, picks, min_selected_dist,
    next_global_max, pool_miss}``. ``min_selected_dist`` is the
    round's LAST pick's distance; ``next_global_max`` is the global
    farthest remaining distance observed right after the round (the
    next pool's head — the final round pays one extra TakeOrdered to
    close the ledger). Because min-distances only ever DECREASE,
    ``next_global_max > min_selected_dist`` is a sound WITNESS that
    the true farthest point sat outside the pool when that pick was
    made — exact greedy would have picked it first. Any
    ``pool_miss=True`` round is the cue to raise ``pool_factor``.
    The witness is ONE-SIDED: pool_miss=True is a sound proof of a
    miss, but all-False does NOT certify the exact greedy
    trajectory — ``next_global_max`` is measured only after the
    whole round closes, so a mid-round miss goes unwitnessed when a
    LATER in-round pick collapses the missed point's min-distance
    below ``min_selected_dist`` before the measurement (ADVICE
    r12). All-False means no miss was *observable at round
    granularity* (modulo the documented last-ulp numpy/JVM drift;
    the comparison carries a 1e-9 slack); for a per-pick guarantee
    run ``batch_m=1``, which is exact by construction."""
    from dataprocessingframework_spark.functions.hashing import hash64

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("kid"),
        F.col(vec_col).alias("kv"),
        norm(F.col(vec_col)).alias("kn"),
    ).filter(F.col("kn") > 0)
    seed = (
        base.withColumn("h", hash64(F.col("kid").cast("string")))
        .orderBy("h", "kid")
        .limit(1)
        .collect()[0]
    )

    def dist_to(vec: list[float], vnorm: float) -> Column:
        # engine-exact: the center's norm is reused from the collected
        # row (computed by the same fold), not recomputed driver-side.
        # Built as ONE parsed SQL expression rather than py4j column
        # algebra: the column form costs dim+2 py4j round-trips per
        # center (F.lit per element), which cProfile showed was 10.1s
        # of this operator's 12.5s wall at k=64/dim=64 — 28k driver
        # socket round-trips, zero cluster work (guide §1.1/§5: the
        # driver should do almost no work; here it WAS the job). The
        # parsed tree is arithmetically identical: repr() floats
        # round-trip binary64 exactly through the SQL double literal,
        # and zip_with/aggregate lambdas match dot()'s shape.
        return F.expr(_dist_to_sql(vec, vnorm))

    def _dist_to_sql(vec: list[float], vnorm: float) -> str:
        # _finite_d (ADVICE r16): a non-finite embedding component or
        # center norm fails as a named ValueError, not a parse error
        arr = ",".join(
            _finite_d(x, "kcenter center component") for x in vec
        )
        return (
            "1.0D - aggregate(zip_with(kv, array({arr}), "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            "(acc, v) -> acc + v) / (kn * {vn})"
        ).format(arr=arr, vn=_finite_d(vnorm, "kcenter center norm"))

    selected = [(0, int(seed.kid), 2.0)]
    cur = base.withColumn(
        "mind", dist_to([float(x) for x in seed.kv], float(seed.kn))
    ).filter(F.col("kid") != int(seed.kid))
    if batch_m > 1:
        import numpy as np

        rank, rounds = 1, 0
        prev_round: dict | None = None
        ckpt_rounds = max(1, checkpoint_every // batch_m)

        def close_round(prev: dict, gm: float | None) -> dict:
            # one definition of the miss witness for BOTH the
            # intermediate closes (next pool's head) and the final
            # top-1 close — the 1e-9 slack absorbs numpy/JVM ulp
            # drift in the distance folds
            return {
                **prev,
                "next_global_max": gm,
                "pool_miss": (
                    gm is not None
                    and gm > prev["min_selected_dist"] + 1e-9
                ),
            }

        while rank < k:
            m = min(batch_m, k - rank)
            pool_rows = (
                cur.orderBy(F.desc("mind"), F.asc("kid"))
                .limit(pool_factor * m)
                .collect()
            )
            if round_stats is not None and prev_round is not None:
                # close the PREVIOUS round's ledger with this pool's
                # head = the global max remaining distance after its
                # picks (min-distances only decrease, so a head above
                # the round's last pick is a sound pool-miss witness)
                gm = float(pool_rows[0].mind) if pool_rows else None
                round_stats.append(close_round(prev_round, gm))
                prev_round = None
            if not pool_rows:
                break  # fewer than k usable vectors
            pv = np.array(
                [[float(x) for x in r.kv] for r in pool_rows]
            )
            pn = np.array([float(r.kn) for r in pool_rows])
            pids = np.array([int(r.kid) for r in pool_rows])
            pmind = np.array([float(r.mind) for r in pool_rows])
            picked = []
            for _ in range(min(m, len(pool_rows))):
                mx = pmind.max()
                if not np.isfinite(mx):
                    break
                # tie -> lowest id, same as the distributed ordering
                cand = np.where(pmind == mx)[0]
                i = int(cand[np.argmin(pids[cand])])
                selected.append((rank, int(pids[i]), float(pmind[i])))
                picked.append(i)
                rank += 1
                pmind = np.minimum(
                    pmind, 1.0 - (pv @ pv[i]) / (pn * pn[i])
                )
                pmind[i] = -np.inf
            if not picked:
                break
            if round_stats is not None:
                prev_round = {
                    "round": rounds,
                    "picks": len(picked),
                    "min_selected_dist": float(selected[-1][2]),
                }
            cur = cur.filter(
                ~F.col("kid").isin([int(pids[i]) for i in picked])
            ).withColumn(
                "mind",
                F.least(
                    F.col("mind"),
                    *[
                        dist_to([float(x) for x in pv[i]], float(pn[i]))
                        for i in picked
                    ],
                ),
            )
            rounds += 1
            if rounds % ckpt_rounds == 0:
                cur = cur.localCheckpoint(eager=False)
        if round_stats is not None and prev_round is not None:
            # final round: one extra TakeOrdered (top-1, no vectors
            # needed beyond the head) so the ledger is complete
            top = (
                cur.orderBy(F.desc("mind"), F.asc("kid"))
                .limit(1)
                .collect()
            )
            gm = float(top[0].mind) if top else None
            round_stats.append(close_round(prev_round, gm))
    else:
        for r in range(1, k):
            top_rows = (
                cur.orderBy(F.desc("mind"), F.asc("kid")).limit(1).collect()
            )
            if not top_rows:
                break  # fewer than k usable vectors
            top = top_rows[0]
            selected.append((r, int(top.kid), float(top.mind)))
            cur = cur.filter(F.col("kid") != int(top.kid)).withColumn(
                "mind",
                F.least(
                    F.col("mind"),
                    dist_to([float(x) for x in top.kv], float(top.kn)),
                ),
            )
            if r % checkpoint_every == 0:
                cur = cur.localCheckpoint(eager=False)
    # ROUND in Spark SQL (half-up, matching DuckDB for positives),
    # NOT Python round() (banker's — would diverge on exact .00005s).
    # pandas input takes the Arrow createDataFrame path: the
    # list-of-tuples form pickles rows into a defaultParallelism-way
    # Python RDD, and materializing these k rows then launches one
    # Python worker per core (measured: a 32-task, 8.6 core-s stage
    # for 64 rows — guide §6 Arrow for driver transfers)
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(selected, columns=["sel_rank", "vec_id", "dist"]),
        schema="sel_rank int, vec_id long, dist double",
    ).select("sel_rank", "vec_id", F.round("dist", 4).alias("dist"))


def incremental_semantic_dedup(
    batch: DataFrame,
    corpus: DataFrame | None,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_probe: int = 2,
    impl: str = "jvm",
    broadcast_batch: bool = True,
    corpus_cells: DataFrame | None = None,
    max_cell_rows: int | None = 100_000,
) -> DataFrame:
    """Drop arriving vectors that semantically duplicate the accepted
    corpus: a batch row is removed iff some DIFFERENT-id corpus
    vector in one of its ``n_probe`` nearest IVF cells has cosine >=
    ``threshold``. (Same-id matches never count: ids are globally
    unique by contract, so a same-id hit is the batch meeting its own
    half-applied copy during a replay — counting it would silently
    drop the whole batch on retry.)

    ``corpus_cells`` short-circuits the corpus-side cell assignment:
    pass a frame with (cell, id_col, vec_col, vnorm) — e.g. a
    :func:`materialize_ivf_index` table built with the SAME
    centroids — and the corpus is gated as-is, each vector's cell
    computed ONCE at accept time instead of on every batch.
    The embedding twin of ``dedup.incremental_near_dup`` (which
    gates on text MinHash/Jaccard), and the batch kernel of
    ``streaming.incremental_semantic_ingest``.

    IVF-cell blocking is the scale shape: the corpus is touched only
    through a cell equi-join (corpus rows in their 1 nearest cell,
    batch rows fanned to n_probe cells), never an all-pairs score.
    ``centroids`` is the shared coarse quantizer — train it once
    (:func:`materialize_ivf_index` / :func:`load_ivf_centroids`) and
    reuse it across batches; recomputing per batch would re-scan the
    corpus. Zero-norm vectors never match (cosine undefined): they
    are excluded from scoring on both sides, so zero-norm batch rows
    are always kept. Within-batch duplicates are kept (the
    incremental contract). Returns surviving batch rows, all columns.

    ``broadcast_batch=True`` (default — the batch is by contract the
    small arriving side) broadcasts the probe side, so the cell join
    never shuffles the corpus. This matters doubly here because the
    join key has only n_cells distinct values: a shuffle join on it
    would concentrate each cell's corpus rows in one task. If a bulk
    backfill makes the batch genuinely large, pass False and size
    ``n_cells`` in the thousands so the shuffle join has key
    cardinality to spread.

    ``max_cell_rows`` (blas path, default ON) hard-bounds per-task
    memory against quantizer skew: corpus cells above the cap are
    salted into (cell, salt) sub-blocks before the cogroup — see the
    inline note. Sizing ``n_cells`` well (corpus/500) remains the
    performance lever; the cap is the OOM guard when the data
    distribution refuses to cooperate. Pass None to disable. (With
    the cap on, the corpus side is evaluated twice — once for the
    n_cells-row count agg, once for scoring; both are narrow reads.)
    """
    if corpus_cells is not None:
        c = corpus_cells.select(
            "cell",
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            F.col("vnorm").alias("c_norm"),
        ).filter(F.col("c_norm") > 0)
    else:
        c = assign_cells(
            corpus.select(
                F.col(id_col).alias("c_id"),
                F.col(vec_col).alias("c_vec"),
                norm(F.col(vec_col)).alias("c_norm"),
            ).filter(F.col("c_norm") > 0),
            centroids,
            "c_id",
            "c_vec",
            n_probe=1,
            impl=impl,
        )
    b = assign_cells(
        batch.select(
            F.col(id_col).alias("b_id"),
            F.col(vec_col).alias("b_vec"),
            norm(F.col(vec_col)).alias("b_norm"),
        ).filter(F.col("b_norm") > 0),
        centroids,
        "b_id",
        "b_vec",
        n_probe=n_probe,
        impl=impl,
    )
    if impl == "blas":
        # per-cell matmul instead of a per-pair codegen fold: cogroup
        # (corpus cell members) x (batch probe rows) and score each
        # cell as ONE numpy matmul. Measured necessity (PLANS.md "r8
        # semantic ingest soak"): a 100k-batch-vs-100k-corpus gate at
        # 64 cells is ~6x10^8 pairs — minutes through the JVM fold,
        # seconds as matmuls. Like cosine_topk's blas impl, float
        # summation order differs from the fold in the last ulp —
        # production path; use impl='jvm' for oracle-exact parity.
        #
        # max_cell_rows (default ON) is the per-task memory cap: a
        # skewed quantizer concentrates a near-dup-heavy corpus in few
        # cells — exactly when the gate runs — and applyInPandas
        # materializes a WHOLE group in one Python worker, so an
        # uncapped mega-cell is an executor OOM no matter how the
        # matmul is chunked. Corpus cells larger than max_cell_rows
        # are salted into ceil(n/max) (cell, salt) sub-blocks and the
        # batch probe rows fan to every sub-block of their cell;
        # the threshold decision is existential (ANY corpus hit drops
        # the row), so corpus-side splitting is semantics-free — the
        # distinct() below unions sub-block verdicts. Same discipline
        # as max_bucket_size in the LSH tier. Inside each sub-block
        # the matmul additionally chunks over batch rows so the sims
        # matrix stays <=2^24 doubles (~128 MB) even under a bulk
        # backfill batch.
        c_g, b_g, keys = _salt_cell_blocks(c, b, "c_id", "cell", max_cell_rows)
        import numpy as np
        import pandas as pd

        def gate(cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
            if len(cpdf) == 0 or len(bpdf) == 0:
                return pd.DataFrame({"b_id": pd.Series([], dtype="int64")})
            cm = np.stack(cpdf["c_vec"].values).astype(np.float64)
            cn = cpdf["c_norm"].values.astype(np.float64)
            cids = cpdf["c_id"].values
            bids_all = bpdf["b_id"].values
            hits = []
            step = max(1, (1 << 24) // len(cpdf))
            for lo in range(0, len(bpdf), step):
                bm = np.stack(
                    bpdf["b_vec"].values[lo : lo + step]
                ).astype(np.float64)
                bn = bpdf["b_norm"].values[lo : lo + step].astype(
                    np.float64
                )
                bids = bids_all[lo : lo + step]
                sims = (bm @ cm.T) / np.outer(bn, cn)
                not_self = bids[:, None] != cids[None, :]
                hit = ((sims >= threshold) & not_self).any(axis=1)
                hits.append(bids[hit])
            return pd.DataFrame(
                {"b_id": np.concatenate(hits).astype("int64")}
            )

        dup_ids = (
            c_g.groupby(*keys)
            .cogroup(b_g.groupby(*keys))
            .applyInPandas(gate, schema="b_id long")
            .withColumnRenamed("b_id", id_col)
            .distinct()
        )
    else:
        b_side = F.broadcast(b) if broadcast_batch else b
        dup_ids = (
            c.join(b_side, on="cell")
            .filter(F.col("c_id") != F.col("b_id"))
            .filter(
                dot(F.col("b_vec"), F.col("c_vec"))
                / (F.col("b_norm") * F.col("c_norm"))
                >= threshold
            )
            .select(F.col("b_id").alias(id_col))
            .distinct()
        )
    return batch.join(dup_ids, on=id_col, how="left_anti")


def incremental_semantic_dedup_sq8(
    batch: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    index: DataFrame,
    sq8_bounds: tuple[list, list],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    margin: float | None = None,
    n_probe: int = 2,
    impl: str = "jvm",
    pushdown_candidate_ids: bool = False,
    max_cell_rows: int | None = 100_000,
    gate_stats: dict | None = None,
) -> DataFrame:
    """The semantic dedup gate over an SQ8-COMPRESSED corpus index —
    :func:`incremental_semantic_dedup` re-shaped for the deployment
    where the corpus index lives on object storage at 100 TB scale
    and scanning float vectors per arriving batch is the dominant
    cost. Two stages, with the exact gate's semantics provably
    preserved:

    1. **Compressed shortlist**: batch rows fan to their ``n_probe``
       nearest cells and score against the index's packed SQ8 codes
       (the ~3.6-7.7x smaller payload is all that's read); pairs with
       approx cosine >= ``threshold - margin`` become candidates.
    2. **Exact recheck**: ONLY the candidate corpus ids' float
       vectors are fetched (broadcast semi-lookup — the float corpus
       is touched through candidate ids, never scanned) and the drop
       decision is made on the EXACT cosine >= ``threshold``.

    With ``margin=None`` (default) a SOUND margin is derived from the
    stored bounds and the index's minimum vnorm via
    :func:`sq8_gate_margin`, making the output IDENTICAL to the
    exact gate (pinned in tests): stage 1 can only over-approximate
    the candidate set, and stage 2 is exact. Pass a smaller measured
    margin to trade a bounded false-negative rate for a shorter
    shortlist when the sound bound is too loose for the corpus
    (report the rate with the ``emb_gate_recall`` audit pattern).
    Same-id pairs never count (replay contract), zero-norm batch
    rows are always kept, within-batch duplicates are kept — all as
    in the exact gate. ``index`` is a
    ``materialize_ivf_index(sq8=True)`` table built with the SAME
    ``centroids``; ``corpus`` is the accepted float corpus used only
    for the recheck.

    Soundness caveat for APPENDED indexes: the margin bound assumes
    every stored vector lies within the persisted bounds (true by
    construction for a fresh build — bounds are the corpus min/max).
    ``materialize_ivf_index(mode='append')`` clamps out-of-range
    batch values to the stored code rails, and a clamped dimension's
    dequant error can exceed step/2, so a heavily drifted appended
    vector may evade stage 1 — the failure direction is a MISSED
    duplicate (row kept that the exact gate would drop), never a
    false drop. Under distribution drift, widen ``margin`` or
    rebuild the index so the bounds re-cover the corpus.

    ``pushdown_candidate_ids`` (opt-in, same tradeoff as the LSH
    probe-key pushdown): collect the distinct candidate corpus ids
    and push them into the float corpus scan as an IN filter, so a
    corpus laid out sorted/bucketed on ``id_col`` prunes row groups
    instead of scanning id+vector columns end to end — the knob that
    keeps the recheck's IO candidate-sized at 100 TB. Costs one
    driver round-trip holding the distinct id list (candidate-set
    bounded: ~|batch| x per-row shortlist); leave off for bulk
    backfill batches.

    ``impl``: 'jvm' scores stage 1 with the unrolled codegen fold —
    bit-portable, the oracle-exact path. 'blas' cogroups per cell and
    decodes+scores each cell as one vectorized shift/mask + matmul
    (``max_cell_rows`` salting bounds group size, as in the float
    gate) — the production default for big batches; numpy summation
    order can move an ulp-borderline CANDIDATE, which the margin
    slack absorbs — the kept set is still decided by the exact
    stage 2 and equals the jvm path's."""
    mins, maxs = sq8_bounds
    if "codes" not in index.columns:
        raise ValueError(
            "index has no 'codes' column — build it with"
            " materialize_ivf_index(sq8=True)"
        )
    if margin is None:
        row = index.filter(F.col("vnorm") > 0).agg(
            F.min("vnorm")
        ).collect()[0]
        if row[0] is None:
            # no scoreable rows: stage 1 yields nothing, but any
            # degenerate (vnorm<=0) rows still route to the exact
            # recheck via _degenerate_recon_candidates below
            margin = 0.0
        else:
            margin = sq8_gate_margin(mins, maxs, float(row[0]))
    b = assign_cells(
        batch.select(
            F.col(id_col).alias("b_id"),
            F.col(vec_col).alias("b_vec"),
            norm(F.col(vec_col)).alias("b_norm"),
        ).filter(F.col("b_norm") > 0),
        centroids,
        "b_id",
        "b_vec",
        n_probe=n_probe,
        impl=impl,
    )
    c = index.filter(F.col("vnorm") > 0).select(
        "cell",
        F.col("vec_id").alias("c_id"),
        "codes",
        F.col("vnorm").alias("c_norm"),
    )
    if impl == "blas":
        # cogrouped per-cell stage 1 (production default shape, like
        # the float gate's blas path): decode the packed codes with
        # ONE vectorized shift/mask per cell group and score as one
        # matmul — the per-pair codegen fold below is the oracle-
        # exact path but pays dim multiply-adds per candidate pair
        # interpreted per row. Same max_cell_rows salting contract as
        # incremental_semantic_dedup; numpy summation order can move
        # a borderline candidate by an ulp, which the margin slack
        # absorbs (stage 2 decides exactly either way).
        import numpy as np
        import pandas as pd

        mins_a = np.array(mins, dtype=np.float64)
        steps_a = (
            np.array(maxs, dtype=np.float64) - mins_a
        ) / float(SQ8_LEVELS)
        dim = len(mins)
        w_idx = np.arange(dim) // _SQ8_PER_WORD
        shifts = (np.arange(dim) % _SQ8_PER_WORD) * 8
        thr = threshold - margin
        c_g, b_g, keys = _salt_cell_blocks(
            c, b, "c_id", "cell", max_cell_rows
        )

        def stage1(cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "b_id": pd.Series([], dtype="int64"),
                    "c_id": pd.Series([], dtype="int64"),
                }
            )
            if len(cpdf) == 0 or len(bpdf) == 0:
                return empty
            words = np.stack(
                [np.asarray(x, dtype=np.int64) for x in cpdf["codes"]]
            )
            codes = (words[:, w_idx] >> shifts) & 255
            recon = mins_a + (codes.astype(np.float64) + 0.5) * steps_a
            cn = cpdf["c_norm"].values.astype(np.float64)
            cids = cpdf["c_id"].values
            bids_all = bpdf["b_id"].values
            outs = []
            step = max(1, (1 << 24) // max(len(cpdf), 1))
            for lo in range(0, len(bpdf), step):
                bm = np.stack(
                    bpdf["b_vec"].values[lo : lo + step]
                ).astype(np.float64)
                bn = bpdf["b_norm"].values[lo : lo + step].astype(
                    np.float64
                )
                bids = bids_all[lo : lo + step]
                sims = (bm @ recon.T) / np.outer(bn, cn)
                mask = (sims >= thr) & (
                    bids[:, None] != cids[None, :]
                )
                bi, ci = np.nonzero(mask)
                if len(bi):
                    outs.append(
                        pd.DataFrame(
                            {
                                "b_id": bids[bi].astype("int64"),
                                "c_id": cids[ci].astype("int64"),
                            }
                        )
                    )
            return pd.concat(outs) if outs else empty

        cand = (
            c_g.groupby(*keys)
            .cogroup(b_g.groupby(*keys))
            .applyInPandas(stage1, schema="b_id long, c_id long")
            .distinct()
        )
    else:
        approx_cos = _sq8_dequant_dot("b_vec", "codes", mins, maxs) / (
            F.col("b_norm") * F.col("c_norm")
        )
        # skinny (b_id, c_id) candidate pairs; distinct also collapses
        # a crash-replayed append's duplicate index rows
        cand = (
            c.join(F.broadcast(b), on="cell")
            .filter(F.col("c_id") != F.col("b_id"))
            .filter(approx_cos >= F.lit(threshold - margin))
            .select("b_id", "c_id")
            .distinct()
        )
    cand = _degenerate_recon_candidates(index, b, cand)
    return _exact_gate_recheck(
        batch, corpus, cand, id_col, vec_col, threshold,
        pushdown_candidate_ids, gate_stats=gate_stats,
    )


def _exact_gate_recheck(
    batch: DataFrame,
    corpus: DataFrame,
    cand: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    pushdown_candidate_ids: bool,
    gate_stats: dict | None = None,
) -> DataFrame:
    """Stage 2 of the compressed gates: fetch ONLY the shortlisted
    (b_id, c_id) pairs' corpus float vectors (broadcast semi-lookup,
    optional candidate-id scan pushdown) and drop batch rows with an
    exact cosine >= threshold witness. Shared by the SQ8 and PQ
    gates — the exactness of this stage is what makes their stage-1
    margins a superset filter rather than a verdict.

    ``gate_stats`` (opt-in): filled with ``stage1_candidates`` (the
    shortlisted pair count — the number whose explosion signals a
    margin collapse at runtime, the thing the sizing reports predict
    offline) and ``distinct_corpus_ids`` (the corpus rows stage 2
    actually fetches). Costs one localCheckpoint + count of the
    skinny pair frame; leave off on hot paths."""
    src = corpus
    if gate_stats is not None:
        cand = cand.localCheckpoint()
        gate_stats["stage1_candidates"] = cand.count()
        gate_stats["distinct_corpus_ids"] = (
            cand.select("c_id").distinct().count()
        )
    if pushdown_candidate_ids:
        # materialize the skinny pair set once; it is consumed twice
        # (id collect + recheck join) and recomputing it would re-run
        # the stage-1 scoring
        cand = cand.localCheckpoint()
        ids = [r.c_id for r in cand.select("c_id").distinct().collect()]
        if not ids:
            return batch
        src = corpus.filter(F.col(id_col).isin(ids))
    cvec = src.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    ).filter(F.col("c_norm") > 0)
    bvec = batch.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        norm(F.col(vec_col)).alias("b_norm"),
    )
    # no broadcast hint on the candidate join: in the normal regime
    # the pair set is skinny and AQE converts it to a runtime
    # broadcast (corpus never shuffles); in the degenerate regime —
    # e.g. the PQ gate over codebooks that reconstruct this corpus
    # poorly, where per-row margins collapse and the candidate set
    # approaches |batch| x cell size — a forced broadcast would
    # OOM/stall the driver, and a shuffle join is the correct plan
    dup_ids = (
        cvec.join(cand, on="c_id")
        .join(F.broadcast(bvec), on="b_id")
        .filter(
            dot(F.col("b_vec"), F.col("c_vec"))
            / (F.col("b_norm") * F.col("c_norm"))
            >= threshold
        )
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return batch.join(dup_ids, on=id_col, how="left_anti")


def incremental_semantic_dedup_prefix(
    batch: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    index: DataFrame,
    prefix_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    margin: float = 0.0,
    n_probe: int = 2,
    impl: str = "jvm",
    pushdown_candidate_ids: bool = False,
    max_cell_rows: int | None = 100_000,
    gate_stats: dict | None = None,
) -> DataFrame:
    """The semantic dedup gate over a PREFIX-compressed corpus index
    (r13) — the dim/d_p rung of the compression ladder, between the
    float gate and SQ8. The index stores each vector's first
    ``prefix_dims`` coordinates plus the scalar norm of the REMAINDER
    (``materialize_ivf_index(prefix_dims=...)``); stage 1 scores the
    per-pair Cauchy-Schwarz upper bound

        cos(b, v) = (<b_p, v_p> + <b_r, v_r>) / (||b||·||v||)
                 <= (<b_p, v_p> + ||b_r||·||v_r||) / (||b||·||v||)

    and shortlists pairs whose BOUND reaches ``threshold - margin``;
    stage 2 (shared :func:`_exact_gate_recheck`) fetches only the
    shortlisted float vectors and decides exactly. Because the bound
    can only over-estimate the true cosine, ``margin=0.0`` is already
    SOUND — the kept set equals the exact gate's with no derived
    global slack at all (contrast SQ8's corpus-wide
    :func:`sq8_gate_margin`): the bound is PER PAIR, exact whenever
    either remainder is zero, and tightens as the embedding
    concentrates mass in the prefix (matryoshka-trained embeddings
    are the design target; for generic embeddings the
    ``emb_gate_prefix_report`` registry query sizes the rest-mass
    distribution before committing to a d_p). A positive ``margin``
    only WIDENS the shortlist (audit headroom); narrowing below 0 is
    rejected — it would trade soundness silently.

    Same contracts as the sibling rungs: same-id pairs never count,
    zero-norm batch rows are always kept, within-batch duplicates are
    kept, degenerate stored rows (vnorm <= 0) route unconditionally
    to the exact recheck, 'jvm' stage 1 is the bit-portable
    oracle-exact fold and 'blas' cogroups per cell into one matmul
    with ``max_cell_rows`` salting."""
    if margin < 0:
        raise ValueError(
            "prefix gate margin must be >= 0 — the Cauchy-Schwarz"
            " bound is already sound at 0; a negative margin would"
            " silently trade missed duplicates"
        )
    for col in ("prefix", "rest_norm"):
        if col not in index.columns:
            raise ValueError(
                f"index has no {col!r} column — build it with"
                " materialize_ivf_index(prefix_dims=...)"
            )
    dp = int(prefix_dims)
    # geometry guard: the jvm bound's zip_with dot would evaluate to
    # NULL on mismatched prefix lengths, silently emptying stage 1
    # and KEEPING every duplicate — probe one stored row and fail
    # loudly instead (the dispatcher loads dp from the companion
    # table, but this public API can be called with a bare int)
    stored = index.select(F.size("prefix")).first()
    if stored is not None and int(stored[0]) != dp:
        raise ValueError(
            f"prefix_dims {dp} != the index's stored prefix length"
            f" {int(stored[0])} — the stored geometry is"
            " authoritative (load_prefix_dims)"
        )
    b = assign_cells(
        batch.select(
            F.col(id_col).alias("b_id"),
            F.col(vec_col).alias("b_vec"),
            norm(F.col(vec_col)).alias("b_norm"),
        ).filter(F.col("b_norm") > 0),
        centroids,
        "b_id",
        "b_vec",
        n_probe=n_probe,
        impl=impl,
    ).select(
        "cell",
        "b_id",
        F.expr(f"slice(b_vec, 1, {dp})").alias("b_prefix"),
        norm(
            F.expr(f"slice(b_vec, {dp + 1}, size(b_vec))")
        ).alias("b_rest"),
        "b_norm",
    )
    c = index.filter(F.col("vnorm") > 0).select(
        "cell",
        F.col("vec_id").alias("c_id"),
        F.col("prefix").alias("c_prefix"),
        F.col("rest_norm").alias("c_rest"),
        F.col("vnorm").alias("c_norm"),
    )
    thr = threshold - margin
    if impl == "blas":
        import numpy as np
        import pandas as pd

        c_g, b_g, keys = _salt_cell_blocks(
            c, b, "c_id", "cell", max_cell_rows
        )

        def stage1(cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "b_id": pd.Series([], dtype="int64"),
                    "c_id": pd.Series([], dtype="int64"),
                }
            )
            if len(cpdf) == 0 or len(bpdf) == 0:
                return empty
            cp = np.stack(cpdf["c_prefix"].values).astype(np.float64)
            cr = cpdf["c_rest"].values.astype(np.float64)
            cn = cpdf["c_norm"].values.astype(np.float64)
            cids = cpdf["c_id"].values
            bp = np.stack(bpdf["b_prefix"].values).astype(np.float64)
            br = bpdf["b_rest"].values.astype(np.float64)
            bn = bpdf["b_norm"].values.astype(np.float64)
            bids = bpdf["b_id"].values
            bound = (bp @ cp.T + np.outer(br, cr)) / np.outer(bn, cn)
            mask = (bound >= thr) & (bids[:, None] != cids[None, :])
            bi, ci = np.nonzero(mask)
            if not len(bi):
                return empty
            return pd.DataFrame(
                {
                    "b_id": bids[bi].astype("int64"),
                    "c_id": cids[ci].astype("int64"),
                }
            )

        cand = (
            c_g.groupby(*keys)
            .cogroup(b_g.groupby(*keys))
            .applyInPandas(stage1, schema="b_id long, c_id long")
            .distinct()
        )
    else:
        bound = (
            dot(F.col("b_prefix"), F.col("c_prefix"))
            + F.col("b_rest") * F.col("c_rest")
        ) / (F.col("b_norm") * F.col("c_norm"))
        cand = (
            c.join(F.broadcast(b), on="cell")
            .filter(F.col("c_id") != F.col("b_id"))
            .filter(bound >= F.lit(thr))
            .select("b_id", "c_id")
            .distinct()
        )
    cand = _degenerate_recon_candidates(
        index, b.select("cell", "b_id"), cand
    )
    return _exact_gate_recheck(
        batch, corpus, cand, id_col, vec_col, threshold,
        pushdown_candidate_ids, gate_stats=gate_stats,
    )


def incremental_semantic_dedup_pq(
    batch: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    index: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    extra_margin: float = 0.0,
    n_probe: int = 2,
    impl: str = "jvm",
    pushdown_candidate_ids: bool = False,
    max_cell_rows: int | None = 100_000,
    gate_stats: dict | None = None,
) -> DataFrame:
    """The semantic dedup gate over an IVF-PQ corpus index — the
    16 B/vector rung made gate-capable by a PER-ROW sound margin.
    PQ's codebook error is unbounded corpus-wide (unlike SQ8's
    bounds-derived step/2), but the index stores each row's actual
    reconstruction residual ``resid = ‖v − v̂‖`` (8 B/row, computed
    at encode time), and the same perturbation inequality as
    :func:`sq8_gate_margin` gives a per-row bound
    |cos(q,v) − cos(q,v̂)| ≤ 2·resid/‖v̂‖ — so stage 1 keeps pairs
    with approx cosine ≥ threshold − 2·resid_c/vnorm_c and is a
    provable candidate superset, and stage 2
    (:func:`_exact_gate_recheck`) decides on exact cosines: the kept
    set EQUALS the exact gate's (pinned in tests). Per-row margins
    stay sound under ``mode='append'`` — PQ encoding never clamps,
    and each appended row's resid is computed against the stored
    codebooks — so unlike the SQ8 gate there is no drift caveat.
    ``extra_margin`` widens stage 1 uniformly (diagnostics /
    belt-and-suspenders; 0.0 is already sound).

    ``impl='jvm'``: stage-1 scoring is the probe's codebook-lookup
    reconstruction fold — bit-portable, the FULL-oracle path
    (``emb_gate_pq``). ``impl='blas'``: cogrouped per-cell numpy —
    codes gather per subspace + one matmul, ``max_cell_rows``
    salting — the production default; ulp drift only moves
    candidates, never verdicts. Same contracts as the other gates:
    same-id pairs ignored (replay), zero-norm batch rows kept,
    within-batch dups kept."""
    m = len(codebooks)
    sd = len(codebooks[0][0])
    if "resid" not in index.columns:
        raise ValueError(
            "index has no 'resid' column — rebuild it with this"
            " version's materialize_pq_index (the per-row residual"
            " is what makes the PQ gate's margin sound)"
        )
    b = assign_cells(
        batch.select(
            F.col(id_col).alias("b_id"),
            F.col(vec_col).alias("b_vec"),
            norm(F.col(vec_col)).alias("b_norm"),
        ).filter(F.col("b_norm") > 0),
        centroids,
        "b_id",
        "b_vec",
        n_probe=n_probe,
        impl=impl,
    )
    c = index.filter(F.col("vnorm") > 0).select(
        "cell",
        F.col("vec_id").alias("c_id"),
        "codes",
        F.col("vnorm").alias("c_norm"),
        "resid",
    )
    if impl == "blas":
        import numpy as np
        import pandas as pd

        b_books = [
            np.array(codebooks[s], dtype=np.float64) for s in range(m)
        ]
        thr_base = threshold - extra_margin
        c_g, b_g, keys = _salt_cell_blocks(
            c, b, "c_id", "cell", max_cell_rows
        )

        def stage1(cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "b_id": pd.Series([], dtype="int64"),
                    "c_id": pd.Series([], dtype="int64"),
                }
            )
            if len(cpdf) == 0 or len(bpdf) == 0:
                return empty
            words = np.stack(
                [np.asarray(x, dtype=np.int64) for x in cpdf["codes"]]
            )
            recon = np.empty((len(cpdf), m * sd), dtype=np.float64)
            for s in range(m):
                cs = (
                    words[:, s // _SQ8_PER_WORD]
                    >> (8 * (s % _SQ8_PER_WORD))
                ) & 255
                recon[:, s * sd : (s + 1) * sd] = b_books[s][cs]
            cn = cpdf["c_norm"].values.astype(np.float64)
            thr_row = thr_base - 2.0 * cpdf["resid"].values.astype(
                np.float64
            ) / cn
            cids = cpdf["c_id"].values
            bids_all = bpdf["b_id"].values
            outs = []
            step = max(1, (1 << 24) // max(len(cpdf), 1))
            for lo in range(0, len(bpdf), step):
                bm = np.stack(
                    bpdf["b_vec"].values[lo : lo + step]
                ).astype(np.float64)
                bn = bpdf["b_norm"].values[lo : lo + step].astype(
                    np.float64
                )
                bids = bids_all[lo : lo + step]
                sims = (bm @ recon.T) / np.outer(bn, cn)
                mask = (sims >= thr_row[None, :]) & (
                    bids[:, None] != cids[None, :]
                )
                bi, ci = np.nonzero(mask)
                if len(bi):
                    outs.append(
                        pd.DataFrame(
                            {
                                "b_id": bids[bi].astype("int64"),
                                "c_id": cids[ci].astype("int64"),
                            }
                        )
                    )
            return pd.concat(outs) if outs else empty

        cand = (
            c_g.groupby(*keys)
            .cogroup(b_g.groupby(*keys))
            .applyInPandas(stage1, schema="b_id long, c_id long")
            .distinct()
        )
    else:
        recon = F.concat(
            *[
                F.element_at(
                    _nested_array_lit(codebooks[s]),
                    (
                        F.shiftright(
                            F.col("codes")[s // _SQ8_PER_WORD],
                            8 * (s % _SQ8_PER_WORD),
                        ).bitwiseAND(F.lit(255))
                        + 1
                    ).cast("int"),
                )
                for s in range(m)
            ]
        )
        approx_cos = dot(F.col("b_vec"), recon) / (
            F.col("b_norm") * F.col("c_norm")
        )
        row_thr = (
            F.lit(threshold - extra_margin)
            - F.lit(2.0) * F.col("resid") / F.col("c_norm")
        )
        cand = (
            c.join(F.broadcast(b), on="cell")
            .filter(F.col("c_id") != F.col("b_id"))
            .filter(approx_cos >= row_thr)
            .select("b_id", "c_id")
            .distinct()
        )
    cand = _degenerate_recon_candidates(index, b, cand)
    return _exact_gate_recheck(
        batch, corpus, cand, id_col, vec_col, threshold,
        pushdown_candidate_ids, gate_stats=gate_stats,
    )


def _degenerate_recon_candidates(
    index: DataFrame, b: DataFrame, cand: DataFrame
) -> DataFrame:
    """Soundness patch for the compressed gates: an index row whose
    STORED norm is <= 0 (a nonzero vector whose dequant/PQ
    reconstruction collapsed to ~zero — pathological but possible)
    has no defined approximate cosine and its margin bound is
    meaningless, so stage 1 cannot score it. Route every such row as
    an UNCONDITIONAL candidate against each probed batch row of its
    cell — stage 2's exact cosine (against the real float vector,
    which may be perfectly healthy) then decides. The set is empty on
    any sane index, so this costs one empty-side union."""
    deg = index.filter(~(F.col("vnorm") > 0)).select(
        "cell", F.col("vec_id").alias("c_id")
    )
    extra = (
        deg.join(F.broadcast(b.select("cell", "b_id")), on="cell")
        .filter(F.col("c_id") != F.col("b_id"))
        .select("b_id", "c_id")
    )
    return cand.unionByName(extra).distinct()


def semantic_dedup_gate(
    batch: DataFrame,
    corpus: DataFrame | None,
    centroids: list[list[float]],
    index: DataFrame | None = None,
    gate_kind: str = "auto",
    index_table: str | None = None,
    sq8_bounds: tuple[list, list] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    prefix_dims: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_probe: int = 2,
    impl: str = "jvm",
    pushdown_candidate_ids: bool = False,
    max_cell_rows: int | None = 100_000,
    gate_stats: dict | None = None,
    recommend_stats: dict | None = None,
) -> DataFrame:
    """ONE entry point for the semantic dedup gate across the whole
    compression ladder (r12 — VERDICT r11 item 4). The four rungs —
    :func:`incremental_semantic_dedup` (float),
    :func:`incremental_semantic_dedup_prefix` (dim/d_p prefix +
    Cauchy-Schwarz remainder bound, r13),
    :func:`incremental_semantic_dedup_sq8` (7.7x codes) and
    :func:`incremental_semantic_dedup_pq` (16 B/vector) — share one
    contract (same kept set, proven per rung); this dispatcher picks
    the rung from the index you hand it, so pipeline code does not
    change when an index is re-materialized at a different rung.

    ``gate_kind='auto'`` (default) detects from the index's columns:
    no index → the float gate over ``corpus``; ``resid`` column →
    PQ; ``codes`` column → SQ8; ``rest_norm`` column → prefix; a
    float :func:`materialize_ivf_index` table → the float gate with
    ``corpus_cells`` (cells reused, corpus never re-assigned).
    Passing an explicit kind that contradicts the index's columns
    raises instead of silently gating with the wrong arithmetic.

    Sidecars (SQ8 bounds / PQ codebooks) are taken from
    ``sq8_bounds``/``codebooks`` if given, else loaded from
    ``index_table``'s companion tables; ``index_table`` alone also
    suffices for the index itself. ``corpus`` is the accepted FLOAT
    corpus — the compressed rungs touch it only for the exact
    recheck of stage-1 candidates; the float-index rung never reads
    it (pass None there). ``pushdown_candidate_ids`` applies to the
    compressed rungs only (stage 2's IN-pushdown knob), as does
    ``gate_stats`` (opt-in dict filled with stage1_candidates /
    distinct_corpus_ids — the runtime flood signal whose offline
    predictors are the sizing reports; ignored on the float rungs,
    which have no compressed stage 1). Rung choice guidance lives in
    docs/llm_operators.md; size the compressed rungs first with
    ``emb_gate_margin_report`` (SQ8) /
    ``emb_gate_pq_margin_report`` (PQ).

    ``recommend_stats`` (r14, opt-in): pass a dict and it is filled
    with ``{'signals', 'decision', 'rung', 'active_rung'}`` from
    :func:`gate_rung_signals` + :func:`recommend_gate_rung` over the
    FLOAT ``corpus`` (requires it; ``prefix_dims`` defaults to dim/4
    when not given) — the "you are gating on rung X, the picker
    recommends Y" instrument. Telemetry only: the dispatch is always
    decided by the index actually handed in (a recommendation cannot
    re-materialize it); pay one extra two-aggregation corpus pass
    only when you ask."""
    spark = batch.sparkSession
    if index is None and index_table is not None:
        index = spark.table(index_table)
    if gate_kind == "auto":
        if index is None:
            gate_kind = "float"
        elif "resid" in index.columns:
            gate_kind = "pq"
        elif "codes" in index.columns:
            gate_kind = "sq8"
        elif "rest_norm" in index.columns:
            gate_kind = "prefix"
        else:
            gate_kind = "float"
    if gate_kind in ("sq8", "pq", "prefix") and corpus is None:
        raise ValueError(
            f"gate_kind={gate_kind!r} needs the accepted FLOAT corpus"
            " for the exact stage-2 recheck — corpus=None is only"
            " valid for the float-index rung (which never reads it)"
        )
    if recommend_stats is not None:
        if corpus is None:
            raise ValueError(
                "recommend_stats needs the FLOAT corpus (the picker's"
                " signals are corpus-side arithmetic)"
            )
        # prefix_dims=None → gate_rung_signals defaults to dim/4 per
        # row inside its own aggregation (no extra driver action)
        signals = gate_rung_signals(corpus, prefix_dims, vec_col=vec_col)
        decision = recommend_gate_rung(
            threshold=threshold,
            rest_mass_p95=signals["rest_mass_p95"],
            sq8_margin=signals["sq8_margin"],
        )
        recommend_stats.update(
            signals=signals,
            decision=decision,
            rung=decision["rung"],
            active_rung=gate_kind,
        )
    if gate_kind == "pq":
        if index is None or "resid" not in index.columns:
            raise ValueError(
                "gate_kind='pq' needs a materialize_pq_index table"
                " (codes + resid columns)"
            )
        if codebooks is None:
            if index_table is None:
                raise ValueError(
                    "gate_kind='pq' needs codebooks= or index_table="
                    " (to load the persisted codebooks)"
                )
            codebooks = load_pq_codebooks(spark, index_table)
        return incremental_semantic_dedup_pq(
            batch, corpus, centroids, index, codebooks,
            id_col=id_col, vec_col=vec_col, threshold=threshold,
            n_probe=n_probe, impl=impl,
            pushdown_candidate_ids=pushdown_candidate_ids,
            max_cell_rows=max_cell_rows, gate_stats=gate_stats,
        )
    if gate_kind == "sq8":
        if index is None or "codes" not in index.columns:
            raise ValueError(
                "gate_kind='sq8' needs a"
                " materialize_ivf_index(sq8=True) table (codes column)"
            )
        if "resid" in index.columns:
            raise ValueError(
                "index has a resid column — that is a PQ index; use"
                " gate_kind='pq' (SQ8 dequant arithmetic would read"
                " its packed words wrong)"
            )
        if sq8_bounds is None:
            if index_table is None:
                raise ValueError(
                    "gate_kind='sq8' needs sq8_bounds= or index_table="
                    " (to load the persisted bounds)"
                )
            sq8_bounds = load_sq8_bounds(spark, index_table)
        return incremental_semantic_dedup_sq8(
            batch, corpus, centroids, index, sq8_bounds,
            id_col=id_col, vec_col=vec_col, threshold=threshold,
            n_probe=n_probe, impl=impl,
            pushdown_candidate_ids=pushdown_candidate_ids,
            max_cell_rows=max_cell_rows, gate_stats=gate_stats,
        )
    if gate_kind == "prefix":
        if index is None or "rest_norm" not in index.columns:
            raise ValueError(
                "gate_kind='prefix' needs a"
                " materialize_ivf_index(prefix_dims=...) table"
                " (prefix + rest_norm columns)"
            )
        if prefix_dims is None:
            if index_table is None:
                raise ValueError(
                    "gate_kind='prefix' needs prefix_dims= or"
                    " index_table= (to load the persisted geometry)"
                )
            prefix_dims, _ = load_prefix_dims(spark, index_table)
        return incremental_semantic_dedup_prefix(
            batch, corpus, centroids, index, prefix_dims,
            id_col=id_col, vec_col=vec_col, threshold=threshold,
            n_probe=n_probe, impl=impl,
            pushdown_candidate_ids=pushdown_candidate_ids,
            max_cell_rows=max_cell_rows, gate_stats=gate_stats,
        )
    if gate_kind != "float":
        raise ValueError(
            f"unknown gate_kind {gate_kind!r}:"
            " expected 'auto'|'float'|'sq8'|'pq'|'prefix'"
        )
    if index is not None and (
        "codes" in index.columns
        or "resid" in index.columns
        or "rest_norm" in index.columns
    ):
        raise ValueError(
            "gate_kind='float' got a compressed index (codes/resid"
            " columns) — its float cosine arithmetic cannot score"
            " packed codes; use gate_kind='auto'"
        )
    cells = None
    if index is not None:
        cells = index.withColumnRenamed(
            "vec_id", id_col
        ).withColumnRenamed("embedding", vec_col)
    elif corpus is None:
        raise ValueError(
            "the float gate needs corpus= (or a float index /"
            " index_table to gate against)"
        )
    return incremental_semantic_dedup(
        batch, corpus, centroids,
        id_col=id_col, vec_col=vec_col, threshold=threshold,
        n_probe=n_probe, impl=impl, corpus_cells=cells,
        max_cell_rows=max_cell_rows,
    )


def gate_rung_signals(
    corpus: DataFrame,
    prefix_dims: int | None = None,
    vec_col: str = "embedding",
    levels: int = SQ8_LEVELS,
) -> dict:
    """The training-free inputs to :func:`recommend_gate_rung`,
    computed from the float corpus in two metadata-sized aggregations
    (no index needs to exist yet — this is the BEFORE-you-build
    instrument):

    - ``rest_mass_p95``: p95 of ‖v[d_p:]‖/‖v‖ — the prefix rung's
      flood predictor (a pair's Cauchy-Schwarz slack is the product
      of its two rest masses; matryoshka-trained embeddings
      concentrate mass early, random ones sit near
      sqrt(1 − d_p/d));
    - ``delta`` / ``min_vnorm`` / ``sq8_margin``: the SQ8 rung's
      sound derived margin 2Δ/min‖v‖ evaluated on the corpus's own
      per-dim min/max grid (exactly the bounds
      ``materialize_ivf_index(sq8=True)`` would store) — the same
      arithmetic as :func:`sq8_gate_margin`, pre-index.

    PQ has no training-free signal (its per-row margins exist only
    after codebooks are trained — run ``pq_gate_margin_report`` on a
    candidate index instead), so the auto-picker treats PQ as an
    explicit user choice.

    Scale shape: one narrow per-row projection + percentile (rows
    never shuffled), one posexplode → groupBy(pos) whose result is
    dim-sized; the returned dict is the only driver-resident data."""
    base = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    # prefix_dims=None defaults to dim/4 PER ROW (cast truncates) — a
    # plan-time expression, so no extra driver action samples the
    # corpus and an all-null/empty first row cannot crash the default
    start = (
        str(int(prefix_dims) + 1)
        if prefix_dims is not None
        else "cast(size(v) / 4 as int) + 1"
    )
    norms = base.select(
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)
        ).alias("vnorm"),
        F.sqrt(
            F.aggregate(
                F.expr(f"slice(v, {start}, size(v))"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
        ).alias("rest"),
    )
    nrow = norms.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.when(F.col("vnorm") > 0, F.col("vnorm"))).alias(
            "min_vnorm"
        ),
        F.percentile(
            F.when(F.col("vnorm") > 0, F.col("rest") / F.col("vnorm")),
            F.lit(0.95),
        ).alias("rest_mass_p95"),
    ).collect()[0]
    drow = (
        base.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(
            F.sqrt(
                F.sum(
                    F.when(
                        F.col("mx") > F.col("mn"),
                        F.pow(
                            (F.col("mx") - F.col("mn"))
                            / F.lit(float(levels))
                            / F.lit(2.0),
                            F.lit(2.0),
                        ),
                    ).otherwise(F.lit(0.0))
                )
            ).alias("delta")
        )
        .collect()[0]
    )
    min_vnorm = float(nrow.min_vnorm) if nrow.min_vnorm is not None else 0.0
    delta = float(drow.delta or 0.0)
    return {
        "n_rows": int(nrow.n_rows or 0),
        "rest_mass_p95": (
            float(nrow.rest_mass_p95)
            if nrow.rest_mass_p95 is not None
            else None
        ),
        "delta": delta,
        "min_vnorm": min_vnorm,
        "sq8_margin": (
            2.0 * delta / min_vnorm if min_vnorm > 0 else None
        ),
    }


def recommend_gate_rung(
    *,
    threshold: float = 0.95,
    rest_mass_p95: float | None = None,
    sq8_margin: float | None = None,
    pq_margin_p95: float | None = None,
    pq_frac_no_headroom: float | None = None,
    max_rest_mass_p95: float = 0.35,
    max_margin_frac: float = 0.25,
    max_frac_no_headroom: float = 0.05,
) -> dict:
    """Deterministic RUNG-PICKER verdict over the sizing reports (r14
    — VERDICT r13 item 5): the ladder has four rungs and three
    FULL-oracled instruments (``gate_rung_signals`` /
    ``emb_gate_prefix_report`` for prefix, ``emb_gate_margin_report``
    for SQ8, ``pq_gate_margin_report`` for PQ), and until now picking
    was a human reading them. This turns the report columns into a
    verdict with every cutoff an explicit argument — the
    ``rebalance_trigger`` pattern: pure scalar arithmetic, the dict
    is the whole output, trivially oracle-able.

    Viability per rung (a rung whose signal was not supplied is NOT
    viable — no silent guessing):

    - ``prefix``: ``rest_mass_p95 <= max_rest_mass_p95``. A pair's
      stage-1 over-estimate is the product of its two rest masses,
      so at p95 the slack is ~rest_mass_p95² (0.35 → ~0.12) — small
      enough that stage 1 still prunes; random embeddings
      (rest mass ≈ sqrt(1 − d_p/d)) fail this, matryoshka corpora
      pass.
    - ``sq8``: ``sq8_margin <= max_margin_frac * threshold`` — the
      global derived margin must leave stage 1 most of its
      threshold (0.25·0.95 ≈ 0.24 of budget at the defaults).
    - ``pq``: BOTH ``pq_margin_p95 <= max_margin_frac * threshold``
      AND ``pq_frac_no_headroom <= max_frac_no_headroom`` — the
      per-row margins are only as good as their tail.

    ``rung`` is the MOST-COMPRESSED viable rung (pq 16 B < sq8 ~1 B/
    dim < prefix d_p/d floats < float), falling back to ``float``
    (always sound — the other rungs buy space, never correctness)."""
    budget = max_margin_frac * threshold
    viable_prefix = (
        rest_mass_p95 is not None and rest_mass_p95 <= max_rest_mass_p95
    )
    viable_sq8 = sq8_margin is not None and sq8_margin <= budget
    viable_pq = (
        pq_margin_p95 is not None
        and pq_frac_no_headroom is not None
        and pq_margin_p95 <= budget
        and pq_frac_no_headroom <= max_frac_no_headroom
    )
    if viable_pq:
        rung = "pq"
    elif viable_sq8:
        rung = "sq8"
    elif viable_prefix:
        rung = "prefix"
    else:
        rung = "float"
    return {
        "rung": rung,
        "viable_prefix": viable_prefix,
        "viable_sq8": viable_sq8,
        "viable_pq": viable_pq,
        "margin_budget": budget,
    }


def pq_gate_margin_report(
    index: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """One-row sizing report for the PQ-compressed gate — the go/no-go
    instrument BEFORE switching a production gate to the 16 B rung
    (:func:`incremental_semantic_dedup_pq`). Unlike the SQ8 gate's
    single global margin (2Δ/min‖v‖ — ``emb_gate_margin_report``),
    the PQ gate's stage-1 margin is PER-ROW (2·resid/‖v̂‖) and
    collapses exactly when the codebooks reconstruct the corpus
    poorly — a regime invisible until stage 1 floods. This report is
    pure arithmetic over the index's stored ``resid``/``vnorm``
    columns (one map-side-combined agg, never a corpus re-scan):

    - ``n_rows`` / ``n_degenerate``: index rows, and rows whose
      reconstruction norm collapsed to <= 0 (unscoreable in stage 1,
      routed unconditionally to the exact recheck);
    - ``resid_p50/p95/max``: the reconstruction-residual distribution
      (the raw quantization-quality signal; compare to mean_vnorm);
    - ``min_vnorm`` / ``mean_vnorm``: stored reconstruction norms
      over scoreable rows;
    - ``margin_p50/p95/max``: the per-row stage-1 margin
      2·resid/vnorm — each row's stage-1 test runs at
      ``threshold - margin``, so a margin near/over the threshold
      means that row is shortlisted against its whole probed cell;
    - ``frac_no_headroom``: fraction of rows with NO stage-1 pruning
      power at ``threshold`` (margin >= threshold, or degenerate) —
      the single number to alert on: near 0.0 the PQ gate prunes
      like SQ8; near 1.0 every batch degenerates to the exact gate
      plus wasted code scans, and the fix is better codebooks
      (``refine_iters``) or the SQ8 rung.

    Reference parity: the reference has no compression tier; this
    instruments the repo's beyond-ref PQ gate
    (`similarity.py` incremental_semantic_dedup_pq)."""
    if "resid" not in index.columns:
        raise ValueError(
            "index has no 'resid' column — build it with"
            " materialize_pq_index (this report sizes the PQ gate's"
            " per-row margins)"
        )
    m_col = F.when(
        F.col("vnorm") > 0, F.lit(2.0) * F.col("resid") / F.col("vnorm")
    )
    no_head = (
        F.when(~(F.col("vnorm") > 0), 1)
        .when(m_col >= F.lit(threshold), 1)
        .otherwise(0)
    )
    return index.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(~(F.col("vnorm") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_degenerate"),
        F.round(F.percentile("resid", F.lit(0.5)), 4).alias("resid_p50"),
        F.round(F.percentile("resid", F.lit(0.95)), 4).alias("resid_p95"),
        F.round(F.max("resid"), 4).alias("resid_max"),
        F.round(
            F.min(F.when(F.col("vnorm") > 0, F.col("vnorm"))), 4
        ).alias("min_vnorm"),
        F.round(
            F.avg(F.when(F.col("vnorm") > 0, F.col("vnorm"))), 4
        ).alias("mean_vnorm"),
        F.round(F.percentile(m_col, F.lit(0.5)), 4).alias("margin_p50"),
        F.round(F.percentile(m_col, F.lit(0.95)), 4).alias("margin_p95"),
        F.round(F.max(m_col), 4).alias("margin_max"),
        F.round(
            F.sum(no_head).cast("double") / F.count(F.lit(1)), 4
        ).alias("frac_no_headroom"),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Scalar (per-dimension min/max) quantization of float embeddings
    to ``levels``-level integer codes — the 4x storage cut that makes
    a 100 TB float32 embedding store a 25 TB int8 one, at a bounded
    reconstruction error (the public FAISS-style SQ8 scheme).

    code_d = min(levels-1, floor((x_d - min_d) / (max_d - min_d) *
    levels)); degenerate dims (max == min) code to 0. Pure floor
    arithmetic — no rounding-mode ambiguity, so codes are bit-portable
    across engines. Dequantized midpoint x̂_d = min_d + (code_d + 0.5)
    * (max_d - min_d) / levels gives the per-vector MSE.

    Output: ``id_col``, ``codes array<int>``, ``mse`` (double).

    Scale shape: per-dim bounds come from ONE posexplode + groupBy(pos)
    (dim-sized result) collapsed to two dim-length arrays and
    broadcast; coding itself is a narrow ``zip_with`` projection — the
    corpus is never shuffled.
    """
    pe = df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
    bounds = pe.groupBy("pos").agg(
        F.min(F.col("x").cast("double")).alias("mn"),
        F.max(F.col("x").cast("double")).alias("mx"),
    )
    packed = bounds.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("pos", "mn", "mx"))
            ),
            lambda s: s["mn"],
        ).alias("mins"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("pos", "mn", "mx"))
            ),
            lambda s: s["mx"],
        ).alias("maxs"),
    )
    lv = F.lit(float(levels))
    with_bounds = df.crossJoin(F.broadcast(packed))
    idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    code_at = lambda i: F.when(  # noqa: E731
        F.col("maxs")[i] > F.col("mins")[i],
        F.least(
            F.lit(levels - 1),
            F.floor(
                (F.col(vec_col)[i].cast("double") - F.col("mins")[i])
                / (F.col("maxs")[i] - F.col("mins")[i])
                * lv
            ),
        ),
    ).otherwise(F.lit(0))
    deq_at = lambda i: F.col("mins")[i] + (  # noqa: E731
        code_at(i).cast("double") + F.lit(0.5)
    ) * (F.col("maxs")[i] - F.col("mins")[i]) / lv
    err_at = lambda i: F.pow(  # noqa: E731
        F.col(vec_col)[i].cast("double") - deq_at(i), F.lit(2.0)
    )
    return with_bounds.select(
        F.col(id_col),
        F.transform(idx, lambda i: code_at(i).cast("int")).alias("codes"),
        (
            F.aggregate(
                F.transform(idx, err_at),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size(F.col(vec_col))
        ).alias("mse"),
    )
