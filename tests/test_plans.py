"""Plan-quality regression tests — the 100 TB posture, asserted.

These pin the physical-plan properties PLANS.md claims: predicates
reach the parquet scan, projection is pruned, small dims broadcast,
and the custom join formulations never degenerate into cartesian
products. A refactor that silently breaks one of these would still
pass the value-correctness oracle at sf0.01 but fall over at scale —
this file is what catches it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataprocessingframework_spark import queries as q


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_h6_filters_pushed_to_scan(spark, sf_dir):
    plan = formatted(q.q_h6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters:" in plan
    # every predicate column reaches the reader
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln][0]
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in pushed, pushed
    # projection pruned: extendedprice+3 predicate cols, not all 11
    schema = [ln for ln in plan.splitlines() if "ReadSchema:" in ln][0]
    assert "l_orderkey" not in schema
    assert "l_comment" not in schema


def test_p3_projection_prunes_scan(spark, sf_dir):
    plan = formatted(q.q_p3_projection(spark, sf_dir))
    schema = [ln for ln in plan.splitlines() if "ReadSchema:" in ln][0]
    assert "l_orderkey" in schema and "l_quantity" in schema
    assert "l_extendedprice" not in schema, schema


def test_h3_dimension_broadcasts(spark, sf_dir):
    plan = plan_of(q.q_h3_top_orders(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_h18_semi_join_broadcasts(spark, sf_dir):
    plan = plan_of(q.q_h18_large_orders(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_h22_anti_join_no_cartesian(spark, sf_dir):
    plan = plan_of(q.q_h22_idle_customers(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_no_pair_explosion(spark, sf_dir):
    """The union-window as-of formulation must never plan a
    theta/cartesian join (the naive quadratic formulation)."""
    plan = plan_of(q.q_j_asof(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_single_shuffle(spark, sf_dir):
    """Signature build: tokenize -> hash -> k partial-aggregated mins.
    Exactly ONE exchange (the doc-key groupBy); the distinct folds into
    the same aggregation via partial combine upstream."""
    from dataprocessingframework_spark.operators import dedup

    sig = dedup.minhash_signatures(
        q.T(spark, sf_dir, "documents"), "text", "doc_id", num_hashes=8
    )
    plan = plan_of(sig)
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_hash_sample_is_scan_side_filter(spark, sf_dir):
    """Deterministic sampling must stay a pure filter — no shuffle, no
    window, no join."""
    from dataprocessingframework_spark.operators.sampling import hash_sample

    out = hash_sample(q.T(spark, sf_dir, "orders"), "o_orderkey", 1, 20)
    plan = plan_of(out)
    assert "Exchange" not in plan, plan


def test_cosine_topk_corpus_not_shuffled(spark, sf_dir):
    """Brute-force cosine top-k: queries broadcast, corpus streams.
    The only exchange allowed is the per-query top-k window on the
    (already reduced) scored pairs."""
    from dataprocessingframework_spark.operators.similarity import cosine_topk

    emb = q.T(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    plan = plan_of(cosine_topk(emb, qs, k=3))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # corpus-side shuffle would show as Exchange BEFORE the join;
    # scored-pairs window shuffle after it is expected and small
    assert "SortMergeJoin" not in plan


def test_h8_seven_way_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(q.q_h8_market_share(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # nations x2 + region
    assert "CartesianProduct" not in plan


def test_h4_exists_is_semi_join(spark, sf_dir):
    plan = plan_of(q.q_h4_priority_exists(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_h13_left_join_preserved(spark, sf_dir):
    """Q13's left join must stay an outer hash join (customers with
    zero orders kept) — never rewritten to inner by the count agg."""
    plan = plan_of(q.q_h13_count_distribution(spark, sf_dir))
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan


def test_h17_threshold_join_no_cartesian(spark, sf_dir):
    plan = plan_of(q.q_h17_small_quantity(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hamming_near_dup_is_equi_join(spark, sf_dir):
    """Banded Hamming pair-gen must plan as a hash equi-join on
    (band, slice) — a theta formulation would be quadratic."""
    from dataprocessingframework_spark.operators import dedup

    sig = dedup.simhash(q.T(spark, sf_dir, "documents"), "text", "doc_id", bits=16)
    plan = plan_of(
        dedup.hamming_near_dup(sig, "simhash", "doc_id", 3, 4, 16)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_candidates_single_pass_no_cache(spark, sf_dir):
    """Pair generation must be the generate-based single pass: no
    bucket self-join (the old shape consumed the signature pipeline
    twice) and no persisted RDD left behind after materialization."""
    from dataprocessingframework_spark.operators import dedup

    spark.catalog.clearCache()
    pairs = dedup.minhash_lsh_candidates(
        q.T(spark, sf_dir, "documents"), "text", "doc_id", 16, 4,
        max_bucket_size=None,
    )
    plan = plan_of(pairs)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # exact path: sig groupBy + bucket groupBy + block-pair repartition
    # = 3 exchanges max: first-colliding-band emission replaces the
    # final distinct (whose shuffle carried the whole pre-dedup pair
    # volume). The repartition is load-bearing (it spreads each hot
    # bucket's pair emission across tasks) and must use an explicit
    # partition count so AQE cannot coalesce it away
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "REPARTITION_BY_NUM" in plan, plan
    assert "HashAggregate(keys=[id_a" not in plan, plan
    # capped path: the oversized-bucket stats and star join must be
    # BROADCAST (members stream map-side; no bucket member array for
    # oversized buckets), never a shuffle join of the member table
    capped = dedup.minhash_lsh_candidates(
        q.T(spark, sf_dir, "documents"), "text", "doc_id", 16, 4,
        max_bucket_size=10,
    )
    cplan = plan_of(capped)
    assert "BroadcastHashJoin" in cplan, cplan
    assert "SortMergeJoin" not in cplan, cplan
    # other tests in the shared session may hold localCheckpoint RDDs;
    # assert THIS pipeline adds none
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    pairs.count()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after == before


def test_jaccard_candidates_no_broadcast_hint(spark, sf_dir):
    """The candidate pair set is unbounded — it must never carry an
    explicit broadcast hint (AQE may still choose broadcast at runtime
    from observed sizes; that is fine). Regression for the executor-OOM
    shape `broadcast(candidates)`."""
    from dataprocessingframework_spark.operators import dedup

    docs = q.T(spark, sf_dir, "documents")
    # max_bucket_size=None: the exact candidate set (what the oracle
    # composition uses) carries no hints of its own, so ANY hint in the
    # composed plan would be one jaccard_pairs added
    cand = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", 16, 4, max_bucket_size=None
    )
    out = dedup.jaccard_pairs(docs, "text", "doc_id", 0.5, candidates=cand)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed


def test_h10_filters_pushed_dims_broadcast(spark, sf_dir):
    plan = formatted(q.q_h10_returned_items(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln]
    assert any("l_returnflag" in ln for ln in pushed), pushed
    assert any("o_orderdate" in ln for ln in pushed), pushed
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_h21_exists_shapes_are_semi_joins(spark, sf_dir):
    """Both correlated EXISTS become key-set semi-joins, never a
    correlated re-scan or cartesian pairing."""
    plan = plan_of(q.q_h21_waiting_suppliers(spark, sf_dir))
    assert plan.count("LeftSemi") >= 3, plan.count("LeftSemi")
    assert "CartesianProduct" not in plan


def test_temperature_sample_corpus_not_shuffled(spark, sf_dir):
    """The rate table broadcasts back onto the corpus — the corpus
    itself must pass through a BroadcastHashJoin, never a sort-merge
    join or its exchange (only the tiny count side and the
    presentation sort may exchange)."""
    plan = plan_of(q.q_d_temperature_sample(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_topk_broadcast_gated_by_query_size(spark, sf_dir):
    """VERDICT r3 'what's wrong' #2: the multi-probe query side must
    broadcast only under the row threshold. Small probe batch ->
    BroadcastHashJoin; threshold forced to 0 -> plain equi-join on
    bucket (shuffle both sides), so a 10M-row probe batch can never
    OOM the broadcast."""
    from dataprocessingframework_spark.operators import similarity

    emb = q.T(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    small = similarity.lsh_topk(emb, qs, k=5)
    assert "BroadcastHashJoin" in plan_of(small)
    # over threshold: the FORCED hint must be gone (Catalyst may still
    # auto-broadcast a stats-small side, but a stats-large batch now
    # falls back to a shuffled equi-join instead of an OOMing hint)
    large = similarity.lsh_topk(emb, qs, k=5, broadcast_threshold=0)
    analyzed = large._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed
    assert "CartesianProduct" not in plan_of(large)


def test_sessionize_single_data_shuffle(spark, sf_dir):
    """Both sessionize windows and the per-session agg reuse ONE
    hash exchange on user_id; only the presentation sort adds a
    range exchange."""
    plan = plan_of(q.q_ev_sessionize(spark, sf_dir))
    assert plan.count("hashpartitioning") <= 1, plan.count("hashpartitioning")


def test_attribution_is_two_level_aggregate(spark, sf_dir):
    """min_by/max_by formulation: no window sort over events, no
    self-join — two hash aggregates with map-side partials."""
    plan = plan_of(q.q_ev_attribution(spark, sf_dir))
    assert "Window" not in plan
    assert plan.count("hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """A-ES top-k must plan TakeOrderedAndProject (per-partition
    top-k + k-row merge), never a global Sort + Limit."""
    from dataprocessingframework_spark.operators.sampling import (
        weighted_sample,
    )

    plan = plan_of(
        weighted_sample(
            q.T(spark, sf_dir, "documents"), "n_chars", "doc_id", k=100
        )
    )
    assert "TakeOrderedAndProject" in plan


def test_bloom_decontaminate_prefilters_map_side(spark, sf_dir):
    """Both Bloom position probes must be BROADCAST semi-joins (the
    corpus-side explode is filtered map-side before any shuffle); a
    shuffled semi-join here would move the full corpus gram set."""
    plan = plan_of(q.q_tx_bloom_decontaminate(spark, sf_dir))
    semi = [
        ln for ln in plan.splitlines()
        if "LeftSemi" in ln
    ]
    assert len(semi) >= 2
    assert all("BroadcastHashJoin" in ln for ln in semi)


def test_nearest_join_single_exchange_single_sort(spark, sf_dir):
    """Backward last() and forward first() must share ONE partitioning
    and ONE sort — two exchanges here would mean the bidirectional
    formulation degenerated into two separate asof passes."""
    plan = plan_of(q.q_j_nearest(spark, sf_dir))
    # count shuffle exchanges attributable to the window (exclude the
    # final orderBy's range exchange)
    hash_exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(hash_exchanges) <= 2  # union-window + purchases groupBy
    assert plan.count("Window") <= 2  # one Window op computes both


def test_remove_dup_passages_linear_shuffles(spark, sf_dir):
    """Tile df + join-back + reassembly must stay a bounded linear
    shuffle family — no cartesian, no broadcast of the corpus-sized
    frequency table forced by hint."""
    plan = plan_of(q.q_tx_remove_dup_passages(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_no_cartesian_single_key_family(spark, sf_dir):
    plan = plan_of(q.q_w_scd2(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_emb_code_dedup_is_equi_join(spark, sf_dir):
    """Same-bucket pairing must plan as an EQUI-join on code_key —
    never a cartesian over the corpus. (A BroadcastNestedLoopJoin
    against the single-row quantization-bounds aggregate is the
    intended tiny-broadcast pattern and is allowed.)"""
    plan = plan_of(q.q_emb_code_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_interval_overlap_join_is_equi_join_on_bin(spark, sf_dir):
    """The overlap theta-predicate must ride an equi-join on the bin
    id (shuffle-hash/AQE), not degrade to a nested-loop join."""
    plan = plan_of(q.q_j_interval_overlap(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pipeline_curation_v2_no_quadratic_shapes(spark, sf_dir):
    plan = plan_of(q.q_pipeline_curation_v2(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _assert_partial_group_limit_below_exchange(plan: str) -> None:
    """The q_id exchange must be fed by a map-side partial
    WindowGroupLimit — i.e. each map partition forwards at most k
    score rows per query, never its full raw score set."""
    partials = [
        i
        for i in range(len(plan))
        if plan.startswith("WindowGroupLimit", i)
        and "Partial" in plan[i : plan.index("\n", i)]
    ]
    assert partials, plan
    # plan prints top-down: the Partial limit must sit BELOW (after)
    # the exchange that hashes on q_id
    i_exchange = plan.index("Exchange hashpartitioning(q_id")
    assert min(partials) > i_exchange, plan


def test_cosine_topk_window_not_over_raw_scores(spark, sf_dir):
    """VERDICT r4 item 1: the per-query top-k must be two-level — no
    q_id partition may receive the raw corpus x queries score
    relation. The rn <= k filter triggers Catalyst's
    InferWindowGroupLimit, which plans a spillable map-side partial
    top-k below the exchange; this pins that the rule keeps firing
    (it would not for k > spark.sql.window.group.limit.threshold or a
    rewritten filter shape)."""
    from dataprocessingframework_spark.operators.similarity import cosine_topk

    emb = q.T(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    _assert_partial_group_limit_below_exchange(plan_of(cosine_topk(emb, qs, k=3)))


def test_lsh_and_ivf_topk_partial_group_limit(spark, sf_dir):
    """Same pin for the approximate paths: a hot LSH bucket or fat
    IVF cell must be pre-reduced map-side, not funneled whole into
    one q_id partition."""
    from dataprocessingframework_spark.operators.similarity import (
        ivf_topk,
        lsh_topk,
    )

    emb = q.T(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    _assert_partial_group_limit_below_exchange(plan_of(lsh_topk(emb, qs, k=3)))
    _assert_partial_group_limit_below_exchange(
        plan_of(ivf_topk(emb, qs, k=3, n_cells=4, n_probe=2))
    )


def test_ev_dominant_users_decorrelated(spark, sf_dir):
    """The Q20-shape aggregated-threshold query must stay decorrelated:
    per-type totals and the qualifying-user set both broadcast, the
    dim filter is a LeftSemi hash join, and no cartesian/re-scan shape
    appears."""
    plan = plan_of(q.q_ev_dominant_users(spark, sf_dir))
    assert "LeftSemi" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_ev_engagement_profile_anti_join_shape(spark, sf_dir):
    """Q16-shape: the blacklist must be an anti hash join of the small
    distinct set (no correlated re-scan, no cartesian)."""
    plan = plan_of(q.q_ev_engagement_profile(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_emb_centroid_prune_broadcasts_prototypes(spark, sf_dir):
    """Centroid pruning must broadcast the n_labels prototype arrays
    onto the corpus — scoring stays a narrow projection with no
    corpus-side shuffle before the join."""
    plan = plan_of(q.q_emb_centroid_prune(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_lsh_multi_topk_scale_shape(spark, sf_dir):
    """Multi-table LSH must keep the single-table guarantees: one
    hash equi-join on the (tbl, bucket) composite key (never a
    cartesian), broadcast gated by post-fanout query size, and the
    candidate dedup running on the skinny pair relation BEFORE the
    ranking window (vectors never shuffle through the dedup)."""
    from dataprocessingframework_spark.operators.similarity import (
        lsh_topk_multi,
    )

    emb = q.T(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    small = lsh_topk_multi(emb, qs, k=5, n_tables=3)
    plan = plan_of(small)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "tbl" in plan and "bucket" in plan
    _assert_partial_group_limit_below_exchange(plan)
    large = lsh_topk_multi(
        emb, qs, k=5, n_tables=3, broadcast_threshold=0
    )
    analyzed = large._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "CartesianProduct" not in plan_of(large)


def test_semantic_dedup_corpus_never_shuffles(spark):
    """r8: incremental_semantic_dedup's cell join must broadcast the
    (small, arriving) batch side so the corpus never shuffles — the
    join key has only n_cells distinct values, so a shuffle join on
    it would concentrate each cell's corpus rows in one task."""
    import numpy as np

    from dataprocessingframework_spark.operators import similarity

    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 8).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        schema="vec_id long, embedding array<float>",
    )
    batch = spark.createDataFrame(
        [(100 + i, [float(x) for x in vecs[50 + i]]) for i in range(10)],
        schema="vec_id long, embedding array<float>",
    )
    cents = [[float(x) for x in vecs[i]] for i in range(4)]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast: the explicit hint must carry it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        kept = similarity.incremental_semantic_dedup(
            batch, corpus, cents, threshold=0.99, n_probe=2
        )
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "Exchange hashpartitioning(cell" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
