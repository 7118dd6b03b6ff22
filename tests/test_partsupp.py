"""Synthetic-partsupp TPC-H coverage (Q2/Q9/Q11/Q16/Q20).

The testdata generator omits partsupp; ``queries._partsupp`` derives a
deterministic one from part x supplier with pure integer arithmetic
(COVERAGE.md §2.7 note). These tests pin the invariants the five
queries rely on, plus the plan shapes that keep them scale-safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataprocessingframework_spark import queries as q
from tests.test_plans import plan_of


def test_partsupp_four_distinct_suppliers_per_part(spark, sf_dir):
    ps = q._partsupp(spark, sf_dir)
    bad = (
        ps.groupBy("ps_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("ps_suppkey").alias("nd"),
        )
        .filter((F.col("n") != 4) | (F.col("nd") != 4))
        .count()
    )
    assert bad == 0


def test_partsupp_keys_reference_real_suppliers(spark, sf_dir):
    ps = q._partsupp(spark, sf_dir)
    sup = q.T(spark, sf_dir, "supplier").select("s_suppkey")
    dangling = ps.join(
        sup, ps["ps_suppkey"] == sup["s_suppkey"], "left_anti"
    ).count()
    assert dangling == 0


def test_partsupp_cost_is_exact_two_decimals(spark, sf_dir):
    row = (
        q._partsupp(spark, sf_dir)
        .agg(
            F.min("ps_supplycost").alias("lo"),
            F.max("ps_supplycost").alias("hi"),
            F.min("ps_availqty").alias("qlo"),
            F.max("ps_availqty").alias("qhi"),
        )
        .collect()[0]
    )
    assert float(row["lo"]) >= 1.00
    assert float(row["hi"]) <= 90.99
    assert row["qlo"] >= 1 and row["qhi"] <= 9999
    # DECIMAL(12,2) end-to-end: no float representation in the schema
    dtype = dict(q._partsupp(spark, sf_dir).dtypes)["ps_supplycost"]
    assert dtype == "decimal(12,2)"


def test_partsupp_deterministic_across_calls(spark, sf_dir):
    a = q._partsupp(spark, sf_dir)
    b = q._partsupp(spark, sf_dir)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_h2_decorrelated_min_no_cartesian(spark, sf_dir):
    plan = plan_of(q.q_h2_min_cost_supplier(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # dims arrive by broadcast, the min-cost join is a hash equi-join
    assert "BroadcastHashJoin" in plan


def test_h9_composite_key_equi_join(spark, sf_dir):
    import re

    plan = plan_of(q.q_h9_product_profit(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # lineitem joins partsupp on the (partkey, suppkey) COMPOSITE key
    # as a hash equi-join (the only BroadcastNestedLoopJoin allowed is
    # _partsupp's 1-row supplier-count cross)
    assert re.search(
        r"(Broadcast|SortMerge)HashJoin.*l_partkey.*l_suppkey.*"
        r"ps_partkey.*ps_suppkey",
        plan,
    ) or re.search(
        r"(BroadcastHash|SortMergeJoin).*ps_partkey.*ps_suppkey", plan
    ), plan


def test_h11_threshold_is_broadcast_scalar(spark, sf_dir):
    # the totals row joins back as a broadcast nested-loop of ONE row
    # (crossJoin with a 1-row aggregate) — never a shuffled cartesian
    plan = plan_of(q.q_h11_important_stock(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_h20_qualifying_set_semi_joins_supplier(spark, sf_dir):
    plan = plan_of(q.q_h20_promotion_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
