"""Bucketed co-located joins (sources/bucketed.py): the shuffle is paid
once at write time; subsequent equi-joins on the bucket key plan with
NO Exchange on either side."""

import pytest
from pyspark.sql import functions as F

from dataprocessingframework_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        orders,
        "t_orders_b",
        "o_custkey",
        num_buckets=4,
        sort_cols="o_custkey",
        path=str(base / "orders"),
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "t_cust_b",
        "o_custkey",
        num_buckets=4,
        sort_cols="o_custkey",
        path=str(base / "cust"),
    )
    yield "t_orders_b", "t_cust_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t1, t2 = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the shuffle question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, t1).join(
            read_bucketed(spark, t2), on="o_custkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct(spark, sf_dir, bucketed_pair):
    t1, t2 = bucketed_pair
    got = (
        read_bucketed(spark, t1)
        .join(read_bucketed(spark, t2), on="o_custkey")
        .count()
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    assert got == want > 0


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also reuses the layout."""
    t1, _ = bucketed_pair
    agg = (
        read_bucketed(spark, t1)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
