"""Connected-components clustering + profiling operator."""

from pyspark.sql import functions as F

from dataprocessingframework_spark.operators.dedup import connected_components
from dataprocessingframework_spark.operators.profiling import profile_table


def test_connected_components_transitive(spark):
    """a-b, b-c chain + isolated pair + singleton."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], schema="id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 99]], schema="doc_id long"
    )
    out = {
        r.node: r.cluster
        for r in connected_components(pairs, all_nodes=nodes).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_long_chain(spark):
    """Chain of 12 — needs multiple propagation rounds."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], schema="id_a long, id_b long"
    )
    out = connected_components(pairs).collect()
    assert {r.cluster for r in out} == {0}
    assert len(out) == 13


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, None, 7.0)],
        schema="id long, tag string, score double",
    )
    row = profile_table(df).collect()[0]
    assert row.n_rows == 3
    assert row.tag_non_null == 2 and row.tag_distinct == 1 and row.tag_nulls == 1
    assert row.score_nulls == 1 and row.score_min == 5.0 and row.score_max == 7.0
    assert row.id_avg == 2.0


def test_profile_table_approximate(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 10)
    row = profile_table(df, ["v"], approximate=True).collect()[0]
    assert abs(row.v_distinct - 10) <= 2  # HLL estimate
