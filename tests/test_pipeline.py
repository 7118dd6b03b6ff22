"""Pipeline runner semantics (reference `tests/test_pipelines.py`):
stage order, memoization skip, on_error stop/continue."""

import pytest
from pyspark.sql import functions as F

from dataprocessingframework_spark import Dataset
from dataprocessingframework_spark.filters.text_filters import TokenStatsFilter
from dataprocessingframework_spark.plans import (
    DataframeStage,
    Pipeline,
)


@pytest.fixture()
def ds(spark):
    return Dataset(
        spark.createDataFrame(
            [(1, "a b c", "x"), (2, "a b c", "y"), (3, "d", "z")],
            schema="id long, text string, tag string",
        )
    )


def test_pipeline_runs_in_order(ds):
    p = (
        Pipeline()
        .add_filter(TokenStatsFilter())
        .add_dataframe_filter(lambda df: df.filter(F.col("n_tokens_pd") > 1))
        .add_dedup(["text"], order_col="id")
    )
    out, reports = p.run(ds)
    assert [r.status for r in reports] == ["ok", "ok", "ok"]
    rows = out.df.collect()
    assert len(rows) == 1 and rows[0].id == 1


def test_pipeline_memoization_skips(ds):
    """Stage skipped when its result columns already exist
    (`pipeline_stages.py:90-97`)."""
    pre = Dataset(
        ds.df.withColumn("n_tokens_pd", F.lit(0).cast("long")).withColumn(
            "avg_token_len", F.lit(0.0)
        )
    )
    p = Pipeline().add_filter(TokenStatsFilter())
    out, reports = p.run(pre)
    assert reports[0].status == "skipped"
    assert out.df.collect()[0].n_tokens_pd == 0  # untouched


class _Boom(DataframeStage):
    def __init__(self):
        super().__init__(lambda df: df, name="boom")

    def run(self, ds):
        raise RuntimeError("boom")


def test_pipeline_on_error_stop(ds):
    p = Pipeline(on_error="stop")
    p.stages.append(_Boom())
    with pytest.raises(RuntimeError):
        p.run(ds)


def test_pipeline_on_error_continue(ds):
    p = Pipeline(on_error="continue")
    p.stages.append(_Boom())
    p.add_dataframe_filter(lambda df: df.filter(F.col("id") <= 2))
    out, reports = p.run(ds)
    assert [r.status for r in reports] == ["failed", "ok"]
    assert out.count() == 2
