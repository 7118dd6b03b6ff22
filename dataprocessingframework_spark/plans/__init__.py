from dataprocessingframework_spark.plans.pipeline import (
    DataframeStage,
    DedupStage,
    FilterStage,
    Pipeline,
    ShuffleStage,
    TransformStage,
)

__all__ = [
    "Pipeline",
    "FilterStage",
    "DataframeStage",
    "DedupStage",
    "ShuffleStage",
    "TransformStage",
]
