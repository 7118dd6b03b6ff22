from dataprocessingframework_spark.operators import (
    clustering,
    dedup,
    drift,
    joins,
    profiling,
    sampling,
    similarity,
    text_analysis,
    validators,
    versioning,
)

__all__ = [
    "clustering",
    "dedup",
    "drift",
    "joins",
    "profiling",
    "sampling",
    "similarity",
    "text_analysis",
    "validators",
    "versioning",
]
