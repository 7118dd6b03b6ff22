from dataprocessingframework_spark.operators import (
    clustering,
    dedup,
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
    "joins",
    "profiling",
    "sampling",
    "similarity",
    "text_analysis",
    "validators",
    "versioning",
]
