from dataprocessingframework_spark.operators import (
    dedup,
    joins,
    profiling,
    sampling,
    similarity,
    text_analysis,
    validators,
)

__all__ = [
    "dedup",
    "joins",
    "profiling",
    "sampling",
    "similarity",
    "text_analysis",
    "validators",
]
