from dataprocessingframework_spark.operators import (
    dedup,
    similarity,
    text_analysis,
    validators,
)

__all__ = ["dedup", "similarity", "text_analysis", "validators"]
