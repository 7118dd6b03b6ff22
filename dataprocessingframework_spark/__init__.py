"""PySpark-native multimodal dataset analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
ai-forever/DataProcessingFramework (DPF): reading / filtering /
transforming / validating / converting multimodal datasets (image,
video, audio, text) whose per-sample metadata lives in a relational
table, plus the scale-out operators a 100 TB training-data pipeline
needs (dedup, similarity search, text analysis, streaming).

Design stance (see SURVEY.md §7): metadata is a Spark DataFrame; media
bytes are lazy `binary` columns or fetched inside `mapInPandas`
partitions; every relational op is declarative DataFrame/SQL so
Catalyst does pruning/pushdown/join planning; Python only runs inside
Arrow-batched pandas UDFs.
"""

from dataprocessingframework_spark.dataset import Dataset
from dataprocessingframework_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = ["Dataset", "get_spark", "stop_spark", "__version__"]
