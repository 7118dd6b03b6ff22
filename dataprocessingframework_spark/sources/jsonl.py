"""JSONL (newline-delimited JSON) source/sink.

The reference exchanges metadata as CSV/parquet only
(`connectors/connector.py:66-90`); JSONL is the interchange format
large text/LLM corpora actually ship in (one JSON object per line,
splittable, appendable), so the engine supports it as a first-class
dataset format next to the shards/files layouts.

Spark's native json reader/writer handles JSONL: each output part is
a valid .jsonl file, each input file is split by line. Schema should
be supplied on read for production scans (schema inference is a
full extra pass over 100 TB); `read_jsonl` does this when given one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Write as partitioned .jsonl files. ``maxRecordsPerFile`` bounds
    file size without a repartition shuffle — each task rolls to a new
    file at the cap, the JSONL analogue of max_files_in_shard
    (`processors/writers/shards_writer.py:27`)."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read a JSONL dataset. With ``schema``: single pass, corrupt
    records land in ``_corrupt_record`` (PERMISSIVE) instead of failing
    the scan — the error-tolerant read the reference implements by
    hand (`dataloaders/files_dataset.py:84-107`)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
