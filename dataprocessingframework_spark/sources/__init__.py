from dataprocessingframework_spark.sources.reader import DatasetReader
from dataprocessingframework_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from dataprocessingframework_spark.sources.compact import (
    compact_parquet,
    dataset_file_stats,
)
from dataprocessingframework_spark.sources.jsonl import read_jsonl, write_jsonl
from dataprocessingframework_spark.sources.layout import (
    file_key_ranges,
    write_range_partitioned,
)
from dataprocessingframework_spark.sources.shards_source import (
    compact_shards,
    heal_compaction,
    publish_shard_schema,
    register_shards_source,
)
from dataprocessingframework_spark.sources.writers import (
    write_sharded_files,
    write_shards,
)

__all__ = [
    "DatasetReader",
    "write_shards",
    "write_sharded_files",
    "register_shards_source",
    "compact_shards",
    "heal_compaction",
    "publish_shard_schema",
    "write_bucketed",
    "read_bucketed",
    "read_jsonl",
    "write_jsonl",
    "compact_parquet",
    "dataset_file_stats",
    "write_range_partitioned",
    "file_key_ranges",
]
