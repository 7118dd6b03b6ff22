"""Dataset configs: the three on-disk formats of the reference
(`docs/formats.md`), re-expressed for Spark readers.

- files: one CSV/parquet metadata table + media referenced by relative
  path column (`DPF/configs/files_config.py:10-53`)
- shards: directory of ``N.csv`` + ``N.tar`` pairs, row <-> member by
  basename (`DPF/configs/shards_config.py:9-78`)
- sharded_files: ``N.csv`` + loose files under ``N/``
  (`DPF/configs/sharded_files_config.py:9-71`)

A config declares paths, the modality path columns, user->canonical
renames, and required columns; the reader turns it into lazy scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class DatasetConfig:
    """Common declaration (`DPF/configs/dataset_config.py:7-41`)."""

    path: str
    path_columns: list[str] = field(default_factory=list)
    required_columns: list[str] = field(default_factory=list)
    rename: dict[str, str] = field(default_factory=dict)  # user -> canonical
    metadata_format: str = "csv"  # csv | parquet


@dataclass
class FilesDatasetConfig(DatasetConfig):
    """`files` format: ``path`` is the metadata table; ``base_path`` is
    prefixed onto every path column (`dataset_reader.py:286-289`)."""

    base_path: str = ""


@dataclass
class ShardsDatasetConfig(DatasetConfig):
    """`shards` format: ``path`` is a directory of N.csv + N.tar pairs.

    ``name_columns`` hold tar-member basenames; the reader derives
    ``split_name`` (shard id) per row (`dataset_reader.py:125-130`).
    """

    name_columns: list[str] = field(default_factory=list)
    archive_ext: str = "tar"


@dataclass
class ShardedFilesDatasetConfig(DatasetConfig):
    """`sharded_files` format: N.csv + folder N/ of loose files."""

    name_columns: list[str] = field(default_factory=list)
