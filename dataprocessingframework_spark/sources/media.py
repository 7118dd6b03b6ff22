"""Media-bytes loading (S5/S6): attach a ``binary`` content column.

Reference: per-row file fetch with error-tolerant mode
(`dataloaders/files_dataset.py:74-107`) and one-tar-open-per-shard
streaming (`dataloaders/shards_dataset.py:86-131`, the IO-locality
trick at `:95-96`).

Spark versions run inside ``mapInPandas`` — Arrow-batched, one Python
worker per partition:

- files: open each path in the partition; failures become
  ``is_correct=false`` + ``error`` instead of dropped rows (matching
  the reference's ``return_none_on_error`` semantics and K1's schema);
- shards: ``repartition(split_name)`` first so every task touches few
  tars and opens each exactly once (partition-per-shard locality).

At cluster scale the same code reads s3a/hdfs via mounted filesystems;
the per-partition open amortizes remote-store round trips.
"""

from __future__ import annotations

import tarfile

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from dataprocessingframework_spark.sources.reader import SPLIT_COLUMN


def _out_schema(df: DataFrame, content_col: str) -> StructType:
    return StructType(
        list(df.schema.fields)
        + [
            StructField(content_col, BinaryType()),
            StructField("is_correct", BooleanType()),
            StructField("error", StringType()),
        ]
    )


def load_file_bytes(
    df: DataFrame, path_col: str, content_col: str = "content"
) -> DataFrame:
    """S5: per-row path -> bytes, error-tolerant."""

    def fetch(pdfs):
        for pdf in pdfs:
            contents, ok, err = [], [], []
            for p in pdf[path_col]:
                try:
                    with open(p, "rb") as f:
                        contents.append(f.read())
                    ok.append(True)
                    err.append(None)
                except Exception as e:  # noqa: BLE001 — error-tolerant by contract
                    contents.append(None)
                    ok.append(False)
                    err.append(f"{type(e).__name__}: {e}")
            pdf = pdf.copy()
            pdf[content_col] = contents
            pdf["is_correct"] = ok
            pdf["error"] = err
            yield pdf

    return df.mapInPandas(fetch, _out_schema(df, content_col))


def load_shard_bytes(
    df: DataFrame,
    tar_path_col: str,
    name_col: str,
    content_col: str = "content",
) -> DataFrame:
    """S6: tar-member bytes with one tar open per (task, shard).

    The repartition on split_name reproduces the reference's
    shard-grouping (`shards_dataset.py:74-77`): rows of one shard land
    in one task, the tar is read once, members resolved from its index.
    """

    def fetch(pdfs):
        cache: dict[str, dict[str, bytes]] = {}
        for pdf in pdfs:
            contents, ok, err = [], [], []
            for tar_path, name in zip(pdf[tar_path_col], pdf[name_col]):
                try:
                    if tar_path not in cache:
                        members: dict[str, bytes] = {}
                        with tarfile.open(tar_path, "r") as tf:
                            for m in tf.getmembers():
                                f = tf.extractfile(m)
                                if f is not None:
                                    members[m.name] = f.read()
                        cache[tar_path] = members
                    contents.append(cache[tar_path][str(name)])
                    ok.append(True)
                    err.append(None)
                except Exception as e:  # noqa: BLE001
                    contents.append(None)
                    ok.append(False)
                    err.append(f"{type(e).__name__}: {e}")
            pdf = pdf.copy()
            pdf[content_col] = contents
            pdf["is_correct"] = ok
            pdf["error"] = err
            yield pdf

    parted = (
        df.repartition(SPLIT_COLUMN) if SPLIT_COLUMN in df.columns else df
    )
    return parted.mapInPandas(fetch, _out_schema(df, content_col))
