"""Validators re-expressed as aggregate/anti-join queries (§2.11).

Reference: `DPF/validators/` walks files and pandas frames imperatively
(`validators/format_validators/sharded_validator.py`). Every check is
really a relational invariant, so here each one is a DataFrame query
that returns *violations* (empty result = valid), and a typed report
mirrors `validators/validator.py:8-29`'s ValidationResult.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ValidationResult:
    """Typed report — reference `validators/validator.py:8-29`."""

    errors: list[str] = field(default_factory=list)

    @property
    def total_errors(self) -> int:
        return len(self.errors)


def missing_columns(df: DataFrame, required: list[str]) -> list[str]:
    """V1 required-columns check (`files_validator.py:46-50`)."""
    return [c for c in required if c not in df.columns]


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """V2 key-uniqueness violations (`sharded_validator.py:40-44`):
    one row per duplicated key with its count."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def orphans(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """V3/V4 membership check via anti-join: child rows whose key has no
    parent (rows-without-files shape, `shards_validator.py:68-78`)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )


def tar_members(spark, shard_dir: str, archive_ext: str = "tar"):
    """Distributed listing of every (split_name, member) in a shard
    directory's archives: one task per tar, names only (no payload
    reads — tar index walk)."""
    import os
    import tarfile

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    tars = sorted(
        f for f in os.listdir(shard_dir) if f.endswith(f".{archive_ext}")
    )
    paths = spark.createDataFrame(
        [(os.path.join(shard_dir, t), t[: -len(archive_ext) - 1]) for t in tars],
        schema="tar_path string, split_name string",
    ).repartition(max(1, len(tars)))

    schema = StructType(
        [
            StructField("split_name", StringType()),
            StructField("member", StringType()),
        ]
    )

    def scan(pdfs):
        for pdf in pdfs:
            for tar_path, split in zip(pdf.tar_path, pdf.split_name):
                with tarfile.open(tar_path, "r") as tf:
                    names = tf.getnames()
                yield pd.DataFrame(
                    {"split_name": [split] * len(names), "member": names}
                )

    return paths.mapInPandas(scan, schema)


def membership_errors(
    spark,
    df,
    shard_dir: str,
    name_col: str,
    archive_ext: str = "tar",
) -> dict[str, DataFrame]:
    """V4 table<->archive membership (`shards_validator.py:47-87`):
    rows whose file is missing from its shard archive, and archive
    members with no metadata row — both as anti-join DataFrames."""
    members = tar_members(spark, shard_dir, archive_ext)
    rows = df.select(
        F.col("split_name"), F.col(name_col).alias("member")
    )
    rows_without_files = rows.join(
        members, on=["split_name", "member"], how="left_anti"
    )
    files_without_rows = members.join(
        rows, on=["split_name", "member"], how="left_anti"
    )
    return {
        "rows_without_files": rows_without_files,
        "files_without_rows": files_without_rows,
    }


def validate(
    df: DataFrame,
    required_columns: list[str] | None = None,
    key_columns: list[str] | None = None,
    reference: DataFrame | None = None,
    reference_key: str | None = None,
    key: str | None = None,
) -> ValidationResult:
    """Run all applicable checks; one Spark job per check."""
    errors: list[str] = []
    if required_columns:
        for c in missing_columns(df, required_columns):
            errors.append(f"MissedColumnsError: {c}")
    if key_columns:
        dups = duplicate_keys(df, key_columns).limit(100).collect()
        for r in dups:
            errors.append(f"DuplicatedValuesError: {tuple(r[c] for c in key_columns)}")
    if reference is not None and reference_key and key:
        n = orphans(df, reference, key, reference_key).count()
        if n:
            errors.append(f"MissingValueError: {n} rows without a match")
    return ValidationResult(errors)
