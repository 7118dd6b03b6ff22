"""Generic columnar/text table formats: parquet, ORC, CSV, JSONL.

The reference's convert-format surface is CSV/parquet only
(`connectors/connector.py:66-90`, `dataset_reader.py` to_parquet/
to_csv paths). On Spark every format behind `DataFrameReader`/
`DataFrameWriter` comes for free, so the engine exposes one
convert entry point instead of per-format writer classes.

Scale notes:
- ORC and parquet are the splittable columnar options; both carry
  predicate pushdown and column pruning through the same DataSource
  V1 scan machinery (PLANS.md pins this for parquet; ORC plans are
  the same `PushedFilters`/`ReadSchema` shape).
- CSV is row-major and schema-less: always pass an explicit schema on
  read (inference is a full extra pass over 100 TB) and keep
  `header=True` so files are self-describing for external tools.
- `maxRecordsPerFile` bounds output file size WITHOUT a repartition
  shuffle in every format — the task rolls to a new file at the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if fmt == "csv":
        # quote-all + escaped quotes + multiLine-safe output so text
        # columns with delimiters/newlines survive the round trip
        w = w.option("header", True).option("quoteAll", True).option("escape", '"')
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = (
            r.option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
        )
    return r.format(fmt).load(path)


def convert_format(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    src_fmt: str,
    dst_fmt: str,
    schema: StructType | str | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """W3 convert-format (`connectors/connector.py:66-90` twin): a
    single scan-to-write plan, no driver materialization — at 100 TB
    this is a map-only job whose parallelism is the source's split
    count."""
    df = read_table(spark, src_path, src_fmt, schema)
    write_table(df, dst_path, dst_fmt, max_records_per_file)
