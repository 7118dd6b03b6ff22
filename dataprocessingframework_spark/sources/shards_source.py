"""Python DataSource (Spark 4 DSv2 API) for csv(+tar) shard datasets.

The one custom piece SURVEY §4 flags as worth real engine work: the
reference's shards loader hands each DataLoader worker WHOLE tar
archives (`dataloaders/shards_dataset.py:86-131` — the worker slices
`tar_to_data.keys()` so one tar is opened exactly once, by exactly one
worker). The prior Spark expression of that locality trick,
``media.load_shard_bytes``, is a ``repartition(split_name) +
mapInPandas`` — correct, but opaque to Catalyst: partition planning is
by convention (a shuffle re-groups rows that ALREADY arrive grouped by
shard), and a ``split_name`` predicate still scans every csv before
filtering.

This DataSource makes the contract explicit to the engine:

- **One shard pair per InputPartition** (``partitions()`` returns one
  ``ShardPartition`` per ``N.csv``/``N.tar`` pair): Spark schedules
  whole shards to tasks, each task opens its tar exactly once, and no
  shuffle is needed to co-locate a shard's rows — the planner-level
  version of the reference's worker-slicing.
- **Partition pruning via filter pushdown** (``pushFilters``): an
  ``EqualTo``/``In`` predicate on ``split_name`` removes whole shard
  pairs from the scan — neither the csv nor the tar of a pruned shard
  is ever opened. Handled filters are still returned to Spark
  (conservative re-apply; pruning only removes rows that cannot
  match), so correctness never depends on this reader's predicate
  evaluation.
- **Arrow-native reads**: each partition yields pyarrow RecordBatches
  (csv parsed by ``pyarrow.csv`` in the RFC4180 doublequote dialect
  pandas ``to_csv`` writes — the exact dialect ``writers.write_shards``
  produces), so rows take the vectorized path into the JVM.

Scale posture: planning state is one small object per shard
(#shards = rows / max_files_in_shard — metadata-sized), reads are
embarrassingly parallel across shards, and the schema is either
supplied by the caller (``.schema(...)`` — recommended; the engine's
``DatasetReader`` passes the Spark-csv-inferred schema for exact type
parity with the legacy path) or inferred from the FIRST csv only.

Error tolerance mirrors the reference's ``return_none_on_error``
(`shards_dataset.py:101-115`): a missing/corrupt tar member yields
``content=None, is_correct=False, error=<reason>`` instead of failing
the task.
"""

from __future__ import annotations

import os
import tarfile
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

SPLIT_COLUMN = "split_name"
_META_COLS = ("is_correct", "error")


@dataclass
class ShardPartition(InputPartition):
    """One csv(+tar) shard pair — the unit of scheduling."""

    split_name: str
    csv_path: str
    tar_path: str | None


def _list_shards(path: str, archive_ext: str) -> tuple[list[str], set[str]]:
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    names = sorted(os.listdir(path))
    csvs = [n[:-4] for n in names if n.endswith(".csv")]
    tars = {
        n[: -(len(archive_ext) + 1)]
        for n in names
        if n.endswith(f".{archive_ext}")
    }
    return csvs, tars


class ShardsReader(DataSourceReader):
    """Batch reader: one partition per shard pair, split_name
    partition pruning, Arrow-native csv+tar reads."""

    def __init__(self, schema: StructType, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("dpf_shards requires a path")
        self._schema = schema
        self._name_col = options.get("name_col", "name")
        self._content_col = options.get("content_col", "content")
        self._archive_ext = options.get("archive_ext", "tar")
        self._with_content = self._content_col in schema.fieldNames()
        csvs, tars = _list_shards(path, self._archive_ext)
        if self._with_content:
            # csv<->tar pairing contract (`dataset_reader.py:183-192`)
            missing = sorted(set(csvs) - tars)
            if missing:
                raise ValueError(
                    f"shard tables without archive mates: {missing[:10]}"
                )
        self._parts: list[ShardPartition] = [
            ShardPartition(
                split_name=stem,
                csv_path=os.path.join(path, f"{stem}.csv"),
                tar_path=(
                    os.path.join(path, f"{stem}.{self._archive_ext}")
                    if stem in tars and self._with_content
                    else None
                ),
            )
            for stem in csvs
        ]

    def pushFilters(self, filters):  # noqa: D102 — contract in class doc
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == (SPLIT_COLUMN,):
                self._parts = [
                    p for p in self._parts if p.split_name == str(f.value)
                ]
            elif isinstance(f, In) and f.attribute == (SPLIT_COLUMN,):
                vals = {str(v) for v in f.value}
                self._parts = [
                    p for p in self._parts if p.split_name in vals
                ]
        # return ALL filters as unhandled: Spark re-applies them, so
        # pruning can only remove shards that cannot match — the
        # reader never becomes the predicate evaluator of record
        return filters

    def partitions(self):  # noqa: D102
        return list(self._parts)

    def read(self, partition: ShardPartition | None):  # noqa: D102
        if partition is None:
            # Spark passes [None] when partitions() returned [] —
            # i.e. every shard was pruned: nothing to read
            return
        import pyarrow as pa
        import pyarrow.csv as pacsv

        from pyspark.sql.pandas.types import to_arrow_schema

        special = {SPLIT_COLUMN, self._content_col, *_META_COLS}
        meta_fields = [
            f for f in self._schema.fields if f.name not in special
        ]
        arrow_meta = to_arrow_schema(StructType(meta_fields))
        parse = pacsv.ParseOptions(newlines_in_values=True)
        convert = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in arrow_meta},
            strings_can_be_null=True,
        )
        try:
            tbl = pacsv.read_csv(
                partition.csv_path,
                parse_options=parse,
                convert_options=convert,
            )
        except pa.ArrowInvalid:
            # a type pyarrow's csv converter cannot parse directly
            # (rare — e.g. exotic decimals): read raw, cast after
            tbl = pacsv.read_csv(
                partition.csv_path, parse_options=parse
            )
            tbl = tbl.cast(
                pa.schema(
                    [arrow_meta.field(c) for c in tbl.column_names]
                )
            )
        n = tbl.num_rows
        cols: dict[str, pa.ChunkedArray | pa.Array] = {
            f.name: tbl.column(f.name) for f in meta_fields
        }
        cols[SPLIT_COLUMN] = pa.array(
            [partition.split_name] * n, pa.string()
        )
        if self._with_content:
            members: dict[str, bytes] = {}
            tar_err: str | None = None
            if partition.tar_path is not None:
                try:
                    with tarfile.open(partition.tar_path, "r") as tf:
                        for m in tf.getmembers():
                            fh = tf.extractfile(m)
                            if fh is not None:
                                members[m.name] = fh.read()
                except Exception as e:  # noqa: BLE001 — tolerant contract
                    tar_err = f"{type(e).__name__}: {e}"
            else:
                tar_err = "missing archive"
            contents: list[bytes | None] = []
            ok: list[bool] = []
            err: list[str | None] = []
            for name in tbl.column(self._name_col).to_pylist():
                data = members.get(str(name))
                if data is None:
                    contents.append(None)
                    ok.append(False)
                    err.append(
                        tar_err or f"KeyError: {name!r} not in archive"
                    )
                else:
                    contents.append(data)
                    ok.append(True)
                    err.append(None)
            cols[self._content_col] = pa.array(contents, pa.binary())
            cols["is_correct"] = pa.array(ok, pa.bool_())
            cols["error"] = pa.array(err, pa.string())
        full = to_arrow_schema(self._schema)
        out = pa.table(
            [cols[f.name] for f in self._schema.fields], schema=full
        )
        yield from out.to_batches()


class ShardsDataSource(DataSource):
    """``spark.read.format("dpf_shards")`` — see module docstring.

    Options: ``path`` (shard dir), ``content`` ('auto'|'true'|'false',
    default auto: bytes columns appear iff any archive exists),
    ``name_col`` (tar member key column, default 'name'),
    ``content_col`` (default 'content'), ``archive_ext`` (default
    'tar'). When the caller supplies ``.schema(...)``, content columns
    are emitted iff the schema contains ``content_col``."""

    @classmethod
    def name(cls) -> str:
        return "dpf_shards"

    def schema(self) -> StructType:
        import pyarrow.csv as pacsv

        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("dpf_shards requires a path")
        archive_ext = self.options.get("archive_ext", "tar")
        csvs, tars = _list_shards(path, archive_ext)
        if not csvs:
            raise ValueError(f"no .csv shard tables under {path}")
        content_opt = self.options.get("content", "auto")
        with_content = content_opt == "true" or (
            content_opt == "auto" and bool(tars)
        )
        # FIRST-shard inference only (the sampling trade every csv
        # reader makes — pass .schema() to pin types exactly)
        first = pacsv.read_csv(
            os.path.join(path, f"{csvs[0]}.csv"),
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
        )
        inferred = from_arrow_schema(first.schema)
        fields = list(inferred.fields)
        fields.append(StructField(SPLIT_COLUMN, StringType()))
        if with_content:
            fields.append(
                StructField(
                    self.options.get("content_col", "content"),
                    BinaryType(),
                )
            )
            fields.append(StructField("is_correct", BooleanType()))
            fields.append(StructField("error", StringType()))
        return StructType(fields)

    def reader(self, schema: StructType) -> ShardsReader:
        return ShardsReader(schema, dict(self.options))


def register_shards_source(spark) -> None:
    """Idempotently register ``dpf_shards`` on the session.

    The DataSource class is shipped to Python workers by cloudpickle;
    by default classes pickle BY REFERENCE (module + name), which
    requires this package on every worker's import path. Registering
    the module for by-value pickling makes the source self-contained —
    it works from any driver that merely has the package importable
    (e.g. a sys.path-injected harness), with no cluster-side install."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    # self-enable (runtime-settable SQL conf): Spark REFUSES a reader
    # that implements pushFilters while this flag is false, and the
    # external harness brings a vanilla session — same pattern as the
    # events nanosAsLong self-enable (see .claude/skills/verify)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ShardsDataSource)
