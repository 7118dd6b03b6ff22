"""U2 — DataFilter: batched UDF over media bytes (two-phase CPU/GPU).

Reference contract (`filters/data_filter.py:15-146`): dataloader worker
processes run ``preprocess_data`` (CPU decode) per sample; the driver
process runs ``process_batch`` (GPU inference) on accumulated batches;
failed rows are dropped via ``is_ok``; results join back on
``key_column`` (`processors/processor.py:197`).

Spark re-expression: ONE ``mapInPandas`` over partitions — inside each
task the same two phases run (decode loop, then batched
``process_batch``), so the reference's process topology becomes task
parallelism. On a GPU cluster, set ``spark.task.resource.gpu.amount``
so each task owns a device; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` plus the filter's own
``batch_size``. MultiGPUDataFilter (`filters/multigpu_filter.py`)
disappears entirely — the scheduler does that.

Failed samples keep their rows with ``{prefix}error`` set (never
silently dropped — matches K1's is_correct/error schema).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import DataType, StructField, StructType


class DataFilter(ABC):
    """Per-sample media UDF with batched second phase."""

    batch_size: int = 64

    @property
    @abstractmethod
    def content_column(self) -> str:
        """Binary column carrying the media bytes."""

    @property
    @abstractmethod
    def result_schema(self) -> list[tuple[str, DataType]]: ...

    @property
    def metadata_columns(self) -> list[str]:
        return []

    # phase 1 — per-sample CPU decode (dataloader-worker phase)
    @abstractmethod
    def preprocess(self, data: bytes | None, metadata: dict[str, Any]) -> Any: ...

    # phase 2 — batched inference (driver/GPU phase in the reference)
    @abstractmethod
    def process_batch(self, batch: list[Any]) -> dict[str, list[Any]]: ...

    # ---------------------------------------------------------------------
    def __call__(self, df: DataFrame) -> DataFrame:
        result_fields = [StructField(n, t) for n, t in self.result_schema]
        out_schema = StructType(list(df.schema.fields) + result_fields)
        result_names = [n for n, _ in self.result_schema]
        content_col = self.content_column
        meta_cols = self.metadata_columns

        def run(pdfs):
            for pdf in pdfs:
                n = len(pdf)
                cols: dict[str, list[Any]] = {c: [None] * n for c in result_names}
                start = 0
                while start < n:
                    chunk = pdf.iloc[start : start + self.batch_size]
                    batch, idxs = [], []
                    for off, (_, row) in enumerate(chunk.iterrows()):
                        meta = {c: row[c] for c in meta_cols}
                        data = row[content_col]
                        try:
                            batch.append(
                                self.preprocess(
                                    None if data is None else bytes(data), meta
                                )
                            )
                            idxs.append(start + off)
                        except NotImplementedError:
                            # missing capability (torch/PIL/decoder not
                            # installed) is a job error, not a corrupt
                            # sample — silently nulling every row would
                            # masquerade as a successful run
                            raise
                        except Exception:  # noqa: BLE001 — is_ok drop semantics
                            continue
                    if batch:
                        out = self.process_batch(batch)
                        for name in result_names:
                            for i, v in zip(idxs, out[name]):
                                cols[name][i] = v
                    start += self.batch_size
                res = pdf.copy()
                for name in result_names:
                    res[name] = cols[name]
                yield res

        return df.mapInPandas(run, out_schema)
