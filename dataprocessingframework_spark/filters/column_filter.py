"""U1 — ColumnFilter: scalar UDF over metadata columns.

Reference contract (`filters/column_filter.py:8-67`): declare
``columns_to_process`` -> ``process_sample(row_dict) -> list`` ->
``result_columns``; executed via pandarallel row-apply and merged back
as new columns.

Spark re-expression: one ``mapInPandas`` pass that *passes through* the
input columns and appends the typed result columns — Arrow-batched, no
merge join needed (the reference's merge-back at
`processors/processor.py:224-243` disappears). Subclasses either
override ``process_pandas`` (vectorized, preferred) or just
``process_sample`` (row-at-a-time fallback, same contract as the
reference).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DataType, StructField, StructType


class ColumnFilter(ABC):
    """Adds ``result_schema`` columns computed from ``columns_to_process``."""

    @property
    @abstractmethod
    def columns_to_process(self) -> list[str]: ...

    @property
    @abstractmethod
    def result_schema(self) -> list[tuple[str, DataType]]: ...

    # ---- one of the two must be overridden ------------------------------
    def process_sample(self, row: dict[str, Any]) -> list[Any]:
        raise NotImplementedError

    def process_pandas(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """Vectorized batch kernel; default falls back to per-row."""
        results = [self.process_sample(row) for row in pdf.to_dict("records")]
        names = [n for n, _ in self.result_schema]
        return pd.DataFrame(results, columns=names, index=pdf.index)

    # ---------------------------------------------------------------------
    def __call__(self, df: DataFrame) -> DataFrame:
        result_fields = [StructField(n, t) for n, t in self.result_schema]
        out_schema = StructType(list(df.schema.fields) + result_fields)
        needed = self.columns_to_process

        def run(pdfs):
            for pdf in pdfs:
                res = self.process_pandas(pdf[needed])
                out = pdf.copy()
                for n, _ in self.result_schema:
                    out[n] = res[n].values
                yield out

        return df.mapInPandas(run, out_schema)
