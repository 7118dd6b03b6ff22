"""U4 — file/media transforms, immutable re-expression.

Reference (`transforms/base_file_transforms.py:18-120`) mutates media
files IN PLACE over a thread pool and merges changed metadata back.
Spark has no in-place: a transform is a ``mapInPandas`` that rewrites
the ``content`` bytes column (and its metadata columns) into a NEW
dataset, which a writer then persists — an immutable dataset version
(the semantic change is documented in SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import DataType, StructField, StructType


class BaseTransform(ABC):
    """Rewrites content bytes + appends/updates metadata columns."""

    content_column: str = "content"

    @property
    @abstractmethod
    def metadata_schema(self) -> list[tuple[str, DataType]]:
        """Columns updated/added alongside the new bytes."""

    @abstractmethod
    def transform_bytes(
        self, data: bytes | None, metadata: dict[str, Any]
    ) -> tuple[bytes | None, dict[str, Any]]: ...

    def __call__(self, df: DataFrame) -> DataFrame:
        meta_names = [n for n, _ in self.metadata_schema]
        passthrough = [
            f for f in df.schema.fields if f.name not in meta_names
        ]
        out_schema = StructType(
            passthrough + [StructField(n, t) for n, t in self.metadata_schema]
        )
        content_col = self.content_column

        def run(pdfs):
            for pdf in pdfs:
                out = pdf.copy()
                new_meta: dict[str, list[Any]] = {n: [] for n in meta_names}
                new_bytes = []
                for _, row in pdf.iterrows():
                    data = row[content_col]
                    b, meta = self.transform_bytes(
                        None if data is None else bytes(data), dict(row)
                    )
                    new_bytes.append(b)
                    for n in meta_names:
                        new_meta[n].append(meta.get(n))
                out[content_col] = new_bytes
                for n in meta_names:
                    out[n] = new_meta[n]
                yield out[[f.name for f in out_schema.fields]]

        return df.mapInPandas(run, out_schema)


class ImageResizeTransform(BaseTransform):
    """T2 — resize media, emit new width/height
    (`transforms/image_resize_transforms.py:12-47`), on the synthetic
    codec (real decoders slot into kernels.decode_image)."""

    def __init__(self, policy, size, downscale_only: bool = False) -> None:
        self.policy = policy
        self.size = size
        self.downscale_only = downscale_only

    @property
    def metadata_schema(self):
        from pyspark.sql.types import IntegerType

        return [("width", IntegerType()), ("height", IntegerType())]

    def transform_bytes(self, data, metadata):
        import numpy as np

        from dataprocessingframework_spark.filters.kernels import (
            decode_image,
            encode_fake_image,
        )
        from dataprocessingframework_spark.functions.resizer import resize_dims

        if data is None:
            return None, {"width": None, "height": None}
        try:
            arr = decode_image(data)
        except Exception:  # noqa: BLE001
            return data, {"width": None, "height": None}
        h, w = arr.shape[:2]
        nw, nh = resize_dims(w, h, self.policy, self.size, self.downscale_only)
        # nearest-neighbor index sampling: deterministic, decoder-free
        yi = (np.arange(nh) * h // nh).astype(int)
        xi = (np.arange(nw) * w // nw).astype(int)
        resized = arr[yi][:, xi]
        return encode_fake_image(resized), {"width": nw, "height": nh}
