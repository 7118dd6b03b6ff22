"""Modality & datatype model (§1.1).

Reference: `DPF/modalities.py:4-58` declares the four modalities with
canonical column names; `DPF/datatypes.py:19-101` declares how a
modality is stored (inline column / standalone file / shard member).

Here the same declarations drive column naming and reader behavior;
media bytes are `binary` columns (or fetched lazily inside
`mapInPandas`), so a "datatype" maps to which column(s) carry or locate
the payload.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

ModalityName = Literal["image", "video", "text", "audio"]

MODALITIES: tuple[ModalityName, ...] = ("image", "video", "text", "audio")


@dataclass(frozen=True)
class DataModality:
    """Canonical column names per modality (`DPF/modalities.py:7-38`)."""

    name: ModalityName

    @property
    def path_column(self) -> str:
        return f"{self.name}_path"

    @property
    def sharded_file_name_column(self) -> str:
        return f"{self.name}_name"

    @property
    def column(self) -> str | None:
        """Inline content column (text lives in the table itself)."""
        return self.name if self.name == "text" else None


MODALITY_REGISTRY: dict[str, DataModality] = {
    name: DataModality(name) for name in MODALITIES
}


@dataclass(frozen=True)
class ColumnDataType:
    """Payload inline in a table column (`DPF/datatypes.py:19-47`)."""

    modality: DataModality

    @property
    def column(self) -> str:
        return self.modality.column or self.modality.name


@dataclass(frozen=True)
class FileDataType:
    """Payload in a standalone file named by a path column
    (`DPF/datatypes.py:50-74`) -> load via sources.media.load_file_bytes."""

    modality: DataModality
    ext: str = ""

    @property
    def path_column(self) -> str:
        return self.modality.path_column


@dataclass(frozen=True)
class ShardedDataType:
    """Payload is a shard-container member named by a basename column
    (`DPF/datatypes.py:77-101`) -> load via sources.media.load_shard_bytes."""

    modality: DataModality
    ext: str = ""

    @property
    def name_column(self) -> str:
        return self.modality.sharded_file_name_column
