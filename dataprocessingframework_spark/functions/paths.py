"""Path/string helpers mirroring the reference's scalar usage (§2.7).

All pure Column expressions — JVM-side, inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def basename(col: Column | str) -> Column:
    """F1 — `col.str.split('/').str[-1]`
    (`validators/format_validators/sharded_validator.py:42`)."""
    return F.element_at(F.split(_c(col), "/"), -1)


def strip_prefix(col: Column | str, prefix_len: int) -> Column:
    """F2 — `col.str.slice(len(base_path)+1)`
    (`processors/files_processor.py:63`)."""
    return F.substring(_c(col), prefix_len + 1, 2**31 - 1)


def path_concat(*parts: Column | str) -> Column:
    """F3 — path building (`dataset_reader.py:95,101`)."""
    return F.concat_ws("/", *[_c(p) if not isinstance(p, Column) else p for p in parts])


def with_suffix_replaced(col: Column | str, old: str, new: str) -> Column:
    """F4 — `filepath.replace(ext_a, ext_b)` (`dataset_reader.py:177-191`)."""
    import re

    return F.regexp_replace(_c(col), re.escape(old) + "$", new)
