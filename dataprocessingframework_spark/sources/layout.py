"""Data layout for scan pruning — how a 100 TB table avoids being read.

Parquet footers carry per-row-group min/max statistics; Spark (and
every other engine) skips row groups whose range excludes the
predicate. But statistics only prune if the data is CLUSTERED on the
predicate column: random placement makes every row-group range span
the whole domain. `write_range_partitioned` lays a dataset out so
range predicates on the sort key touch only the files they must —
`repartitionByRange` (one sampled range shuffle) + in-partition sort.

The reference has no layout control at all (shards are filled in
arrival order, `processors/writers/shards_writer.py:120-160`); this is
pure scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_partitioned(
    df: DataFrame,
    path: str,
    sort_col: str,
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on ``sort_col``: file i holds the i-th
    range of the key domain (sampled quantile boundaries), rows sorted
    within each file so row-group min/max are tight."""
    (
        df.repartitionByRange(num_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def file_key_ranges(path: str, col: str) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``col`` per parquet file, from footer
    statistics only (no data read) — the pruning map a range predicate
    sees. Driver-side helper for layout verification and debugging."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((os.path.basename(f), lo, hi))
    return out


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning: ``col=value/`` subdirectories
    that partition pruning eliminates WHOLESALE from a scan — the scan
    plan's ``PartitionFilters`` never lists, opens, or footer-reads a
    pruned directory, one level stronger than row-group min/max
    pruning (which still reads every footer).

    The ``repartition`` on the partition columns is the small-files
    guard: without it every one of T tasks writes a file into every
    one of P partition directories (T x P files at 100 TB — millions);
    with it each partition's rows land in few tasks. Use
    LOW-CARDINALITY columns (date, source, lang); high-cardinality
    partitioning recreates the small-files problem as directories.
    """
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
