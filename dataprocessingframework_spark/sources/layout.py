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


def zorder_value(cols, mins, maxs, bits: int = 8):
    """Morton z-value expression over numeric columns: each column is
    equi-width bucketed to [0, 2^bits) against its broadcast min/max,
    then the bucket bits interleave. Pure JVM bit arithmetic
    (whole-stage codegen); no shuffle of its own."""
    from pyspark.sql import functions as F

    n = len(cols)
    levels = (1 << bits) - 1
    buckets = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi) - float(lo)
        if span <= 0:
            buckets.append(F.lit(0).cast("long"))
            continue
        scaled = (
            (F.col(c).cast("double") - F.lit(float(lo)))
            / F.lit(span)
            * F.lit(levels)
        )
        b = F.least(
            F.greatest(F.floor(scaled).cast("long"), F.lit(0).cast("long")),
            F.lit(levels).cast("long"),
        )
        buckets.append(b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet z-ordered on MULTIPLE columns: rows sort along the
    Morton curve, so every file covers a compact hyper-rectangle of
    the (col1, col2, ...) domain and parquet min/max footer statistics
    prune on ANY of the z-ordered columns — where a plain sort key
    only prunes its leading column. The Delta/Iceberg OPTIMIZE ZORDER
    move, built from repartitionByRange + codegen bit interleave.

    Column min/max come from ONE tiny aggregate (driver-collected,
    2 x len(cols) scalars); the only shuffle is the range partition on
    the z-value.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    mins = [stats[f"lo_{c}"] for c in cols]
    maxs = [stats[f"hi_{c}"] for c in cols]
    z = zorder_value(cols, mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )

