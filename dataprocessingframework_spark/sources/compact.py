"""Small-file compaction — dataset maintenance at scale.

Long-running ingestion (per-micro-batch streaming sinks, per-task
shard writers) accumulates many small files; at 100 TB that means
millions of sub-128MB parquet files, each costing a task, a footer
read, and a namenode/list call per query. Compaction rewrites a
dataset into ~target-sized files. The reference has no analogue (its
shard size is fixed at write time, `processors/processor.py:381`);
this is the maintenance op a Spark-native engine needs.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def dataset_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(num_files, total_bytes) for a dataset directory, via the JVM
    Hadoop FileSystem so it works for file://, hdfs:// and s3a:// alike
    — a recursive listing on the driver, no data read."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    it = fs.listFiles(p, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``in_path`` parquet into ``out_path`` with ~target-sized
    files; returns the output file count. Uses coalesce when shrinking
    (no shuffle — tasks just read multiple input splits) and falls back
    to repartition only when the input has too FEW partitions to
    parallelize the write."""
    _, total = dataset_file_stats(spark, in_path)
    df = spark.read.parquet(in_path)
    n_out = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    n_in = df.rdd.getNumPartitions()
    out = df.coalesce(n_out) if n_out <= n_in else df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_path)
    n_files, _ = dataset_file_stats(spark, out_path)
    return n_files


def compact_bucketed_index(
    spark: SparkSession,
    table: str,
) -> int:
    """Rewrite a bucketed table (e.g. a ``materialize_lsh_index`` /
    ``materialize_ivf_index`` corpus index) back to ONE file per
    bucket under the SAME bucket spec, and swap it in under the same
    table name. Returns the output file count (== num buckets).

    Why a dedicated op: every ``mode='append'`` index maintenance
    write adds ``num_buckets`` files (the bucket spec forces one file
    per bucket PER WRITE), so a thousand-micro-batch day of
    index-backed ingest turns the r8 one-file-per-bucket layout into
    1000x that many files and probe latency regresses to the exact
    small-files failure that fix eliminated. :func:`compact_parquet`
    cannot be used — a plain-parquet rewrite DESTROYS the bucket spec
    (the probe join would silently re-Exchange the 100 TB index).

    Mechanics: read the bucket spec (num buckets / bucket / sort
    columns, location, managed-vs-external) from the catalog, rewrite
    through ``write_bucketed`` into a ``{table}__compact`` swap table
    (external tables: a fresh ``{location}__c-{token}`` directory),
    then drop-and-rename — a metadata-only swap window. The companion
    ``{table}_centroids`` quantizer table is untouched. Old external
    files are deleted after the swap. Crash between drop and rename
    leaves the data intact under ``{table}__compact`` — re-run the
    compaction (it renames the finished swap table back) or rename
    manually; the batch-dir corpus remains the source of truth and
    the index is rebuildable regardless.

    Not safe under concurrent writers (like any table swap); run it
    from the maintenance slot of the ingest loop — see the
    ``compact_every`` option of the index-backed ingest wrappers.
    """
    import uuid

    from dataprocessingframework_spark.sources.bucketed import (
        write_bucketed,
    )

    swap = f"{table}__compact"
    if spark.catalog.tableExists(swap) and not spark.catalog.tableExists(
        table
    ):
        # crash recovery: a previous run finished the rewrite and the
        # drop but not the rename — complete it
        spark.sql(f"ALTER TABLE {swap} RENAME TO {table}")
        n, _ = dataset_file_stats(spark, _table_location(spark, table))
        return n

    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }
    num_buckets = int(desc["Num Buckets"])

    def _cols(key: str) -> list[str]:
        raw = desc.get(key, "[]").strip("[]")
        return [c.strip(" `") for c in raw.split(",") if c.strip(" `")]

    bucket_cols = _cols("Bucket Columns")
    sort_cols = _cols("Sort Columns") or None
    location = desc["Location"]
    external = desc.get("Type") == "EXTERNAL"

    spark.sql(f"DROP TABLE IF EXISTS {swap}")
    new_path = (
        f"{location}__c-{uuid.uuid4().hex[:8]}" if external else None
    )
    # read the RAW files, not the catalog table: a bucketed-table scan
    # advertises its hash partitioning, which lets Catalyst elide the
    # writer's repartition-on-bucket-cols as redundant — the rewrite
    # then degrades to one file per (scan task x bucket), the exact
    # layout being compacted away. A plain parquet scan forces the
    # real shuffle, restoring one file per bucket.
    write_bucketed(
        spark.read.parquet(location),
        swap,
        bucket_cols,
        num_buckets=num_buckets,
        sort_cols=sort_cols,
        path=new_path,
        mode="overwrite",
    )
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {swap} RENAME TO {table}")
    if external:
        # external DROP leaves the old files; reclaim them
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(location)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(p):
            fs.delete(p, True)
    n, _ = dataset_file_stats(spark, _table_location(spark, table))
    return n


def _table_location(spark: SparkSession, table: str) -> str:
    rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    return next(r.data_type for r in rows if r.col_name == "Location")
