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
