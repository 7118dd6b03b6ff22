"""Shards lifecycle: the csv(+tar) shard format as a first-class,
operationally complete Spark format.

The reference treats shards as a one-shot batch format (write once
with ShardsWriter, read with the DataLoader). This engine upgrades
the same on-disk layout into a managed dataset:

1. **Batch write** through the ``dpf_shards`` DataSource's commit
   protocol — task attempts write temps, the driver renames only
   after every task succeeds, so retries/speculation/failed jobs
   never corrupt or half-publish a dataset.
2. **Streaming appends** — ``writeStream.format("dpf_shards")``
   lands each micro-batch as new numbered shard pairs; per-batch
   write-ahead markers make failure-restart replays exactly-once.
3. **Compaction** — the streaming tail of tiny shards merges into
   right-sized pairs behind a crash-healable two-phase manifest;
   right-sized shards are never rescanned or rewritten.
4. **Pruned reads** — one shard pair per input partition, and a
   ``split_name`` predicate removes whole pairs from the scan before
   any file opens.
5. **Object storage** (r14) — the same lifecycle runs on paths with
   no atomic rename: here the ``fakeobj://`` test backend (S3-class
   semantics — whole-object PUTs, copy+delete rename); on a real
   cluster, any fsspec scheme (``s3://``/``gs://``/...).
6. **Sharded-files layout** (r14) — ``layout='dir'`` writes the
   reference's other format (N.csv + loose-file folder N/) through
   the same commit protocol and reader.
7. **In-place metadata updates** (r14) —
   ``update_shard_metadata_native`` merges new metadata columns into
   the shard tables through attempt-unique temps + a write-ahead
   rename plan (crash heals forward), archives byte-untouched.

Run directly (writes under a temp dir by default):

    python examples/shards_lifecycle.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pipeline(spark, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from dataprocessingframework_spark.sources.shards_source import (
        compact_shards,
        register_shards_source,
        update_shard_metadata_native,
    )

    register_shards_source(spark)
    dataset = os.path.join(workdir, "dataset")
    stream_src = os.path.join(workdir, "incoming")
    ckpt = os.path.join(workdir, "ckpt")

    def docs(lo: int, n: int):
        return spark.range(lo, lo + n).select(
            F.concat(F.lit("doc_"), F.col("id")).alias("name"),
            F.col("id").cast("int").alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).cast("binary").alias(
                "content"
            ),
        )

    # 1. batch write: 40 rows -> 2 right-sized shard pairs
    (
        docs(0, 40)
        .repartition(1)
        .write.format("dpf_shards")
        .option("max_files_in_shard", "20")
        .mode("append")
        .save(dataset)
    )
    shards_after_batch = len(
        [f for f in os.listdir(dataset) if f.endswith(".csv")]
    )

    # 2. streaming appends: three tiny files -> three tiny shard pairs
    for lo in (100, 110, 120):
        docs(lo, 4).repartition(1).write.parquet(
            f"{stream_src}/b{lo}.parquet"
        )

    def run_stream() -> None:
        q = (
            spark.readStream.schema(docs(0, 1).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stream_src}/*")
            .writeStream.format("dpf_shards")
            .option("path", dataset)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    rows_after_stream = spark.read.format("dpf_shards").load(dataset).count()
    run_stream()  # replay/no-new-data: exactly-once, appends nothing
    rows_after_rerun = spark.read.format("dpf_shards").load(dataset).count()
    shards_after_stream = len(
        [f for f in os.listdir(dataset) if f.endswith(".csv")]
    )

    # 3. compact the streaming tail (the three 4-row pairs)
    summary = compact_shards(spark, dataset, max_files_in_shard=20)
    shards_after_compact = len(
        [f for f in os.listdir(dataset) if f.endswith(".csv")]
    )

    # 4. pruned read: one split -> one input partition, files of every
    # other shard never open
    back = spark.read.format("dpf_shards").load(dataset)
    first_split = back.select("split_name").first()["split_name"]
    one = back.filter(F.col("split_name") == first_split)
    # 5. the same lifecycle on OBJECT-STORE semantics: fakeobj:// has
    # no atomic rename (copy+delete), whole-object atomic PUTs — the
    # commit protocol's atomic points are single-object publishes, so
    # everything above still holds
    obj_dataset = f"fakeobj://{os.path.join(workdir, 'obj-dataset')}"
    (
        docs(0, 40)
        .repartition(1)
        .write.format("dpf_shards")
        .option("max_files_in_shard", "20")
        .mode("append")
        .save(obj_dataset)
    )
    obj_rows = spark.read.format("dpf_shards").load(obj_dataset).count()

    # 6. sharded-files layout: loose members in N/ folders, same
    # protocol (csv published LAST — the shard's visibility gate)
    dir_dataset = os.path.join(workdir, "dir-dataset")
    (
        docs(0, 40)
        .repartition(1)
        .write.format("dpf_shards")
        .option("max_files_in_shard", "20")
        .option("layout", "dir")
        .mode("append")
        .save(dir_dataset)
    )
    dir_rows = (
        spark.read.format("dpf_shards")
        .option("layout", "dir")
        .load(dir_dataset)
        .count()
    )
    loose_members = len(os.listdir(os.path.join(dir_dataset, "0")))

    # 7. in-place metadata update on the compacted dataset: double k
    # for the first 10 docs; untouched rows keep their values, tars
    # are never rewritten
    upd = spark.range(0, 10).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("name"),
        (F.col("id") * 2).cast("int").alias("k"),
    )
    update_shard_metadata_native(spark, dataset, upd, "name")
    after = spark.read.format("dpf_shards").load(dataset)
    updated_k_sum = after.filter(
        F.col("name").isin([f"doc_{i}" for i in range(10)])
    ).agg(F.sum("k")).collect()[0][0]

    return {
        "shards_after_batch": shards_after_batch,
        "rows_after_stream": rows_after_stream,
        "rows_after_rerun": rows_after_rerun,
        "shards_after_stream": shards_after_stream,
        "compaction": summary,
        "shards_after_compact": shards_after_compact,
        "rows_total": back.count(),
        "pruned_partitions": one.rdd.getNumPartitions(),
        "objectstore_rows": obj_rows,
        "dir_layout_rows": dir_rows,
        "dir_layout_loose_members": loose_members,
        "updated_k_sum": int(updated_k_sum),
    }


def main() -> None:
    from dataprocessingframework_spark.session import get_spark

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_spark(app_name="shards-lifecycle-example")
    spark.sparkContext.setLogLevel("ERROR")
    result = run_pipeline(spark, workdir)
    for k, v in result.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
