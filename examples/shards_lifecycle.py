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
8. **Crash repair: updates** (r16) — writers REFUSE to land shards
   around an outstanding update plan; ``heal_metadata_update`` rolls
   the recorded rename plan forward and unblocks them.
9. **Crash repair: schema** (r16) — a ``_schema.json`` absent for an
   ambiguous reason is never re-published blind by a write path;
   ``publish_shard_schema`` is the explicit verifying repair that
   reads every shard header and republishes.

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

    # 8. crash REPAIR, update edition (r16): a metadata update that
    # died between its write-ahead rename plan and the renames leaves
    # the marker + temps behind. Writers REFUSE to land shards around
    # the outstanding plan (the error names the remedy); the heal
    # rolls the plan FORWARD (temps carry the new metadata), after
    # which writes flow again.
    import json

    from dataprocessingframework_spark.sources.shards_source import (
        heal_metadata_update,
        publish_shard_schema,
        read_published_schema,
    )

    repair_ds = os.path.join(workdir, "repair-dataset")
    docs(0, 4).repartition(1).write.format("dpf_shards").mode(
        "append"
    ).save(repair_ds)
    # simulate the crashed updater: temp with NEW metadata + marker,
    # renames never ran (exactly the state a mid-update kill leaves)
    tmp = os.path.join(repair_ds, ".deadbeef-u0.csv.tmp")
    with open(tmp, "w") as f:
        f.write(
            '"name","k"\n"doc_0",1000\n"doc_1",1001\n'
            '"doc_2",1002\n"doc_3",1003\n'
        )
    with open(os.path.join(repair_ds, "_metadata_update.json"), "w") as f:
        json.dump(
            {
                "state": "renaming",
                "map": {tmp: os.path.join(repair_ds, "0.csv")},
            },
            f,
        )
    try:
        docs(50, 4).repartition(1).write.format("dpf_shards").mode(
            "append"
        ).save(repair_ds)
        refused = False
    except Exception as e:  # noqa: BLE001 — the refusal is the point
        refused = "heal_metadata_update" in str(e)
    healed = heal_metadata_update(repair_ds)  # rolls forward -> True
    docs(50, 4).repartition(1).write.format("dpf_shards").mode(
        "append"
    ).save(repair_ds)  # flows again
    healed_k_sum = (
        spark.read.format("dpf_shards")
        .load(repair_ds)
        .filter(F.col("name").isin(["doc_0", "doc_1", "doc_2", "doc_3"]))
        .agg(F.sum("k"))
        .collect()[0][0]
    )

    # 9. crash REPAIR, schema edition (r16): `_schema.json` absent for
    # an AMBIGUOUS reason (here: a crashed predecessor's pre-write
    # drop). Cold reads still work — they fall back to inference and
    # pay a scan — and no write path will publish into ambiguous
    # absence (publishing blind would claim a schema for shards the
    # job never saw). publish_shard_schema is the explicit verifying
    # repair: it reads every shard's header, refuses a mixed dataset,
    # and republishes; cold reads plan with pinned types again.
    os.remove(os.path.join(repair_ds, "_schema.json"))
    schema_absent = read_published_schema(repair_ds) is None
    published = publish_shard_schema(spark, repair_ds)
    schema_repaired = read_published_schema(repair_ds) is not None

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
        "crashed_update_write_refused": refused,
        "crashed_update_healed": healed,
        "healed_k_sum": int(healed_k_sum),  # 1000+1001+1002+1003
        "schema_absent_before_repair": schema_absent,
        "schema_repaired": schema_repaired,
        "republished_columns": [f.name for f in published.fields],
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
