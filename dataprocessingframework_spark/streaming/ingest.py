"""Incremental dataset ingestion — the streaming twin of the
reference's resume-from-last-shard append mode
(`processors/writers/shards_writer.py:92-119`).

The reference resumes by scanning the output directory for the highest
shard index. Structured Streaming subsumes that: the checkpoint
records exactly which source files each committed micro-batch read, so
re-running the ingest picks up only files that appeared since — with
exactly-once output even across crashes mid-batch. At 100 TB this is
how a corpus directory that grows by thousands of shards a day is
folded into a curated parquet dataset without ever re-reading history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def incremental_ingest(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    src_format: str = "json",
    transform=None,
    max_files_per_trigger: int | None = None,
) -> int:
    """Process all source files not yet recorded in the checkpoint,
    append them (optionally transformed) to ``out_dir`` as parquet, and
    return. Idempotent: a rerun with the same checkpoint ingests only
    new files; a rerun with no new files writes nothing.

    ``transform`` is an optional DataFrame -> DataFrame stage (filter /
    projection / column derivation), applied inside the stream so it
    runs per micro-batch. ``max_files_per_trigger`` bounds the batch
    size for backfills (bounded state + steady checkpoints instead of
    one giant batch). Returns the number of micro-batches committed in
    this run.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream: DataFrame = getattr(reader, src_format)(src_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    n_batches = 0
    try:
        while q.isActive:
            q.awaitTermination(1)
        progress = q.recentProgress
        n_batches = sum(1 for p in progress if p["numInputRows"] > 0)
    finally:
        q.stop()
    return n_batches
