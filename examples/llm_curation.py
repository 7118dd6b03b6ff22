"""LLM pretraining-data curation, end to end on the synthetic corpus.

The text counterpart of ``quickstart.py``: the pipeline a training-data
team runs over a raw crawl before tokenization, composed from this
engine's operators. Every stage is the real distributed path — the
same code curates 100 TB on a cluster; only the input size changes.

    raw documents
      1. quality gate        hashed-linear classifier (zero-shuffle)
      2. exact dedup         keep-first by doc_id
      3. near-dup dedup      MinHash -> LSH banding -> pair-driven
                             exact-Jaccard verify -> drop the higher
                             doc_id of each verified pair
      4. span dedup          stride-1 ExactSubstr-class removal of
                             cross-document duplicated token spans
      5. chunking            sliding 64-token windows, 48 stride
      6. packing             fixed 256-token training bins

Run:  python examples/llm_curation.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_pipeline(spark, sf_dir: str) -> dict:
    from dataprocessingframework_spark.dataset import Dataset
    from dataprocessingframework_spark.operators.text_analysis import (
        pack_sequences,
    )

    raw = Dataset(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text", "source"
        )
    )
    n_raw = raw.count()

    # 1. model-based quality gate (deterministic hashed-linear scorer;
    #    swap in learned weights for production — same plan)
    scored = raw.classify_quality()
    gated = raw._wrap(
        raw.df.join(
            scored.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
        )
    )
    n_gated = gated.count()

    # 2. exact dedup, deterministic keep-first
    exact = gated.drop_duplicates_keep_first(["text"], order_col="doc_id")
    n_exact = exact.count()

    # 3. near-dup dedup: LSH candidates -> exact-Jaccard verify ->
    #    drop the higher id of each verified pair
    pairs = exact.near_dup_pairs(
        "text", "doc_id", threshold=0.8, num_hashes=16, bands=4
    )
    near = exact._wrap(
        exact.df.join(
            pairs.select(F.col("id_b").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
    )
    n_near = near.count()

    # 4. cross-document duplicated-span removal (stride-1)
    clean = near._wrap(
        near.remove_dup_spans("text", "doc_id", n=8, min_docs=2).df.select(
            "doc_id", F.col("clean_text").alias("text")
        )
    )

    # 5-6. chunk to context windows, pack into training bins
    chunks = clean.chunk("text", "doc_id", window=64, stride=48)
    n_chunks = chunks.count()
    packed = pack_sequences(
        chunks.df.select(
            F.concat_ws("_", "doc_id", "chunk_id").alias("chunk_key"),
            F.col("chunk_text"),
        ),
        text_col="chunk_text",
        id_col="chunk_key",
        context_len=256,
        order_col="chunk_key",
    )
    # bins are per-shard: (shard, bin_id) identifies a training bin
    n_bins = packed.select("shard", "bin_id").distinct().count()

    return {
        "raw_docs": n_raw,
        "after_quality_gate": n_gated,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_near,
        "chunks": n_chunks,
        "packed_bins": n_bins,
    }


def main(sf_dir: str | None = None) -> dict:
    from dataprocessingframework_spark.session import get_spark

    sf_dir = sf_dir or "/root/testdata/sf0.001"
    spark = get_spark(app_name="dpf-spark-llm-curation")
    spark.sparkContext.setLogLevel("ERROR")
    result = run_pipeline(spark, sf_dir)
    print(
        "curated {raw_docs} raw docs -> {after_quality_gate} quality-gated"
        " -> {after_exact_dedup} exact-deduped -> {after_near_dedup}"
        " near-deduped -> {chunks} chunks in {packed_bins} training"
        " bins".format(**result)
    )
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
