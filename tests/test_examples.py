"""Smoke test for examples/quickstart.py — the worked example must
keep running end-to-end (VERDICT r4 item 5: a runnable quickstart is
part of the user-facing surface, so it is executed, not just shipped).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)


def test_quickstart_pipeline_end_to_end(spark, tmp_path):
    import quickstart

    dataset_dir = quickstart.build_example_dataset(
        str(tmp_path / "example_dataset")
    )
    result = quickstart.run_pipeline(
        spark, dataset_dir, str(tmp_path / "curated")
    )
    assert result["rows_in"] == 6
    # exactly the one cross-shard phash duplicate is removed
    assert result["rows_deduped"] == 1
    assert result["rows_kept"] == 5
    assert result["shards_written"] >= 1

    # the curated output is itself a readable shards dataset
    from dataprocessingframework_spark.configs import ShardsDatasetConfig
    from dataprocessingframework_spark.sources.media import load_shard_bytes
    from dataprocessingframework_spark.sources.reader import DatasetReader

    ds = DatasetReader(spark).read(
        ShardsDatasetConfig(
            path=result["out_dir"], name_columns=["image_name"]
        )
    )
    assert ds.count() == 5
    reread = load_shard_bytes(
        ds.df, "image_name_tar_path", "image_name"
    ).collect()
    assert all(r.is_correct for r in reread)


def test_llm_curation_pipeline_end_to_end(spark):
    import llm_curation

    result = llm_curation.run_pipeline(spark, "/root/testdata/sf0.001")
    # the funnel only narrows
    assert (
        result["raw_docs"]
        >= result["after_quality_gate"]
        >= result["after_exact_dedup"]
        >= result["after_near_dedup"]
        > 0
    )
    assert result["chunks"] > 0 and result["packed_bins"] > 0


def test_video_curation_pipeline_end_to_end(spark, tmp_path):
    import video_curation

    dataset_dir = video_curation.build_example_dataset(
        str(tmp_path / "video_dataset")
    )
    result = video_curation.run_pipeline(
        spark, dataset_dir, str(tmp_path / "curated")
    )
    assert result["rows_in"] == 6
    # exactly the frame-dup and the under-duration clip are removed
    assert result["rows_removed"] == 2
    assert result["rows_kept"] == 4
    assert result["shards_written"] == 1


import glob
import json

import pytest


@pytest.mark.parametrize(
    "nb_path",
    sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(os.path.dirname(__file__)),
                "examples",
                "*.ipynb",
            )
        )
    ),
    ids=os.path.basename,
)
def test_notebook_code_cells_execute(spark, nb_path):
    """The five notebook walkthroughs (1:1 with the reference's
    examples/*.ipynb) are EXECUTED, not just shipped: every code cell
    runs in order in one namespace against the session Spark."""
    with open(nb_path) as f:
        nb = json.load(f)
    cells = [
        "".join(c["source"])
        for c in nb["cells"]
        if c["cell_type"] == "code"
    ]
    assert cells, nb_path
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["DPF_SPARK_ROOT"] = root
    ns = {"spark": spark}
    for i, src in enumerate(cells):
        try:
            exec(compile(src, f"{os.path.basename(nb_path)}:cell{i}", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"{nb_path} cell {i} failed: {e}\n---\n{src}"
            ) from e


def test_shards_lifecycle_end_to_end(spark, tmp_path):
    """r13: the shards-lifecycle walkthrough (batch commit-protocol
    write -> exactly-once streaming appends -> compaction -> pruned
    read) must keep running with its documented invariants."""
    import shards_lifecycle

    result = shards_lifecycle.run_pipeline(spark, str(tmp_path / "life"))
    assert result["shards_after_batch"] == 2
    assert result["rows_after_stream"] == 52
    assert result["rows_after_rerun"] == 52  # exactly-once rerun
    assert result["shards_after_stream"] == 5
    assert result["compaction"]["retired"] == ["2", "3", "4"]
    assert result["compaction"]["new"] == ["5"] and (
        result["compaction"]["rows"] == 12
    )
    assert result["shards_after_compact"] == 3
    assert result["rows_total"] == 52
    assert result["pruned_partitions"] == 1
    assert result["objectstore_rows"] == 40  # r14: fakeobj:// leg
    assert result["dir_layout_rows"] == 40  # r14: sharded-files leg
    assert result["dir_layout_loose_members"] == 20
    assert result["updated_k_sum"] == 90  # r14: 2*sum(0..9)
    # r16: both repair ops demoed end-to-end
    assert result["crashed_update_write_refused"] is True
    assert result["crashed_update_healed"] is True
    assert result["healed_k_sum"] == 4006  # 1000+1001+1002+1003
    assert result["schema_absent_before_repair"] is True
    assert result["schema_repaired"] is True
    assert result["republished_columns"] == ["name", "k"]


def test_semantic_gate_ladder_end_to_end(spark, tmp_path):
    """r12: the compressed-gate ladder example must keep running —
    quantizer health -> repair -> 4-rung indexing -> sizing reports
    -> one batch gated identically on every rung via the dispatcher."""
    import semantic_gate_ladder

    try:
        result = semantic_gate_ladder.run_pipeline(
            spark, "/root/testdata/sf0.001", str(tmp_path / "ladder")
        )
    finally:
        semantic_gate_ladder.cleanup(spark)
    assert result["rungs_agree"] is True
    assert result["max_cell_after"] < result["max_cell_before"]
    assert 0 < result["kept_rows"] < result["batch_rows"]
    assert 0.0 <= result["pq_frac_no_headroom"] <= 1.0
