"""K8 optical flow plumbing, T3 ffmpeg argv builder, stateful streaming."""

import json

import numpy as np

from dataprocessingframework_spark.filters.kernels import encode_fake_image
from dataprocessingframework_spark.filters.media_kernels import encode_fake_video
from dataprocessingframework_spark.filters.text_filters import LangIdFilter
from dataprocessingframework_spark.filters.video_filters import (
    OpticalFlowFilter,
    VideoFFMPEGTransform,
    frame_pair_positions,
)
from dataprocessingframework_spark.streaming.stateful import running_user_totals


def test_frame_pair_positions_deterministic():
    pairs = frame_pair_positions(duration=10.0, fps=25.0, num_pairs=3)
    assert pairs == [
        (round(10 / 6, 6), round(10 / 6 + 0.04, 6)),
        (5.0, 5.04),
        (round(10 * 5 / 6, 6), round(10 * 5 / 6 + 0.04, 6)),
    ]
    assert frame_pair_positions(0.0, 25.0) == []
    # pair never exceeds duration
    t0, t1 = frame_pair_positions(1.0, 10.0, num_pairs=1)[0]
    assert t1 <= 1.0


def test_optical_flow_filter_runs(spark):
    rng = np.random.RandomState(2)
    frame = encode_fake_image(rng.randint(0, 255, (8, 8, 3), dtype=np.uint8))
    rows = [
        ("v0", bytearray(encode_fake_video(8, 8, 25.0, 2000, frame))),
        ("bad", bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, schema="name string, content binary")
    out = {r.name: r.optical_flow_mean for r in OpticalFlowFilter()(df).collect()}
    assert out["v0"] is not None and out["v0"] > 0
    assert out["bad"] is None


def test_ffmpeg_argv_builder():
    t = VideoFFMPEGTransform(scale=(641, 360), fps=24.0, cut=(1.5, 3.0))
    args = t.build_args("in.mp4", "out.mp4")
    assert args[:6] == ["ffmpeg", "-y", "-hide_banner", "-loglevel", "error", "-ss"]
    assert "-vf" in args
    vf = args[args.index("-vf") + 1]
    assert vf == "scale=640:360,fps=fps=24"  # odd width fixed to even
    assert args[args.index("-ss") + 1] == "1.500"
    assert args[args.index("-t") + 1] == "3.000"
    # copy-codec path only when no filters
    t2 = VideoFFMPEGTransform(cut=(0.0, 1.0), copy_codec_on_cut=True)
    a2 = t2.build_args("a", "b")
    assert "-c" in a2 and "copy" in a2


def test_langid_filter_heuristic(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of a house"), (2, "zzz qqq")],
        schema="id int, text string",
    )
    out = {r.id: (r.lang, r.lang_score) for r in LangIdFilter()(df).collect()}
    assert out[1][0] == "en" and out[1][1] > 0
    assert out[2] == ("unk", 0.0)


def test_running_user_totals_batch(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 5.0)], schema="user_id long, value double"
    )
    out = {r.user_id: (r.n_events, r.total_value) for r in running_user_totals(df).collect()}
    assert out == {1: (2, 5.0), 2: (1, 5.0)}


def test_running_user_totals_streaming(spark, tmp_path):
    """applyInPandasWithState across two micro-batches: state carries."""
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        f.write(json.dumps({"user_id": 1, "value": 2.0}) + "\n")
        f.write(json.dumps({"user_id": 1, "value": 3.0}) + "\n")

    stream = spark.readStream.schema("user_id long, value double").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        with open(src / "b1.json", "w") as f:
            f.write(json.dumps({"user_id": 1, "value": 5.0}) + "\n")
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM running_totals ORDER BY n_events DESC"
        ).collect()
        # update-mode sink appends one row per batch; the latest shows
        # accumulated state across batches
        assert (rows[0].n_events, rows[0].total_value) == (3, 10.0)
    finally:
        q.stop()


def test_stateful_sessionize_batch_parity(spark, sf_dir):
    """Batch fallback of the stateful sessionizer reproduces the
    lag/cumsum query's session partition on the real events table."""
    import dataprocessingframework_spark.queries as q
    from dataprocessingframework_spark.streaming import stateful_sessionize

    ev = q.T(spark, sf_dir, "events")
    mine = stateful_sessionize(ev).groupBy("user_id").count()
    ref = q.q_ev_sessionize(spark, sf_dir).groupBy("user_id").count()
    a = {r.user_id: r["count"] for r in mine.collect()}
    b = {r.user_id: r["count"] for r in ref.collect()}
    assert a == b


def test_stateful_sessionize_streaming_closes_on_gap(spark, tmp_path):
    """Two micro-batches: the first session closes (append-emitted)
    when a later event arrives past the gap; the open session stays in
    state, not in the sink."""
    from dataprocessingframework_spark.streaming import stateful_sessionize

    src = tmp_path / "sess_src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        f.write(json.dumps({"user_id": 1, "ts": "2024-01-01T12:00:00"}) + "\n")
        f.write(json.dumps({"user_id": 1, "ts": "2024-01-01T12:10:00"}) + "\n")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stateful_sessionize(stream, gap_sec=1800)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # next event 2h later -> closes the first session
        with open(src / "b1.json", "w") as f:
            f.write(
                json.dumps({"user_id": 1, "ts": "2024-01-01T14:10:00"}) + "\n"
            )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM sessions_out ORDER BY session_start"
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.n_events == 2
        assert r.session_end - r.session_start == 600
    finally:
        q.stop()
