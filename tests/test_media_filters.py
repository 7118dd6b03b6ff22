"""K3/K4/K7/K9 kernels + M-tier schema tests (DummyGPUFilter pattern)."""

import numpy as np
import pytest

from dataprocessingframework_spark.filters.kernels import (
    ImageInfoFilter,
    encode_fake_image,
)
from dataprocessingframework_spark.filters.media_kernels import (
    AudioInfoFilter,
    FrameFilterAdapter,
    VideoInfoFilter,
    encode_fake_audio,
    encode_fake_video,
    translate_column,
)
from dataprocessingframework_spark.filters.model_filters import (
    CLIPLabelsFilter,
    DummyGPUFilter,
    HAVE_TORCH,
)


def test_video_info_filter(spark):
    frame = encode_fake_image(np.zeros((4, 6, 3), dtype=np.uint8))
    rows = [
        ("v0", bytearray(encode_fake_video(640, 480, 29.97, 12000, frame))),
        ("bad", bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, schema="name string, content binary")
    out = {r.name: r for r in VideoInfoFilter()(df).collect()}
    assert out["v0"].vid_is_correct
    assert (out["v0"].width, out["v0"].height) == (640, 480)
    assert out["v0"].fps == 29.97 and out["v0"].duration == 12.0
    assert not out["bad"].vid_is_correct and out["bad"].vid_error


def test_audio_info_filter(spark):
    rows = [
        ("a0", bytearray(encode_fake_audio(44100, 2500))),
        ("bad", bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, schema="name string, content binary")
    out = {r.name: r for r in AudioInfoFilter()(df).collect()}
    assert out["a0"].aud_is_correct
    assert out["a0"].sample_rate == 44100 and out["a0"].duration == 2.5
    assert not out["bad"].aud_is_correct


def test_frame_adapter_composes_image_filter_on_video(spark):
    """K9: video -> frame -> wrapped ImageInfoFilter."""
    frame = encode_fake_image(np.zeros((4, 6, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [("v0", bytearray(encode_fake_video(640, 480, 30.0, 1000, frame)))],
        schema="name string, content binary",
    )
    out = FrameFilterAdapter(ImageInfoFilter())(df).collect()[0]
    assert out.img_is_correct
    assert (out.width, out.height) == (6, 4)  # frame dims, not video dims


def test_translate_dedup_pattern(spark):
    """K7: expensive call runs once per DISTINCT value."""
    calls = []

    def fake_translate(batch):
        calls.append(list(batch))
        return [t[::-1] for t in batch]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["hola", "hola", "mundo", "hola"])],
        schema="id int, text string",
    )
    out = translate_column(
        df.repartition(1), "text", fake_translate, max_symbols_in_batch=8
    )
    rows = {(r.id, r.text_translated) for r in out.collect()}
    assert rows == {(0, "aloh"), (1, "aloh"), (2, "odnum"), (3, "aloh")}
    # row count preserved by the broadcast left join-back
    assert out.count() == 4


def test_dummy_gpu_filter_runs_without_torch(spark):
    df = spark.createDataFrame(
        [("x", bytearray(b"anything"))], schema="name string, content binary"
    )
    out = DummyGPUFilter()(df).collect()
    assert out[0].dummy_label == "dummy"


def test_model_filter_schema_without_weights(spark):
    """M-tier declares schemas for planning even when torch is absent."""
    f = CLIPLabelsFilter(labels=["cat", "dog"])
    assert [n for n, _ in f.result_schema] == ["clip_score_cat", "clip_score_dog"]
    if not HAVE_TORCH:
        df = spark.createDataFrame(
            [("x", bytearray(b"d"))], schema="name string, content binary"
        )
        with pytest.raises(Exception, match="torch"):
            f(df).collect()


def test_m_tier_schemas_and_loud_gating():
    """Every M-tier filter constructs, declares its result schema, and
    (without the model stack) raises NotImplementedError from
    preprocess — NEVER silently nulls rows (data_filter passthrough)."""
    from dataprocessingframework_spark.filters.model_filters import (
        AestheticFilter,
        CaptioningFilter,
        NSFWFilter,
        T2ISimilarityFilter,
        WatermarksFilter,
    )

    from dataprocessingframework_spark.filters.model_filters import (
        OCRFilter,
        RAFTOpticalFlowFilter,
        TextDetectionFilter,
    )

    cases = [
        (AestheticFilter(), ["aesthetic_score"]),
        (NSFWFilter(), ["nsfw_score"]),
        (WatermarksFilter(), ["watermark"]),
        (CaptioningFilter(), ["caption_describe"]),
        (T2ISimilarityFilter(), ["t2i_similarity"]),
        (
            TextDetectionFilter(),
            ["text_boxes", "num_text_boxes", "text_area"],
        ),
        (OCRFilter(), ["ocr_text"]),
        (RAFTOpticalFlowFilter(), ["mean_optical_flow_raft"]),
    ]
    # M7 consumes M6's output column through metadata_columns — the
    # DataFilter composition contract
    assert OCRFilter().metadata_columns == ["text_boxes"]
    for f, names in cases:
        assert [n for n, _ in f.result_schema] == names
        if not HAVE_TORCH:
            with pytest.raises(NotImplementedError):
                f.preprocess(b"bytes", {"caption": "hi"})
            with pytest.raises(NotImplementedError):
                f.process_batch([b"bytes"])


def test_video_captioning_filter_schema_and_sampling(spark):
    """M14 contract: schema declared without weights, frame sampling
    runs through the same decode path as K9, gating is loud."""
    from dataprocessingframework_spark.filters.model_filters import (
        VideoCaptioningFilter,
    )

    f = VideoCaptioningFilter(num_frames=4, prompt="describe")
    assert [n for n, _ in f.result_schema] == ["video_caption_describe"]
    if not HAVE_TORCH:
        with pytest.raises(NotImplementedError):
            f.preprocess(b"bytes", {})
        with pytest.raises(NotImplementedError):
            f.process_batch([b"bytes"])


def test_text_detection_default_body_is_gated_not_absent(spark):
    """M6: with no injected detector, setup() must try to LOAD a public
    CRAFT port (craft_text_detector / easyocr) — i.e. raise the loud
    NotImplementedError only because the stack is absent here, not
    because the body is a stub. With an injected detector the full
    kernel must run without any model stack... except PIL decode."""
    from dataprocessingframework_spark.filters.model_filters import (
        HAVE_PIL,
        TextDetectionFilter,
    )

    f = TextDetectionFilter()
    if not HAVE_TORCH:
        with pytest.raises(NotImplementedError):
            f.setup()
    # injected-detector seam still composes with OCRFilter downstream
    fake = TextDetectionFilter(detector=lambda img: [(0, 0, 2, 2)])
    assert [n for n, _ in fake.result_schema] == [
        "text_boxes",
        "num_text_boxes",
        "text_area",
    ]
    if HAVE_PIL:  # pragma: no cover - stack not in this sandbox
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 4)).save(buf, format="PNG")
        img = fake.preprocess(buf.getvalue(), {})
        out = fake.infer_batch([img])
        assert out["num_text_boxes"] == [1]


def test_frame_adapter_composes_captioning_filter(spark):
    """M14/K9 composition: the IMAGE CaptioningFilter wrapped in
    FrameFilterAdapter becomes a single-frame video captioner — the
    adapter must surface the wrapped schema and (without torch) the
    wrapped filter's loud gate, never silent nulls."""
    from dataprocessingframework_spark.filters.media_kernels import (
        FrameFilterAdapter,
    )
    from dataprocessingframework_spark.filters.model_filters import (
        CaptioningFilter,
    )

    wrapped = FrameFilterAdapter(CaptioningFilter(prompt="describe"))
    assert [n for n, _ in wrapped.result_schema] == ["caption_describe"]
    assert wrapped.content_column == "content"
    if not HAVE_TORCH:
        # decode succeeds (synthetic codec); the wrapped filter's gate
        # must fire on the extracted frame
        frame = encode_fake_image(np.zeros((4, 6, 3), dtype=np.uint8))
        video = encode_fake_video(640, 480, 30.0, 1000, frame)
        with pytest.raises(NotImplementedError):
            wrapped.preprocess(video, {})


class _FakeTensor:
    """Duck-typed float tensor for torch-less CI: records precision."""

    def __init__(self, dtype="float32", floating=True):
        self.dtype = dtype
        self.floating = floating

    def is_floating_point(self):
        return self.floating

    def half(self):
        return _FakeTensor("float16", True)

    def float(self):
        return _FakeTensor("float32", True)


def test_fp16_cast_floats_recurses_and_skips_non_floats():
    """cast_floats must halve every floating leaf in nested
    tuple/list/dict structure, restore fp32 on the way back, and leave
    non-float leaves (ints/strings/None/integer tensors) untouched —
    the reference FP16Module's conversion contract
    (DPF/filters/utils/fp16_module.py:10-45)."""
    from dataprocessingframework_spark.filters.fp16 import cast_floats

    t = _FakeTensor()
    ints = _FakeTensor("int64", floating=False)
    nested = (t, [t, {"a": t, "n": 7}], ints, "s", None)
    halved = cast_floats(nested, True)
    assert isinstance(halved, tuple) and isinstance(halved[1], list)
    assert halved[0].dtype == "float16"
    assert halved[1][0].dtype == "float16"
    assert halved[1][1]["a"].dtype == "float16"
    assert halved[1][1]["n"] == 7
    assert halved[2].dtype == "int64"  # integer tensor not converted
    assert halved[3] == "s" and halved[4] is None
    restored = cast_floats(halved, False)
    assert restored[0].dtype == "float32"


def test_watermarks_filter_half_default_and_gating():
    """WatermarksFilter defaults to fp16 like the reference
    (watermarks_filter.py:103); the knob is togglable and, without
    torch, setup still gates loudly instead of failing inside the
    half-wrap."""
    from dataprocessingframework_spark.filters.model_filters import (
        WatermarksFilter,
    )

    wf = WatermarksFilter()
    assert wf.half is True
    assert WatermarksFilter(half=False).half is False
    if not HAVE_TORCH:
        with pytest.raises(NotImplementedError):
            wf.setup()


@pytest.mark.skipif(not HAVE_TORCH, reason="torch not installed")
def test_wrap_half_converts_weights_and_keeps_fp32_contract():
    import torch

    from dataprocessingframework_spark.filters.fp16 import wrap_half

    lin = torch.nn.Linear(4, 2)
    wrapped = wrap_half(lin)
    assert next(wrapped.parameters()).dtype == torch.float16
    out = wrapped(torch.randn(3, 4))  # fp32 in
    assert out.dtype == torch.float32  # fp32 out


def test_fp16_cast_gates_on_exact_dtype():
    """Reference FLOAT_TYPES/HALF_TYPES gating: only fp32 halves on
    the way in, only fp16 floats on the way out — fp64 and bf16 pass
    through BOTH directions untouched (ADVICE r5: halving a double
    or upcasting a bf16 silently changed caller precision)."""
    from dataprocessingframework_spark.filters.fp16 import cast_floats

    f64 = _FakeTensor("float64")
    bf16 = _FakeTensor("bfloat16")
    f32 = _FakeTensor("float32")
    f16 = _FakeTensor("float16")
    halved = cast_floats((f64, bf16, f32, f16), True)
    assert halved[0].dtype == "float64"
    assert halved[1].dtype == "bfloat16"
    assert halved[2].dtype == "float16"
    assert halved[3].dtype == "float16"  # already half: untouched
    restored = cast_floats((f64, bf16, f16), False)
    assert restored[0].dtype == "float64"
    assert restored[1].dtype == "bfloat16"
    assert restored[2].dtype == "float32"
