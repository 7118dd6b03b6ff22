"""K3/K4/K7/K9 kernels: video/audio probes, the dedup-then-broadcast
expensive-call pattern, and the frame-adapter combinator.

Media decode uses synthetic deterministic codecs (the container has no
av/soundfile/PIL); real decoders slot in behind the import-tries. The
Spark-side shape — schemas, batching, join topology — is real.

Synthetic formats:
    FAKEVID:<w>x<h>x<fps>x<duration_ms>:<frame0 FAKEIMG bytes>
    FAKEAUD:<sample_rate>x<duration_ms>:
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
)

from dataprocessingframework_spark.filters.data_filter import DataFilter

_VID_MAGIC = b"FAKEVID:"
_AUD_MAGIC = b"FAKEAUD:"

try:
    import av  # noqa: F401

    HAVE_AV = True
except ImportError:
    HAVE_AV = False

try:
    import soundfile  # noqa: F401

    HAVE_SOUNDFILE = True
except ImportError:
    HAVE_SOUNDFILE = False


def encode_fake_video(
    width: int, height: int, fps: float, duration_ms: int, frame: bytes = b""
) -> bytes:
    return _VID_MAGIC + f"{width}x{height}x{fps}x{duration_ms}:".encode() + frame


def decode_video_info(data: bytes) -> tuple[int, int, float, float]:
    """(width, height, fps, duration_seconds); raises on garbage.

    Real containers probe through pyav when installed (the reference
    probes via imageio's pyav plugin, `filters/videos/info_filter.py:
    22-42`); the synthetic FAKEVID codec always decodes so tests run
    without av.
    """
    if data.startswith(_VID_MAGIC):
        header, _, _ = data[len(_VID_MAGIC):].partition(b":")
        w, h, fps, dur = header.split(b"x")
        return int(w), int(h), float(fps), int(dur) / 1000.0
    if HAVE_AV:
        import io as _io

        import av

        with av.open(_io.BytesIO(data)) as container:
            stream = next(
                s for s in container.streams if s.type == "video"
            )
            cc = stream.codec_context
            fps = float(stream.average_rate) if stream.average_rate else 0.0
            if container.duration is not None:
                duration = container.duration / 1_000_000.0  # av.time_base
            elif stream.duration is not None and stream.time_base is not None:
                duration = float(stream.duration * stream.time_base)
            else:
                duration = 0.0
            return int(cc.width), int(cc.height), fps, duration
    raise ValueError("undecodable video bytes")


def extract_video_frame(data: bytes, position: float = 0.5) -> bytes:
    """One decoded frame re-encoded as PNG bytes, taken at the given
    relative ``position`` of the clip (the fake codec stores one
    frame, so position is honored only by the real decoder)."""
    if data.startswith(_VID_MAGIC):
        _, _, frame = data[len(_VID_MAGIC):].partition(b":")
        if not frame:
            raise ValueError("video has no frame payload")
        return frame
    if HAVE_AV:
        import io as _io

        import av

        with av.open(_io.BytesIO(data)) as container:
            stream = next(
                s for s in container.streams if s.type == "video"
            )
            if container.duration:
                offset = int(container.duration * min(max(position, 0.0), 1.0))
                container.seek(offset, any_frame=False)
            for frame in container.decode(stream):
                buf = _io.BytesIO()
                frame.to_image().save(buf, format="PNG")
                return buf.getvalue()
        raise ValueError("video has no decodable frame")
    raise ValueError("undecodable video bytes")


def encode_fake_audio(sample_rate: int, duration_ms: int) -> bytes:
    return _AUD_MAGIC + f"{sample_rate}x{duration_ms}:".encode()


def decode_audio_info(data: bytes) -> tuple[int, float]:
    """(sample_rate, duration_seconds); raises on garbage. Real audio
    probes through soundfile when installed (reference:
    `filters/audios/info_filter.py:43-89` — duration = frames/rate)."""
    if data.startswith(_AUD_MAGIC):
        header, _, _ = data[len(_AUD_MAGIC):].partition(b":")
        sr, dur = header.split(b"x")
        return int(sr), int(dur) / 1000.0
    if HAVE_SOUNDFILE:
        import io as _io

        import soundfile as sf

        f = sf.SoundFile(_io.BytesIO(data))
        return int(f.samplerate), len(f) / float(f.samplerate)
    raise ValueError("undecodable audio bytes")


class VideoInfoFilter(DataFilter):
    """K3 — `filters/videos/info_filter.py:22-94` schema
    (is_correct, error, width, height, fps, duration)."""

    def __init__(self, content_column: str = "content") -> None:
        self._content_column = content_column

    @property
    def content_column(self) -> str:
        return self._content_column

    @property
    def result_schema(self):
        return [
            ("vid_is_correct", BooleanType()),
            ("vid_error", StringType()),
            ("width", IntegerType()),
            ("height", IntegerType()),
            ("fps", DoubleType()),
            ("duration", DoubleType()),
        ]

    def preprocess(self, data, metadata):
        if data is None:
            return (False, "no data", None, None, None, None)
        try:
            w, h, fps, dur = decode_video_info(data)
            return (True, None, w, h, fps, dur)
        except Exception as e:  # noqa: BLE001
            return (False, f"{type(e).__name__}: {e}", None, None, None, None)

    def process_batch(self, batch):
        ok, err, w, h, fps, dur = zip(*batch)
        return {
            "vid_is_correct": list(ok),
            "vid_error": list(err),
            "width": list(w),
            "height": list(h),
            "fps": list(fps),
            "duration": list(dur),
        }


class AudioInfoFilter(DataFilter):
    """K4 — `filters/audios/info_filter.py:43-89` schema."""

    def __init__(self, content_column: str = "content") -> None:
        self._content_column = content_column

    @property
    def content_column(self) -> str:
        return self._content_column

    @property
    def result_schema(self):
        return [
            ("aud_is_correct", BooleanType()),
            ("duration", DoubleType()),
            ("sample_rate", IntegerType()),
            ("aud_error", StringType()),
        ]

    def preprocess(self, data, metadata):
        if data is None:
            return (False, None, None, "no data")
        try:
            sr, dur = decode_audio_info(data)
            return (True, dur, sr, None)
        except Exception as e:  # noqa: BLE001
            return (False, None, None, f"{type(e).__name__}: {e}")

    def process_batch(self, batch):
        ok, dur, sr, err = zip(*batch)
        return {
            "aud_is_correct": list(ok),
            "duration": list(dur),
            "sample_rate": list(sr),
            "aud_error": list(err),
        }


class FrameFilterAdapter(DataFilter):
    """K9 — wraps any image DataFilter to run on one extracted video
    frame (`filters/videos/image_filter_adapter.py:13-84`): frame
    extraction composes before the wrapped filter's kernel."""

    def __init__(self, image_filter: DataFilter, position: float = 0.5) -> None:
        self.image_filter = image_filter
        self.position = position

    @property
    def content_column(self) -> str:
        return self.image_filter.content_column

    @property
    def result_schema(self):
        return self.image_filter.result_schema

    def preprocess(self, data, metadata):
        frame = None if data is None else extract_video_frame(data, self.position)
        return self.image_filter.preprocess(frame, metadata)

    def process_batch(self, batch):
        return self.image_filter.process_batch(batch)


def translate_column(
    df: DataFrame,
    text_col: str,
    translate_batch,
    result_col: str | None = None,
    max_symbols_in_batch: int = 3000,
) -> DataFrame:
    """K7 — the GoogleTranslateFilter execution pattern
    (`filters/texts/google_translate_filter.py:43-118`): expensive
    per-string calls are made once per DISTINCT value, char-capped
    batches, then mapped back — here as distinct() -> mapInPandas ->
    broadcast join, so the expensive path sees |unique| not |rows| and
    the big table never shuffles.

    ``translate_batch(list[str]) -> list[str]`` is the pluggable
    external call (a real API client or a local model).
    """
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    result_col = result_col or f"{text_col}_translated"
    uniq = df.select(text_col).distinct()

    out_schema = StructType(
        [StructField(text_col, StringType()), StructField(result_col, StringType())]
    )

    def run(pdfs):
        for pdf in pdfs:
            texts = pdf[text_col].tolist()
            results: list[str] = []
            batch: list[str] = []
            chars = 0
            for t in texts + [None]:  # sentinel flushes the tail
                if t is not None and chars + len(str(t)) <= max_symbols_in_batch:
                    batch.append(str(t))
                    chars += len(str(t))
                    continue
                if batch:
                    results.extend(translate_batch(batch))
                if t is None:
                    break
                batch, chars = [str(t)], len(str(t))
            yield pd.DataFrame({text_col: texts, result_col: results})

    translations = uniq.mapInPandas(run, out_schema)
    return df.join(F.broadcast(translations), on=text_col, how="left")
