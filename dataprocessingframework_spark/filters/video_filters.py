"""K8 (optical flow) and T3 (ffmpeg transform) — the video operators.

Both split into a deterministic, fully-tested core (frame-pair
sampling positions; ffmpeg argv construction; output-dimension math)
and an execution edge gated on the optional binary/library (cv2 /
ffmpeg), mirroring how this repo stubs all heavy media decode.
"""

from __future__ import annotations

import shutil
import subprocess
from typing import Any

from pyspark.sql.types import DoubleType

from dataprocessingframework_spark.filters.data_filter import DataFilter
from dataprocessingframework_spark.filters.media_kernels import (
    decode_video_info,
    extract_video_frame,
)

try:
    import cv2  # noqa: F401

    HAVE_CV2 = True
except ImportError:
    HAVE_CV2 = False


def frame_pair_positions(duration: float, fps: float, num_pairs: int = 3) -> list[tuple[float, float]]:
    """Deterministic (t, t + 1/fps) sample positions across the clip —
    the sampling scheme of the reference's Farneback filter
    (`filters/videos/farneback_filter.py:95-159`): evenly spaced pairs,
    consecutive frames one frame-interval apart."""
    if duration <= 0 or fps <= 0 or num_pairs <= 0:
        return []
    step = 1.0 / fps
    out = []
    for i in range(num_pairs):
        t = duration * (i + 0.5) / num_pairs
        t = min(t, max(0.0, duration - step))
        out.append((round(t, 6), round(t + step, 6)))
    return out


def farneback_mean_flow(gray_pairs: list[tuple[Any, Any]]) -> float:
    """Mean Farneback dense-flow magnitude over grayscale frame pairs —
    the reference's kernel and parameters verbatim
    (`filters/videos/farneback_filter.py:95-159`: pyramid_scale=0.5,
    levels=3, win_size=15, iterations=3, poly_n=5, poly_sigma=1.2)."""
    import cv2
    import numpy as np

    mags = []
    for a, b in gray_pairs:
        flow = cv2.calcOpticalFlowFarneback(
            a, b, None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        magnitude, _ = cv2.cartToPolar(flow[..., 0], flow[..., 1])
        mags.append(float(magnitude.mean()))
    return float(np.mean(mags)) if mags else 0.0


class OpticalFlowFilter(DataFilter):
    """K8 — mean optical-flow magnitude over sampled frame pairs.

    With cv2: real Farneback dense flow (``farneback_mean_flow``).
    Without: a deterministic frame-difference proxy (mean abs pixel
    delta of the sampled pair) so the full Spark plumbing — sampling,
    batching, schema — runs and is tested. Both paths consume the SAME
    sampled grayscale pairs, so the kernel swap changes only the score.
    """

    def __init__(self, content_column: str = "content", num_pairs: int = 3) -> None:
        self._content_column = content_column
        self.num_pairs = num_pairs

    @property
    def content_column(self) -> str:
        return self._content_column

    @property
    def result_schema(self):
        return [("optical_flow_mean", DoubleType())]

    def _gray_pairs(self, data: bytes, pairs: list[tuple[float, float]]):
        """Sampled grayscale (frame_t, frame_t+1) pairs. The synthetic
        codec carries one frame, so its pair partner is a time-shifted
        roll; a real container decodes the true frame at each t."""
        import numpy as np

        from dataprocessingframework_spark.filters.kernels import decode_image

        def to_gray(arr):
            a = arr.astype(np.float32)
            return a.mean(axis=2) if a.ndim == 3 else a

        if data.startswith(b"FAKEVID:"):
            frame = to_gray(decode_image(extract_video_frame(data)))
            return [
                (frame, np.roll(frame, shift=i + 1, axis=1))
                for i in range(len(pairs))
            ]
        # real container: one seek per sample position, then two
        # CONSECUTIVE decoded frames (the reference's frame-pair shape)
        import io

        import av

        out = []
        with av.open(io.BytesIO(data)) as container:
            stream = next(s for s in container.streams if s.type == "video")
            for t0, _t1 in pairs:
                container.seek(int(t0 * 1_000_000), any_frame=False)
                it = container.decode(stream)
                try:
                    a = to_gray(next(it).to_ndarray(format="rgb24"))
                    b = to_gray(next(it).to_ndarray(format="rgb24"))
                except StopIteration:
                    continue
                out.append((a, b))
        return out

    def preprocess(self, data: bytes | None, metadata: dict[str, Any]):
        if data is None:
            return None
        import numpy as np

        try:
            w, h, fps, duration = decode_video_info(data)
            pairs = frame_pair_positions(duration, fps, self.num_pairs)
            if not pairs:
                return 0.0
            gray_pairs = self._gray_pairs(data, pairs)
            if HAVE_CV2:
                return farneback_mean_flow(
                    [(a.astype(np.uint8), b.astype(np.uint8)) for a, b in gray_pairs]
                )
            return float(
                np.mean([np.abs(a - b).mean() for a, b in gray_pairs])
            )
        except Exception:  # noqa: BLE001
            return None

    def process_batch(self, batch):
        return {"optical_flow_mean": list(batch)}


class VideoFFMPEGTransform:
    """T3 — ffmpeg-based scale / retime / cut
    (`transforms/video_ffmpeg_transforms.py:31-143`). The argv builder
    (`:105-135` in the reference) is the deterministic, unit-tested
    core; execution requires the ffmpeg binary.
    """

    def __init__(
        self,
        scale: tuple[int, int] | None = None,
        fps: float | None = None,
        cut: tuple[float, float] | None = None,
        preset: str = "fast",
        crf: int = 23,
        copy_codec_on_cut: bool = False,
    ) -> None:
        self.scale = scale
        self.fps = fps
        self.cut = cut
        self.preset = preset
        self.crf = crf
        self.copy_codec_on_cut = copy_codec_on_cut

    @staticmethod
    def even_dims(width: int, height: int) -> tuple[int, int]:
        """yuv420 needs even dimensions — the reference's even-dims fix."""
        return width - (width % 2), height - (height % 2)

    def build_args(self, src: str, dst: str) -> list[str]:
        args = ["ffmpeg", "-y", "-hide_banner", "-loglevel", "error"]
        if self.cut:
            start, length = self.cut
            args += ["-ss", f"{start:.3f}"]
        args += ["-i", src]
        if self.cut:
            args += ["-t", f"{length:.3f}"]
        filters = []
        if self.scale:
            w, h = self.even_dims(*self.scale)
            filters.append(f"scale={w}:{h}")
        if self.fps:
            # eps guard: only retime when the target differs materially
            filters.append(f"fps=fps={self.fps:g}")
        if filters:
            args += ["-vf", ",".join(filters)]
        if self.cut and self.copy_codec_on_cut and not filters:
            args += ["-c", "copy"]
        else:
            args += ["-preset", self.preset, "-crf", str(self.crf)]
        args += ["-c:a", "copy", dst]
        return args

    def run(self, src: str, dst: str) -> None:
        if shutil.which("ffmpeg") is None:
            raise NotImplementedError("ffmpeg binary not available")
        subprocess.run(self.build_args(src, dst), check=True)
