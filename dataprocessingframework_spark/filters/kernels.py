"""Deterministic filter kernels (K1/K2/K5-analogues) and the synthetic
media codec used when real decoders (PIL/av/soundfile) are absent.

The container has no image/audio libs, so media decode is STUBBED with
a deterministic fake format while the Spark-side plumbing (schemas,
partitioning, Arrow batching, UDF contracts) is fully real and tested:

    FAKEIMG:<width>x<height>x<channels>:<pixel bytes row-major>

Real decoders slot into ``decode_image`` behind the import-try; the
kernels (phash DCT, info probe) operate on numpy arrays either way.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
)

from dataprocessingframework_spark.filters.data_filter import DataFilter

_MAGIC = b"FAKEIMG:"

try:  # real decoder, if ever available
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# ---------------------------------------------------------------- fake codec
def encode_fake_image(arr: np.ndarray) -> bytes:
    """Encode an (h, w, c) uint8 array into the synthetic format."""
    h, w, c = arr.shape
    return _MAGIC + f"{w}x{h}x{c}:".encode() + arr.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Decode image bytes -> (h, w, c) uint8 array.

    Supports the synthetic format always; PIL formats when available.
    Raises on garbage — callers map that to is_correct=false.
    """
    if data.startswith(_MAGIC):
        rest = data[len(_MAGIC):]
        header, _, payload = rest.partition(b":")
        w, h, c = (int(x) for x in header.split(b"x"))
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size != w * h * c:
            raise ValueError("payload size mismatch")
        return arr.reshape(h, w, c)
    if HAVE_PIL:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise ValueError("undecodable image bytes")


# ------------------------------------------------------------------ K1: info
class ImageInfoFilter(DataFilter):
    """K1 — is_correct/width/height/channels/error probe
    (`filters/images/info_filter.py:22-99`, schema FIXTURES.md §1.5)."""

    def __init__(self, content_column: str = "content") -> None:
        self._content_column = content_column

    @property
    def content_column(self) -> str:
        return self._content_column

    @property
    def result_schema(self):
        return [
            ("img_is_correct", BooleanType()),
            ("width", IntegerType()),
            ("height", IntegerType()),
            ("channels", IntegerType()),
            ("img_error", StringType()),
        ]

    def preprocess(self, data: bytes | None, metadata: dict[str, Any]):
        if data is None:
            return (False, None, None, None, "no data")
        try:
            arr = decode_image(data)
            h, w, c = arr.shape
            return (True, w, h, c, None)
        except Exception as e:  # noqa: BLE001
            return (False, None, None, None, f"{type(e).__name__}: {e}")

    def process_batch(self, batch):
        ok, w, h, c, err = zip(*batch)
        return {
            "img_is_correct": list(ok),
            "width": list(w),
            "height": list(h),
            "channels": list(c),
            "img_error": list(err),
        }


# ----------------------------------------------------------------- K2: phash
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (numpy-only; scipy absent)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


def _mean_pool_resize(gray: np.ndarray, out: int) -> np.ndarray:
    """Deterministic box-filter resize to (out, out)."""
    h, w = gray.shape
    ys = (np.arange(out + 1) * h // out).astype(int)
    xs = (np.arange(out + 1) * w // out).astype(int)
    res = np.empty((out, out), dtype=np.float64)
    for r in range(out):
        for c in range(out):
            block = gray[ys[r]: max(ys[r + 1], ys[r] + 1),
                         xs[c]: max(xs[c + 1], xs[c] + 1)]
            res[r, c] = block.mean()
    return res


def phash(arr: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> str:
    """Perceptual hash: resize -> 2-D DCT -> low-freq block -> median
    threshold -> hex. Same algorithm shape as the reference's
    `filters/images/hash_filters.py:13-28` (imagehash-style), decoder-
    and resize-kernel independent in structure, deterministic here.
    """
    gray = arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)
    img_size = hash_size * highfreq_factor
    small = _mean_pool_resize(gray, img_size)
    d = _dct_matrix(img_size)
    dct = d @ small @ d.T
    low = dct[:hash_size, :hash_size]
    med = np.median(low)
    bits = (low > med).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:0{hash_size * hash_size // 4}x}"


class PHashFilter(DataFilter):
    """K2 — `image_phash_8` column (`filters/images/hash_filters.py:31-86`)."""

    def __init__(self, content_column: str = "content", hash_size: int = 8) -> None:
        self._content_column = content_column
        self.hash_size = hash_size

    @property
    def content_column(self) -> str:
        return self._content_column

    @property
    def result_schema(self):
        return [(f"image_phash_{self.hash_size}", StringType())]

    def preprocess(self, data: bytes | None, metadata: dict[str, Any]):
        if data is None:
            return None
        try:
            return decode_image(data)
        except Exception:  # noqa: BLE001
            return None

    def process_batch(self, batch):
        name = f"image_phash_{self.hash_size}"
        return {
            name: [None if a is None else phash(a, self.hash_size) for a in batch]
        }
