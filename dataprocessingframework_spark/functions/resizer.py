"""Resize-policy math (T1): pure integer functions, reused by the image
transforms and unit-tested against the reference's semantics
(`transforms/resizer.py:5-53`; goldens in `tests/test_resizer.py:6-30`).

Three policies:
- FIXED: force (w, h);
- MIN_SIZE: scale so the SHORTER side equals ``size`` (upscale unless
  downscale_only);
- MAX_SIZE: scale so the LONGER side equals ``size`` (downscale unless
  already smaller; never upscale when downscale_only).

Aspect ratio preserved with round-to-nearest integer math.
"""

from __future__ import annotations

from enum import Enum


class ResizePolicy(str, Enum):
    FIXED = "fixed"
    MIN_SIZE = "min_size"
    MAX_SIZE = "max_size"


def resize_dims(
    width: int,
    height: int,
    policy: ResizePolicy,
    size: int | tuple[int, int],
    downscale_only: bool = False,
) -> tuple[int, int]:
    """New (width, height) under the given policy."""
    if policy == ResizePolicy.FIXED:
        if not isinstance(size, tuple):
            raise ValueError("FIXED policy requires size=(width, height)")
        return size
    if not isinstance(size, int):
        raise ValueError(f"{policy.name} policy requires an int size")
    if policy == ResizePolicy.MIN_SIZE:
        short = min(width, height)
        if downscale_only and short <= size:
            return width, height
        scale = size / short
    else:  # MAX_SIZE
        long_ = max(width, height)
        if downscale_only and long_ <= size:
            return width, height
        scale = size / long_
    return max(1, round(width * scale)), max(1, round(height * scale))
