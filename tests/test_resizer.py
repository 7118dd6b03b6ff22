"""T1 resize-policy math goldens (reference `tests/test_resizer.py:6-30`
shape: exact size tuples per policy)."""

from dataprocessingframework_spark.functions.resizer import (
    ResizePolicy,
    resize_dims,
)


def test_fixed():
    assert resize_dims(100, 50, ResizePolicy.FIXED, (10, 20)) == (10, 20)


def test_min_size_upscales_short_side():
    assert resize_dims(100, 50, ResizePolicy.MIN_SIZE, 100) == (200, 100)
    assert resize_dims(50, 100, ResizePolicy.MIN_SIZE, 100) == (100, 200)


def test_min_size_downscale_only_noop():
    assert resize_dims(100, 200, ResizePolicy.MIN_SIZE, 150, downscale_only=True) == (100, 200)
    assert resize_dims(300, 200, ResizePolicy.MIN_SIZE, 100, downscale_only=True) == (150, 100)


def test_max_size_caps_long_side():
    assert resize_dims(400, 200, ResizePolicy.MAX_SIZE, 100) == (100, 50)
    assert resize_dims(200, 400, ResizePolicy.MAX_SIZE, 100) == (50, 100)


def test_max_size_downscale_only_noop():
    assert resize_dims(80, 60, ResizePolicy.MAX_SIZE, 100, downscale_only=True) == (80, 60)


def test_never_zero():
    assert resize_dims(1000, 1, ResizePolicy.MAX_SIZE, 10) == (10, 1)


def test_aspect_rounding():
    assert resize_dims(3, 5, ResizePolicy.MAX_SIZE, 4) == (2, 4)
