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


def test_truncation_matches_reference():
    """Reference `transforms/resizer.py:37-51` uses int() truncation,
    not round-to-nearest: 3x7 at MAX_SIZE 4 scales the short side to
    4*3/7 = 1.71 -> 1 (round would give 2). VERDICT r5 item 7."""
    assert resize_dims(3, 7, ResizePolicy.MAX_SIZE, 4) == (1, 4)
    assert resize_dims(7, 3, ResizePolicy.MAX_SIZE, 4) == (4, 1)
    # MIN_SIZE: anchor = short side, long side truncated
    # 5x9 at MIN_SIZE 4: 4*9/5 = 7.2 -> 7
    assert resize_dims(5, 9, ResizePolicy.MIN_SIZE, 4) == (4, 7)


def test_downscale_only_strict_comparison_equivalence():
    """At exact equality the reference resizes (strict <) while the
    old code returned early (<=) — both land on identical dims, which
    this pins so the branch change can never drift."""
    assert resize_dims(3, 7, ResizePolicy.MAX_SIZE, 7, downscale_only=True) == (3, 7)
    assert resize_dims(3, 7, ResizePolicy.MIN_SIZE, 3, downscale_only=True) == (3, 7)
