"""Half-precision inference utilities for the M-tier.

Behavioral parity with the reference's FP16 wrapper
(`DPF/filters/utils/fp16_module.py:48-68`, applied by
`DPF/filters/images/watermarks_filter.py:56-57,103` and
`DPF/filters/images/text_detection_filter.py:30`): module weights are
stored in fp16, floating inputs are cast to half before the wrapped
forward, and outputs are cast back to fp32 — callers keep an fp32
contract while inference runs at half the memory bandwidth. On a GPU
executor that is the first throughput knob a user coming from the
reference reaches for; within Spark it composes with the per-task
``ModelFilter.setup()`` (each mapInPandas task halves its own replica
once).

The conversion helper is duck-typed (anything exposing
``is_floating_point()`` / ``.half()`` / ``.float()``), so the casting
logic is unit-testable in CI where torch is absent; only
:func:`wrap_half` itself requires torch.
"""

from __future__ import annotations

from typing import Any


def _dtype_name(val: Any) -> str:
    """Last dot-segment of the dtype ('torch.float32' -> 'float32',
    matching the duck-typed fakes' plain 'float32'). Exact compare —
    'bfloat16' must NOT string-match 'float16'."""
    return str(getattr(val, "dtype", "")).split(".")[-1]


def cast_floats(val: Any, to_half: bool) -> Any:
    """Recursively cast tensors inside nested tuples/lists/dicts:
    ``to_half=True`` casts ONLY fp32 tensors to half, else ONLY fp16
    tensors back to float — the reference FP16Module's
    FLOAT_TYPES/HALF_TYPES gating (`fp16_module.py:10-45`). fp64 and
    bf16 tensors pass through untouched (halving a double input or
    upcasting a bf16 output would silently change the wrapped
    module's precision contract), as do non-float leaves (ints,
    bools, strings, None); tuple/list/dict shape is preserved."""
    if isinstance(val, (tuple, list)):
        out = [cast_floats(v, to_half) for v in val]
        return tuple(out) if isinstance(val, tuple) else out
    if isinstance(val, dict):
        return {k: cast_floats(v, to_half) for k, v in val.items()}
    is_fp = getattr(val, "is_floating_point", None)
    if callable(is_fp) and is_fp():
        name = _dtype_name(val)
        if to_half and name == "float32":
            return val.half()
        if not to_half and name == "float16":
            return val.float()
    return val


def wrap_half(module: Any) -> Any:
    """Wrap a ``torch.nn.Module`` for fp16 inference: weights halved
    once, float inputs halved per call, outputs restored to fp32.
    Requires torch (raise at call time, not import time, so planning
    works on weight-less drivers)."""
    import torch

    class _HalfModule(torch.nn.Module):
        def __init__(self, inner: "torch.nn.Module") -> None:
            super().__init__()
            self.inner = inner.half()

        def forward(self, *args: Any, **kwargs: Any) -> Any:
            out = self.inner(
                *cast_floats(args, True), **cast_floats(kwargs, True)
            )
            return cast_floats(out, False)

    return _HalfModule(module)
