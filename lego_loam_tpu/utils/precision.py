"""Matmul precision policy for the geometry pipeline.

On TPU, XLA's DEFAULT matmul precision feeds the MXU bfloat16 inputs (~8
mantissa bits).  Every contraction in this engine is geometry with a tiny
inner dimension — point transforms (K=3), distance matrices (K=3), normal
equations (K=3/5/6) — so bf16 rounding costs ~0.4 % relative error on
coordinates and distances while buying NOTHING (these matmuls are bandwidth-
bound, not MXU-bound).  Measured on a v5e: default precision degrades a
36-scan synthetic trajectory from 0.083 m RMSE to 0.577 m (7x) with no
measurable speed gain; see examples/accuracy_sweep.py --precision.

Every jitted entry point therefore traces under
jax.default_matmul_precision("highest") via this decorator (float32 MXU
passes).  Ops that explicitly pass a precision= argument still win.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Trace `fn` with full-float32 matmul precision (apply UNDER jax.jit,
    so the context is active while the function body is traced)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
