"""f32 matmul precision for the geometry compute path.

On TPU, XLA routes even dim-3 einsum contractions (epipolar residual
line stacks, pose candidate products, Gram builds) through the MXU at
the DEFAULT single-pass bf16 precision.  Geometry residuals are small
differences of O(1) products — measured on device (r4, NOTES_R4): the
epipolar residual of a [17, 3, 3] bank against 2560 points carries
p99 ~ 5e-2 absolute error vs f64, while the RANSAC inlier gate is
3e-6 — the device inlier decisions were ~noise at the gate, which is
why per-seed device quality trailed the CPU study for three rounds.

The fix is structural, not per-call-site: every jitted geometry entry
point is wrapped so that ALL matmuls traced under it default to true
f32 ("float32" = bf16_6x / f32 path — for 3x3-contraction shapes the
cost is unmeasurable).  Explicit per-op precisions (pyramid HIGH,
Pallas kernel internals) are unaffected.

No reference counterpart: the reference computes geometry in CUDA f32
throughout (SfM/sfm.cu) and never meets a bf16 systolic array; this
module is the TPU-native equivalent of that guarantee.
"""

from __future__ import annotations

import functools

import jax


def f32_matmul(fn):
    """Decorator: run fn (tracing or eager) under f32 matmul default."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
