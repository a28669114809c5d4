"""Trilinear resize matching torch ``F.interpolate(mode='trilinear')``.

Used for the decoder skip upsample (``attention.py:463-467``) and the final stem-skip
interpolation (``custom_multimodal_builder.py:479``). Torch's default
``align_corners=False`` uses half-pixel sample positions, which is exactly
``jax.image.resize(method='linear')``.

Measured NO (round 3): replacing the exact-2x axes with explicit phase
interpolation (even = 0.75·x + 0.25·x[m-1], odd = 0.75·x + 0.25·x[m+1],
edge-clamped, then interleave) to dodge the resize weight-matmul's batch-minor
layout (profiled at ~23 ms of conv+relayout+pad for the d4 skip at batch 128)
made the FULL forward 62 ms slower: 747.5 -> 809.8 ms device-op time
(tools/profile_forward.py, batch 128) — the phase construction materializes
~4 GB loop-fusion intermediates at d3/d4 (+68 ms of loop fusions) and the
isolated decoder blocks regressed too (d2 52.6→67.8, d3 95.4→123.2,
d4 112.4→120.6 ms, ab_decoder). XLA's separable-matmul lowering wins.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Decompose multi-axis resizes into sequential single-axis resizes with T
# FIRST. The joint lowering resizes H,W first and T last (profiled: the d4
# skip's T-step scale matmul at FINE spatial res pays two batch-minor relayout
# copies, copy.1232/copy.1233 = 16 ms at batch 128, 253 GB/s); T-first runs
# that matmul on the 4x-smaller coarse grid. Separable interpolation — axis
# order doesn't change the math (exact in fp32, rounding-level diffs
# otherwise). On-chip A/B (tools/ab_flags.py, batch 128, one process):
# bit-exact vs joint (max|Δ|=0) and 614.1 vs 618.3 ms/step alone, 607.7 ms
# combined with models/csts.py HEAD_COMMUTE (which REQUIRES this lowering —
# the joint resize of its 1-channel map measured 18.5 s/step). Default ON.
SPLIT_AXES_T_FIRST = True


def _resize_axis_split(x: jax.Array, out_shape) -> jax.Array:
    """Sequential single-axis ``jax.image.resize`` calls, T (axis 1) first."""
    shape = list(x.shape)
    for axis in (1, 2, 3):
        if shape[axis] != out_shape[axis]:
            shape[axis] = out_shape[axis]
            x = jax.image.resize(x, tuple(shape), method="linear")
    return x


def trilinear_resize(x: jax.Array, size_thw: Sequence[int]) -> jax.Array:
    """``x``: (B, T, H, W, C) -> (B, *size_thw, C)."""
    b, _, _, _, c = x.shape
    out_shape = (b, int(size_thw[0]), int(size_thw[1]), int(size_thw[2]), c)
    resize = _resize_axis_split if SPLIT_AXES_T_FIRST else (
        lambda a, s: jax.image.resize(a, s, method="linear"))
    if x.dtype == jnp.bfloat16:
        # memory-bound op: stay in bf16 (the bf16 path trades exactness for traffic)
        return resize(x, out_shape)
    # fp32 interpolation for parity with torch F.interpolate
    y = resize(x.astype(jnp.float32), out_shape)
    return y.astype(x.dtype)
