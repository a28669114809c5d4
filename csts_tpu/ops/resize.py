"""Trilinear resize matching torch ``F.interpolate(mode='trilinear')``.

Used for the decoder skip upsample (``attention.py:463-467``) and the final stem-skip
interpolation (``custom_multimodal_builder.py:479``). Torch's default
``align_corners=False`` uses half-pixel sample positions, which is exactly
``jax.image.resize(method='linear')``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def trilinear_resize(x: jax.Array, size_thw: Sequence[int]) -> jax.Array:
    """``x``: (B, T, H, W, C) -> (B, *size_thw, C)."""
    b, _, _, _, c = x.shape
    out_shape = (b, int(size_thw[0]), int(size_thw[1]), int(size_thw[2]), c)
    if x.dtype == jnp.bfloat16:
        # memory-bound op: stay in bf16 (the bf16 path trades exactness for traffic)
        return jax.image.resize(x, out_shape, method="linear")
    # fp32 interpolation for parity with torch F.interpolate
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method="linear")
    return y.astype(x.dtype)
