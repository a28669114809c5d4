"""LayerNorm, fp32-accumulated regardless of activation dtype.

Equivalent of ``nn.LayerNorm(dim, eps=1e-6)`` used everywhere in the reference model
(``custom_multimodal_builder.py:61``). Statistics are computed in float32 even when
activations are bfloat16 — on TPU the cast is free relative to the HBM read and keeps
bf16 training numerically stable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)
