"""Common NN building blocks: linear, MLP, GELU, stochastic depth, init helpers.

TPU equivalents of ``slowfast/models/common.py:7-70``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — matches torch ``nn.GELU()`` default."""
    return jax.nn.gelu(x, approximate=False)


def trunc_normal(key: jax.Array, shape, std: float = 0.02, dtype=jnp.float32) -> jax.Array:
    """trunc_normal_(std=...) with torch's default ±2 truncation bounds."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def linear_init(
    key: jax.Array, dim_in: int, dim_out: int, bias: bool = True, std: float = 0.02, dtype=jnp.float32
) -> dict:
    """Linear with trunc-normal weight / zero bias, the model-wide init rule
    (``custom_multimodal_builder.py:318-322``)."""
    params = {"w": trunc_normal(key, (dim_in, dim_out), std, dtype)}
    if bias:
        params["b"] = jnp.zeros((dim_out,), dtype)
    return params


def linear_apply(params: dict, x: jax.Array) -> jax.Array:
    # fp32 accumulation on the MXU regardless of activation dtype. fp32 inputs use
    # HIGHEST so they don't silently drop to bf16 passes; bf16 inputs use DEFAULT
    # (bf16 multiplies + fp32 accumulate — HIGHEST would emulate fp32 multi-pass).
    precision = (
        jax.lax.Precision.DEFAULT
        if x.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    out = jnp.dot(
        x,
        params["w"].astype(x.dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(x.dtype)
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def mlp_init(
    key: jax.Array, dim_in: int, hidden: int, dim_out: int, dtype=jnp.float32
) -> dict:
    """fc1-GELU-fc2 (``common.py:7-34``)."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim_in, hidden, dtype=dtype),
        "fc2": linear_init(k2, hidden, dim_out, dtype=dtype),
    }


def mlp_apply(params: dict, x: jax.Array) -> jax.Array:
    x = linear_apply(params["fc1"], x)
    x = gelu(x)
    return linear_apply(params["fc2"], x)


def drop_path(
    x: jax.Array, rate, key: Optional[jax.Array], deterministic: bool
) -> jax.Array:
    """Stochastic depth per sample (``common.py:46-59``). No-op when deterministic.

    ``rate`` may be a traced scalar (the pipelined block stack passes per-block
    rates as data because stacked stages share one static spec); the static
    short-circuit only applies to Python floats.
    """
    if deterministic or (isinstance(rate, (int, float)) and rate == 0.0):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape).astype(x.dtype)
    return x * mask / keep
