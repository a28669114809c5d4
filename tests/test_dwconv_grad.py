"""Gradient parity for the depthwise-conv custom VJP (ops/conv.py).

The custom VJP replaces JAX's stock conv transpose (measured ~90x the eval
forward's per-clip cost in the train-step profile) with the subpixel
transposed-conv input-grad and the 27-tap strided-reduce weight-grad. Both
must match stock autodiff exactly (f32, HIGHEST precision on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csts_tpu.ops import conv as conv_mod


CASES = [
    # (T, H, W, C, stride) — the model's kv-pool geometries
    (4, 8, 8, 24, (1, 1, 1)),
    (4, 8, 8, 24, (1, 2, 2)),
    (4, 16, 16, 8, (1, 4, 4)),   # general (lhs-dilated) transpose fallback
    (5, 9, 8, 16, (1, 2, 2)),    # odd spatial sizes
    (4, 8, 8, 24, (2, 2, 2)),
]


@pytest.mark.parametrize("t,h,w,c,stride", CASES)
def test_custom_vjp_matches_autodiff(t, h, w, c, stride):
    pad = (1, 1, 1)
    kx, kw_, kg = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (2, t, h, w, c), jnp.float32)
    wgt = jax.random.normal(kw_, (3, 3, 3, 1, c), jnp.float32)

    out_shape = jax.eval_shape(
        lambda w_, x_: conv_mod._depthwise_conv3d_xla(w_, x_, stride, pad), wgt, x
    ).shape
    cot = jax.random.normal(kg, out_shape, jnp.float32)

    def loss_ref(w_, x_):
        return jnp.sum(conv_mod._depthwise_conv3d_xla(w_, x_, stride, pad) * cot)

    def loss_cv(w_, x_):
        return jnp.sum(conv_mod.depthwise_conv3d_cv(w_, x_, stride, pad) * cot)

    dw_ref, dx_ref = jax.grad(loss_ref, argnums=(0, 1))(wgt, x)
    dw_cv, dx_cv = jax.grad(loss_cv, argnums=(0, 1))(wgt, x)

    np.testing.assert_allclose(np.asarray(dx_cv), np.asarray(dx_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_cv), np.asarray(dw_ref),
                               atol=1e-3, rtol=1e-4)


def test_flagged_path_forward_identical(monkeypatch):
    """depthwise_conv3d (flag ON) and the raw XLA op agree in the forward,
    with and without the layout barrier."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 16), jnp.float32)
    wgt = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 1, 16), jnp.float32)
    want = conv_mod._depthwise_conv3d_xla(wgt, x, (1, 2, 2), (1, 1, 1))
    for barrier in (False, True):
        monkeypatch.setattr(conv_mod, "DW_CUSTOM_VJP", True)
        monkeypatch.setattr(conv_mod, "DW_BARRIER", barrier)
        got = conv_mod.depthwise_conv3d(wgt, x, (1, 2, 2), (1, 1, 1))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("custom_vjp", [False, True])
def test_barrier_grads_match_unbarriered(monkeypatch, custom_vjp):
    """DW_BARRIER is numerically a no-op: grads through depthwise_conv3d with
    the layout barrier match the unbarriered path on both VJP routes."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8, 16), jnp.float32)
    wgt = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 3, 1, 16), jnp.float32)

    def loss(w_, x_):
        return jnp.sum(
            jnp.sin(conv_mod.depthwise_conv3d(w_, x_, (1, 2, 2), (1, 1, 1))))

    monkeypatch.setattr(conv_mod, "DW_CUSTOM_VJP", custom_vjp)
    monkeypatch.setattr(conv_mod, "DW_BARRIER", False)
    ref = jax.grad(loss, argnums=(0, 1))(wgt, x)
    monkeypatch.setattr(conv_mod, "DW_BARRIER", True)
    got = jax.grad(loss, argnums=(0, 1))(wgt, x)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_custom_vjp_bf16_cotangent_dtype():
    """bf16 primal: cotangents returned in the primal dtypes (w may be a
    f32 master weight while x is bf16)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 16), jnp.bfloat16)
    wgt = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 1, 16), jnp.float32)

    def loss(w_, x_):
        return jnp.sum(
            conv_mod.depthwise_conv3d_cv(
                w_, x_, (1, 2, 2), (1, 1, 1)).astype(jnp.float32))

    dw, dx = jax.grad(loss, argnums=(0, 1))(wgt, x)
    assert dw.dtype == jnp.float32
    assert dx.dtype == jnp.bfloat16
