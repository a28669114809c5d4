"""Pallas depthwise stencil kernels (interpret mode) vs the XLA conv ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from csts_tpu import ops
from csts_tpu.kernels import stencil


@pytest.mark.parametrize("stride,thw", [
    ((1, 2, 2), (4, 8, 8)),    # decoder d1-d3 spatial upsample
    ((2, 1, 1), (4, 8, 8)),    # decoder d4 temporal upsample
    ((1, 1, 1), (4, 8, 8)),    # dense (degenerate)
    ((2, 2, 2), (2, 4, 4)),    # full 3-D stride-2
])
def test_depthwise_transpose_matches_xla(rng, stride, thw):
    c = 256
    x = jnp.asarray(rng.standard_normal((2, *thw, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)), jnp.float32)
    outpad = tuple(0 if s == 1 else s - 1 for s in stride)
    ref = ops.depthwise_conv_transpose3d(w, x, stride, (1, 1, 1), outpad)
    out = stencil.depthwise_transpose3d(w, x, stride, (1, 1, 1), outpad, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride,thw", [
    ((1, 2, 2), (4, 8, 8)),    # encoder q-pool
    ((1, 4, 4), (4, 8, 8)),    # kv pool
    ((1, 8, 8), (2, 16, 16)),  # stem-scale kv pool
    ((2, 2, 2), (4, 8, 8)),
    ((1, 1, 1), (3, 8, 8)),    # dense, odd T
])
def test_depthwise_pool_matches_xla(rng, stride, thw):
    c = 128
    x = jnp.asarray(rng.standard_normal((2, *thw, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)), jnp.float32)
    ref = ops.depthwise_conv3d(w, x, stride, (1, 1, 1))
    out = stencil.depthwise_pool3d(w, x, stride, (1, 1, 1), interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_pool_odd_temporal_stride(rng):
    # strided T with a T length that doesn't divide: out planes clamp correctly
    c = 128
    x = jnp.asarray(rng.standard_normal((1, 5, 4, 4, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)), jnp.float32)
    ref = ops.depthwise_conv3d(w, x, (2, 1, 1), (1, 1, 1))
    out = stencil.depthwise_pool3d(w, x, (2, 1, 1), (1, 1, 1), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [(1, 1, 1), (1, 2, 2), (1, 4, 4), (2, 2, 2), (1, 8, 8)])
def test_shift_stack_pool_matches_native(rng, stride):
    from csts_tpu.ops import conv as conv_ops

    c = 96  # non-128-aligned channels exercise the general path
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)), jnp.float32)
    ref = conv_ops._depthwise_conv3d_xla(w, x, stride, (1, 1, 1))
    out = conv_ops._shift_depthwise_conv3d(w, x, stride, (1, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [(1, 2, 2), (2, 1, 1), (2, 2, 2), (1, 1, 1)])
def test_shift_stack_transpose_matches_native(rng, stride):
    from csts_tpu.ops import conv as conv_ops

    c = 96
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)), jnp.float32)
    outpad = tuple(0 if s == 1 else s - 1 for s in stride)
    ref = conv_ops._depthwise_conv_transpose3d_xla(w, x, stride, (1, 1, 1), outpad)
    out = conv_ops._shift_depthwise_transpose3d(w, x, stride, (1, 1, 1), outpad)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_supported_gate():
    assert stencil._supported((3, 3, 3), (1, 2, 2), (1, 1, 1), True)
    assert not stencil._supported((3, 3, 3), (1, 3, 3), (1, 1, 1), True)
    assert not stencil._supported((1, 3, 3), (1, 2, 2), (1, 1, 1), True)
    assert stencil._supported((3, 3, 3), (1, 8, 8), (1, 1, 1), False)
    assert not stencil._supported((3, 3, 3), (1, 16, 16), (1, 1, 1), False)
