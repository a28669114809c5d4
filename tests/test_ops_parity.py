"""Golden-parity tests: csts_tpu ops vs torch CPU reference semantics.

These pin the numerics of every primitive the reference model relies on
(Conv3d, depthwise Conv3d, ConvTranspose3d with output_padding, MaxPool3d,
LayerNorm eps=1e-6, exact GELU, trilinear interpolation).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from csts_tpu import ops

ATOL = 1e-5


def to_jax_ndhwc(x_torch):
    # torch (B, C, T, H, W) -> jax (B, T, H, W, C)
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 4, 1))


def from_torch_conv_w(w):
    # torch (O, I/g, kT, kH, kW) -> jax (kT, kH, kW, I/g, O)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))


def from_torch_convT_w(w):
    # torch ConvTranspose3d weight (I, O/g, kT, kH, kW). For depthwise g=I=O:
    # shape (C, 1, kT, kH, kW) -> jax depthwise (kT, kH, kW, 1, C)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))


@pytest.mark.parametrize(
    "cin,cout,kernel,stride,padding",
    [
        (3, 96, (3, 7, 7), (2, 4, 4), (1, 3, 3)),  # the patch-embed stem
        (1, 96, (3, 7, 7), (2, 4, 4), (1, 3, 3)),  # audio stem
        (8, 8, (1, 8, 8), (1, 1, 1), (0, 0, 0)),  # vision_pool-style
    ],
)
def test_conv3d_vs_torch(cin, cout, kernel, stride, padding):
    torch.manual_seed(0)
    m = nn.Conv3d(cin, cout, kernel, stride=stride, padding=padding)
    x = torch.randn(2, cin, 8, 16, 16)
    ref = m(x).detach().numpy().transpose(0, 2, 3, 4, 1)

    params = {"w": from_torch_conv_w(m.weight), "b": jnp.asarray(m.bias.detach().numpy())}
    out = np.asarray(ops.conv3d(params, to_jax_ndhwc(x), stride, padding))
    np.testing.assert_allclose(out, ref, atol=ATOL)


@pytest.mark.parametrize(
    "c,kernel,stride",
    [
        (96, (3, 3, 3), (1, 2, 2)),  # q-pool at a stage transition
        (96, (3, 3, 3), (1, 8, 8)),  # kv-pool at stem scale
        (64, (3, 3, 3), (1, 1, 1)),
    ],
)
def test_depthwise_conv3d_vs_torch(c, kernel, stride):
    torch.manual_seed(1)
    padding = tuple(k // 2 for k in kernel)
    m = nn.Conv3d(c, c, kernel, stride=stride, padding=padding, groups=c, bias=False)
    x = torch.randn(2, c, 4, 16, 16)
    ref = m(x).detach().numpy().transpose(0, 2, 3, 4, 1)

    w = from_torch_conv_w(m.weight)  # (k,k,k,1,C)
    out = np.asarray(ops.depthwise_conv3d(w, to_jax_ndhwc(x), stride, padding))
    np.testing.assert_allclose(out, ref, atol=ATOL)


@pytest.mark.parametrize(
    "c,stride",
    [
        (96, (1, 2, 2)),  # decoder spatial upsample (attention.py:322-325)
        (96, (2, 1, 1)),  # decoder temporal upsample (last decode block)
    ],
)
def test_depthwise_conv_transpose3d_vs_torch(c, stride):
    torch.manual_seed(2)
    kernel = (3, 3, 3)
    padding = tuple(k // 2 for k in kernel)
    output_padding = tuple(0 if s == 1 else s - 1 for s in stride)
    m = nn.ConvTranspose3d(
        c, c, kernel, stride=stride, padding=padding,
        output_padding=output_padding, groups=c, bias=False,
    )
    x = torch.randn(2, c, 4, 8, 8)
    ref = m(x).detach().numpy().transpose(0, 2, 3, 4, 1)

    w = from_torch_convT_w(m.weight)
    out = np.asarray(
        ops.depthwise_conv_transpose3d(w, to_jax_ndhwc(x), stride, padding, output_padding)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=ATOL)


@pytest.mark.parametrize(
    "kernel,stride",
    [((3, 3, 3), (1, 2, 2)), ((1, 3, 3), (1, 2, 2)), ((3, 3, 3), (1, 1, 1))],
)
def test_max_pool3d_vs_torch(kernel, stride):
    torch.manual_seed(3)
    padding = tuple(k // 2 for k in kernel)
    m = nn.MaxPool3d(kernel, stride, padding, ceil_mode=False)
    x = torch.randn(2, 16, 4, 8, 8)
    ref = m(x).detach().numpy().transpose(0, 2, 3, 4, 1)
    out = np.asarray(ops.max_pool3d(to_jax_ndhwc(x), kernel, stride, padding))
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_layer_norm_vs_torch():
    torch.manual_seed(4)
    dim = 96
    m = nn.LayerNorm(dim, eps=1e-6)
    with torch.no_grad():
        m.weight.mul_(1.3)
        m.bias.add_(0.1)
    x = torch.randn(2, 50, dim)
    ref = m(x).detach().numpy()
    params = {
        "scale": jnp.asarray(m.weight.detach().numpy()),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }
    out = np.asarray(ops.layer_norm(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_gelu_exact_vs_torch():
    x = torch.linspace(-4, 4, 101)
    ref = nn.GELU()(x).numpy()
    out = np.asarray(ops.gelu(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_trilinear_resize_vs_torch():
    torch.manual_seed(5)
    x = torch.randn(2, 96, 4, 8, 8)
    # the final stem-skip: (4, 64, 64) -> (8, 64, 64); here scaled-down shapes
    ref = (
        F.interpolate(x, size=(8, 8, 8), mode="trilinear")
        .detach().numpy().transpose(0, 2, 3, 4, 1)
    )
    out = np.asarray(ops.trilinear_resize(to_jax_ndhwc(x), (8, 8, 8)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_trilinear_upsample_scale_factor_vs_torch():
    # nn.Upsample(scale_factor=(1,2,2)) — decoder skip path (attention.py:463-467)
    torch.manual_seed(6)
    x = torch.randn(2, 32, 4, 8, 8)
    m = nn.Upsample(scale_factor=(1, 2, 2), mode="trilinear")
    ref = m(x).detach().numpy().transpose(0, 2, 3, 4, 1)
    out = np.asarray(ops.trilinear_resize(to_jax_ndhwc(x), (4, 16, 16)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_linear_and_mlp_shapes():
    key = jax.random.PRNGKey(0)
    p = ops.mlp_init(key, 96, 384, 192)
    x = jnp.ones((2, 10, 96))
    out = ops.mlp_apply(p, x)
    assert out.shape == (2, 10, 192)


def test_drop_path_train_eval():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((8, 4, 4))
    assert np.allclose(ops.drop_path(x, 0.5, key, deterministic=True), x)
    y = ops.drop_path(x, 0.5, key, deterministic=False)
    # each sample is either 0 or 1/keep_prob
    per_sample = np.asarray(y)[:, 0, 0]
    assert set(np.round(per_sample, 5)).issubset({0.0, 2.0})


def test_trilinear_resize_split_axes_matches_joint():
    """SPLIT_AXES_T_FIRST (sequential single-axis resizes, T first) is the same
    separable interpolation as the joint lowering — exact in fp32 up to rounding,
    rounding-level in bf16. Covers the d4-skip shape class (2x on every axis) and
    the stem-skip shape (T-only, which the split path passes through unchanged)."""
    from csts_tpu.ops import resize as resize_mod

    rng = np.random.default_rng(5)
    x32 = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 6), dtype=np.float32))
    x16 = x32.astype(jnp.bfloat16)
    saved = resize_mod.SPLIT_AXES_T_FIRST
    try:
        for target in [(8, 16, 16), (8, 8, 8), (4, 16, 16)]:
            resize_mod.SPLIT_AXES_T_FIRST = False
            joint32 = np.asarray(ops.trilinear_resize(x32, target))
            joint16 = np.asarray(ops.trilinear_resize(x16, target).astype(jnp.float32))
            resize_mod.SPLIT_AXES_T_FIRST = True
            split32 = np.asarray(ops.trilinear_resize(x32, target))
            split16 = np.asarray(ops.trilinear_resize(x16, target).astype(jnp.float32))
            np.testing.assert_allclose(split32, joint32, atol=2e-6, err_msg=str(target))
            np.testing.assert_allclose(split16, joint16, atol=0.05, err_msg=str(target))
    finally:
        resize_mod.SPLIT_AXES_T_FIRST = saved
