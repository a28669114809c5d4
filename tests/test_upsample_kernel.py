"""Parity tests for the fused T×2 skip-upsample kernel (kernels/upsample.py).

The kernel must reproduce ``jax.image.resize(method='linear')`` on axis T at
scale 2 (= torch ``F.interpolate(mode='trilinear', scale_factor=(2,1,1))``,
reference slowfast/models/attention.py:463-467) and emit the decoder kernel's
lane-padded token-major skip layout with zero pads.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csts_tpu import ops
from csts_tpu.kernels import upsample as kup


def _reference_skip(x, thw, cp):
    """Composite path: trilinear T×2 resize on the token grid, then lane pad."""
    b, l, c = x.shape
    t, h, w = thw
    grid = x.reshape(b, t, h, w, c)
    up = ops.trilinear_resize(grid, (2 * t, h, w))
    toks = up.reshape(b, 2 * l, c)
    return jnp.pad(toks, [(0, 0), (0, 0), (0, cp - c)])


@pytest.mark.parametrize("t_c,h,w,c", [(4, 8, 8, 24), (2, 4, 8, 7), (3, 8, 16, 130)])
def test_t2_upsample_matches_resize_fp32(t_c, h, w, c):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, t_c * h * w, c), jnp.float32)
    cp = -(-c // 128) * 128
    got = t2 = kup.t2_upsample_padded(x, (t_c, h, w), interpret=True)
    want = _reference_skip(x, (t_c, h, w), cp)
    assert t2.shape == (2, 2 * t_c * h * w, cp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_t2_upsample_bf16_and_zero_pad():
    t_c, h, w, c = 4, 8, 8, 24
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t_c * h * w, c), jnp.bfloat16)
    got = kup.t2_upsample_padded(x, (t_c, h, w), interpret=True)
    want = _reference_skip(x, (t_c, h, w), 128)
    assert got.dtype == jnp.bfloat16
    # pad lanes exactly zero (the decoder kernel's proj pads rely on it)
    assert not np.asarray(got[..., c:]).any()
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )
    # edge-clamped planes are exact copies of the source planes
    g = np.asarray(got, np.float32).reshape(2, 2 * t_c, h * w, 128)
    src = np.asarray(x, np.float32).reshape(2, t_c, h * w, c)
    np.testing.assert_array_equal(g[:, 0, :, :c], src[:, 0])
    np.testing.assert_array_equal(g[:, -1, :, :c], src[:, -1])


def _reference_hw2(x, thw):
    b, l, c = x.shape
    t, h, w = thw
    grid = x.reshape(b, t, h, w, c)
    up = ops.trilinear_resize(grid, (t, 2 * h, 2 * w))
    return up.reshape(b, 4 * l, c)


@pytest.mark.parametrize("t_c,h,w,c", [(2, 8, 8, 128), (3, 16, 8, 256)])
def test_hw2_upsample_matches_resize_fp32(t_c, h, w, c):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, t_c * h * w, c), jnp.float32)
    got = kup.hw2_upsample(x, (t_c, h, w), interpret=True)
    want = _reference_hw2(x, (t_c, h, w))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_hw2_upsample_bf16():
    t_c, h, w, c = 2, 8, 8, 128
    x = jax.random.normal(jax.random.PRNGKey(4), (2, t_c * h * w, c), jnp.bfloat16)
    got = kup.hw2_upsample(x, (t_c, h, w), interpret=True)
    want = _reference_hw2(x, (t_c, h, w))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_eligibility_gates():
    import dataclasses

    @dataclasses.dataclass
    class Spec:
        stride_q: tuple
        dim: int
        skip_upsample_on: bool = True

    assert kup.eligible(Spec((2, 1, 1), 192), (4, 64, 64), (8, 64, 64))
    assert not kup.eligible(Spec((1, 2, 2), 384), (4, 32, 32), (4, 64, 64))
    assert not kup.eligible(Spec((2, 1, 1), 192, skip_upsample_on=False),
                            (4, 64, 64), (8, 64, 64))
    # fine grid not T-doubled
    assert not kup.eligible(Spec((2, 1, 1), 192), (4, 64, 64), (8, 128, 64))
    # hw2: the flagship d3/d2 shapes qualify; misaligned lanes don't
    assert kup.hw2_eligible(Spec((1, 2, 2), 384), (4, 32, 32), (4, 64, 64))
    assert kup.hw2_eligible(Spec((1, 2, 2), 768), (4, 16, 16), (4, 32, 32))
    assert not kup.hw2_eligible(Spec((1, 2, 2), 192), (4, 32, 32), (4, 64, 64))
    assert not kup.hw2_eligible(Spec((2, 1, 1), 384), (4, 32, 32), (8, 32, 32))


@pytest.mark.parametrize("dim,dim_out,heads,sq", [
    (192, 96, 2, (2, 1, 1)),   # d4-style: fused T×2 skip
    (384, 192, 4, (1, 2, 2)),  # d3-style: fused HW×2 skip
])
def test_decoder_forward_with_fused_skip_matches_composite(
        monkeypatch, dim, dim_out, heads, sq):
    """_decoder_kernel_forward end-to-end: the fused skip kernels must give
    the same block output as the composite resize path (interpret mode, CPU).
    Uses the DEC_CASE geometries from test_fused_block.py."""
    from csts_tpu.kernels import block as kb
    from csts_tpu.models import mvit
    from csts_tpu.models.mvit import AttentionSpec

    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3), stride_q=sq,
        stride_kv=(1, 4, 4), upsample_q=True, fused=True,
    )
    thw = (4, 8, 16)
    params = mvit.multiscale_block_init(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4 * 8 * 16, spec.dim),
                          jnp.float32) * 0.5
    thw_f = mvit._static_upsample_out(
        thw, spec.kernel_q, spec.stride_q, spec.padding_q, spec.output_padding_q
    )
    assert kup.eligible(spec, thw, thw_f) or kup.hw2_eligible(spec, thw, thw_f)

    orig_dec = kb.fused_decoder_block
    monkeypatch.setattr(kb, "fused_decoder_block",
                        functools.partial(orig_dec, interpret=True))
    orig_up = kup.t2_upsample_padded
    monkeypatch.setattr(kup, "t2_upsample_padded",
                        functools.partial(orig_up, interpret=True))
    orig_hw = kup.hw2_upsample
    monkeypatch.setattr(kup, "hw2_upsample",
                        functools.partial(orig_hw, interpret=True))

    monkeypatch.setattr(kup, "T2_SKIP_KERNEL", False)
    monkeypatch.setattr(kup, "HW2_SKIP_KERNEL", False)
    want = mvit._decoder_kernel_forward(x, params, spec, thw, thw_f)
    monkeypatch.setattr(kup, "T2_SKIP_KERNEL", True)
    monkeypatch.setattr(kup, "HW2_SKIP_KERNEL", True)
    got = mvit._decoder_kernel_forward(x, params, spec, thw, thw_f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
