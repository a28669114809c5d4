"""Fused-attention kernel correctness (interpret mode on CPU) vs the XLA composite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from csts_tpu.kernels import attention as ka
from csts_tpu.models import mvit


def composite(q, k, v, scale, mask=None):
    out, _ = mvit._attention_core(q, k, v, scale, mask)
    return out


@pytest.mark.parametrize(
    "b,n,lq,lk,hd",
    [
        (2, 1, 512, 256, 96),   # stem-stage shape (scaled down)
        (1, 4, 256, 256, 96),   # middle stage
        (2, 8, 260, 260, 96),   # spatial fusion (odd Lq -> single tile)
        (1, 8, 8, 8, 96),       # temporal fusion
    ],
)
def test_fused_matches_composite(rng, b, n, lq, lk, hd):
    q = jnp.asarray(rng.standard_normal((b, n, lq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    scale = hd ** -0.5
    ref = composite(q, k, v, scale)
    out = ka.fused_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_with_mask(rng):
    b, n, lq, lk, hd = 1, 2, 68, 68, 64
    q = jnp.asarray(rng.standard_normal((b, n, lq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    mask = np.asarray(mvit.build_inframe_mask((4, 4, 4), 4), np.float32)
    scale = hd ** -0.5
    ref = composite(q, k, v, scale, jnp.asarray(mask))
    out = ka.fused_attention(q, k, v, scale, jnp.asarray(mask), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_gradients_match(rng):
    b, n, lq, lk, hd = 1, 2, 128, 64, 32
    q = jnp.asarray(rng.standard_normal((b, n, lq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    scale = hd ** -0.5

    def loss_fused(q, k, v):
        return jnp.sum(jnp.square(ka.fused_attention(q, k, v, scale, interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(composite(q, k, v, scale)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4)


def test_flash_bwd_padded_shapes(rng):
    """Gradient parity through the flash backward kernel at shapes needing
    head-dim (96→128) and KV (250→256) padding — padded rows/cols must
    contribute exactly zero to dq/dk/dv."""
    b, n, lq, lk, hd = 1, 2, 128, 250, 96
    q = jnp.asarray(rng.standard_normal((b, n, lq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    scale = hd ** -0.5

    def loss_fused(q, k, v):
        return jnp.sum(jnp.square(ka.fused_attention(q, k, v, scale, interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(composite(q, k, v, scale)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4)


def test_masked_gradients_use_composite_fallback(rng):
    """Masked (fusion) blocks keep the XLA recompute backward, including dmask."""
    b, n, lq, lk, hd = 1, 2, 68, 68, 64
    q = jnp.asarray(rng.standard_normal((b, n, lq, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.float32)
    mask = jnp.asarray(np.asarray(mvit.build_inframe_mask((4, 4, 4), 4), np.float32))
    scale = hd ** -0.5

    def loss_fused(q, k, v):
        return jnp.sum(jnp.square(ka.fused_attention(q, k, v, scale, mask, interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(composite(q, k, v, scale, mask)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4)


def test_bf16_path(rng):
    b, n, lq, lk, hd = 1, 1, 256, 128, 96
    q = jnp.asarray(rng.standard_normal((b, n, lq, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, lk, hd)), jnp.bfloat16)
    scale = hd ** -0.5
    ref = composite(q, k, v, scale)
    out = ka.fused_attention(q, k, v, scale, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_model_fused_flag_dispatches(rng, monkeypatch):
    """With the kernel force-enabled (interpret), the full model still matches."""
    from csts_tpu.config import get_cfg
    from csts_tpu.models import csts as csts_lib

    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.AUDIO_FREQ_BINS = 32
    cfg.DATA.AUDIO_WINDOW = 32
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MVIT.SEP_POS_EMBED = True
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.DIM_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 8, 8]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [2, 1, 2, 2], [3, 1, 2, 2]]
    cfg.MODEL.LOSS_FUNC = "kldiv"

    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    video = jnp.asarray(rng.standard_normal((1, 8, 32, 32, 3)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((1, 8, 32, 32, 1)), jnp.float32)

    ka.set_enabled(False)
    ref = csts_lib.csts_apply(params, spec, video, audio)

    # force-enable with interpret via monkeypatching the kernel entries
    from csts_tpu.kernels import block as kb

    orig = ka.fused_attention

    def interp_fused(q, k, v, scale, mask=None, interpret=False):
        return orig(q, k, v, scale, mask, interpret=True)

    monkeypatch.setattr(ka, "fused_attention", interp_fused)
    orig_blk = kb.fused_block
    monkeypatch.setattr(
        kb, "fused_block",
        lambda x, k, v, p, s, interpret=False: orig_blk(x, k, v, p, s, interpret=True),
    )
    orig_tail = kb.fused_mlp_tail
    monkeypatch.setattr(
        kb, "fused_mlp_tail",
        lambda x, p, s, interpret=False: orig_tail(x, p, s, interpret=True),
    )
    ka.set_enabled(True)
    try:
        out = csts_lib.csts_apply(params, spec, video, audio)
    finally:
        ka.set_enabled(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
