"""Fused block mega-kernel (interpret mode) vs the XLA composite block."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from csts_tpu.kernels import attention as ka
from csts_tpu.kernels import block as kb
from csts_tpu.models import mvit
from csts_tpu.models.mvit import AttentionSpec


def make_block(rng_key, spec):
    return mvit.multiscale_block_init(rng_key, spec)


CASES = [
    # (dim, dim_out, heads, L, thw, stride_kv) — mirrors eligible CSTS blocks
    (96, 192, 1, 2048, (2, 32, 32), (1, 8, 8)),   # stem-scale with dim change
    (192, 384, 2, 1024, (1, 32, 32), (1, 4, 4)),  # stage-1 transition-out
    (384, 384, 4, 256, (1, 16, 16), (1, 2, 2)),   # stage-2 workhorse
    (384, 768, 4, 256, (1, 16, 16), (1, 2, 2)),   # stage-2 -> stage-3 widening
    (768, 768, 8, 256, (1, 16, 16), (1, 1, 1)),   # stage-3 workhorse
]


@pytest.mark.parametrize("variant", ["loop", "hg"])
@pytest.mark.parametrize("dim,dim_out,heads,l,thw,stride_kv", CASES)
def test_fused_block_matches_composite(rng, dim, dim_out, heads, l, thw, stride_kv, variant):
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(), stride_kv=stride_kv,
        fused=True,
    )
    # dispatch eligibility gates 4-head dim-384 out for perf (see eligible());
    # the kernel itself is correct for any head count — test them all
    if heads <= 2 or dim >= 768:
        assert kb.eligible(spec, None, True)
    params = make_block(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((2, l, dim)), jnp.float32)

    ka.set_enabled(False)  # composite reference path
    ref, ref_thw = mvit.multiscale_block_apply(params, spec, x, thw)
    ka.set_enabled(None)

    k, v = mvit._pooled_kv(params, spec, x, thw)
    out = kb.fused_block(x, k, v, params, spec, interpret=True, variant=variant)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_fused_block_bf16(rng):
    dim, dim_out, heads, l, thw = 96, 192, 1, 1024, (1, 32, 32)
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(), stride_kv=(1, 4, 4),
        fused=True,
    )
    params = make_block(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(rng.standard_normal((1, l, dim)), jnp.bfloat16)
    ka.set_enabled(False)
    ref, _ = mvit.multiscale_block_apply(params, spec, x, thw)
    ka.set_enabled(None)
    k, v = mvit._pooled_kv(params, spec, x, thw)
    out = kb.fused_block(x, k, v, params, spec, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.15, rtol=0.05
    )


def test_fused_block_gradients(rng):
    dim, dim_out, heads, l, thw = 96, 96, 1, 256, (1, 16, 16)
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(), stride_kv=(1, 4, 4),
        fused=True,
    )
    params = make_block(jax.random.PRNGKey(2), spec)
    x = jnp.asarray(rng.standard_normal((1, l, dim)), jnp.float32)
    k, v = mvit._pooled_kv(params, spec, x, thw)

    def loss_fused(x, p):
        kk, vv = mvit._pooled_kv(p, spec, x, thw)
        return jnp.sum(jnp.square(kb.fused_block(x, kk, vv, p, spec, interpret=True)))

    def loss_ref(x, p):
        ka.set_enabled(False)
        out, _ = mvit.multiscale_block_apply(p, spec, x, thw)
        ka.set_enabled(None)
        return jnp.sum(jnp.square(out))

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-3, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(gp_f), jax.tree_util.tree_leaves(gp_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_model_with_fused_blocks_matches(rng, monkeypatch):
    """Tiny CSTS family model: fused-block path == composite, end to end."""
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

    orig = kb.fused_block
    monkeypatch.setattr(
        kb, "fused_block",
        lambda x, k, v, p, s, interpret=False: orig(x, k, v, p, s, interpret=True),
    )
    orig_attn = ka.fused_attention
    monkeypatch.setattr(
        ka, "fused_attention",
        lambda q, k, v, scale, mask=None, interpret=False: orig_attn(
            q, k, v, scale, mask, interpret=True
        ),
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


@pytest.mark.parametrize("dim,dim_out,upsample", [(384, 384, False), (384, 192, True), (768, 768, False)])
def test_mlp_tail_matches_composite(rng, dim, dim_out, upsample):
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=4,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 2, 2),
        upsample_q=upsample, fused=True,
    )
    params = make_block(jax.random.PRNGKey(3), spec)
    x = jnp.asarray(rng.standard_normal((2, 256, dim)), jnp.float32)
    ref = kb._composite_tail(x, params, spec)
    out = kb.fused_mlp_tail(x, params, spec, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_mlp_tail_gradients(rng):
    spec = AttentionSpec(
        dim=96, dim_out=192, num_heads=1,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 2, 2), fused=True,
    )
    params = make_block(jax.random.PRNGKey(4), spec)
    x = jnp.asarray(rng.standard_normal((1, 128, 96)), jnp.float32)

    g1 = jax.grad(lambda x: jnp.sum(jnp.square(kb.fused_mlp_tail(x, params, spec, interpret=True))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.square(kb._composite_tail(x, params, spec))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3, rtol=1e-3)
