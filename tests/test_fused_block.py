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


@pytest.mark.parametrize("variant", ["loop", "hg", "bd"])
@pytest.mark.parametrize("dim,dim_out,heads,l,thw,stride_kv", CASES)
def test_fused_block_matches_composite(rng, dim, dim_out, heads, l, thw, stride_kv, variant):
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(), stride_kv=stride_kv,
        fused=True,
    )
    # dispatch eligibility gates >2-head blocks out for perf (see eligible());
    # the kernel itself is correct for any head count — test them all
    if heads <= 2:
        assert kb.eligible(spec, None, True)
    params = make_block(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((2, l, dim)), jnp.float32)

    ka.set_enabled(False)  # composite reference path
    ref, ref_thw = mvit.multiscale_block_apply(params, spec, x, thw)
    ka.set_enabled(None)

    k, v = mvit._pooled_kv(params, spec, x, thw)
    if variant == "bd" and k.shape[2] % 128 != 0:
        pytest.skip("bd variant requires lane-aligned Lk (all flagship Lk are 256)")
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


DEC_CASES = [
    # (dim, dim_out, heads, thw, stride_q, stride_kv) — decoder block d2 at
    # flagship geometry, a d3-style spatial case and a temporal-upsample
    # (d4-style) case at reduced grid. d1 (768→768) is VMEM-ineligible by design
    # (see kernels/block._decoder_tile_plan) — covered by test_decoder_d1_gated.
    (768, 384, 4, (4, 16, 16), (1, 2, 2), (1, 4, 4)),
    (384, 192, 4, (4, 8, 16), (1, 2, 2), (1, 8, 8)),
    (192, 96, 2, (4, 8, 16), (2, 1, 1), (1, 4, 4)),
    # odd fine-plane count at st=1 (tiling edge case)
    (192, 96, 2, (3, 8, 16), (1, 2, 2), (1, 4, 4)),
]


def test_decoder_d1_gated():
    spec = AttentionSpec(
        dim=768, dim_out=768, num_heads=8,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3), stride_q=(1, 2, 2),
        stride_kv=(1, 2, 2), upsample_q=True, fused=True,
    )
    assert not kb.decoder_eligible(spec, None, True, (4, 16, 16), 64)


@pytest.mark.parametrize("dim,dim_out,heads,thw,sq,skv", DEC_CASES)
def test_fused_decoder_block_matches_composite(rng, dim, dim_out, heads, thw, sq, skv):
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3), stride_q=sq, stride_kv=skv,
        upsample_q=True, fused=True,
    )
    params = make_block(jax.random.PRNGKey(7), spec)
    l = thw[0] * thw[1] * thw[2]
    x = jnp.asarray(rng.standard_normal((2, l, dim)) * 0.5, jnp.float32)

    ka.set_enabled(False)
    ref, ref_thw = mvit.multiscale_block_apply(params, spec, x, thw)
    ka.set_enabled(None)

    k, v = mvit._pooled_kv(params, spec, x, thw)
    q5 = mvit._coarse_q_slots(params, spec, x, thw)
    thw_f = mvit._static_upsample_out(
        thw, spec.kernel_q, spec.stride_q, spec.padding_q, spec.output_padding_q
    )
    assert thw_f == ref_thw
    skip, _ = mvit.upsample_tokens_trilinear(x, thw, sq)
    assert kb.decoder_eligible(spec, None, True, thw_f, k.shape[2])
    out = kb.fused_decoder_block(q5, skip, k, v, params, spec, thw_f, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


POOL_CASES = [
    # (dim, dim_out, heads, thw, stride_kv) — encoder Q-pool stage transitions
    # (video 1 / audio 1-2 geometry at reduced grids); stride_q is always (1,2,2)
    (192, 192, 2, (4, 16, 32), (1, 4, 4)),
    (192, 384, 2, (4, 16, 32), (1, 4, 4)),
    (384, 384, 4, (4, 16, 32), (1, 2, 2)),
]


@pytest.mark.parametrize("dim,dim_out,heads,thw,skv", POOL_CASES)
def test_fused_pool_block_matches_composite(rng, dim, dim_out, heads, thw, skv):
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3), stride_q=(1, 2, 2), stride_kv=skv,
        fused=True,
    )
    params = make_block(jax.random.PRNGKey(9), spec)
    l = thw[0] * thw[1] * thw[2]
    x = jnp.asarray(rng.standard_normal((2, l, dim)) * 0.5, jnp.float32)

    ka.set_enabled(False)
    ref, ref_thw = mvit.multiscale_block_apply(params, spec, x, thw)
    ka.set_enabled(None)

    lk_thw = mvit._static_pool_out(thw, spec.kernel_kv, skv, spec.padding_kv)
    lk = lk_thw[0] * lk_thw[1] * lk_thw[2]
    assert kb.pool_block_eligible(spec, None, True, thw, lk)
    r_out = kb._pool_tile_plan(spec, thw)[0]
    k, v = mvit._pooled_kv(params, spec, x, thw)
    q6 = mvit._pool_q_slots(params, spec, x, thw, r_out)
    pad = tuple(int(kk // 2) for kk in spec.skip_kernel)
    skip, _ = mvit.pool_tokens_max(x, thw, spec.skip_kernel, spec.stride_q, pad)
    out = kb.fused_pool_block(q6, skip, k, v, params, spec, thw, interpret=True)
    assert out.shape == ref.shape
    assert ref_thw == (thw[0], thw[1] // 2, thw[2] // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_pool_block_negative_inputs(rng):
    """All-negative activations: the −1e30 MaxPool row padding must never win."""
    spec = AttentionSpec(
        dim=192, dim_out=192, num_heads=2,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3), stride_q=(1, 2, 2),
        stride_kv=(1, 4, 4), fused=True,
    )
    params = make_block(jax.random.PRNGKey(10), spec)
    thw = (4, 16, 32)
    x = jnp.asarray(-1.0 - np.abs(rng.standard_normal((1, 2048, 192))), jnp.float32)
    ka.set_enabled(False)
    ref, _ = mvit.multiscale_block_apply(params, spec, x, thw)
    ka.set_enabled(None)
    r_out = kb._pool_tile_plan(spec, thw)[0]
    k, v = mvit._pooled_kv(params, spec, x, thw)
    q6 = mvit._pool_q_slots(params, spec, x, thw, r_out)
    pad = tuple(int(kk // 2) for kk in spec.skip_kernel)
    skip, _ = mvit.pool_tokens_max(x, thw, spec.skip_kernel, spec.stride_q, pad)
    out = kb.fused_pool_block(q6, skip, k, v, params, spec, thw, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_decoder_block_training_grads(rng, monkeypatch):
    """The decoder kernel's training path (_decoder_block_ad): forward == composite
    (drop_path == 0 so the deterministic block IS the training block) and the
    recompute backward matches composite autodiff for x and all params."""
    dim, dim_out, heads, thw, sq, skv = DEC_CASES[2]
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3), stride_q=sq, stride_kv=skv,
        upsample_q=True, fused=True,
    )
    params = make_block(jax.random.PRNGKey(8), spec)
    l = thw[0] * thw[1] * thw[2]
    x = jnp.asarray(rng.standard_normal((1, l, dim)) * 0.5, jnp.float32)
    thw_f = mvit._static_upsample_out(
        thw, spec.kernel_q, spec.stride_q, spec.padding_q, spec.output_padding_q
    )

    orig = kb.fused_decoder_block
    monkeypatch.setattr(
        kb, "fused_decoder_block",
        lambda *a, interpret=False: orig(*a, interpret=True),
    )
    # the skip-upsample kernels sit on the same path — interpret them too
    from csts_tpu.kernels import upsample as kup

    orig_t2, orig_hw2 = kup.t2_upsample_padded, kup.hw2_upsample
    monkeypatch.setattr(
        kup, "t2_upsample_padded",
        lambda *a, interpret=False: orig_t2(*a, interpret=True),
    )
    monkeypatch.setattr(
        kup, "hw2_upsample",
        lambda *a, interpret=False: orig_hw2(*a, interpret=True),
    )

    def loss_fused(x, p):
        return jnp.sum(jnp.square(mvit._decoder_block_ad(x, p, spec, thw, tuple(thw_f))))

    def loss_ref(x, p):
        ka.set_enabled(False)
        out, _ = mvit.multiscale_block_apply(p, spec, x, thw, deterministic=False)
        ka.set_enabled(None)
        return jnp.sum(jnp.square(out))

    (l_f, ), (l_r, ) = (jax.value_and_grad(loss_fused)(x, params)[:1],
                        jax.value_and_grad(loss_ref)(x, params)[:1])
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-5)
    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=2e-3, rtol=2e-3)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gp_f)[0],
        jax.tree_util.tree_flatten_with_path(gp_r)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def _composite_tail_train(x, p, spec, dp_mask):
    """Reference semantics for the training tail: proj residual unmasked, MLP branch
    scaled by the per-sample stochastic-depth multiplier (mvit.py composite path)."""
    from csts_tpu import ops

    xn2 = ops.layer_norm(p["norm2"], x)
    mlp = ops.mlp_apply(p["mlp"], xn2)
    base = ops.linear_apply(p["proj"], xn2) if spec.dim != spec.dim_out else x
    return base + dp_mask[:, None, None].astype(x.dtype) * mlp


@pytest.mark.parametrize("dim,dim_out,upsample", [(96, 96, False), (96, 192, False), (384, 192, True)])
def test_mlp_tail_train_forward(rng, dim, dim_out, upsample):
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=1,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 2, 2),
        upsample_q=upsample, fused=True, drop_path=0.1,
    )
    params = make_block(jax.random.PRNGKey(5), spec)
    x = jnp.asarray(rng.standard_normal((3, 256, dim)), jnp.float32)
    dp_mask = jnp.asarray([0.0, 1.0 / 0.9, 1.0 / 0.9], jnp.float32)  # one dropped sample
    ref = _composite_tail_train(x, params, spec, dp_mask)
    out = kb.fused_mlp_tail_train(x, params, spec, dp_mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("dim,dim_out", [(96, 96), (96, 192)])
def test_mlp_tail_train_gradients(rng, dim, dim_out):
    """Stored-residual VJP == autodiff of the composite, for x AND every param."""
    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=1,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 2, 2), fused=True,
    )
    params = make_block(jax.random.PRNGKey(6), spec)
    x = jnp.asarray(rng.standard_normal((2, 128, dim)), jnp.float32)
    dp_mask = jnp.asarray([1.25, 0.0], jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 128, dim_out)), jnp.float32)

    def loss_fused(x, p):
        out = kb.fused_mlp_tail_train(x, p, spec, dp_mask, interpret=True)
        return jnp.sum(jnp.square(out - tgt))

    def loss_ref(x, p):
        return jnp.sum(jnp.square(_composite_tail_train(x, p, spec, dp_mask) - tgt))

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=2e-3, rtol=2e-3)
    flat_f, tdef_f = jax.tree_util.tree_flatten_with_path(gp_f)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gp_r)
    for (path, a), (_, b) in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow  # heavy compile; surface also covered by fast-lane tests
def test_model_train_grads_with_fused_tail(rng, monkeypatch):
    """Tiny CSTS family model, TRAINING mode: loss + grads through the fused
    stored-residual tail == composite. DROPPATH_RATE=0 so the two paths draw no
    stochastic-depth masks (mask shapes differ between implementations)."""
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
    cfg.MVIT.DROPPATH_RATE = 0.0
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
    key = jax.random.PRNGKey(9)

    def loss(p):
        out = csts_lib.csts_apply(p, spec, video, audio, deterministic=False, rng=key)
        return jnp.sum(jnp.square(out))

    ka.set_enabled(False)
    l_ref, g_ref = jax.value_and_grad(loss)(params)

    orig = kb.fused_mlp_tail_train
    monkeypatch.setattr(
        kb, "fused_mlp_tail_train",
        lambda x, p, s, m, interpret=False: orig(x, p, s, m, interpret=True),
    )
    ka.set_enabled(True)
    ka.set_train_attention(False)  # CPU: composite attention, fused tail only
    try:
        l_f, g_f = jax.value_and_grad(loss)(params)
    finally:
        ka.set_enabled(None)
        ka.set_train_attention(True)

    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_f)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    for (path, a), (_, b) in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


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
