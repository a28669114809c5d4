"""Full-model golden parity: csts_tpu CSTS vs the PyTorch reference (CPU oracle).

The reference model is instantiated in-place from /root/reference (import shims, no
code copied), its randomly initialized weights are converted with the real
``csts_tpu.convert`` pathway, and fp32 logits are compared end-to-end. This is the
strongest correctness statement available without the HuggingFace weights (zero-egress
image): every layer, every quirk, one assertion.

Uses a reduced spatial size (64² instead of 256²) to keep CPU runtime reasonable —
the architecture math is identical (token grid 4×16×16, fusion grid 4×2×2).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from csts_tpu.config import get_cfg
from csts_tpu.convert.from_torch import convert_csts_state_dict
from csts_tpu.models import csts as csts_lib

from reference_oracle import load_reference_csts

CROP = 64
FRAMES = 8


def make_cfg(loss_func="kldiv+egonce"):
    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = CROP
    cfg.DATA.TEST_CROP_SIZE = CROP
    cfg.DATA.NUM_FRAMES = FRAMES
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.DATA.AUDIO_FREQ_BINS = CROP  # oracle couples audio size to crop size
    cfg.DATA.AUDIO_WINDOW = CROP
    cfg.MVIT.PATCH_KERNEL = [3, 7, 7]
    cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.DEPTH = 16
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.EMBED_DIM = 96
    cfg.MVIT.DROPPATH_RATE = 0.2
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MVIT.SEP_POS_EMBED = True
    cfg.MVIT.DIM_MUL = [[1, 2.0], [3, 2.0], [14, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [3, 2.0], [14, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 8, 8]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [3, 1, 2, 2], [14, 1, 2, 2]]
    cfg.MODEL.LOSS_FUNC = loss_func
    cfg.MODEL.MODEL_NAME = "CSTS"
    return cfg


@pytest.fixture(scope="module")
def oracle():
    model, _ = load_reference_csts(crop_size=CROP, num_frames=FRAMES, seed=7)
    # The reference hard-codes the fusion pooling kernels to (1, 8, 8) — the fusion
    # grid at the shipped 256² crop (custom_multimodal_builder.py:227-229). At the
    # reduced test crop the grid is 2×2, so rebuild those three convs at (1, 2, 2);
    # csts_tpu derives the kernel from the grid, so both sides stay equivalent.
    grid = CROP // 4 // 8
    torch.manual_seed(11)
    model.vision_pool = torch.nn.Conv3d(768, 768, kernel_size=(1, grid, grid), stride=1)
    model.audio_pool = torch.nn.Conv3d(768, 768, kernel_size=(1, grid, grid), stride=1)
    model.audio_pool2 = torch.nn.Conv3d(768, 768, kernel_size=(1, grid, grid), stride=1)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(oracle):
    cfg = make_cfg()
    spec = csts_lib.build_spec(cfg)
    sd = oracle.state_dict()
    params_np = convert_csts_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params_np)
    return spec, params


def test_spec_matches_reference_dims(oracle):
    cfg = make_cfg()
    spec = csts_lib.build_spec(cfg)
    # block dims/heads trajectory must match the torch modules exactly
    for i, blk in enumerate(oracle.blocks):
        assert spec.video_blocks[i].dim == blk.dim, i
        assert spec.video_blocks[i].dim_out == blk.dim_out, i
        assert spec.video_blocks[i].num_heads == blk.attn.num_heads, i
    for i, blk in enumerate(oracle.blocks_audio):
        assert spec.audio_blocks[i].dim == blk.dim
        assert spec.audio_blocks[i].dim_out == blk.dim_out
    assert spec.token_dim == 768
    assert spec.fusion_thw == (4, 2, 2)  # 64² crop -> 16×16 tokens -> 2×2 after stages


def test_full_forward_parity(oracle, jax_setup):
    spec, params = jax_setup
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 3, FRAMES, CROP, CROP), dtype=np.float32)
    audio = rng.standard_normal((2, 1, FRAMES, CROP, CROP), dtype=np.float32)

    with torch.no_grad():
        ref = oracle([torch.from_numpy(video)], torch.from_numpy(audio))
    ref_np = ref.numpy()  # (B, 1, 8, H/4, W/4)

    video_j = jnp.asarray(video.transpose(0, 2, 3, 4, 1))
    audio_j = jnp.asarray(audio.transpose(0, 2, 3, 4, 1))
    out = csts_lib.csts_apply(params, spec, video_j, audio_j)
    out_np = np.asarray(out)  # (B, 8, H/4, W/4, 1)
    out_nchw = out_np.transpose(0, 4, 1, 2, 3)

    assert out_nchw.shape == ref_np.shape
    np.testing.assert_allclose(out_nchw, ref_np, atol=5e-4, rtol=1e-4)


def test_forward_with_embeddings_parity(oracle, jax_setup):
    spec, params = jax_setup
    rng = np.random.default_rng(1)
    video = rng.standard_normal((1, 3, FRAMES, CROP, CROP), dtype=np.float32)
    audio = rng.standard_normal((1, 1, FRAMES, CROP, CROP), dtype=np.float32)

    with torch.no_grad():
        ref_logits, ref_v, ref_a = oracle(
            [torch.from_numpy(video)], torch.from_numpy(audio), return_embed=True
        )

    out, v_emb, a_emb = csts_lib.csts_apply(
        params, spec,
        jnp.asarray(video.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(audio.transpose(0, 2, 3, 4, 1)),
        return_embed=True,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref_logits.numpy(), atol=5e-4, rtol=1e-4
    )
    # embeddings pass through a 768-dim mean-pool + projection; fp32 summation-order
    # differences accumulate slightly more than in the logits path
    np.testing.assert_allclose(np.asarray(v_emb), ref_v.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a_emb), ref_a.numpy(), atol=2e-3, rtol=1e-3)


def test_jit_compiles_and_matches_eager(jax_setup):
    spec, params = jax_setup
    rng = np.random.default_rng(2)
    video = jnp.asarray(rng.standard_normal((1, FRAMES, CROP, CROP, 3), dtype=np.float32))
    audio = jnp.asarray(rng.standard_normal((1, FRAMES, CROP, CROP, 1), dtype=np.float32))
    eager = csts_lib.csts_apply(params, spec, video, audio)
    jitted = jax.jit(lambda p, v, a: csts_lib.csts_apply(p, spec, v, a))(params, video, audio)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), atol=1e-5)


def test_head_commute_flag_matches_composite(jax_setup):
    """HEAD_COMMUTE classifies the stem skip before its T-resize — an exact
    commute (1x1x1 conv is per-voxel linear; interp weights sum to 1, so the
    bias rides the feat term once). fp32 logits must match to rounding."""
    spec, params = jax_setup
    rng = np.random.default_rng(3)
    video = jnp.asarray(rng.standard_normal((1, FRAMES, CROP, CROP, 3), dtype=np.float32))
    audio = jnp.asarray(rng.standard_normal((1, FRAMES, CROP, CROP, 1), dtype=np.float32))
    from csts_tpu.ops import resize as resize_mod

    saved = csts_lib.HEAD_COMMUTE
    saved_split = resize_mod.SPLIT_AXES_T_FIRST
    try:
        # the commuted branch is gated on HEAD_COMMUTE AND SPLIT_AXES_T_FIRST;
        # force the resize flag too so this test can't pass vacuously if its
        # default ever flips back to False
        resize_mod.SPLIT_AXES_T_FIRST = True
        csts_lib.HEAD_COMMUTE = False
        base = np.asarray(csts_lib.csts_apply(params, spec, video, audio))
        csts_lib.HEAD_COMMUTE = True
        commuted = np.asarray(csts_lib.csts_apply(params, spec, video, audio))
    finally:
        csts_lib.HEAD_COMMUTE = saved
        resize_mod.SPLIT_AXES_T_FIRST = saved_split
    np.testing.assert_allclose(commuted, base, atol=2e-5)
