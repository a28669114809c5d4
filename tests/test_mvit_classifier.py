"""cls-token block parity (vs the reference MultiScaleBlock with has_cls_embed=True)
and MViT classifier model sanity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from csts_tpu.config import get_cfg
from csts_tpu.convert.from_torch import convert_csts_state_dict
from csts_tpu.models import mvit
from csts_tpu.models.build import build_model
from csts_tpu.models.mvit import AttentionSpec

from reference_oracle import load_reference_blocks


def test_cls_block_parity(rng):
    """One MultiScaleBlock with cls token, q-pool and kv-pool, vs torch."""
    MultiScaleBlock, _, _, _ = load_reference_blocks()
    torch.manual_seed(0)
    dim, dim_out, heads = 96, 192, 2
    blk = MultiScaleBlock(
        dim=dim, dim_out=dim_out, num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
        drop_path=0.0, norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        kernel_q=[3, 3, 3], kernel_kv=[3, 3, 3],
        stride_q=[1, 2, 2], stride_kv=[1, 4, 4],
        mode="conv", has_cls_embed=True,
    )
    blk.eval()

    thw = (2, 8, 8)
    L = 1 + 2 * 8 * 8
    x = rng.standard_normal((2, L, dim)).astype(np.float32)
    with torch.no_grad():
        ref, ref_thw = blk(torch.from_numpy(x), list(thw))

    spec = AttentionSpec(
        dim=dim, dim_out=dim_out, num_heads=heads,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 4, 4),
        has_cls=True,
    )
    # convert the block's weights through the standard converter path
    sd = {f"blocks.0.{k}": v for k, v in blk.state_dict().items()}
    params = convert_csts_state_dict(sd, num_video_blocks=1, num_audio_blocks=0)["blocks"][0]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out, out_thw = mvit.multiscale_block_apply(params, spec, jnp.asarray(x), thw)

    assert tuple(out_thw) == tuple(ref_thw)
    assert out.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


@pytest.fixture(scope="module")
def mvit_cfg():
    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.NUM_FRAMES = 8
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.CLS_EMBED_ON = True
    cfg.MVIT.SEP_POS_EMBED = True
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.DIM_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 8, 8]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [2, 1, 2, 2], [3, 1, 2, 2]]
    cfg.MODEL.MODEL_NAME = "MVIT"
    cfg.MODEL.NUM_CLASSES = 11
    return cfg


def test_mvit_classifier_forward(mvit_cfg, rng):
    spec, init_fn, apply_fn = build_model(mvit_cfg)
    params = init_fn(jax.random.PRNGKey(0))
    video = jnp.asarray(rng.standard_normal((2, 8, 32, 32, 3)), jnp.float32)
    logits = apply_fn(params, video)
    assert logits.shape == (2, 11)
    assert np.isfinite(np.asarray(logits)).all()
    # train mode with dropout is stochastic but finite
    out_train = apply_fn(params, video, deterministic=False, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out_train)).all()


def test_mvit_classifier_no_cls(mvit_cfg, rng):
    import copy

    cfg = copy.deepcopy(mvit_cfg)
    cfg.MVIT.CLS_EMBED_ON = False
    spec, init_fn, apply_fn = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    logits = apply_fn(params, jnp.asarray(rng.standard_normal((1, 8, 32, 32, 3)), jnp.float32))
    assert logits.shape == (1, 11)


def test_classification_metrics(rng):
    from csts_tpu.eval.class_metrics import confusion_matrix, topk_accuracies

    preds = np.zeros((6, 4), np.float32)
    labels = np.array([0, 1, 2, 3, 0, 1])
    for i, l in enumerate(labels):
        preds[i, l] = 1.0  # perfect
    preds[5] = [0.9, 0.5, 0, 0]  # wrong top-1, correct top-2
    top1, top2 = topk_accuracies(preds, labels, ks=(1, 2))
    assert abs(top1 - 5 / 6 * 100) < 1e-6
    assert abs(top2 - 100.0) < 1e-6
    cm = confusion_matrix(preds, labels, 4)
    assert cm.sum() == 6
    assert cm[1, 0] == 1  # the one mistake


def test_visualization_smoke(tmp_path, rng):
    from csts_tpu.eval import visualization as vis

    video = rng.standard_normal((4, 32, 32, 3)).astype(np.float32) * 0.2
    preds = rng.uniform(0, 1, (4, 8, 8)).astype(np.float32)
    labels = rng.uniform(0, 1, (4, 8, 8)).astype(np.float32)
    vis.vis_inference(str(tmp_path / "inf"), video, preds, labels)
    import os

    assert len(os.listdir(tmp_path / "inf")) == 4

    attn = rng.uniform(0, 1, (2, 2 * 4 * 4 + 2, 2 * 4 * 4 + 2)).astype(np.float32)
    vis.vis_spatial_attention(str(tmp_path / "sp"), video, attn, (2, 4, 4))
    assert len(os.listdir(tmp_path / "sp")) == 4  # heads × T

    tattn = rng.uniform(0, 1, (2, 8, 8)).astype(np.float32)
    vis.vis_temporal_attention(str(tmp_path / "tmp"), tattn)
    assert len(os.listdir(tmp_path / "tmp")) == 2


def test_vis_video_dumps(tmp_path, rng):
    """vis_video / vis_video_forecasting: full-rate frame dumps with nearest-step
    heatmap assignment (reference visualization.py:76-169)."""
    import os

    from csts_tpu.eval import visualization as vis

    t_full, t_model = 40, 4
    all_frames = rng.integers(0, 255, (t_full, 48, 64, 3), dtype=np.uint8)  # wide
    preds = rng.uniform(0, 1, (t_model, 8, 8)).astype(np.float32)
    labels = np.column_stack([
        rng.uniform(0.2, 0.8, t_model), rng.uniform(0.2, 0.8, t_model),
        np.zeros(t_model),
    ]).astype(np.float32)

    # estimation: steps sampled across the observed window
    frame_idx = np.array([0, 12, 25, 38])
    vis.vis_video(str(tmp_path / "est"), all_frames, frame_idx, preds, labels, size=64)
    files = sorted(os.listdir(tmp_path / "est"))
    assert len(files) == 39  # frames 0..38 inclusive
    assert files[0] == "hm_00000.png" and files[-1] == "hm_00038.png"

    # forecasting: steps map onto FUTURE frames (observed window 0..25)
    label_idx = np.array([26, 30, 34, 38])
    vis.vis_video_forecasting(
        str(tmp_path / "fct"), all_frames, label_idx, preds, labels, size=64
    )
    files = sorted(os.listdir(tmp_path / "fct"))
    assert len(files) == 13  # frames 26..38
    assert files[0] == "hm_00026.png"


def test_extract_activations_and_weights(rng):
    """Functional hook replacement: named intermediates + weight path lookup."""
    import jax
    import jax.numpy as jnp

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
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    video = jnp.asarray(rng.standard_normal((1, 8, 32, 32, 3)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((1, 8, 32, 32, 1)), jnp.float32)

    logits, acts = jax.jit(
        lambda p, v, a: csts_lib.extract_activations(
            p, spec, v, a, layers=("blocks/2", "spatial_fusion", "decode_block4")
        )
    )(params, video, audio)
    assert set(acts) == {"blocks/2", "spatial_fusion", "decode_block4"}
    assert acts["blocks/2"].shape[0] == 1
    # captured forward == plain forward
    ref = csts_lib.csts_apply(params, spec, video, audio)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-6)

    w = csts_lib.get_weights(params, ["blocks/2/attn/qkv/w", "decode_block4/norm2/scale"])
    assert w["blocks/2/attn/qkv/w"].ndim == 2
    assert w["decode_block4/norm2/scale"].ndim == 1
