"""Offline visualization runner: checkpoint + test split → overlay dumps.

The reference ships the plotting functions but leaves every call site commented
out (``tools/test_avgaze_net.py:73-82``); this makes them a first-class tool:
``run_visualization(cfg)`` loads the checkpoint exactly like the tester, runs
the jitted forward over the first N test clips, and writes per-frame
prediction/label overlays — optionally with the spatial-fusion (audio→video)
and temporal-fusion attention maps (``vis_av_st_fusion``,
``slowfast/visualization/visualization.py:172-228``).

CLI: ``python tools/visualize.py --cfg <yaml> [--num-clips 4] [--attention]``.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax

from csts_tpu.config import Config
from csts_tpu.data import loader as loader_lib
from csts_tpu.eval import metrics, visualization as vis
from csts_tpu.eval.tester import _load_params
from csts_tpu.models import csts as csts_lib
from csts_tpu.train import losses
from csts_tpu.utils.logging import get_logger, setup_logging

logger = get_logger(__name__)


def _denormalize(video: np.ndarray, mean, std) -> np.ndarray:
    """Batch video as fed to the model -> normalized float frames for the
    overlay helpers. Handles both loader feeds: uint8 (UINT8_TRANSFER — the
    model folds /255+mean/std on-device) and pre-normalized float."""
    if video.dtype == np.uint8:
        return (video.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(
            std, np.float32
        )
    return video.astype(np.float32)


def run_visualization(
    cfg: Config,
    num_clips: int = 4,
    attention: bool = False,
    out_dir: str | None = None,
) -> str:
    """Dump overlays for the first ``num_clips`` test clips. Returns the dir."""
    setup_logging(cfg.OUTPUT_DIR)
    out_dir = out_dir or os.path.join(cfg.OUTPUT_DIR, "visualization")
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(cfg.RNG_SEED), spec)
    params = _load_params(cfg, spec, params)

    @partial(jax.jit, static_argnames=("attn",))
    def forward(params, video, audio, attn=False):
        out = csts_lib.csts_apply(
            params, spec, video, audio, deterministic=True,
            return_spatial_attn=attn, return_temporal_attn=attn,
        )
        logits = out[0] if attn else out
        preds = losses.frame_softmax(logits, temperature=2.0)[..., 0]
        return (preds, out[1], out[2]) if attn else preds

    test_loader = loader_lib.construct_loader(cfg, "test")
    mean, std = cfg.DATA.MEAN, cfg.DATA.STD
    done = 0
    for batch in test_loader:
        out = forward(params, batch["video"], batch["audio"], attn=attention)
        if attention:
            preds, spatial_attn, temporal_attn = out
        else:
            preds, spatial_attn, temporal_attn = out, None, None
        preds = np.asarray(metrics.minmax_rescale(preds))
        video = np.asarray(batch["video"])
        labels_hm = np.asarray(batch["labels_hm"])
        for i in range(video.shape[0]):
            if done >= num_clips:
                logger.info("Wrote %d clips to %s", done, out_dir)
                return out_dir
            clip_dir = os.path.join(out_dir, f"clip{done:04d}")
            frames = _denormalize(video[i], mean, std)
            vis.vis_inference(
                clip_dir, frames, preds[i], labels_hm[i], mean=mean, std=std
            )
            if attention:
                vis.vis_spatial_attention(
                    os.path.join(clip_dir, "spatial_attn"), frames,
                    np.asarray(spatial_attn[i], np.float32), spec.fusion_thw,
                    mean=mean, std=std,
                )
                vis.vis_temporal_attention(
                    os.path.join(clip_dir, "temporal_attn"),
                    np.asarray(temporal_attn[i], np.float32),
                )
            done += 1
    logger.info("Wrote %d clips to %s", done, out_dir)
    return out_dir
