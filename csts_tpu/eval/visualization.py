"""Visualization: prediction/label heatmap overlays and fusion-attention dumps.

Reference: ``slowfast/visualization/visualization.py:9-228`` (vis_inference,
vis_video, vis_video_forecasting, vis_av_st_fusion). Host-side cv2/numpy — never on
the accelerator path.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np


def _to_uint8_frame(frame: np.ndarray, mean, std) -> np.ndarray:
    """Undo tensor_normalize: (H, W, 3) float -> uint8 BGR for cv2."""
    img = frame * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return cv2.cvtColor(img, cv2.COLOR_RGB2BGR)


def heatmap_overlay(frame_u8: np.ndarray, heatmap: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Colorized heatmap blended over a frame (vis_inference :9-73)."""
    h, w = frame_u8.shape[:2]
    hm = heatmap.astype(np.float32)
    hm = (hm - hm.min()) / (hm.max() - hm.min() + 1e-8)
    hm_u8 = (hm * 255).astype(np.uint8)
    hm_u8 = cv2.resize(hm_u8, (w, h), interpolation=cv2.INTER_LINEAR)
    colored = cv2.applyColorMap(hm_u8, cv2.COLORMAP_JET)
    return cv2.addWeighted(frame_u8, 1 - alpha, colored, alpha, 0)


def vis_inference(
    out_dir: str,
    video: np.ndarray,  # (T, H, W, 3) normalized
    preds: np.ndarray,  # (T, h, w)
    labels_hm: np.ndarray,  # (T, h, w)
    mean=(0.45, 0.45, 0.45),
    std=(0.225, 0.225, 0.225),
    prefix: str = "clip",
) -> None:
    """Side-by-side prediction/label overlays per frame (visualization.py:9-73)."""
    os.makedirs(out_dir, exist_ok=True)
    for t in range(video.shape[0]):
        frame = _to_uint8_frame(video[t], mean, std)
        pred_vis = heatmap_overlay(frame, preds[t])
        label_vis = heatmap_overlay(frame, labels_hm[t])
        side = np.concatenate([pred_vis, label_vis], axis=1)
        cv2.imwrite(os.path.join(out_dir, f"{prefix}_f{t:02d}.jpg"), side)


def vis_spatial_attention(
    out_dir: str,
    video: np.ndarray,  # (T, H, W, 3) normalized
    spatial_attn: np.ndarray,  # (num_heads, L, L) fp32 from the spatial-fusion block
    thw,
    mean=(0.45, 0.45, 0.45),
    std=(0.225, 0.225, 0.225),
) -> None:
    """Per-head audio→video spatial attention maps over frames
    (vis_av_st_fusion, visualization.py:172-228)."""
    os.makedirs(out_dir, exist_ok=True)
    t_grid, h_grid, w_grid = thw
    hw = h_grid * w_grid
    thw_total = t_grid * hw
    num_heads = spatial_attn.shape[0]
    frames_per_grid = video.shape[0] // t_grid
    for head in range(num_heads):
        for f in range(t_grid):
            attn_map = spatial_attn[head, thw_total + f, hw * f : hw * (f + 1)]
            attn_map = attn_map.reshape(h_grid, w_grid)
            vid_frame = video[min(f * frames_per_grid, video.shape[0] - 1)]
            frame = _to_uint8_frame(vid_frame, mean, std)
            cv2.imwrite(
                os.path.join(out_dir, f"attn_h{head}_f{f}.jpg"),
                heatmap_overlay(frame, attn_map),
            )


def vis_video(
    out_dir: str,
    all_frames: np.ndarray,  # (T_full, H, W, 3) uint8 RGB — the clip at full rate
    frame_indices: np.ndarray,  # (T,) full-rate index of each model output step
    preds: np.ndarray,  # (T, h, w) rescaled predictions
    labels: Optional[np.ndarray] = None,  # (T, 3) normalized (x, y, type)
    prefix: str = "hm",
    crop_square: bool = True,
    size: int = 256,
) -> None:
    """Full-frame-rate result dump for assembled videos (visualization.py:76-133).

    Every full-rate frame between the first and last sampled step is overlaid
    with the prediction of its NEAREST model step (the reference repeats each
    heatmap over a hard-coded 9-frame stride at 30 fps / 5 at 20 fps; deriving
    the assignment from ``frame_indices`` generalizes both and stays correct for
    arbitrary SAMPLING_RATE). Frames are center-cropped square and resized, the
    reference's cv2 layout. Writes ``<prefix>_<frame_idx>.png`` per frame."""
    os.makedirs(out_dir, exist_ok=True)
    frame_indices = np.asarray(frame_indices).astype(int)
    lo, hi = int(frame_indices.min()), int(frame_indices.max())
    hi = min(hi, all_frames.shape[0] - 1)
    for j in range(lo, hi + 1):
        step = int(np.argmin(np.abs(frame_indices - j)))
        frame = all_frames[min(j, all_frames.shape[0] - 1)]
        if crop_square:
            h, w = frame.shape[:2]
            if w > h:
                frame = frame[:, (w - h) // 2 : (w - h) // 2 + h]
            elif h > w:
                frame = frame[(h - w) // 2 : (h - w) // 2 + w]
        frame = cv2.resize(frame, (size, size))
        frame = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
        vis = heatmap_overlay(frame, preds[step], alpha=0.4)
        if labels is not None:
            cv2.circle(
                vis,
                (int(labels[step, 0] * size), int(labels[step, 1] * size)),
                5, (0, 255, 0), -1,
            )
        cv2.imwrite(os.path.join(out_dir, f"{prefix}_{j:05d}.png"), vis)


def vis_video_forecasting(
    out_dir: str,
    all_frames: np.ndarray,  # (T_full, H, W, 3) uint8 RGB
    label_indices: np.ndarray,  # (T,) FUTURE frame index of each forecast step
    preds: np.ndarray,  # (T, h, w)
    labels: Optional[np.ndarray] = None,
    prefix: str = "hm",
    size: int = 256,
) -> None:
    """Forecast result dump (visualization.py:136-169): predictions overlay the
    FUTURE frames they anticipate — the per-step frame assignment comes from the
    dataset's forecast label indices (meta["labels_index"]), replacing the
    reference's hard-coded forecast_start_idx + num_repeat arithmetic."""
    vis_video(
        out_dir, all_frames, label_indices, preds, labels,
        prefix=prefix, size=size,
    )


def vis_temporal_attention(out_dir: str, temporal_attn: np.ndarray) -> None:
    """Temporal attention matrix dump (visualization.py:214-228).

    ``temporal_attn``: (num_heads, 2T, 2T)."""
    os.makedirs(out_dir, exist_ok=True)
    for head in range(temporal_attn.shape[0]):
        m = temporal_attn[head]
        m = (m - m.min()) / (m.max() - m.min() + 1e-8)
        img = cv2.resize((m * 255).astype(np.uint8), (256, 256), interpolation=cv2.INTER_NEAREST)
        cv2.imwrite(os.path.join(out_dir, f"temporal_attn_h{head}.png"), cv2.applyColorMap(img, cv2.COLORMAP_VIRIDIS))
