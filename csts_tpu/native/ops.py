"""numpy-facing wrappers over the native loader ops, with pure-numpy fallbacks."""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from csts_tpu.native.build import get_lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fused_crop_flip_normalize(
    frames: np.ndarray,
    y0: int,
    x0: int,
    crop: int,
    flip: bool,
    mean,
    std,
) -> np.ndarray:
    """uint8/float32 (T, H, W, 3) -> float32 (T, crop, crop, 3) in one pass."""
    lib = get_lib()
    t, h, w, c = frames.shape
    assert c == 3
    mean_arr = np.ascontiguousarray(mean, np.float32)
    inv_std = np.ascontiguousarray(1.0 / np.asarray(std, np.float32), np.float32)
    if lib is not None and frames.dtype == np.uint8:
        frames = np.ascontiguousarray(frames)
        out = np.empty((t, crop, crop, 3), np.float32)
        lib.fused_crop_flip_normalize(
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            t, h, w, y0, x0, crop, int(flip), _fp(mean_arr), _fp(inv_std), _fp(out),
        )
        return out
    if lib is not None and frames.dtype == np.float32:
        frames = np.ascontiguousarray(frames)
        out = np.empty((t, crop, crop, 3), np.float32)
        lib.fused_crop_flip_normalize_f32(
            _fp(frames), t, h, w, y0, x0, crop, int(flip),
            _fp(mean_arr), _fp(inv_std), 0, _fp(out),
        )
        return out
    # numpy fallback
    patch = frames[:, y0 : y0 + crop, x0 : x0 + crop].astype(np.float32)
    if frames.dtype == np.uint8:
        patch /= 255.0
    patch = (patch - mean_arr) / np.asarray(std, np.float32)
    if flip:
        patch = patch[:, :, ::-1]
    return np.ascontiguousarray(patch)


def audio_slice_gather(audio: np.ndarray, centers: np.ndarray, half: int) -> np.ndarray:
    """float32 (F, L) + (T,) centers -> (T, F, 2·half)."""
    lib = get_lib()
    if lib is not None and audio.dtype == np.float32:
        audio = np.ascontiguousarray(audio)
        centers = np.ascontiguousarray(centers, np.int64)
        t = len(centers)
        f_bins, length = audio.shape
        out = np.empty((t, f_bins, 2 * half), np.float32)
        lib.audio_slice_gather(
            _fp(audio), f_bins, length,
            centers.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            t, half, _fp(out),
        )
        return out
    return np.stack([audio[:, i - half : i + half] for i in centers], axis=0)


def gaze_heatmaps(
    gaze_loc: np.ndarray, num_frames: int, height: int, width: int, kernel_size: int
) -> np.ndarray:
    """Native twin of csts_tpu.data.heatmap.gaze_heatmaps."""
    from csts_tpu.data.heatmap import gaussian_kernel_1d, gaze_heatmaps as np_impl

    lib = get_lib()
    if lib is None:
        return np_impl(gaze_loc, num_frames, height, width, kernel_size)
    k1 = gaussian_kernel_1d(kernel_size, -1.0)
    k2 = np.ascontiguousarray(k1 * k1.T, np.float32)
    gaze = np.ascontiguousarray(gaze_loc[:num_frames, :2], np.float64)
    out = np.empty((num_frames, height, width), np.float32)
    lib.gaze_heatmaps(
        gaze.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        num_frames, _fp(k2), kernel_size, height, width, _fp(out),
    )
    return out
