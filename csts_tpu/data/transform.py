"""Host-side spatial transforms, numpy/cv2, explicitly seeded.

Re-designs the gaze-aware augmentations of ``slowfast/datasets/transform.py``
(random_short_side_scale_jitter :43-97, random_crop_gaze :155-197,
horizontal_flip_gaze :235-261, uniform_crop_gaze :327-387) for a functional input
pipeline: every random op takes a ``np.random.Generator`` instead of mutating global
state, frames are ``(T, H, W, C)`` uint8/float32 numpy arrays, and resizing uses
OpenCV's C++ bilinear kernel (same half-pixel convention as torch's
``align_corners=False``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import cv2
import numpy as np


def short_side_scale(frames: np.ndarray, size: int) -> np.ndarray:
    """Resize so the short side equals ``size`` (no-op when already there)."""
    t, h, w, c = frames.shape
    if (w <= h and w == size) or (h <= w and h == size):
        return frames
    if w < h:
        new_w, new_h = size, int(math.floor(float(h) / w * size))
    else:
        new_w, new_h = int(math.floor(float(w) / h * size)), size
    out = np.empty((t, new_h, new_w, c), dtype=frames.dtype)
    for i in range(t):
        out[i] = cv2.resize(frames[i], (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    return out


def random_short_side_scale_jitter(
    frames: np.ndarray, min_size: int, max_size: int, rng: np.random.Generator
) -> np.ndarray:
    size = int(round(rng.uniform(min_size, max_size)))
    return short_side_scale(frames, size)


def random_crop_gaze(
    frames: np.ndarray, size: int, gaze_loc: np.ndarray, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """Random crop constrained to keep gaze points inside (transform.py:155-197).

    ``gaze_loc``: (T, K≥2) normalized [x, y, ...]; extra columns pass through.
    If infeasible, outlier gaze points are dropped pairwise until a window exists.
    """
    t, h, w, c = frames.shape
    if h == size and w == size:
        return frames, gaze_loc
    gaze_x = gaze_loc[:, 0] * w
    gaze_y = gaze_loc[:, 1] * h

    def pick_offset(coords: np.ndarray, span: int) -> int:
        if span <= size:
            return 0
        s = np.sort(coords)
        low, high = max(0, s.max() - size), min(span - size, s.min())
        while low > high:
            s = s[1:] if len(s) % 2 == 0 else s[:-1]
            low, high = max(0, s.max() - size), min(span - size, s.min())
        return int(low) if low == high else int(rng.uniform(low, high))

    x_offset = pick_offset(gaze_x, w)
    y_offset = pick_offset(gaze_y, h)
    cropped = frames[:, y_offset : y_offset + size, x_offset : x_offset + size]
    out_gaze = gaze_loc.copy()
    out_gaze[:, 0] = np.clip((gaze_x - x_offset) / size, 0, 1)
    out_gaze[:, 1] = np.clip((gaze_y - y_offset) / size, 0, 1)
    return cropped, out_gaze


def uniform_crop_gaze(
    frames: np.ndarray, size: int, spatial_idx: int, gaze_loc: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic left/center/right (or top/center/bottom) crop
    (transform.py:327-387)."""
    assert spatial_idx in (0, 1, 2)
    t, h, w, c = frames.shape
    gaze_x = gaze_loc[:, 0] * w
    gaze_y = gaze_loc[:, 1] * h
    y_offset = int(math.ceil((h - size) / 2))
    x_offset = int(math.ceil((w - size) / 2))
    if h > w:
        if spatial_idx == 0:
            y_offset = 0
        elif spatial_idx == 2:
            y_offset = h - size
    else:
        if spatial_idx == 0:
            x_offset = 0
        elif spatial_idx == 2:
            x_offset = w - size
    cropped = frames[:, y_offset : y_offset + size, x_offset : x_offset + size]
    out_gaze = gaze_loc.copy()
    out_gaze[:, 0] = np.clip((gaze_x - x_offset) / size, 0, 1)
    out_gaze[:, 1] = np.clip((gaze_y - y_offset) / size, 0, 1)
    return cropped, out_gaze


def horizontal_flip_gaze(
    frames: np.ndarray, gaze_loc: np.ndarray, rng: np.random.Generator, prob: float = 0.5
) -> Tuple[np.ndarray, np.ndarray]:
    """x → 1−x flip with probability ``prob`` (transform.py:235-261)."""
    out_gaze = gaze_loc.copy()
    if rng.uniform() < prob:
        frames = frames[:, :, ::-1]
        out_gaze[:, 0] = 1 - gaze_loc[:, 0]
    return frames, out_gaze


def tensor_normalize(frames: np.ndarray, mean, std) -> np.ndarray:
    """uint8 → [0,1] → (x−mean)/std (datasets/utils.py:290-307)."""
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 255.0
    return (frames - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def _crop_offset_1d(coords: np.ndarray, span: int, size: int, rng: np.random.Generator) -> int:
    """The gaze-constrained offset search of random_crop_gaze (transform.py:174-186)."""
    if span <= size:
        return 0
    s = np.sort(coords)
    low, high = max(0, s.max() - size), min(span - size, s.min())
    while low > high:
        s = s[1:] if len(s) % 2 == 0 else s[:-1]
        low, high = max(0, s.max() - size), min(span - size, s.min())
    return int(low) if low == high else int(rng.uniform(low, high))


def spatial_sampling_fused(
    frames: np.ndarray,
    gaze_loc: np.ndarray,
    spatial_idx: int,
    min_scale: int,
    max_scale: int,
    crop_size: int,
    random_horizontal_flip: bool,
    rng: Optional[np.random.Generator],
    mean,
    std,
    normalize: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused-fast-path equivalent of normalize + :func:`spatial_sampling_gaze`.

    Input ``frames`` are raw uint8 (or [0,1] float); the scale happens on [0,1]
    floats (bilinear resize commutes with the affine normalization, so this matches
    the reference's normalize-then-resize order), then crop + flip + (x−mean)/std run
    as ONE native pass (csts_tpu.native). Consumes the rng in the same order as the
    non-fused path, so augmentation choices are identical for a given seed.

    ``normalize=False`` keeps uint8 frames uint8 end-to-end (resize included) and
    skips the /255 + mean/std affine — the device-side-normalization transfer
    path (DATA_LOADER.UINT8_TRANSFER): 4× less h2d per clip, with the affine
    folded into the jitted step (csts_apply normalizes integer inputs). The only
    numerical difference is cv2's uint8 rounding in the resize (≤0.5/255 per
    pixel); with no resize the paths are bit-identical.
    """
    from csts_tpu import native

    assert spatial_idx in (-1, 0, 1, 2)
    keep_uint8 = not normalize and frames.dtype == np.uint8
    if frames.dtype == np.uint8 and not keep_uint8:
        frames = frames.astype(np.float32) / 255.0
    if spatial_idx == -1:
        size = int(round(rng.uniform(min_scale, max_scale)))
        frames = short_side_scale(frames, size)
        t, h, w, _ = frames.shape
        gaze_x = gaze_loc[:, 0] * w
        gaze_y = gaze_loc[:, 1] * h
        x0 = _crop_offset_1d(gaze_x, w, crop_size, rng)
        y0 = _crop_offset_1d(gaze_y, h, crop_size, rng)
        flip = bool(random_horizontal_flip and rng.uniform() < 0.5)
    else:
        assert min_scale == max_scale
        frames = short_side_scale(frames, min_scale)
        t, h, w, _ = frames.shape
        gaze_x = gaze_loc[:, 0] * w
        gaze_y = gaze_loc[:, 1] * h
        y0 = int(math.ceil((h - crop_size) / 2))
        x0 = int(math.ceil((w - crop_size) / 2))
        if h > w:
            y0 = 0 if spatial_idx == 0 else (h - crop_size if spatial_idx == 2 else y0)
        else:
            x0 = 0 if spatial_idx == 0 else (w - crop_size if spatial_idx == 2 else x0)
        flip = False

    if not normalize:
        # uint8 stays uint8 (UINT8_TRANSFER); float inputs pass through un-scaled
        # too — csts_apply only normalizes INTEGER dtypes on-device, so callers
        # must not hand float frames here expecting mean/std to happen later.
        assert keep_uint8 or not np.issubdtype(frames.dtype, np.floating), (
            "normalize=False with float frames would skip mean/std entirely"
        )
        out = frames[:, y0 : y0 + crop_size, x0 : x0 + crop_size, :]
        out = np.ascontiguousarray(out[:, :, ::-1, :] if flip else out)
    else:
        out = native.fused_crop_flip_normalize(frames, y0, x0, crop_size, flip, mean, std)
    out_gaze = gaze_loc.copy()
    gx = np.clip((gaze_x - x0) / crop_size, 0, 1)
    out_gaze[:, 0] = (1 - gx) if flip else gx
    out_gaze[:, 1] = np.clip((gaze_y - y0) / crop_size, 0, 1)
    return out, out_gaze


def spatial_sampling_gaze(
    frames: np.ndarray,
    gaze_loc: np.ndarray,
    spatial_idx: int,
    min_scale: int,
    max_scale: int,
    crop_size: int,
    random_horizontal_flip: bool,
    rng: Optional[np.random.Generator],
) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatcher (datasets/utils.py:112-195): spatial_idx −1 → random jitter+crop
    (+flip); 0/1/2 → deterministic scale + uniform crop."""
    assert spatial_idx in (-1, 0, 1, 2)
    if spatial_idx == -1:
        frames = random_short_side_scale_jitter(frames, min_scale, max_scale, rng)
        frames, gaze_loc = random_crop_gaze(frames, crop_size, gaze_loc, rng)
        if random_horizontal_flip:
            frames, gaze_loc = horizontal_flip_gaze(frames, gaze_loc, rng)
    else:
        assert min_scale == max_scale
        frames = short_side_scale(frames, min_scale)
        frames, gaze_loc = uniform_crop_gaze(frames, crop_size, spatial_idx, gaze_loc)
    return np.ascontiguousarray(frames), gaze_loc
