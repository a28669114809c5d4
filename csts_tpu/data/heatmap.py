"""Gaussian gaze-label heatmaps (reference: ``ego4d_avgaze.py:449-468`` /
``ego4d_avgaze_forecast.py:403-422`` + the uniform fallback at :318-328).

Replaces the cv2.getGaussianKernel dependency with the closed-form kernel —
cv2's default sigma for ksize k is ``0.3·((k−1)·0.5−1)+0.8`` and the kernel is
L1-normalized (verified against cv2 in tests).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


# cv2's small_gaussian_tab: fixed kernels for ksize ≤ 7 when sigma is non-positive
_CV2_SMALL_KERNELS = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


@lru_cache(maxsize=8)
def gaussian_kernel_1d(ksize: int, sigma: float = -1.0) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, sigma, CV_32F) equivalence."""
    if sigma <= 0 and ksize in _CV2_SMALL_KERNELS:
        return np.asarray(_CV2_SMALL_KERNELS[ksize], np.float32)[:, None]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    k /= k.sum()
    return k.astype(np.float32)[:, None]


def place_gaussian(heatmap: np.ndarray, center_xy, kernel_size: int, sigma: float = -1.0) -> None:
    """In-place Gaussian stamp clipped at the borders (``_get_gaussian_map``)."""
    h, w = heatmap.shape
    # round() here is Python banker's rounding — matching the reference exactly
    mu_x, mu_y = round(float(center_xy[0])), round(float(center_xy[1]))
    half = (kernel_size - 1) // 2
    left, right = max(mu_x - half, 0), min(mu_x + half, w - 1)
    top, bottom = max(mu_y - half, 0), min(mu_y + half, h - 1)
    if left >= right or top >= bottom:
        return
    k1 = gaussian_kernel_1d(kernel_size, sigma)
    k2 = k1 * k1.T
    k_left = half - mu_x + left
    k_right = half + right - mu_x
    k_top = half - mu_y + top
    k_bottom = half + bottom - mu_y
    heatmap[top : bottom + 1, left : right + 1] = k2[k_top : k_bottom + 1, k_left : k_right + 1]


def gaze_heatmaps(
    gaze_loc: np.ndarray, num_frames: int, height: int, width: int, kernel_size: int
) -> np.ndarray:
    """Per-frame label heatmaps (T, H, W), each normalized to sum 1; uniform fallback
    when the gaze is off-image (ego4d_avgaze_forecast.py:318-328).

    ``gaze_loc``: (T, ≥2) normalized [x, y, ...].
    """
    hm = np.zeros((num_frames, height, width), np.float32)
    for i in range(num_frames):
        place_gaussian(
            hm[i],
            (gaze_loc[i, 0] * width, gaze_loc[i, 1] * height),
            kernel_size,
            sigma=-1.0,
        )
        s = hm[i].sum()
        if s == 0:
            hm[i] += 1.0 / (height * width)
        elif s != 1:
            hm[i] /= s
    return hm
