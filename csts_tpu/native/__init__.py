"""Native (C++) host-side data-loader ops with transparent numpy fallback.

Compiled on first use with g++ (cached by source hash under ~/.cache/csts_tpu);
loaded via ctypes — no pybind11 dependency. ``available()`` reports whether the
native path is active; every wrapper falls back to the numpy implementation in
csts_tpu.data when compilation is impossible.
"""

from .build import available, get_lib
from .ops import (
    fused_crop_flip_normalize,
    audio_slice_gather,
    gaze_heatmaps,
)

__all__ = [
    "available",
    "get_lib",
    "fused_crop_flip_normalize",
    "audio_slice_gather",
    "gaze_heatmaps",
]
