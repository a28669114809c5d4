"""Native C++ loader ops vs their numpy twins."""

import numpy as np
import pytest

from csts_tpu import native
from csts_tpu.data import heatmap as hm_np
from csts_tpu.data import sampling


def test_native_available():
    # g++ is part of this toolchain; the native path must actually build
    assert native.available(), "native loader ops failed to compile"


def test_fused_crop_flip_normalize_uint8(rng):
    frames = rng.integers(0, 255, (8, 40, 56, 3), dtype=np.uint8)
    mean, std = [0.45, 0.44, 0.43], [0.225, 0.224, 0.223]
    for flip in (False, True):
        out = native.fused_crop_flip_normalize(frames, 3, 5, 32, flip, mean, std)
        ref = frames[:, 3:35, 5:37].astype(np.float32) / 255.0
        ref = (ref - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
        if flip:
            ref = ref[:, :, ::-1]
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fused_crop_flip_normalize_f32(rng):
    frames = rng.standard_normal((4, 20, 24, 3)).astype(np.float32)
    out = native.fused_crop_flip_normalize(frames, 0, 2, 16, True, [0.0] * 3, [1.0] * 3)
    ref = frames[:, 0:16, 2:18][:, :, ::-1]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_audio_slice_gather(rng):
    audio = rng.standard_normal((256, 900)).astype(np.float32)
    centers = np.array([128, 200, 350, 771], np.int64)
    out = native.audio_slice_gather(audio, centers, 128)
    ref = sampling.slice_audio_frames(audio, centers, 128)
    np.testing.assert_array_equal(out, ref)


def test_gaze_heatmaps_match_numpy(rng):
    gaze = np.array([
        [0.5, 0.5, 0], [0.02, 0.02, 0], [1.2, 0.5, 0], [0.98, 0.5, 0],
        [0.0, 0.0, 0], [0.25, 0.75, 0],
    ])
    for k in (19, 5):
        ref = hm_np.gaze_heatmaps(gaze, 6, 64, 64, k)
        out = native.gaze_heatmaps(gaze, 6, 64, 64, k)
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fused_spatial_sampling_matches_reference_path(rng):
    """spatial_sampling_fused == tensor_normalize + spatial_sampling_gaze for the
    same seed (both augmentation choices and pixel values)."""
    from csts_tpu.data import transform

    frames = rng.integers(0, 255, (8, 48, 64, 3), dtype=np.uint8)
    gaze = rng.uniform(0.2, 0.8, (8, 3))
    mean, std = [0.45, 0.45, 0.45], [0.225, 0.225, 0.225]

    for spatial_idx in (-1, 1):
        r1 = np.random.default_rng(7)
        old_frames = transform.tensor_normalize(frames, mean, std)
        old_frames, old_gaze = transform.spatial_sampling_gaze(
            old_frames, gaze.copy(), spatial_idx, 40, 44 if spatial_idx == -1 else 40,
            32, True, r1,
        )
        r2 = np.random.default_rng(7)
        new_frames, new_gaze = transform.spatial_sampling_fused(
            frames, gaze.copy(), spatial_idx, 40, 44 if spatial_idx == -1 else 40,
            32, True, r2, mean, std,
        )
        np.testing.assert_allclose(new_frames, old_frames, atol=1e-4)
        np.testing.assert_allclose(new_gaze, old_gaze, atol=1e-9)
