"""Parity tests for the data layer: sampling math, transforms, heatmaps, STFT."""

import numpy as np
import pytest
import torch

from csts_tpu.data import heatmap, sampling, stft, transform

from reference_oracle import install_stubs

install_stubs()

from slowfast.datasets import decoder as decoder_ref  # noqa: E402
from slowfast.datasets import transform as transform_ref  # noqa: E402


# ------------------------------------------------------------------ sampling math


def test_clip_size_formula():
    # decoder.py:397 — ((8+1)*(8-1)+1)/30*30 = 64 frames at native fps
    assert sampling.clip_size_frames(8, 8, 30, 30.0) == 64.0
    assert sampling.clip_size_frames(4, 8, 20, 20.0) == 36.0


@pytest.mark.parametrize("video_size,clip_size", [(86, 64.0), (150, 64.0), (60, 36.0)])
@pytest.mark.parametrize("clip_idx,num_clips", [(0, 1), (1, 1), (0, 2), (1, 2)])
def test_get_start_end_idx_deterministic(video_size, clip_size, clip_idx, num_clips):
    ref = decoder_ref.get_start_end_idx(video_size, clip_size, clip_idx, num_clips)
    ours = sampling.get_start_end_idx(video_size, clip_size, clip_idx, num_clips)
    assert ours == pytest.approx(ref)


def test_temporal_sampling_indices_matches_torch():
    for start, end, n, size in [(0, 63, 8, 80), (5.5, 69.5, 8, 70), (0, 99, 8, 50)]:
        frames = torch.arange(size)
        ref = decoder_ref.temporal_sampling(frames, start, end, n).numpy()
        ours_idx = sampling.temporal_sampling_indices(start, end, n, size - 1)
        np.testing.assert_array_equal(np.arange(size)[ours_idx], ref)


def test_forecast_label_indices_ego4d():
    # test mode: frames [86, 150) linspace to 8 (ego4d_avgaze_forecast.py:234-235)
    idx = sampling.forecast_label_indices(0, 86, 150, 8, train=False)
    ref = np.linspace(86, 149, 8).astype(np.int64)
    np.testing.assert_array_equal(idx, ref)
    # train mode: the 64 frames after the last observed index
    idx = sampling.forecast_label_indices(70, 86, 150, 8, train=True)
    ref = np.linspace(71, 71 + 63, 8).astype(np.int64)
    np.testing.assert_array_equal(idx, ref)


def test_audio_slice_indices_matches_reference_math():
    frames_idx = np.array([0, 12, 24, 36, 48, 60, 72, 85])
    stft_len = 575  # 86/150 of a 5 s STFT at 5 ms hop ≈ 575 columns
    ref = torch.clip(
        torch.round(torch.as_tensor(frames_idx) / 86 * stft_len).int(), 128, stft_len - 1 - 128
    ).numpy()
    ours = sampling.audio_slice_indices(frames_idx, 86, stft_len)
    np.testing.assert_array_equal(ours, ref)
    audio = np.random.default_rng(0).standard_normal((256, stft_len)).astype(np.float32)
    sliced = sampling.slice_audio_frames(audio, ours)
    assert sliced.shape == (8, 256, 256)


# ------------------------------------------------------------------ transforms


def test_short_side_scale_matches_torch_bilinear(rng):
    frames = rng.integers(0, 255, (3, 60, 80, 3)).astype(np.float32)
    ref, _ = transform_ref.random_short_side_scale_jitter(
        torch.from_numpy(frames.transpose(0, 3, 1, 2)), 48, 48
    )
    ref = ref.numpy().transpose(0, 2, 3, 1)
    ours = transform.short_side_scale(frames, 48)
    assert ours.shape == ref.shape
    # cv2 INTER_LINEAR vs torch bilinear: same half-pixel convention, tiny rounding diffs
    assert np.abs(ours - ref).max() < 1.0


def test_uniform_crop_gaze_matches_reference(rng):
    frames = rng.standard_normal((8, 48, 64, 3)).astype(np.float32)
    gaze = rng.uniform(0.2, 0.8, (8, 3)).astype(np.float64)
    for spatial_idx in (0, 1, 2):
        ref_frames, ref_gaze = transform_ref.uniform_crop_gaze(
            torch.from_numpy(frames.transpose(0, 3, 1, 2)), 48, spatial_idx, gaze_loc=gaze.copy()
        )
        ours_frames, ours_gaze = transform.uniform_crop_gaze(frames, 48, spatial_idx, gaze.copy())
        np.testing.assert_allclose(ours_frames, ref_frames.numpy().transpose(0, 2, 3, 1))
        np.testing.assert_allclose(ours_gaze, ref_gaze, atol=1e-9)


def test_random_crop_gaze_keeps_gaze_inside(rng):
    frames = rng.standard_normal((8, 60, 80, 3)).astype(np.float32)
    gaze = rng.uniform(0.3, 0.7, (8, 3))
    nprng = np.random.default_rng(0)
    cropped, new_gaze = transform.random_crop_gaze(frames, 48, gaze, nprng)
    assert cropped.shape == (8, 48, 48, 3)
    assert np.all(new_gaze[:, :2] >= 0) and np.all(new_gaze[:, :2] <= 1)
    # feasible case: all gaze points stay strictly inside (no clipping happened)
    assert np.all(new_gaze[:, :2] > 0) and np.all(new_gaze[:, :2] < 1)


def test_horizontal_flip_gaze(rng):
    frames = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    gaze = rng.uniform(0, 1, (4, 3))
    always = np.random.default_rng(1)
    flipped, g2 = transform.horizontal_flip_gaze(frames, gaze, always, prob=1.1)
    np.testing.assert_allclose(np.asarray(flipped), frames[:, :, ::-1])
    np.testing.assert_allclose(g2[:, 0], 1 - gaze[:, 0])
    np.testing.assert_allclose(g2[:, 1:], gaze[:, 1:])


def test_tensor_normalize_uint8():
    frames = np.full((1, 2, 2, 3), 255, np.uint8)
    out = transform.tensor_normalize(frames, [0.45] * 3, [0.225] * 3)
    np.testing.assert_allclose(out, (1.0 - 0.45) / 0.225, rtol=1e-6)


# ------------------------------------------------------------------ heatmaps


def test_gaussian_kernel_matches_cv2():
    import cv2

    for k in (19, 11, 5):
        ref = cv2.getGaussianKernel(ksize=k, sigma=-1, ktype=cv2.CV_32F)
        ours = heatmap.gaussian_kernel_1d(k, -1.0)
        np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_gaze_heatmaps_match_reference_impl():
    """Compare against the reference's _get_gaussian_map + normalization inline."""
    install_stubs()
    from slowfast.datasets.ego4d_avgaze_forecast import Ego4d_av_gaze_forecast

    gaze = np.array([[0.5, 0.5, 0], [0.02, 0.02, 0], [1.2, 0.5, 0], [0.98, 0.5, 0]])
    h = w = 64
    ref = np.zeros((4, h, w))
    for i in range(4):
        Ego4d_av_gaze_forecast._get_gaussian_map(
            ref[i], (gaze[i, 0] * w, gaze[i, 1] * h), 19, -1
        )
        s = ref[i].sum()
        if s == 0:
            ref[i] += 1 / (h * w)
        elif s != 1:
            ref[i] /= s
    ours = heatmap.gaze_heatmaps(gaze, 4, h, w, 19)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# ------------------------------------------------------------------ STFT


def test_stft_jax_matches_numpy(rng):
    samples = rng.standard_normal(24000).astype(np.float32)  # 1 s @ 24 kHz
    ref = stft.stft_numpy(samples, 24000)
    ours = np.asarray(stft.stft_jax(samples, 24000))
    assert ref.shape[0] == 256  # n_fft 511 -> 256 freq bins
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_stft_shape_and_scaling():
    # 5 s at 24 kHz, hop 5 ms -> ~1000 columns (reference trims per clip)
    samples = np.sin(2 * np.pi * 440 * np.arange(120000) / 24000).astype(np.float32)
    spec = stft.stft_numpy(samples, 24000)
    assert spec.shape[0] == 256
    assert 990 <= spec.shape[1] <= 1010
    # 440 Hz bin should dominate: bin = 440 / (24000/511) ≈ 9.4
    peak_bin = np.argmax(spec.mean(axis=1))
    assert 8 <= peak_bin <= 11


# ------------------------------------------------------------------ decode backends


def _encode_test_mp4(path, frames, fps):
    """Encode with whatever this image provides; None if no encoder exists."""
    from csts_tpu.data import video as video_lib

    if video_lib._HAS_PYAV:
        import av

        container = av.open(path, "w")
        stream = container.add_stream("libx264", rate=fps)
        stream.width, stream.height = frames.shape[2], frames.shape[1]
        stream.pix_fmt = "yuv420p"
        stream.options = {"g": "10"}  # keyframe every 10 frames: exercises seeking
        for f in frames:
            for pkt in stream.encode(av.VideoFrame.from_ndarray(f, format="rgb24")):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
        container.close()
        return True
    if video_lib._FFMPEG:
        import subprocess

        proc = subprocess.run(
            [video_lib._FFMPEG, "-v", "error", "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-s", f"{frames.shape[2]}x{frames.shape[1]}", "-r", str(fps), "-i", "-",
             "-c:v", "libx264", "-g", "10", "-pix_fmt", "yuv420p", path],
            input=frames.tobytes(), capture_output=True,
        )
        return proc.returncode == 0
    if video_lib._HAS_CV2:
        # MJPG AVI via OpenCV — intra-only (every frame a keyframe), still a
        # real container+codec round trip; cv2 writers can't take .mp4 here so
        # the caller must pass an .avi-compatible path
        import cv2

        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
                             (frames.shape[2], frames.shape[1]))
        if not wr.isOpened():
            return False
        for f in frames:
            wr.write(f[..., ::-1])  # RGB → BGR
        wr.release()
        return True
    return False


def test_container_decode_backends_match_npy(tmp_path):
    """PyAV / FFmpeg window reads agree with NpyClipReader on the same frames
    (guard-skipped where no codec exists — decoder.py:71-108 PTS semantics)."""
    from csts_tpu.data import video as video_lib

    backends = video_lib.available_backends()
    if backends == ["npy"]:
        pytest.skip("no pyav/ffmpeg in this image; npy is the production path")

    fps = 10
    n, h, w = 40, 48, 64
    # each frame one flat gray level -> identity recoverable through lossy H.264
    levels = np.linspace(16, 235, n).astype(np.uint8)
    frames = np.broadcast_to(levels[:, None, None, None], (n, h, w, 3)).copy()
    mp4 = str(tmp_path / "clip.mp4")
    if not _encode_test_mp4(mp4, frames, fps):
        # cv2-only images can't mux MJPG into .mp4 — retry as .avi
        mp4 = str(tmp_path / "clip.avi")
        if not _encode_test_mp4(mp4, frames, fps):
            pytest.skip("no usable encoder in this image")
    np.save(mp4 + ".frames.npy", frames)
    import json

    with open(mp4 + ".meta.json", "w") as f:
        json.dump({"fps": fps}, f)

    ref = video_lib.open_clip(mp4, "npy")
    windows = [(0, 9), (7, 23), (25, 39)]
    for backend in backends:
        if backend == "npy":
            continue
        reader = video_lib.open_clip(mp4, backend)
        meta = reader.meta()
        assert meta.num_frames == n
        assert abs(meta.fps - fps) < 1e-3
        for lo, hi in windows:
            got, got_idx = reader.read_window(lo, hi)
            want, want_idx = ref.read_window(lo, hi)
            np.testing.assert_array_equal(got_idx, want_idx), backend
            # frame identity through the lossy codec: per-frame mean gray level
            got_levels = got.mean(axis=(1, 2, 3))
            want_levels = want.mean(axis=(1, 2, 3))
            np.testing.assert_allclose(got_levels, want_levels, atol=3.0), backend
        reader.close()


def test_device_prefetcher_propagates_worker_errors():
    """A decode/placement failure in the prefetch thread must surface in the
    consumer (it used to end the iteration silently, truncating the epoch and
    reporting metrics over a partial dataset)."""
    import pytest as _pytest

    from csts_tpu.data.loader import DevicePrefetcher

    def bad_iter():
        yield {"x": np.zeros(2)}
        raise RuntimeError("decode exploded")

    pf = DevicePrefetcher(bad_iter(), lambda b: b, depth=2)
    assert next(iter(pf))["x"].shape == (2,)
    with _pytest.raises(RuntimeError, match="decode exploded"):
        next(iter(pf))

    # close() still suppresses the in-flight error (intentional early stop)
    def slow_bad():
        yield {"x": np.zeros(1)}
        raise RuntimeError("late")

    pf2 = DevicePrefetcher(slow_bad(), lambda b: b, depth=1)
    pf2.close()  # no raise
