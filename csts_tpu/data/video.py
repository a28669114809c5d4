"""Video clip readers with pluggable backends.

The reference decodes mp4 via PyAV/FFmpeg inside every DataLoader worker
(``video_container.py:7-29`` + ``decoder.py:226-310``). This build keeps decode on the
host but makes the backend pluggable, because at TPU step rates mp4 software decode is
the input bottleneck (SURVEY §7 hard-part 5):

* ``pyav``  — PTS-seek selective decode, frame-index parity with the reference
              (available only when the ``av`` package is installed; this
              harness image has no ``av`` wheel and zero egress — a round-4
              ``pip install av`` attempt failed on the network boundary, so
              the PyAV leg itself has never executed here. Its index math is
              parity-tested against ``sampling.py`` and the container
              round-trip runs via the OpenCV backend instead);
* ``ffmpeg`` — subprocess rawvideo pipe (available when an ffmpeg binary exists);
* ``opencv`` — cv2.VideoCapture frame-position seek (available when OpenCV was
              built with video IO) — the fallback container path on hosts
              without PyAV/ffmpeg, and the one real-container backend this
              harness image can actually exercise;
* ``npy``   — preprocessed clips stored as ``<clip>.frames.npy`` uint8 (T, H, W, 3)
              arrays, produced by the offline preprocessing CLI. This is the
              production TPU path: zero-codec reads that memory-map straight into the
              input pipeline, removing FFmpeg from the training hot loop entirely.

All backends return (frames uint8 (T,H,W,3), fps, total_frames) plus exact frame
indices so label/audio alignment is backend-independent.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

try:
    import av  # type: ignore

    # reject stubbed/broken installs (e.g. the test oracle's module stub)
    _HAS_PYAV = callable(getattr(av, "open", None))
except ImportError:
    av = None
    _HAS_PYAV = False

_FFMPEG = shutil.which("ffmpeg")
_FFPROBE = shutil.which("ffprobe")

try:
    import cv2  # type: ignore

    _HAS_CV2 = callable(getattr(cv2, "VideoCapture", None))
except ImportError:
    cv2 = None
    _HAS_CV2 = False


def available_backends():
    out = ["npy"]
    if _HAS_PYAV:
        out.append("pyav")
    if _FFMPEG and _FFPROBE:
        out.append("ffmpeg")
    if _HAS_CV2:
        out.append("opencv")
    return out


@dataclass
class ClipMeta:
    num_frames: int
    fps: float
    duration_pts: Optional[int] = None  # pyav stream duration, if known


class VideoReader:
    """Reads a window of frames [start_frame, end_frame] from one clip file."""

    def meta(self) -> ClipMeta:
        raise NotImplementedError

    def read_window(self, start_frame: int, end_frame: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (frames (N,H,W,3) uint8, frame_indices (N,))."""
        raise NotImplementedError

    def close(self):
        pass


def sidecar_num_frames(path: str) -> int:
    """Zero-decode frame count from the ``pack`` sidecars: meta.json first, then
    the npy header (mmap read, no data touched). Returns 0 when no sidecar
    exists. Owns the same naming rules as :class:`NpyClipReader` so the pack
    format's layout lives in one module."""
    npy_path = path if path.endswith(".npy") else path + ".frames.npy"
    for mp in (path + ".meta.json", os.path.splitext(npy_path)[0] + ".meta.json"):
        if os.path.exists(mp):
            with open(mp) as f:
                n = int(json.load(f).get("num_frames", 0))
            if n:
                return n
    if os.path.exists(npy_path):
        return int(np.load(npy_path, mmap_mode="r").shape[0])
    return 0


class NpyClipReader(VideoReader):
    """Preprocessed-clip reader: ``<path>.frames.npy`` + optional ``<path>.meta.json``.

    For a source path ``x/clip.mp4`` the preprocessed array lives at
    ``x/clip.mp4.frames.npy`` (or the path itself if it already ends in .npy).
    """

    def __init__(self, path: str, target_fps: float = 30.0):
        npy_path = path if path.endswith(".npy") else path + ".frames.npy"
        if not os.path.exists(npy_path):
            raise FileNotFoundError(npy_path)
        self._frames = np.load(npy_path, mmap_mode="r")
        meta_path = os.path.splitext(npy_path)[0] + ".meta.json"
        alt_meta = path + ".meta.json"
        fps = target_fps
        for mp in (meta_path, alt_meta):
            if os.path.exists(mp):
                with open(mp) as f:
                    fps = float(json.load(f).get("fps", target_fps))
                break
        self._meta = ClipMeta(num_frames=int(self._frames.shape[0]), fps=fps)

    def meta(self) -> ClipMeta:
        return self._meta

    def read_window(self, start_frame: int, end_frame: int) -> Tuple[np.ndarray, np.ndarray]:
        start = max(int(start_frame), 0)
        end = min(int(end_frame), self._meta.num_frames - 1)
        idx = np.arange(start, end + 1)
        return np.asarray(self._frames[start : end + 1]), idx


class PyAVReader(VideoReader):
    """PTS-seek selective decode (decoder.py:71-108,226-310 semantics)."""

    def __init__(self, path: str):
        assert _HAS_PYAV, "PyAV is not installed"
        self._container = av.open(path)
        stream = self._container.streams.video[0]
        self._stream = stream
        self._meta = ClipMeta(
            num_frames=stream.frames,
            fps=float(stream.average_rate),
            duration_pts=stream.duration,
        )

    def meta(self) -> ClipMeta:
        return self._meta

    def read_window(self, start_frame: int, end_frame: int) -> Tuple[np.ndarray, np.ndarray]:
        m = self._meta
        timebase = (m.duration_pts or m.num_frames) / m.num_frames
        start_pts = int(start_frame * timebase)
        end_pts = int(end_frame * timebase)
        margin = 1024
        seek_offset = max(start_pts - margin, 0)
        self._container.seek(seek_offset, any_frame=False, backward=True, stream=self._stream)
        frames = {}
        for frame in self._container.decode(video=0):
            if frame.pts < start_pts:
                continue
            if frame.pts <= end_pts:
                frames[frame.pts] = frame
            else:
                break
        ordered = [frames[p] for p in sorted(frames)]
        # frame index from PTS (frame.index is deprecated in modern PyAV):
        # pts = index · (duration_pts / num_frames) ⇒ index = round(pts / timebase)
        idx = np.asarray([int(round(f.pts / timebase)) for f in ordered])
        arr = np.stack([f.to_rgb().to_ndarray() for f in ordered])
        return arr, idx

    def close(self):
        self._container.close()


class FFmpegReader(VideoReader):
    """ffmpeg-subprocess rawvideo reader with accurate input seeking: only the
    requested window is emitted (``-ss`` before ``-i`` + ``-frames:v``; ffmpeg's
    default accurate_seek decodes from the preceding keyframe and discards up to
    the exact start time)."""

    def __init__(self, path: str):
        assert _FFMPEG and _FFPROBE, "ffmpeg/ffprobe not available"
        self._path = path
        probe = subprocess.run(
            [
                _FFPROBE, "-v", "error", "-select_streams", "v:0",
                "-show_entries", "stream=nb_frames,avg_frame_rate,width,height",
                "-of", "json", path,
            ],
            capture_output=True, check=True,
        )
        info = json.loads(probe.stdout)["streams"][0]
        num, den = info["avg_frame_rate"].split("/")
        self._wh = (int(info["width"]), int(info["height"]))
        self._meta = ClipMeta(
            num_frames=int(info["nb_frames"]), fps=float(num) / float(den)
        )

    def meta(self) -> ClipMeta:
        return self._meta

    def read_window(self, start_frame: int, end_frame: int) -> Tuple[np.ndarray, np.ndarray]:
        w, h = self._wh
        start = max(int(start_frame), 0)
        end = min(int(end_frame), self._meta.num_frames - 1)
        n = end - start + 1
        proc = subprocess.run(
            [
                _FFMPEG, "-v", "error",
                "-ss", f"{start / self._meta.fps:.6f}", "-i", self._path,
                "-frames:v", str(n),
                "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
            ],
            capture_output=True, check=True,
        )
        frames = np.frombuffer(proc.stdout, np.uint8).reshape(-1, h, w, 3)
        idx = np.arange(start, start + frames.shape[0])
        return frames.copy(), idx


class OpenCVReader(VideoReader):
    """cv2.VideoCapture reader with CAP_PROP_POS_FRAMES seeking.

    OpenCV decodes sequentially after a frame-position seek, matching the
    reference's "decode the whole window, keep the requested indices" semantics
    (decoder.py:226-310) without PTS math: VideoCapture's frame counter IS the
    frame index for constant-rate streams (the only kind the datasets emit)."""

    def __init__(self, path: str, target_fps: float = 30.0):
        assert _HAS_CV2, "OpenCV video IO is not available"
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise FileNotFoundError(f"OpenCV could not open {path}")
        num_frames = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if num_frames <= 0:
            # Headers without nb_frames (fragmented mp4, some MKV) make cv2
            # report 0/garbage; count by grabbing (no decode) rather than
            # silently emitting an empty clip downstream.
            while self._cap.grab():
                num_frames += 1
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
            if num_frames <= 0:
                raise RuntimeError(f"OpenCV found no decodable frames in {path}")
        fps = float(self._cap.get(cv2.CAP_PROP_FPS))
        if not fps > 0:
            # Same broken-header class as the frame-count fallback above: a
            # 0/NaN rate would make clip_size_frames collapse every sampled
            # window to frame 0. Assume the dataset's target rate instead
            # (NpyClipReader does the same when no meta sidecar exists).
            fps = target_fps
        self._meta = ClipMeta(num_frames=num_frames, fps=fps)

    def meta(self) -> ClipMeta:
        return self._meta

    def read_window(self, start_frame: int, end_frame: int) -> Tuple[np.ndarray, np.ndarray]:
        start = max(int(start_frame), 0)
        end = min(int(end_frame), self._meta.num_frames - 1)
        self._cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        frames = []
        for _ in range(end - start + 1):
            ok, bgr = self._cap.read()
            if not ok:
                break
            frames.append(bgr[..., ::-1])  # BGR → RGB
        arr = np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
        idx = np.arange(start, start + arr.shape[0])
        return arr, idx

    def close(self):
        self._cap.release()


def open_clip(path: str, backend: str = "auto", target_fps: float = 30.0) -> VideoReader:
    """Backend selection with graceful fallback: npy sidecar if present, else pyav,
    else ffmpeg, else opencv."""
    if backend == "auto":
        if path.endswith(".npy") or os.path.exists(path + ".frames.npy"):
            backend = "npy"
        elif _HAS_PYAV:
            backend = "pyav"
        elif _FFMPEG:
            backend = "ffmpeg"
        elif _HAS_CV2:
            backend = "opencv"
        else:
            backend = "npy"  # will raise FileNotFoundError with a clear path
    if backend == "npy":
        return NpyClipReader(path, target_fps)
    if backend == "pyav":
        return PyAVReader(path)
    if backend == "ffmpeg":
        return FFmpegReader(path)
    if backend == "opencv":
        return OpenCVReader(path, target_fps)
    raise NotImplementedError(f"Unknown decoding backend {backend}")
