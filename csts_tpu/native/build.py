"""Compile + load the native loader ops (g++, cached, ctypes)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "loader_ops.cpp")
_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "csts_tpu"
)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"loader_ops_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = [
        gxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        _SRC, "-o", so_path + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, OSError):
        # retry without OpenMP
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, OSError):
            return None
    os.replace(so_path + ".tmp", so_path)
    return so_path


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so_path = _build()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        dp = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        ip = ctypes.POINTER(i64)
        lib.fused_crop_flip_normalize.argtypes = [
            u8p, i64, i64, i64, i64, i64, i64, ctypes.c_int, fp, fp, fp,
        ]
        lib.fused_crop_flip_normalize_f32.argtypes = [
            fp, i64, i64, i64, i64, i64, i64, ctypes.c_int, fp, fp, ctypes.c_int, fp,
        ]
        lib.audio_slice_gather.argtypes = [fp, i64, i64, ip, i64, i64, fp]
        lib.gaze_heatmaps.argtypes = [dp, i64, fp, i64, i64, i64, fp]
        lib.loader_ops_version.restype = ctypes.c_int
        assert lib.loader_ops_version() == 1
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None
