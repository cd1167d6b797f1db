"""ctypes bindings for the native MJPEG/AVI codec (csrc/mjpeg_avi.c).

Builds the shared library on first use with the system compiler + libjpeg
(both baked into this image); caches the .so next to the package. Falls back
gracefully: `is_available()` is False when the toolchain or libjpeg is
missing and io.video uses GIF/npy instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "mjpeg_avi.c")
_SO = os.path.join(os.path.dirname(__file__), "libmjpeg_avi.so")


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    for cc in ("cc", "gcc", "g++"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", src, "-ljpeg", "-o", _SO],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return _SO
        except (FileNotFoundError, subprocess.TimeoutExpired):
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        path = _SO if os.path.exists(_SO) else _build()
        if path is None:
            _FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _FAILED = True
            return None
        lib.write_mjpeg_avi.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.write_mjpeg_avi.restype = ctypes.c_int
        lib.probe_mjpeg_avi.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.probe_mjpeg_avi.restype = ctypes.c_int
        lib.read_mjpeg_avi.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.read_mjpeg_avi.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def is_available() -> bool:
    return _load() is not None


def write_avi(path: str, frames: np.ndarray, fps: int = 8, quality: int = 90) -> None:
    """frames: (F, H, W, 3) uint8 → MJPEG AVI."""
    lib = _load()
    assert lib is not None, "native mjpeg codec unavailable"
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    rc = lib.write_mjpeg_avi(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, int(fps), int(quality),
    )
    if rc != 0:
        raise IOError(f"write_mjpeg_avi failed with code {rc}")


def probe_avi(path: str) -> Tuple[int, int, int, int]:
    """Returns (frames, height, width, fps)."""
    lib = _load()
    assert lib is not None, "native mjpeg codec unavailable"
    n = ctypes.c_int(); h = ctypes.c_int(); w = ctypes.c_int(); fps = ctypes.c_int()
    rc = lib.probe_mjpeg_avi(path.encode(), ctypes.byref(n), ctypes.byref(h),
                             ctypes.byref(w), ctypes.byref(fps))
    if rc != 0:
        raise IOError(f"probe_mjpeg_avi failed with code {rc}")
    return n.value, h.value, w.value, fps.value


def read_avi(path: str) -> np.ndarray:
    """MJPEG AVI → (F, H, W, 3) uint8."""
    lib = _load()
    assert lib is not None, "native mjpeg codec unavailable"
    n, h, w, _ = probe_avi(path)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    got = lib.read_mjpeg_avi(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w
    )
    if got <= 0:
        raise IOError(f"read_mjpeg_avi decoded {got} frames")
    return out[:got]
