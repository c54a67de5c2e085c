"""ctypes bridge to the native framepack preprocessing library.

Builds ``native/framepack.cpp`` on demand with g++ (no pybind11 in this
image) and exposes the two transforms with transparent numpy fallback. See
native/framepack.cpp for what it replaces in the reference.
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, 'native', 'framepack.cpp')
_LIB = os.path.join(_REPO_ROOT, 'native', 'libframepack.so')

_lib = None
_tried = False
_lock = threading.Lock()  # loader worker threads race on first use


def _build():
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
           _SRC, '-o', _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if necessary) the native library, or None.

    Thread-safe: concurrent first calls (DataLoader worker threads) must
    not spawn parallel g++ builds of the same .so or dlopen a half-written
    file.
    """
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        return _get_lib_locked()


def _get_lib_locked():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.isfile(_LIB) or (
                os.path.isfile(_SRC) and
                os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            _build()
        lib = ctypes.CDLL(_LIB)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.framepack_eyes.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, f32p, f32p]
        lib.framepack_eyes.restype = None
        lib.framepack_screen.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, f32p]
        lib.framepack_screen.restype = None
        _lib = lib
    except Exception as e:  # noqa: BLE001
        logger.warning('native framepack unavailable (%s); using numpy', e)
        _lib = None
    return _lib


def _as_u8_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _as_f32_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pack_eye_frames(frames, use_native=True):
    """uint8 (N, H, W, 3) eye strip -> (left, right) float32 NHWC patches.

    left = right half of the strip, right = left half, values in [-1, 1]
    (reference eve_sequences.py:196-203,283-285).
    """
    frames = np.ascontiguousarray(frames)
    n, h, w, _ = frames.shape
    half = w // 2
    lib = get_lib() if use_native else None
    if lib is not None:
        left = np.empty((n, h, half, 3), np.float32)
        right = np.empty((n, h, half, 3), np.float32)
        lib.framepack_eyes(_as_u8_ptr(frames), n, h, w,
                           _as_f32_ptr(left), _as_f32_ptr(right))
        return left, right
    scaled = frames.astype(np.float32) * (2.0 / 255.0) - 1.0
    return (np.ascontiguousarray(scaled[:, :, half:, :]),
            np.ascontiguousarray(scaled[:, :, :half, :]))


def split_eye_frames_u8(frames):
    """uint8 (N, H, W, 3) eye strip -> (left, right) uint8 patches.

    Same split as ``pack_eye_frames`` but WITHOUT normalization — for the
    on-device preprocessing path (``tpu_on_device_preprocess``), where the
    `*2/255-1` scaling runs inside the jitted model and the host ships 4x
    fewer bytes.
    """
    frames = np.ascontiguousarray(frames)
    half = frames.shape[2] // 2
    return (np.ascontiguousarray(frames[:, :, half:, :]),
            np.ascontiguousarray(frames[:, :, :half, :]))


def pack_screen_frames(frames, use_native=True):
    """uint8 (N, H, W, 3) -> float32 NHWC in [0, 1]."""
    frames = np.ascontiguousarray(frames)
    n, h, w, _ = frames.shape
    lib = get_lib() if use_native else None
    if lib is not None:
        out = np.empty((n, h, w, 3), np.float32)
        lib.framepack_screen(_as_u8_ptr(frames), n, h, w, _as_f32_ptr(out))
        return out
    return frames.astype(np.float32) * (1.0 / 255.0)
