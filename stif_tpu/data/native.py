"""ctypes bindings for the native frame-ops library.

Falls back to the JAX/NumPy implementations when the shared library hasn't
been built (``tools/build_native.sh``). pybind11 is unavailable in this
environment, so the C++ side exposes a plain C ABI.
"""

from __future__ import annotations

import ctypes
import math
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libframe_ops.so")
_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.stif_imresize_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ]
        lib.stif_bgr_u8_to_rgb_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.stif_degrade_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.stif_num_threads.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def imresize_native(img: np.ndarray, scale: float) -> Optional[np.ndarray]:
    """MATLAB bicubic resize via the native library. img: (H, W, C) float32.
    Returns None when the library isn't built."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w, c = img.shape
    oh, ow = math.ceil(h * scale), math.ceil(w * scale)
    out = np.empty((oh, ow, c), np.float32)
    lib.stif_imresize_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
        float(scale), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def bgr_u8_to_rgb(img: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty(img.shape, np.float32)
    lib.stif_bgr_u8_to_rgb_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0] * img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def degrade_u8(img: np.ndarray, y0: int, x0: int, crop: int,
               scale: float) -> Optional[np.ndarray]:
    """Fused crop + BGR->RGB + normalize + bicubic downscale."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    oh, ow = math.ceil(crop * scale), math.ceil(crop * scale)
    out = np.empty((oh, ow, 3), np.float32)
    lib.stif_degrade_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(y0), int(x0), int(crop), float(scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def host_imresize(img: np.ndarray, scale: float) -> np.ndarray:
    """MATLAB bicubic on the HOST: native C++ (OpenMP) when built, pure-NumPy
    fallback otherwise. Accepts (..., H, W, C); never touches the accelerator
    (data workers and eval harnesses must not trigger XLA compiles)."""
    from stif_tpu.ops.resize import imresize_np

    img = np.asarray(img, np.float32)
    if _load() is None:
        return imresize_np(img, scale)
    if img.ndim == 3:
        return imresize_native(img, scale)
    flat = img.reshape((-1,) + img.shape[-3:])
    outs = [imresize_native(f, scale) for f in flat]
    return np.stack(outs).reshape(img.shape[:-3] + outs[0].shape)
