"""ctypes bindings for the native host runtime (C++).

Auto-builds ``libtpu_pathopt_runtime.so`` on first use (g++, no external
deps); every entry point has a pure-Python/JAX fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtpu_pathopt_runtime.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_DIR, "esdf.cpp")
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-o", _LIB_PATH, src],
            check=True, capture_output=True)
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.esdf_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int]
    _lib.esdf_f32.restype = None
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def esdf_pixels(obstacle_mask: np.ndarray) -> np.ndarray:
    """Exact EDT in pixels via the C++ runtime (Felzenszwalb 2-pass)."""
    lib = _load()
    mask = np.ascontiguousarray(obstacle_mask.astype(np.uint8))
    rows, cols = mask.shape
    out = np.empty((rows, cols), np.float32)
    lib.esdf_f32(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, cols)
    return out


def build_map_native(obstacle_mask: np.ndarray, resolution: float = 0.2):
    """Host-side GridMap construction (CLI data-loader path). Falls back to
    the JAX ESDF when the native library is unavailable."""
    import jax.numpy as jnp
    from tpu_pathopt import maps
    if available():
        esdf = esdf_pixels(np.asarray(obstacle_mask)) * resolution
        return maps.from_esdf(esdf, resolution=resolution)
    return maps.build_map(jnp.asarray(obstacle_mask), resolution=resolution)
