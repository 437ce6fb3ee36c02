"""ctypes bindings for the native host runtime (native/raw_ngp_native.cpp).

Compiles on first use (g++ -O3, OpenMP when available) and caches the
shared object next to the source. Every entry point has a numpy fallback,
so the framework works without a compiler; the native path accelerates
host-side RAW preprocessing of large captures (the reference's analogous
native layer is its CUDA extensions; its HOST preprocessing was pure
numpy).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "raw_ngp_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "raw_ngp_native.so")

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    for flags in (["-fopenmp"], []):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               *flags, _SRC, "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
            return _SO
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.demosaic_rggb.argtypes = [_f32p, ctypes.c_int64,
                                      ctypes.c_int64, _f32p]
        lib.normalize_levels.argtypes = [_f32p, ctypes.c_int64,
                                         ctypes.c_float, ctypes.c_float,
                                         ctypes.c_int]
        lib.morton3d_encode.argtypes = [_i32p, ctypes.c_int64, _u32p]
        lib.morton3d_decode.argtypes = [_u32p, ctypes.c_int64, _i32p]
        lib.packbits.argtypes = [_f32p, ctypes.c_int64, ctypes.c_float,
                                 _u8p]
        lib.linear_to_srgb.argtypes = [_f32p, ctypes.c_int64]
        lib.version.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def demosaic_rggb(bayer: np.ndarray) -> np.ndarray:
    """Bilinear RGGB demosaic; native when possible, else the numpy
    reference (postprocess/raw.py)."""
    lib = _load()
    bayer = np.ascontiguousarray(bayer, np.float32)
    if lib is None:
        from raw_ngp_tpu.postprocess.raw import bilinear_demosaic
        return bilinear_demosaic(bayer).astype(np.float32)
    H, W = bayer.shape
    out = np.empty((H, W, 3), np.float32)
    lib.demosaic_rggb(bayer, H, W, out)
    return out


def normalize_levels(img: np.ndarray, black: float, white: float,
                     clip: bool = True) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.float32).copy()
    if lib is None:
        if clip:
            img = np.clip(img, 0.0, 1.0)
        return (img - black) / (white - black)
    lib.normalize_levels(img.reshape(-1), img.size, black, white,
                         int(clip))
    return img


def morton3d_encode(coords: np.ndarray) -> np.ndarray:
    lib = _load()
    coords = np.ascontiguousarray(coords, np.int32)
    if lib is None:
        from raw_ngp_tpu.ops.grid import _morton3d_invert_np  # noqa: F401
        # numpy fallback via bit spreading
        def expand(v):
            v = v.astype(np.uint32)
            v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
            v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
            v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
            v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
            return v
        return (expand(coords[:, 0]) | (expand(coords[:, 1]) << 1)
                | (expand(coords[:, 2]) << 2))
    out = np.empty(len(coords), np.uint32)
    lib.morton3d_encode(coords, len(coords), out)
    return out


def morton3d_decode(codes: np.ndarray) -> np.ndarray:
    lib = _load()
    codes = np.ascontiguousarray(codes, np.uint32)
    if lib is None:
        from raw_ngp_tpu.ops.grid import _morton3d_invert_np
        return _morton3d_invert_np(codes)
    out = np.empty((len(codes), 3), np.int32)
    lib.morton3d_decode(codes, len(codes), out)
    return out


def packbits(grid: np.ndarray, thresh: float) -> np.ndarray:
    lib = _load()
    flat = np.ascontiguousarray(grid.reshape(-1), np.float32)
    if lib is None:
        occ = (flat > thresh).reshape(-1, 8)
        return (occ.astype(np.uint8)
                * (2 ** np.arange(8)).astype(np.uint8)).sum(-1)\
            .astype(np.uint8)
    out = np.empty(flat.size // 8, np.uint8)
    lib.packbits(flat, flat.size, thresh, out)
    return out


def linear_to_srgb(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.float32).copy()
    if lib is None:
        from raw_ngp_tpu.postprocess.raw import linear_to_srgb as ref
        return ref(img).astype(np.float32)
    lib.linear_to_srgb(img.reshape(-1), img.size)
    return img
