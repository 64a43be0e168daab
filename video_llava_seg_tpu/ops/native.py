"""ctypes bindings for the native host runtime (native/libvls_native.so).

The reference's only native component is a CUDA connected-components kernel
(sam2/csrc/connected_components.cu) with a torch-extension binding.  The TPU
build splits that role in two:

- on-device: the Pallas/JAX label-propagation op
  (video_llava_seg_tpu/ops/connected_components.py), used inside jitted
  postprocessing;
- on host: this C++ library (union-find CC + threaded image resize for the
  input pipeline), bound via ctypes because pybind11 is not available.

All entry points degrade gracefully: if the shared library is missing and
cannot be built, callers fall back to the pure-JAX/numpy paths (mirroring
the reference's try/except around its CUDA kernel, sam2/utils/misc.py:47-63).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libvls_native.so")

_lib = None
_load_failed = False


def _default_threads() -> int:
    return min(16, os.cpu_count() or 1)


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on first use if needed) the native library, or None."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    try:
        if not osp.exists(_LIB_PATH) and build_if_missing:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, check=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vls_connected_components.restype = ctypes.c_int
        lib.vls_connected_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.vls_resize_f32.restype = ctypes.c_int
        lib.vls_resize_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.vls_resize_u8_to_f32.restype = ctypes.c_int
        lib.vls_resize_u8_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        _lib = lib
        return _lib
    except Exception:
        _load_failed = True
        return None


def available() -> bool:
    return load_library() is not None


def connected_components_host(
        mask: np.ndarray,
        num_threads: Optional[int] = None
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Union-find CC on host. mask: bool/uint8 [N, H, W].

    Returns (labels, areas) int32 [N, H, W] with the same id convention as
    the JAX op (component id = min flat pixel index + 1), or None if the
    native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    assert m.ndim == 3, m.shape
    n, h, w = m.shape
    labels = np.empty((n, h, w), np.int32)
    areas = np.empty((n, h, w), np.int32)
    rc = lib.vls_connected_components(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads if num_threads is not None else _default_threads())
    if rc != 0:
        return None
    return labels, areas


def resize_f32_host(x: np.ndarray, out_hw: Tuple[int, int],
                    mode: str = "bilinear",
                    num_threads: Optional[int] = None
                    ) -> Optional[np.ndarray]:
    """Threaded resize. x: float32 [N, C, H, W] -> [N, C, oh, ow].

    bilinear = half-pixel centers (torch align_corners=False); nearest =
    torch 'nearest'. Returns None if the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    assert x.ndim == 4, x.shape
    n, c, h, w = x.shape
    oh, ow = out_hw
    out = np.empty((n, c, oh, ow), np.float32)
    rc = lib.vls_resize_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, c, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
        0 if mode == "bilinear" else 1,
        num_threads if num_threads is not None else _default_threads())
    if rc != 0:
        return None
    return out


def resize_frames_u8_host(frames: np.ndarray, out_hw: Tuple[int, int],
                          mean: Optional[np.ndarray] = None,
                          std: Optional[np.ndarray] = None,
                          num_threads: Optional[int] = None
                          ) -> Optional[np.ndarray]:
    """Fused uint8-HWC -> float32-CHW resize + 1/255 rescale + normalize.

    frames: uint8 [N, H, W, C] -> float32 [N, C, oh, ow]."""
    lib = load_library()
    if lib is None:
        return None
    f = np.ascontiguousarray(frames, np.uint8)
    assert f.ndim == 4, f.shape
    n, h, w, c = f.shape
    oh, ow = out_hw
    out = np.empty((n, c, oh, ow), np.float32)
    mp = sp = None
    if mean is not None and std is not None:
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        mp = mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        sp = std.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.vls_resize_u8_to_f32(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow, mp, sp,
        num_threads if num_threads is not None else _default_threads())
    if rc != 0:
        return None
    return out
