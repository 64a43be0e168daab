"""Image interpolation with torch `F.interpolate` semantics, as matmuls.

The reference resizes constantly (pos-embed interp, FPN top-down upsampling,
mask up/downsampling, final mask postprocess — e.g. sam2/utils/transforms.py:118,
sam2/modeling/backbones/hieradet.py:273-281). Exact coordinate semantics matter
for mask parity, and torch's bicubic (a=-0.75) differs from jax.image's cubic
(a=-0.5), so we build explicit [out, in] interpolation weight matrices at trace
time (numpy, static shapes) and apply them as two dense matmuls:

    out = W_h @ x @ W_w^T

which is exactly what the MXU wants, instead of gather-based resizing.
Supports bilinear / bicubic / nearest, align_corners=False (the only mode the
reference uses), and torch-style antialiasing for downsampling.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Torch/OpenCV cubic convolution kernel (Keys, a=-0.75)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(x), 0.0, None)


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, method: str,
                   antialias: bool, align_corners: bool = False) -> np.ndarray:
    """[out_size, in_size] weight matrix for 1-D torch-style interpolation."""
    if method == "nearest":
        # torch legacy 'nearest': src = floor(dst * in/out)
        idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        m = np.zeros((out_size, in_size), np.float32)
        m[np.arange(out_size), idx] = 1.0
        return m

    if method == "bilinear":
        kernel, support = _linear_kernel, 1.0
    elif method == "bicubic":
        kernel, support = _cubic_kernel, 2.0
    else:
        raise ValueError(f"unknown method: {method}")

    scale = in_size / out_size
    m = np.zeros((out_size, in_size), np.float32)
    if antialias and scale > 1.0:
        # torch antialias path: taps outside [0, in) are dropped, kernel is
        # stretched by the scale factor, weights renormalized.
        for i in range(out_size):
            center = (i + 0.5) * scale
            supp = support * scale
            xmin = max(int(center - supp + 0.5), 0)
            xmax = min(int(center + supp + 0.5), in_size)
            j = np.arange(xmin, xmax)
            w = kernel((j - center + 0.5) / scale)
            s = w.sum()
            if s > 0:
                m[i, xmin:xmax] = w / s
        return m

    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        ac_scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = dst * ac_scale
    else:
        src = (dst + 0.5) * scale - 0.5
    radius = int(np.ceil(support)) + 1
    base = np.floor(src).astype(np.int64)
    offsets = np.arange(-radius + 1, radius + 1)
    idx = base[:, None] + offsets[None, :]             # [out, taps]
    dist = src[:, None] - idx
    w = kernel(dist)
    w = w / np.sum(w, axis=1, keepdims=True)
    idx = np.clip(idx, 0, in_size - 1)                 # border replicate
    np.add.at(m, (np.repeat(np.arange(out_size), idx.shape[1]), idx.ravel()),
              w.ravel())
    return m


def _interp_axes(x, size: Tuple[int, int], method: str, antialias: bool,
                 h_axis: int, w_axis: int, align_corners: bool = False):
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = size
    dtype = x.dtype
    if (in_h, in_w) == (out_h, out_w):
        return x
    xf = x.astype(jnp.float32)
    if in_h != out_h:
        mh = jnp.asarray(_resize_matrix(in_h, out_h, method, antialias,
                                        align_corners))
        xf = jnp.tensordot(mh, xf, axes=((1,), (h_axis,)))
        xf = jnp.moveaxis(xf, 0, h_axis)
    if in_w != out_w:
        mw = jnp.asarray(_resize_matrix(in_w, out_w, method, antialias,
                                        align_corners))
        xf = jnp.tensordot(xf, mw, axes=((w_axis,), (1,)))
        xf = jnp.moveaxis(xf, -1, w_axis)
    return xf.astype(dtype)


def interpolate(x, size: Tuple[int, int], method: str = "bilinear",
                antialias: bool = False, align_corners: bool = False):
    """Resize [..., H, W, C] (NHWC) with torch F.interpolate semantics."""
    return _interp_axes(x, size, method, antialias, x.ndim - 3, x.ndim - 2,
                        align_corners)


def interpolate_hw(x, size: Tuple[int, int], method: str = "bilinear",
                   antialias: bool = False):
    """Resize [..., H, W] (no channel dim, e.g. mask logits)."""
    return _interp_axes(x, size, method, antialias, x.ndim - 2, x.ndim - 1)


def interpolate_nchw(x, size: Tuple[int, int], method: str = "bilinear",
                     antialias: bool = False):
    """Resize [..., C, H, W] layout."""
    return _interp_axes(x, size, method, antialias, x.ndim - 2, x.ndim - 1)


def resize_host(x, size: Tuple[int, int], method: str = "bilinear"):
    """Host-side resize of numpy [N, C, H, W] (or [N, H, W] for masks) —
    prefers the threaded native C++ kernel (native/resize.cpp), falling back
    to the JAX matmul path. torch align_corners=False semantics, no
    antialias; matches the reference's CPU F.interpolate data-pipeline calls
    (llava/train/vicas_dataset.py:340-378)."""
    import numpy as np

    from video_llava_seg_tpu.ops import native

    x = np.asarray(x)
    squeeze = x.ndim == 3
    if squeeze:
        x = x[:, None]
    if method in ("bilinear", "nearest") and x.ndim == 4:
        out = native.resize_f32_host(x.astype(np.float32), size, method)
        if out is not None:
            out = out.astype(x.dtype) if x.dtype != np.float32 else out
            return out[:, 0] if squeeze else out
    import jax.numpy as jnp
    out = np.asarray(interpolate_nchw(jnp.asarray(x), size, method))
    return out[:, 0] if squeeze else out
