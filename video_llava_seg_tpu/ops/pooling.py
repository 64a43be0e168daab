"""Pooling ops: exact torch-style adaptive average pooling as matmuls."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] averaging matrix with torch AdaptiveAvgPool semantics:
    bin i covers [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool_2d(x, out_hw):
    """x: [..., H, W, C] -> [..., oh, ow, C] (torch adaptive_avg_pool2d
    parity, used for the fast-frame 4x4 token pooling at
    llava/model/llava_arch.py:172-181)."""
    oh, ow = out_hw
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    mh = jnp.asarray(_adaptive_pool_matrix(x.shape[h_axis], oh))
    mw = jnp.asarray(_adaptive_pool_matrix(x.shape[w_axis], ow))
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = jnp.tensordot(mh, xf, axes=((1,), (h_axis,)))
    xf = jnp.moveaxis(xf, 0, h_axis)
    xf = jnp.tensordot(xf, mw, axes=((w_axis,), (1,)))
    xf = jnp.moveaxis(xf, -1, w_axis)
    return xf.astype(dtype)
