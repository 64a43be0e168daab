"""Position encodings for SAM2 (sine grid + random-Fourier point PE).

Parity targets: sam2/modeling/position_encoding.py:16-159. Sine tables are
built in numpy at trace time (static shapes → XLA constants), which replaces
the reference's runtime cache."""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def sine_pos_embed_hw(h: int, w: int, num_pos_feats: int,
                      temperature: int = 10000,
                      normalize: bool = True) -> np.ndarray:
    """[H, W, C] sine embedding (reference returns NCHW [C, H, W];
    channels are concat(pos_y, pos_x))."""
    npf = num_pos_feats // 2
    scale = 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.arange(1, w + 1, dtype=np.float64)[None, :] * np.ones((h, 1))
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(npf, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])],
                  axis=3).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])],
                  axis=3).reshape(h, w, -1)
    return np.concatenate([py, px], axis=2).astype(np.float32)


def sine_pos_embed_1d(pos, dim: int, temperature: int = 10000):
    """get_1d_sine_pe (sam2/modeling/sam2_utils.py:64-74): pos [...,] ->
    [..., dim] with interleaved-by-half sin/cos."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pos_embed = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pos_embed), jnp.cos(pos_embed)], axis=-1)


# ---------------------------------------------------------------------------
# random-Fourier point PE (prompt encoder)
# ---------------------------------------------------------------------------

def random_pe_init(key, num_pos_feats: int = 64, scale: float = 1.0):
    import jax
    return {"gaussian_matrix": scale * jax.random.normal(
        key, (2, num_pos_feats), jnp.float32)}


def random_pe_encode(params, coords):
    """coords in [0,1]^2, shape [..., 2] -> [..., 2*num_pos_feats]."""
    c = 2.0 * coords.astype(jnp.float32) - 1.0
    c = c @ params["gaussian_matrix"]
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def random_pe_grid(params, size: Tuple[int, int]):
    """Dense PE grid [H, W, C] (reference returns [C, H, W])."""
    h, w = size
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [H,W,2]
    return random_pe_encode(params, grid)


def random_pe_coords(params, coords, image_size: Tuple[int, int]):
    """Absolute pixel coords [..., 2] (x, y) -> PE, normalized by image size."""
    h, w = image_size
    c = coords.astype(jnp.float32) / jnp.asarray([w, h], jnp.float32)
    return random_pe_encode(params, c)
