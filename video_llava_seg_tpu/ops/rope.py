"""Rotary position embeddings: 1-D (Llama) and 2-D axial (SAM2 memory attn).

Real-valued (cos/sin) formulation — no complex arrays, so it fuses cleanly on
the VPU and works inside Pallas kernels.

Capability parity:
  - axial RoPE semantics of sam2/modeling/position_encoding.py:168-222
    (compute_axial_cis / apply_rotary_enc, incl. repeat_freqs_k for memory
    cross-attention and rotation on interleaved (even, odd) channel pairs)
  - Llama-3 1-D RoPE with half-split rotate (HF convention).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 2-D axial RoPE (SAM2)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def axial_rope_cos_sin(dim: int, end_x: int, end_y: int,
                       theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables [end_x*end_y, dim//2] for axial 2-D RoPE.

    First dim//4 rotary pairs carry x-position frequencies, the next dim//4
    carry y-position frequencies; token order is row-major over (y, x).
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float64)
                             / dim))
    t = np.arange(end_x * end_y, dtype=np.float64)
    t_x = t % end_x
    t_y = np.floor(t / end_x)
    fx = np.outer(t_x, freqs)                    # [N, dim//4]
    fy = np.outer(t_y, freqs)
    ang = np.concatenate([fx, fy], axis=-1)      # [N, dim//2]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rotate_pairs(x, cos, sin):
    """Rotate interleaved (even, odd) channel pairs. x: [..., N, D]."""
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    xe, xo = x2[..., 0], x2[..., 1]
    oe = xe * cos - xo * sin
    oo = xe * sin + xo * cos
    out = jnp.stack([oe, oo], axis=-1).reshape(xf.shape)
    return out.astype(x.dtype)


def apply_axial_rope(q, k, end_x: int, end_y: int, theta: float = 10000.0,
                     repeat_freqs_k: bool = False,
                     num_k_exclude: int = 0):
    """Apply axial RoPE to q [..., Nq, D] and k [..., Nk, D].

    Nq must equal end_x*end_y. If Nk > Nq, requires repeat_freqs_k (memory
    tokens are R stacked frames of the same spatial grid). The trailing
    `num_k_exclude` k tokens (object pointers) are left unrotated.
    """
    d = q.shape[-1]
    nq = q.shape[-2]
    assert nq == end_x * end_y, (nq, end_x, end_y)
    cos_np, sin_np = axial_rope_cos_sin(d, end_x, end_y, theta)
    cos = jnp.asarray(cos_np)
    sin = jnp.asarray(sin_np)
    q_out = _rotate_pairs(q, cos, sin)

    nk = k.shape[-2]
    nk_rope = nk - num_k_exclude
    if nk_rope == 0:
        return q_out, k
    k_rope = k[..., :nk_rope, :]
    if nk_rope != nq:
        assert repeat_freqs_k and nk_rope % nq == 0, (nk_rope, nq)
        r = nk_rope // nq
        cos_k = jnp.tile(cos, (r, 1))
        sin_k = jnp.tile(sin, (r, 1))
    else:
        cos_k, sin_k = cos, sin
    k_out = _rotate_pairs(k_rope, cos_k, sin_k)
    if num_k_exclude > 0:
        k_out = jnp.concatenate([k_out, k[..., nk_rope:, :]], axis=-2)
    return q_out, k_out


# ---------------------------------------------------------------------------
# 1-D RoPE (Llama, half-split convention)
# ---------------------------------------------------------------------------

def rope_1d_cos_sin(positions, head_dim: int, theta: float = 500000.0):
    """cos/sin [..., seq, head_dim] for HF-Llama RoPE given position ids."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # [..., S, D/2]
    ang = jnp.concatenate([ang, ang], axis=-1)                 # [..., S, D]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_1d(x, cos, sin):
    """x: [..., H, S, D]; cos/sin: [..., S, D] (broadcast over heads).

    HF convention: rotate_half splits the head dim in two halves.
    """
    if cos.ndim == x.ndim - 1:
        cos = jnp.expand_dims(cos, -3)
        sin = jnp.expand_dims(sin, -3)
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = xf * cos + rotated * sin
    return out.astype(x.dtype)
