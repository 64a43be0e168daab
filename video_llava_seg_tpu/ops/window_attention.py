"""Fused window attention for Hiera's windowed stages.

TPU-native replacement for the reference's window_partition -> SDPA ->
window_unpartition sequence (sam2/modeling/backbones/hieradet.py:39-166,
backbones/utils.py:16-62). One Pallas pass reads the fused qkv projection
straight from HBM in NHWC map layout, forms windows on VMEM-resident tiles,
runs the per-window softmax attention, and writes the output back in map
layout. This removes the two 6-D relayout transposes per block and the
huge-batch tiny-matmul SDPA dispatch that made stage-1/2 Hiera blocks cost
~10x their HBM roofline (BENCH_NOTES.md "Hiera early-block layout").

Layout contract: `qkv` is the raw output of the fused qkv dense applied to
the [B, H, W, C] token map, i.e. [B, H, W, 3*C] with the last axis ordered
[q | k | v], each [num_heads, head_dim]-major — exactly
`qkv.reshape(b, hw, 3, num_heads, head_dim)`'s memory layout. Each grid
step DMAs only its (tensor, head) lane slice, so q/k/v are never
materialized as separate arrays in HBM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_kernel(qkv_ref, o_ref, *, ws: int, n_w: int, r: int, heads: int,
                hd: int, scale: float):
    """One (batch, row-group) tile: [r*ws, W, 3C] map rows in VMEM.

    r = window-rows per tile, n_w = windows per map row, ws = window side.
    Heads are a static in-kernel loop (<=8 in Hiera) — Mosaic requires the
    minor block dim to be full-width, so head slicing happens on the tile.
    """
    tokens = ws * ws
    c = heads * hd

    def to_windows(x):
        # [r*ws, W, hd] -> [r*n_w windows, ws*ws tokens, hd]; the reshapes
        # are free (row-major splits), the transpose is VMEM-local.
        x = x.reshape(r, ws, n_w, ws, hd)
        x = x.transpose(0, 2, 1, 3, 4)
        return x.reshape(r * n_w, tokens, hd)

    for h in range(heads):
        q = to_windows(qkv_ref[0, :, :, h * hd:(h + 1) * hd])
        k = to_windows(qkv_ref[0, :, :, c + h * hd:c + (h + 1) * hd])
        v = to_windows(qkv_ref[0, :, :, 2 * c + h * hd:2 * c + (h + 1) * hd])

        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        ctx = ctx.reshape(r, n_w, ws, ws, hd)
        ctx = ctx.transpose(0, 2, 1, 3, 4)
        o_ref[0, :, :, h * hd:(h + 1) * hd] = ctx.reshape(
            r * ws, n_w * ws, hd).astype(o_ref.dtype)


def _pick_rows_per_block(n_wr: int, bytes_per_window_row: int,
                         budget: int = 1 << 21) -> int:
    """Largest divisor of n_wr whose q tile stays under ~2 MB."""
    r = max(1, min(n_wr, budget // max(1, bytes_per_window_row)))
    while n_wr % r:
        r -= 1
    return r


def _window_attention_pallas(qkv, *, num_heads: int, ws: int, scale: float,
                             rows_per_block: Optional[int],
                             interpret: bool):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    n_w = w // ws
    n_wr = h // ws
    if rows_per_block is None:
        rows_per_block = _pick_rows_per_block(
            n_wr, ws * w * c3 * qkv.dtype.itemsize)
    r = rows_per_block
    assert n_wr % r == 0, (n_wr, r)

    kernel = functools.partial(_win_kernel, ws=ws, n_w=n_w, r=r,
                               heads=num_heads, hd=hd, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b, n_wr // r),
        in_specs=[
            pl.BlockSpec((1, r * ws, w, c3),
                         lambda bb, rr: (bb, rr, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * ws, w, c),
                               lambda bb, rr: (bb, rr, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), qkv.dtype),
        interpret=interpret,
    )(qkv)


def window_attention_xla(qkv, *, num_heads: int, ws: int, scale: float):
    """Plain-XLA oracle/fallback with identical semantics (also the source
    of the backward pass: recompute-from-qkv, differentiated by JAX)."""
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    n_w, n_wr = w // ws, h // ws
    x = qkv.reshape(b, n_wr, ws, n_w, ws, 3, num_heads, hd)
    x = x.transpose(0, 1, 3, 5, 6, 2, 4, 7)       # [B,nWr,nW,3,H,ws,ws,hd]
    x = x.reshape(b * n_wr * n_w, 3, num_heads, ws * ws, hd)
    q, k, v = x[:, 0], x[:, 1], x[:, 2]
    s = jnp.einsum("whid,whjd->whij", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("whij,whjd->whid", p.astype(v.dtype), v)
    o = o.reshape(b, n_wr, n_w, num_heads, ws, ws, hd)
    o = o.transpose(0, 1, 4, 2, 5, 3, 6)
    return o.reshape(b, h, w, c).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wa(static, qkv):
    num_heads, ws, scale, rows_per_block, interpret = static
    return _window_attention_pallas(
        qkv, num_heads=num_heads, ws=ws, scale=scale,
        rows_per_block=rows_per_block, interpret=interpret)


def _wa_fwd(static, qkv):
    return _wa(static, qkv), qkv


def _wa_bwd(static, qkv, g):
    num_heads, ws, scale, _, _ = static
    _, vjp = jax.vjp(
        lambda t: window_attention_xla(t, num_heads=num_heads, ws=ws,
                                       scale=scale), qkv)
    return (vjp(g)[0],)


_wa.defvjp(_wa_fwd, _wa_bwd)


def window_attention(qkv, *, num_heads: int, ws: int,
                     scale: Optional[float] = None,
                     rows_per_block: Optional[int] = None,
                     backend: str = "auto", interpret: bool = False):
    """Windowed multi-head SDPA over an NHWC map, fused partition to
    unpartition.

    qkv: [B, H, W, 3*C] fused projection (layout contract above).
    Returns [B, H, W, C]. Requires H % ws == 0 and W % ws == 0 (SAM2's
    1024-input stage maps always are; callers fall back otherwise).
    Differentiable: the backward recomputes through the XLA path.
    """
    b, h, w, c3 = qkv.shape
    assert c3 % 3 == 0, c3
    c = c3 // 3
    assert c % num_heads == 0, (c, num_heads)
    assert h % ws == 0 and w % ws == 0, (h, w, ws)
    hd = c // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    if backend == "auto":
        from video_llava_seg_tpu.ops.attention import _on_tpu
        backend = "pallas" if (_on_tpu() or interpret) else "xla"
    if backend == "xla":
        return window_attention_xla(qkv, num_heads=num_heads, ws=ws,
                                    scale=scale)
    assert backend == "pallas", backend
    return _wa((num_heads, ws, scale, rows_per_block, interpret), qkv)
