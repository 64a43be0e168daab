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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_kernel(qkv_ref, o_ref, *scratch, ws: int, n_w: int, r: int,
                heads: int, hd: int, scale: float, ps: int):
    """One (batch, row-group) tile: [r*ws, W, 3C] map rows in VMEM.

    r = window-rows per tile, n_w = windows per map row, ws = window side.
    ps = q max-pool stride (1 = no pooling; 2 for Hiera's q_pool blocks,
    hieradet.py MultiScaleAttention.q_pool — queries are 2x2 max-pooled
    per window, keys/values stay full, output is at pooled resolution).
    Heads are a static in-kernel loop (<=8 in Hiera) — Mosaic requires the
    minor block dim to be full-width, so head slicing happens on the tile.
    """
    tokens = ws * ws
    c = heads * hd
    q_ws = ws // ps

    def to_windows(x, side):
        # [r*side, n_w*side, hd] -> [r*n_w windows, side*side tokens, hd];
        # the reshapes are free (row-major splits), the transpose is
        # VMEM-local.
        x = x.reshape(r, side, n_w, side, hd)
        x = x.transpose(0, 2, 1, 3, 4)
        return x.reshape(r * n_w, side * side, hd)

    for h in range(heads):
        q_map = qkv_ref[0, :, :, h * hd:(h + 1) * hd]
        if ps > 1:
            # map-level 2x2 max pool == per-window pool (windows are
            # ps-aligned: ws % ps == 0). The VMEM scratch round-trip is
            # load-bearing: the pool's reduce output carries an
            # implicit-dim Mosaic layout that tpu.transpose cannot
            # consume ("Layout with implicit dimension"); materializing
            # through the scratch ref resets it to the natural layout.
            q_map = q_map.reshape(r * q_ws, ps, n_w * q_ws, ps, hd)
            q_map = jnp.max(jnp.max(q_map, axis=3), axis=1)
            scratch[0][...] = q_map
            q_map = scratch[0][...]
        q = to_windows(q_map, q_ws)
        k = to_windows(qkv_ref[0, :, :, c + h * hd:c + (h + 1) * hd], ws)
        v = to_windows(qkv_ref[0, :, :, 2 * c + h * hd:2 * c + (h + 1) * hd],
                       ws)

        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        ctx = ctx.reshape(r, n_w, q_ws, q_ws, hd)
        ctx = ctx.transpose(0, 2, 1, 3, 4)
        o_ref[0, :, :, h * hd:(h + 1) * hd] = ctx.reshape(
            r * q_ws, n_w * q_ws, hd).astype(o_ref.dtype)


def _pick_rows_per_block(n_wr: int, bytes_per_window_row: int,
                         budget: int = 1 << 21) -> int:
    """Largest divisor of n_wr whose q tile stays under ~2 MB."""
    r = max(1, min(n_wr, budget // max(1, bytes_per_window_row)))
    while n_wr % r:
        r -= 1
    return r


def _window_attention_pallas(qkv, *, num_heads: int, ws: int, scale: float,
                             ps: int, rows_per_block: Optional[int],
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
                               heads=num_heads, hd=hd, scale=scale, ps=ps)
    # pooled path only: VMEM scratch for the layout-reset round-trip of the
    # pooled q map (see _win_kernel)
    scratch_shapes = ([pltpu.VMEM((r * (ws // ps), n_w * (ws // ps), hd),
                                  qkv.dtype)] if ps > 1 else [])
    return pl.pallas_call(
        kernel,
        grid=(b, n_wr // r),
        scratch_shapes=scratch_shapes,
        in_specs=[
            pl.BlockSpec((1, r * ws, w, c3),
                         lambda bb, rr: (bb, rr, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * ws // ps, w // ps, c),
                               lambda bb, rr: (bb, rr, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // ps, w // ps, c), qkv.dtype),
        interpret=interpret,
    )(qkv)


def pallas_window_legal(ws: int, ps: int = 1) -> bool:
    """Whether Mosaic can lower the kernel for this window/pool config.

    The kernel's VMEM window transposes only lower for EVEN window sides
    (probed on v5e: sides 2/4/8/14/16 lower; side 7 fails with an
    unsupported-layout error). Both the kv side (ws) and the q/output side
    (ws // ps) must be even; callers fall back to XLA otherwise (SAM2's
    stage-4 ws=7 blocks and the ws=14 q-pool transition)."""
    return ws % 2 == 0 and (ws // ps) % 2 == 0


def window_attention_xla(qkv, *, num_heads: int, ws: int, scale: float,
                         ps: int = 1):
    """Plain-XLA oracle/fallback with identical semantics (also the source
    of the backward pass: recompute-from-qkv, differentiated by JAX).

    ps > 1: queries are 2x2 max-pooled per window before attention
    (hieradet q_pool); output is at pooled resolution [B, H/ps, W/ps, C].
    """
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    n_w, n_wr = w // ws, h // ws
    q_ws = ws // ps
    x = qkv.reshape(b, n_wr, ws, n_w, ws, 3, num_heads, hd)
    x = x.transpose(0, 1, 3, 5, 6, 2, 4, 7)       # [B,nWr,nW,3,H,ws,ws,hd]
    x = x.reshape(b * n_wr * n_w, 3, num_heads, ws, ws, hd)
    q, k, v = x[:, 0], x[:, 1], x[:, 2]
    if ps > 1:
        q = q.reshape(-1, num_heads, q_ws, ps, q_ws, ps, hd)
        q = jnp.max(jnp.max(q, axis=5), axis=3)
    q = q.reshape(-1, num_heads, q_ws * q_ws, hd)
    k = k.reshape(-1, num_heads, ws * ws, hd)
    v = v.reshape(-1, num_heads, ws * ws, hd)
    s = jnp.einsum("whid,whjd->whij", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("whij,whjd->whid", p.astype(v.dtype), v)
    o = o.reshape(b, n_wr, n_w, num_heads, q_ws, q_ws, hd)
    o = o.transpose(0, 1, 4, 2, 5, 3, 6)
    return o.reshape(b, h // ps, w // ps, c).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wa(static, qkv):
    num_heads, ws, scale, ps, rows_per_block, interpret = static
    return _window_attention_pallas(
        qkv, num_heads=num_heads, ws=ws, scale=scale, ps=ps,
        rows_per_block=rows_per_block, interpret=interpret)


def _wa_fwd(static, qkv):
    return _wa(static, qkv), qkv


def _wa_bwd(static, qkv, g):
    num_heads, ws, scale, ps, _, _ = static
    _, vjp = jax.vjp(
        lambda t: window_attention_xla(t, num_heads=num_heads, ws=ws,
                                       scale=scale, ps=ps), qkv)
    return (vjp(g)[0],)


_wa.defvjp(_wa_fwd, _wa_bwd)


def window_attention(qkv, *, num_heads: int, ws: int,
                     scale: Optional[float] = None,
                     q_pool: Optional[Tuple[int, int]] = None,
                     rows_per_block: Optional[int] = None,
                     backend: str = "auto", interpret: bool = False):
    """Windowed multi-head SDPA over an NHWC map, fused partition to
    unpartition.

    qkv: [B, H, W, 3*C] fused projection (layout contract above).
    Returns [B, H, W, C], or [B, H/ps, W/ps, C] when q_pool=(ps, ps) is
    given (queries max-pooled per window before attention — hieradet's
    stage-transition blocks). Requires H % ws == 0 and W % ws == 0
    (callers zero-pad the pre-qkv map to window multiples, matching the
    reference's window_partition padding, and crop the output).
    Differentiable: the backward recomputes through the XLA path.
    """
    b, h, w, c3 = qkv.shape
    assert c3 % 3 == 0, c3
    c = c3 // 3
    assert c % num_heads == 0, (c, num_heads)
    assert h % ws == 0 and w % ws == 0, (h, w, ws)
    ps = 1
    if q_pool is not None:
        assert q_pool[0] == q_pool[1], q_pool
        ps = q_pool[0]
        assert ws % ps == 0, (ws, ps)
    hd = c // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    if backend == "auto":
        from video_llava_seg_tpu.ops.attention import _on_tpu
        backend = ("pallas" if ((_on_tpu() or interpret)
                                and pallas_window_legal(ws, ps))
                   else "xla")
    if backend == "xla":
        return window_attention_xla(qkv, num_heads=num_heads, ws=ws,
                                    scale=scale, ps=ps)
    assert backend == "pallas", backend
    return _wa((num_heads, ws, scale, ps, rows_per_block, interpret), qkv)
