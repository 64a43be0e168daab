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


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_estimate(r: int, cw: int, *, ws: int, c3: int, c: int, heads: int,
                   hd: int, ps: int, itemsize: int) -> int:
    """Scoped-VMEM bytes the kernel needs for an (r window-rows x cw
    window-cols) tile.

    Calibrated against Mosaic on v5e (scripts/probe_window_vmem.py):

    - ps=1 kernels: Mosaic reuses the stack across the unrolled head
      loop — probes with a full-heads estimate of 40-165 MiB compile
      fine (ws14/c448/h8 full-width, ws16/c576/h8 r=2 cw=8). Only ~2
      heads' temporaries are ever live, so count 2.
    - ps>1 (q-pool) kernels: the VMEM-scratch layout-reset round-trip
      defeats that reuse — the hiera-large stage-4 transition (heads=16,
      hd=72, ws=8, ps=2, C=1152, full-width) hits Mosaic's 16 MiB stack
      limit at a reported 18.14 MiB, matching the full heads x per-head
      sum (17.5 MiB here). Count all heads.
    """
    tile_r, tile_c = r * ws, cw * ws
    tok, qtok = ws * ws, (ws // ps) ** 2
    hdp = _ceil_to(hd, 128)
    tokp = _ceil_to(tok, 128)
    tok8, qtok8 = _ceil_to(tok, 8), _ceil_to(qtok, 8)
    wins = r * cw
    per_win = (2 * tok8 * hdp * itemsize      # k, v window tiles
               + 3 * qtok8 * hdp * 4          # q, ctx (+1 copy), f32
               + 2 * qtok8 * tokp * 4)        # scores, probs, f32
    heads_live = heads if ps > 1 else min(heads, 2)
    return (2 * tile_r * tile_c * c3 * itemsize       # double-buffered in
            + 2 * (tile_r // ps) * (tile_c // ps) * c * itemsize  # out
            + heads_live * wins * per_win
            + 3 * tile_r * tile_c * hdp * itemsize)   # map-level temps


_VMEM_BUDGET = 12 << 20   # target well under the 16 MiB scoped-vmem limit


def _pick_tiles(n_wr: int, n_wc: int, *, ws: int, c3: int, c: int,
                heads: int, hd: int, ps: int,
                itemsize: int) -> Optional[Tuple[int, int]]:
    """Choose (window-rows, window-cols) per tile.

    Prefers the widest column tile whose estimate fits the soft budget
    (wide minor-dim DMAs), then the largest row count whose single
    input tile stays <= ~4 MiB (grid pipelining). The estimate is a
    conservative over-count — Mosaic reuses stack buffers across the
    unrolled head loop, so shapes estimating 2-3x over budget still
    compile (probed on v5e: ws14/c448/h8 full-width estimates 39 MiB
    and compiles; the b+ seg-head trunk runs it in production). So when
    nothing fits the soft budget, fall back to the full-width r=1 tile
    (the only Mosaic-legal narrow option for e.g. ws=14, and the
    proven-in-context configuration) instead of XLA. Returns None only
    when the double-buffered DMA tiles alone exceed the 16 MiB scoped
    limit — a physical certainty, not a heuristic."""
    est = functools.partial(_vmem_estimate, ws=ws, c3=c3, c=c, heads=heads,
                            hd=hd, ps=ps, itemsize=itemsize)
    for cw in sorted((d for d in range(1, n_wc + 1) if n_wc % d == 0),
                     reverse=True):
        # Mosaic block-mapping rule: the second-minor block dim (tile
        # width) must be a multiple of 8 — for both the input tile
        # (cw*ws) and the pooled output tile (cw*ws/ps) — unless the
        # tile spans the full array width (cw == n_wc).
        if cw != n_wc and ((cw * ws) % 8 or (cw * ws // ps) % 8):
            continue
        if est(1, cw) > _VMEM_BUDGET:
            continue
        best = 1
        for r in sorted(d for d in range(1, n_wr + 1) if n_wr % d == 0):
            if (est(r, cw) <= _VMEM_BUDGET
                    and r * ws * cw * ws * c3 * itemsize <= (1 << 22)):
                best = r
        return best, cw
    dma = (2 * ws * n_wc * ws * c3 * itemsize
           + 2 * (ws // ps) * (n_wc * ws // ps) * c * itemsize)
    if dma > (16 << 20):
        return None
    return 1, n_wc


def _window_attention_pallas(qkv, *, num_heads: int, ws: int, scale: float,
                             ps: int, rows_per_block: Optional[int],
                             cols_per_block: Optional[int],
                             interpret: bool):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    n_wc = w // ws
    n_wr = h // ws
    if rows_per_block is None or cols_per_block is None:
        picked = _pick_tiles(n_wr, n_wc, ws=ws, c3=c3, c=c, heads=num_heads,
                             hd=hd, ps=ps, itemsize=qkv.dtype.itemsize)
        picked = picked or (1, 1)   # explicit backends: best effort
        rows_per_block = rows_per_block or picked[0]
        cols_per_block = cols_per_block or picked[1]
    r, cw = rows_per_block, cols_per_block
    assert n_wr % r == 0, (n_wr, r)
    assert n_wc % cw == 0, (n_wc, cw)

    kernel = functools.partial(_win_kernel, ws=ws, n_w=cw, r=r,
                               heads=num_heads, hd=hd, scale=scale, ps=ps)
    # pooled path only: VMEM scratch for the layout-reset round-trip of the
    # pooled q map (see _win_kernel)
    scratch_shapes = ([pltpu.VMEM((r * (ws // ps), cw * (ws // ps), hd),
                                  qkv.dtype)] if ps > 1 else [])
    return pl.pallas_call(
        kernel,
        grid=(b, n_wr // r, n_wc // cw),
        scratch_shapes=scratch_shapes,
        in_specs=[
            pl.BlockSpec((1, r * ws, cw * ws, c3),
                         lambda bb, rr, cc: (bb, rr, cc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * ws // ps, cw * ws // ps, c),
                               lambda bb, rr, cc: (bb, rr, cc, 0),
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
    num_heads, ws, scale, ps, rows_per_block, cols_per_block, \
        interpret = static
    return _window_attention_pallas(
        qkv, num_heads=num_heads, ws=ws, scale=scale, ps=ps,
        rows_per_block=rows_per_block, cols_per_block=cols_per_block,
        interpret=interpret)


def _wa_fwd(static, qkv):
    return _wa(static, qkv), qkv


def _wa_bwd(static, qkv, g):
    num_heads, ws, scale, ps = static[:4]
    _, vjp = jax.vjp(
        lambda t: window_attention_xla(t, num_heads=num_heads, ws=ws,
                                       scale=scale, ps=ps), qkv)
    return (vjp(g)[0],)


_wa.defvjp(_wa_fwd, _wa_bwd)


def window_attention(qkv, *, num_heads: int, ws: int,
                     scale: Optional[float] = None,
                     q_pool: Optional[Tuple[int, int]] = None,
                     rows_per_block: Optional[int] = None,
                     cols_per_block: Optional[int] = None,
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
        fits = _pick_tiles(h // ws, w // ws, ws=ws, c3=c3, c=c,
                           heads=num_heads, hd=hd, ps=ps,
                           itemsize=qkv.dtype.itemsize) is not None
        backend = ("pallas" if ((_on_tpu() or interpret)
                                and pallas_window_legal(ws, ps) and fits)
                   else "xla")
    if backend == "xla":
        return window_attention_xla(qkv, num_heads=num_heads, ws=ws,
                                    scale=scale, ps=ps)
    assert backend == "pallas", backend
    return _wa((num_heads, ws, scale, ps, rows_per_block, cols_per_block,
                interpret), qkv)
