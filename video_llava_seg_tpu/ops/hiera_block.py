"""Fully-fused Hiera transformer block for TPU.

One Pallas pass per windowed Hiera block: LN1 -> fused qkv dense ->
per-window SDPA (with optional 2x2 q max-pool and dim-change shortcut
projection) -> output projection -> residual -> LN2 -> GELU MLP ->
residual. TPU-native replacement for the reference block
(sam2/modeling/backbones/hieradet.py:84-166 MultiScaleBlock.forward),
which the reference runs as ~10 separate torch kernels.

Why: profiled on v5e at hiera-large shapes, the unfused block spends
most of its time OUTSIDE the matmuls — XLA relayouts the full token map
around every custom call ({3,0,2,1} <-> {3,2,1,0} copies), the exact-erf
GELU expands to a fp32 erfc polynomial over the 4x MLP hidden in HBM,
and every LN/elementwise pass re-traverses the map. Per-block weights
are small at Hiera dims (0.5-21 MB), so the whole block's parameters sit
in VMEM and each block costs exactly one HBM read + one HBM write of the
token map. Stage-1 blocks measured 16.8 ms at batch 8/1024^2 unfused vs
a ~2-4 ms compute floor; see BENCH_NOTES.md.

GELU uses the Abramowitz-Stegun 7.1.26 erf approximation (|eps| <=
1.5e-7 in f32; Mosaic has no erf primitive) — indistinguishable from
exact at bf16 output precision.

Layout contract mirrors ops/window_attention.py: NHWC maps, fused qkv
[q|k|v] each [num_heads, head_dim]-major. Requires H % ws == 0 and
W % ws == 0 (callers fall back to the unfused path otherwise) and even
window sides (Mosaic transpose legality, pallas_window_legal).

Differentiable: the backward recomputes through the XLA oracle
(hiera_block_xla) under jax.custom_vjp, the same recompute pattern as
ops/attention.py's flash backward.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_llava_seg_tpu.ops.window_attention import (
    pallas_window_legal,
    window_attention_xla,
)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf, f32, |eps| <= 1.5e-7."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _ln_f32(x_f32, scale, bias, eps):
    mean = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - mean), axis=-1, keepdims=True)
    return ((x_f32 - mean) * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def _block_kernel(x_ref, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                  ln2s, ln2b, w1, b1, w2, b2, *rest,
                  ws: int, n_w: int, r: int, heads: int, hd: int,
                  scale: float, ps: int, eps: float, has_skip: bool,
                  in_chunks: int, mlp_chunks: int):
    """One (batch, row-group) tile of the full block.

    rest = ([wskip, bskip,] o_ref, qkv_buf[, sc_buf][, q_scratch]).
    All weights ride VMEM whole (index maps pin them across the grid).
    The LN1+qkv+shortcut front end and the LN2+MLP back end are chunked
    over rows so their fp32 transients stay small — Mosaic's scoped-vmem
    stack is limited to 16 MiB and full-tile fp32 intermediates blow it
    at stage-1/3 shapes (22.18M observed). The bf16 qkv/shortcut maps
    live in explicit VMEM scratch, not the stack.
    """
    idx = 0
    if has_skip:
        wskip, bskip = rest[0], rest[1]
        idx = 2
    o_ref, qkv_buf, attn_ref, h1_ref = rest[idx:idx + 4]
    scratch = rest[idx + 4:]
    sc_buf = scratch[0] if (has_skip or ps > 1) else None
    q_scr = scratch[1] if ps > 1 else None

    R, W = r * ws, n_w * ws
    cin = x_ref.shape[-1]
    c = heads * hd
    q_ws = ws // ps
    Rp, Wp = R // ps, W // ps

    # front end, row-chunked: LN1 -> qkv dense (+ shortcut projection).
    # lax.fori_loop, NOT a Python loop: an unrolled loop keeps every
    # iteration's fp32 temporaries live on Mosaic's stack (measured: the
    # q-pool transition block hit 25.11M scoped vmem with 4 unrolled
    # chunks), while a real loop reuses one iteration's worth.
    rows_i = R // in_chunks

    def _front(ci, carry):
        sl = pl.ds(ci * rows_i, rows_i)
        xf = x_ref[0, sl].astype(jnp.float32)
        xn = _ln_f32(xf, ln1s[0], ln1b[0], eps).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(
            xn.reshape(rows_i * W, cin), wqkv[...].astype(xn.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv[0].astype(jnp.float32)).astype(xn.dtype)
        qkv_buf[sl] = qkv.reshape(rows_i, W, 3 * c)
        sc = None
        if has_skip:
            sc = jax.lax.dot_general(
                xn.reshape(rows_i * W, cin), wskip[...].astype(xn.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sc = (sc + bskip[0].astype(jnp.float32)).astype(xn.dtype)
            sc = sc.reshape(rows_i, W, c)
        elif ps > 1:
            sc = x_ref[0, sl]
        if has_skip or ps > 1:
            if ps > 1:
                sc = sc.reshape(rows_i // ps, ps, Wp, ps, c)
                sc = jnp.max(jnp.max(sc, axis=3), axis=1)
            sc_buf[pl.ds(ci * (rows_i // ps), rows_i // ps)] = sc
        return carry

    jax.lax.fori_loop(0, in_chunks, _front, 0)

    def to_windows(t, side):
        t = t.reshape(r, side, n_w, side, hd)
        t = t.transpose(0, 2, 1, 3, 4)
        return t.reshape(r * n_w, side * side, hd)

    # per-head window SDPA; heads fold into the output projection so the
    # per-head context never concatenates: attn = sum_h ctx_h @ Wproj[h]
    # (accumulated in an f32 VMEM scratch to keep it off the stack)
    attn_ref[...] = jnp.zeros((Rp * Wp, c), jnp.float32)
    for h in range(heads):
        q_map = qkv_buf[:, :, h * hd:(h + 1) * hd]
        if ps > 1:
            q_map = q_map.reshape(Rp, ps, Wp, ps, hd)
            q_map = jnp.max(jnp.max(q_map, axis=3), axis=1)
            # layout-reset round-trip (see window_attention._win_kernel)
            q_scr[...] = q_map
            q_map = q_scr[...]
        q = to_windows(q_map, q_ws)
        k = to_windows(qkv_buf[:, :, c + h * hd:c + (h + 1) * hd], ws)
        v = to_windows(qkv_buf[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd],
                       ws)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(x_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ctx = ctx.reshape(r, n_w, q_ws, q_ws, hd)
        ctx = ctx.transpose(0, 2, 1, 3, 4).reshape(Rp * Wp, hd)
        attn_ref[...] = attn_ref[...] + jax.lax.dot_general(
            ctx.astype(x_ref.dtype),
            wproj[h * hd:(h + 1) * hd, :].astype(x_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    base = (sc_buf[...] if (has_skip or ps > 1) else x_ref[0])
    h1_ref[...] = base + (attn_ref[...]
                          + bproj[0].astype(jnp.float32)).astype(
        x_ref.dtype).reshape(Rp, Wp, c)

    # back end, row-chunked (fori_loop, same stack-reuse rationale):
    # LN2 -> GELU MLP -> residual
    rows = Rp // mlp_chunks

    def _back(ci, carry):
        seg = h1_ref[pl.ds(ci * rows, rows)]
        hn = _ln_f32(seg.astype(jnp.float32), ln2s[0], ln2b[0],
                     eps).astype(x_ref.dtype)
        hh = jax.lax.dot_general(
            hn.reshape(rows * Wp, c), w1[...].astype(x_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        hh = _gelu_f32(hh + b1[0].astype(jnp.float32)).astype(x_ref.dtype)
        mlp = jax.lax.dot_general(
            hh, w2[...].astype(x_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        mlp = (mlp + b2[0].astype(jnp.float32)).astype(x_ref.dtype)
        o_ref[0, pl.ds(ci * rows, rows)] = seg + mlp.reshape(rows, Wp, c)
        return carry

    jax.lax.fori_loop(0, mlp_chunks, _back, 0)


def _flat_weights(blk):
    """Flatten the hiera block param dict into the kernel operand order.

    1-D vectors reshape to [1, dim] (Mosaic wants >= 2-D operands)."""
    def vec(v):
        return v.reshape(1, -1)

    mlp0, mlp1 = blk["mlp"]["layers"]
    ws = [vec(blk["norm1"]["scale"]), vec(blk["norm1"]["bias"]),
          blk["qkv"]["kernel"], vec(blk["qkv"]["bias"]),
          blk["proj_attn"]["kernel"], vec(blk["proj_attn"]["bias"]),
          vec(blk["norm2"]["scale"]), vec(blk["norm2"]["bias"]),
          mlp0["kernel"], vec(mlp0["bias"]),
          mlp1["kernel"], vec(mlp1["bias"])]
    if "proj" in blk:
        ws += [blk["proj"]["kernel"], vec(blk["proj"]["bias"])]
    return ws


def _rows_per_block(n_wr: int, ws: int, w: int, c3: int,
                    itemsize: int) -> int:
    """Largest divisor of n_wr keeping the bf16 qkv scratch under ~8 MiB
    (best of the on-chip tile sweep: 188.2 vs 196.3 ms hiera-L trunk at
    batch 8 for the 2 MiB setting; BENCH_NOTES.md)."""
    budget = 8 << 20
    r = max(1, min(n_wr, budget // max(1, ws * w * c3 * itemsize)))
    while n_wr % r:
        r -= 1
    return r


def _row_chunks(rows: int, wp: int, width: int, ps: int = 1,
                budget: int = 2 << 20) -> int:
    """Chunk count keeping an f32 [rows/chunks * wp, width] tile under
    `budget`, with rows/chunks a multiple of ps (chunked 2x2 pooling)."""
    total = rows * wp * width * 4
    chunks = 1
    while chunks < rows and total // chunks > budget:
        chunks += 1
    while rows % chunks or (rows // chunks) % ps:
        chunks += 1
        if chunks > rows:
            return 1
    return chunks


def _hiera_block_pallas(x, weights, *, has_skip: bool, num_heads: int,
                        ws: int, ps: int, eps: float,
                        interpret: bool):
    b, h, w, cin = x.shape
    wqkv = weights[2]
    c = wqkv.shape[1] // 3
    hd = c // num_heads
    n_w = w // ws
    n_wr = h // ws
    r = _rows_per_block(n_wr, ws, w, 3 * c, x.dtype.itemsize)
    rp, wp = r * ws // ps, w // ps
    in_chunks = _row_chunks(r * ws, w, 3 * c, ps=ps)
    mlp_chunks = _row_chunks(rp, wp, weights[8].shape[1])
    kernel = functools.partial(
        _block_kernel, ws=ws, n_w=n_w, r=r, heads=num_heads, hd=hd,
        scale=1.0 / math.sqrt(hd), ps=ps, eps=eps, has_skip=has_skip,
        in_chunks=in_chunks, mlp_chunks=mlp_chunks)

    full = lambda t: pl.BlockSpec(t.shape, lambda bb, rr: (0,) * t.ndim,
                                  memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, r * ws, w, cin),
                             lambda bb, rr: (bb, rr, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [full(t) for t in weights]
    scratch = [pltpu.VMEM((r * ws, w, 3 * c), x.dtype),    # qkv map
               pltpu.VMEM((rp * wp, c), jnp.float32),      # attn accum
               pltpu.VMEM((rp, wp, c), x.dtype)]           # h1 residual
    if has_skip or ps > 1:
        scratch.append(pltpu.VMEM((rp, wp, c), x.dtype))   # shortcut map
    if ps > 1:
        scratch.append(pltpu.VMEM((rp, wp, hd), x.dtype))  # pooled q
    return pl.pallas_call(
        kernel,
        grid=(b, n_wr // r),
        scratch_shapes=scratch,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rp, wp, c),
                               lambda bb, rr: (bb, rr, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // ps, w // ps, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # whole-block fusion legitimately holds the qkv/shortcut maps
            # + resident weights in VMEM; the 16 MiB scoped default is a
            # runaway-kernel guard, not the hardware limit (v5e: 128 MiB)
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(x, *weights)


def hiera_block_xla(blk, x, *, num_heads: int, ws: int,
                    q_stride: Optional[Tuple[int, int]], eps: float):
    """XLA oracle with identical semantics (hieradet MultiScaleBlock):
    also the backward path (recompute-from-x, differentiated by JAX)."""
    from video_llava_seg_tpu.ops import nn

    ps = q_stride[0] if q_stride is not None else 1
    xn = nn.layer_norm(blk["norm1"], x, eps)
    if "proj" in blk:
        shortcut = nn.dense(blk["proj"], xn)
    else:
        shortcut = x
    if ps > 1:
        from video_llava_seg_tpu.models.sam2.hiera import _max_pool_2x2
        shortcut = _max_pool_2x2(shortcut, q_stride)
    qkv = nn.dense(blk["qkv"], xn)
    hd = (qkv.shape[-1] // 3) // num_heads
    o = window_attention_xla(qkv, num_heads=num_heads, ws=ws,
                             scale=1.0 / math.sqrt(hd), ps=ps)
    h1 = shortcut + nn.dense(blk["proj_attn"], o)
    return h1 + nn.mlp_apply(blk["mlp"],
                             nn.layer_norm(blk["norm2"], h1, eps),
                             act=nn.gelu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hb(static, x, weights):
    has_skip, num_heads, ws, ps, eps, interpret = static
    return _hiera_block_pallas(x, weights, has_skip=has_skip,
                               num_heads=num_heads, ws=ws, ps=ps, eps=eps,
                               interpret=interpret)


def _weights_to_blk(weights, has_skip):
    blk = {"norm1": {"scale": weights[0][0], "bias": weights[1][0]},
           "qkv": {"kernel": weights[2], "bias": weights[3][0]},
           "proj_attn": {"kernel": weights[4], "bias": weights[5][0]},
           "norm2": {"scale": weights[6][0], "bias": weights[7][0]},
           "mlp": {"layers": [
               {"kernel": weights[8], "bias": weights[9][0]},
               {"kernel": weights[10], "bias": weights[11][0]}]}}
    if has_skip:
        blk["proj"] = {"kernel": weights[12], "bias": weights[13][0]}
    return blk


def _hb_fwd(static, x, weights):
    return _hb(static, x, weights), (x, weights)


def _hb_bwd(static, res, g):
    has_skip, num_heads, ws, ps, eps, _ = static
    x, weights = res

    def f(x, weights):
        blk = _weights_to_blk(weights, has_skip)
        return hiera_block_xla(blk, x, num_heads=num_heads, ws=ws,
                               q_stride=(ps, ps) if ps > 1 else None,
                               eps=eps)

    _, vjp = jax.vjp(f, x, weights)
    return vjp(g)


_hb.defvjp(_hb_fwd, _hb_bwd)


def hiera_block_supported(h: int, w: int, ws: int, ps: int) -> bool:
    """Kernel legality: window-divisible map (padding would change LN
    semantics — the reference pads POST-norm) and Mosaic-even windows."""
    return (ws > 0 and h % ws == 0 and w % ws == 0
            and pallas_window_legal(ws, ps))


def hiera_block(blk, x, *, num_heads: int, ws: int,
                q_stride: Optional[Tuple[int, int]] = None,
                eps: float = 1e-6, backend: str = "auto",
                interpret: bool = False):
    """Windowed Hiera block, fully fused on TPU; XLA oracle elsewhere."""
    ps = q_stride[0] if q_stride is not None else 1
    b, h, w, _ = x.shape
    if backend == "auto":
        from video_llava_seg_tpu.ops.attention import _on_tpu
        backend = ("pallas" if ((_on_tpu() or interpret)
                                and hiera_block_supported(h, w, ws, ps))
                   else "xla")
    if backend == "xla":
        return hiera_block_xla(blk, x, num_heads=num_heads, ws=ws,
                               q_stride=q_stride, eps=eps)
    assert backend == "pallas", backend
    weights = _flat_weights(blk)
    static = ("proj" in blk, num_heads, ws, ps, eps, interpret)
    return _hb(static, x, weights)
