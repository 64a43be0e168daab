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
[q|k|v] each [num_heads, head_dim]-major. Non-window-divisible maps are
zero-padded with a POST-norm validity mask (the reference pads the
post-norm map, hieradet window_partition). Odd window sides (Mosaic
transpose illegality: ws=7, and ws=14/ps=2 whose pooled side is 7) are
stored GAP-PADDED at the next legal even side: the map is rearranged so
every window occupies ss >= ws storage cells per axis (a contiguous
reshape + pad, no transposes), gap keys are masked to -inf in the window
softmax, and the gap cells are sliced back out of the output. This keeps
every windowed block in every SAM2 Hiera variant on the fused path.

Differentiable: the backward recomputes through the XLA oracle
(hiera_block_xla) under jax.custom_vjp, the same recompute pattern as
ops/attention.py's flash backward.
"""

from __future__ import annotations

import functools
import math
import os
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


#: f32-tile budget (bytes) for the front/MLP dense chunking. Bigger tiles
#: = more MXU rows per dense dot, bounded by the Mosaic stack.
#: Env-sweepable (VLS_HIERA_TILE_MB) for on-chip A/Bs.
HIERA_TILE_BUDGET = int(os.environ.get("VLS_HIERA_TILE_MB", "2")) << 20


def _gelu_f32(x):
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _ln_f32(x_f32, scale, bias, eps):
    mean = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - mean), axis=-1, keepdims=True)
    return ((x_f32 - mean) * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def _mlp_tail(h1_ref, o_ref, ln2s, ln2b, w1, b1, w2, b2, *,
              mlp_chunks: int, eps: float, wp: int, c: int, dtype):
    """LN2 -> GELU MLP -> residual, row-chunked (fori_loop: one chunk's
    fp32 transients on the stack, reused)."""
    rows = h1_ref.shape[0] // mlp_chunks

    def _back(ci, carry):
        seg = h1_ref[pl.ds(ci * rows, rows)]
        hn = _ln_f32(seg.astype(jnp.float32), ln2s[0], ln2b[0],
                     eps).astype(dtype)
        hh = jax.lax.dot_general(
            hn.reshape(rows * wp, c), w1[...].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        hh = _gelu_f32(hh + b1[0].astype(jnp.float32)).astype(dtype)
        mlp = jax.lax.dot_general(
            hh, w2[...].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        mlp = (mlp + b2[0].astype(jnp.float32)).astype(dtype)
        o_ref[0, pl.ds(ci * rows, rows)] = seg + mlp.reshape(rows, wp, c)
        return carry

    jax.lax.fori_loop(0, mlp_chunks, _back, 0)


def _block_kernel(x_ref, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                  ln2s, ln2b, w1, b1, w2, b2, *rest,
                  ws: int, ss: int, n_w: int, r: int, heads: int, hd: int,
                  scale: float, ps: int, eps: float, has_skip: bool,
                  in_chunks: int, mlp_chunks: int, sdpa_chunks: int,
                  true_h: int, true_w: int, padded: bool):
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

    R, W = r * ss, n_w * ss
    cin = x_ref.shape[-1]
    c = heads * hd
    q_ss = ss // ps
    Rp, Wp = R // ps, W // ps
    gapped = ws > 0 and ss != ws
    global_attn = ws == 0

    # front end, row-chunked: LN1 -> qkv dense (+ shortcut projection).
    # lax.fori_loop, NOT a Python loop: an unrolled loop keeps every
    # iteration's fp32 temporaries live on Mosaic's stack (measured: the
    # q-pool transition block hit 25.11M scoped vmem with 4 unrolled
    # chunks), while a real loop reuses one iteration's worth.
    rows_i = R // in_chunks
    tile_row0 = pl.program_id(1) * R if (padded or gapped) else 0

    def _front(ci, carry):
        sl = pl.ds(ci * rows_i, rows_i)
        xf = x_ref[0, sl].astype(jnp.float32)
        xn_f = _ln_f32(xf, ln1s[0], ln1b[0], eps)
        if padded or gapped:
            # zero POST-norm pad tokens: the reference pads the
            # post-norm map before qkv, so pad keys/values carry only
            # the qkv bias (hieradet window_partition semantics).
            # Gap-stored maps translate storage coords back to original
            # coords (gap cells s >= ws are invalid by construction).
            rr = (jax.lax.broadcasted_iota(jnp.int32, (rows_i, W, 1), 0)
                  + (tile_row0 + ci * rows_i))
            cc = jax.lax.broadcasted_iota(jnp.int32, (rows_i, W, 1), 1)
            if gapped:
                r_in, c_in = rr % ss, cc % ss
                valid = ((r_in < ws) & (c_in < ws)
                         & ((rr // ss) * ws + r_in < true_h)
                         & ((cc // ss) * ws + c_in < true_w))
            else:
                valid = (rr < true_h) & (cc < true_w)
            xn_f = jnp.where(valid, xn_f, 0.0)
        xn = xn_f.astype(x_ref.dtype)
        qkv = jax.lax.dot_general(
            xn.reshape(rows_i * W, cin), wqkv[...].astype(xn.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        qkv = qkv + bqkv[0].astype(jnp.float32)
        # the 1/sqrt(hd) attention scale folds into the q third here, in
        # f32 (softmax((q*scale)@k.T) == softmax(scale*(q@k.T)); max-pool
        # q-pooling commutes with a positive scale), so the SDPA loops
        # below never run a scale pass over the wide score tiles
        qcols = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * c), 1) < c
        qkv = (qkv * jnp.where(qcols, scale, 1.0)).astype(xn.dtype)
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

    if global_attn:
        # ws == 0: full-map attention (hieradet global_att_blocks). The
        # whole map is one kv block per head; q is chunked over map rows
        # (fori_loop) so the fp32 score tile stays a few MiB instead of
        # HW x HW. No pooling / dim change on global blocks.
        rows_q = R // sdpa_chunks

        def _one_head_global(h):
            k = qkv_buf[:, :, c + h * hd:c + (h + 1) * hd].reshape(
                R * W, hd)
            v = qkv_buf[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd].reshape(
                R * W, hd)
            wp_h = wproj[h * hd:(h + 1) * hd, :].astype(x_ref.dtype)

            def _qchunk(ci, carry):
                q = qkv_buf[pl.ds(ci * rows_q, rows_q), :,
                            h * hd:(h + 1) * hd].reshape(rows_q * W, hd)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # q arrives pre-scaled from the front end; normalization
                # defers past the ctx dot: two fewer VPU passes over the
                # wide score tile
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                ctx = jax.lax.dot_general(
                    p.astype(x_ref.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) / l
                sl = pl.ds(ci * rows_q * W, rows_q * W)
                attn_ref[sl] = attn_ref[sl] + jax.lax.dot_general(
                    ctx.astype(x_ref.dtype), wp_h,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return carry

            jax.lax.fori_loop(0, sdpa_chunks, _qchunk, 0)

        for h in range(heads):
            _one_head_global(h)

        base = x_ref[0]
        h1_ref[...] = base + (attn_ref[...]
                              + bproj[0].astype(jnp.float32)).astype(
            x_ref.dtype).reshape(Rp, Wp, c)
        _mlp_tail(h1_ref, o_ref, ln2s, ln2b, w1, b1, w2, b2,
                  mlp_chunks=mlp_chunks, eps=eps, wp=Wp, c=c,
                  dtype=x_ref.dtype)
        return

    key_gap = None
    if gapped:
        # gap cells (storage index >= ws per axis) are an artifact of the
        # even-side storage layout — exclude them from every softmax
        # (true out-of-range pad keys stay IN, as post-norm zeros, per
        # the reference's unmasked padded-window attention)
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ss * ss), 2)
        key_gap = (kk // ss >= ws) | (kk % ss >= ws)
    for h in range(heads):
        q_map = qkv_buf[:, :, h * hd:(h + 1) * hd]
        if ps > 1:
            q_map = q_map.reshape(Rp, ps, Wp, ps, hd)
            q_map = jnp.max(jnp.max(q_map, axis=3), axis=1)
            # layout-reset round-trip (see window_attention._win_kernel)
            q_scr[...] = q_map
            q_map = q_scr[...]
        q = to_windows(q_map, q_ss)
        k = to_windows(qkv_buf[:, :, c + h * hd:c + (h + 1) * hd], ss)
        v = to_windows(qkv_buf[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd],
                       ss)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if key_gap is not None:
            s = jnp.where(key_gap, -1e30, s)
        # q pre-scaled + deferred normalization (see _one_head_global)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(x_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / l
        ctx = ctx.reshape(r, n_w, q_ss, q_ss, hd)
        ctx = ctx.transpose(0, 2, 1, 3, 4).reshape(Rp * Wp, hd)
        attn_ref[...] = attn_ref[...] + jax.lax.dot_general(
            ctx.astype(x_ref.dtype),
            wproj[h * hd:(h + 1) * hd, :].astype(x_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    base = (sc_buf[...] if (has_skip or ps > 1) else x_ref[0])
    h1_ref[...] = base + (attn_ref[...]
                          + bproj[0].astype(jnp.float32)).astype(
        x_ref.dtype).reshape(Rp, Wp, c)
    _mlp_tail(h1_ref, o_ref, ln2s, ln2b, w1, b1, w2, b2,
              mlp_chunks=mlp_chunks, eps=eps, wp=Wp, c=c,
              dtype=x_ref.dtype)


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


def _storage_side(ws: int, ps: int) -> int:
    """Smallest even storage side >= ws that Mosaic can transpose (and
    whose pooled side is also even). == ws when ws itself is legal."""
    ss = ws
    while ss % ps or not pallas_window_legal(ss, ps):
        ss += 1
    return ss


def _hiera_block_pallas(x, weights, *, has_skip: bool, num_heads: int,
                        ws: int, ps: int, eps: float,
                        interpret: bool):
    b, true_h, true_w, cin = x.shape
    if ws > 0:
        pad_h = (ws - true_h % ws) % ws
        pad_w = (ws - true_w % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        ss = _storage_side(ws, ps)
        nh, nw = x.shape[1] // ws, x.shape[2] // ws
        if ss != ws:
            # gap-pad: every ws-window occupies an ss-sided storage cell.
            # Contiguous reshapes around one pad op — no transposes.
            x = x.reshape(b, nh, ws, nw, ws, cin)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ss - ws),
                            (0, 0), (0, ss - ws), (0, 0)))
            x = x.reshape(b, nh * ss, nw * ss, cin)
    else:
        # global block: the whole (square) map is one attention group
        pad_h = pad_w = 0
        ss = true_h
    h, w = x.shape[1], x.shape[2]
    wqkv = weights[2]
    c = wqkv.shape[1] // 3
    hd = c // num_heads
    n_w = w // ss
    n_wr = h // ss
    r = _rows_per_block(n_wr, ss, w, 3 * c, x.dtype.itemsize)
    rp, wp = r * ss // ps, w // ps
    in_chunks = _row_chunks(r * ss, w, 3 * c, ps=ps,
                            budget=HIERA_TILE_BUDGET)
    mlp_chunks = _row_chunks(rp, wp, weights[8].shape[1],
                             budget=HIERA_TILE_BUDGET)
    # global-SDPA q chunking: keep the fp32 [rows_q*W, H*W] score tile
    # a few MiB (6 MiB budget, same class as the window-path tiles)
    sdpa_chunks = _row_chunks(h, w, h * w, budget=6 << 20) if ws == 0 else 1
    kernel = functools.partial(
        _block_kernel, ws=ws, ss=ss, n_w=n_w, r=r, heads=num_heads, hd=hd,
        scale=1.0 / math.sqrt(hd), ps=ps, eps=eps, has_skip=has_skip,
        in_chunks=in_chunks, mlp_chunks=mlp_chunks, sdpa_chunks=sdpa_chunks,
        true_h=true_h, true_w=true_w, padded=bool(pad_h or pad_w))

    full = lambda t: pl.BlockSpec(t.shape, lambda bb, rr: (0,) * t.ndim,
                                  memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, r * ss, w, cin),
                             lambda bb, rr: (bb, rr, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [full(t) for t in weights]
    scratch = [pltpu.VMEM((r * ss, w, 3 * c), x.dtype),    # qkv map
               pltpu.VMEM((rp * wp, c), jnp.float32),      # attn accum
               pltpu.VMEM((rp, wp, c), x.dtype)]           # h1 residual
    if has_skip or ps > 1:
        scratch.append(pltpu.VMEM((rp, wp, c), x.dtype))   # shortcut map
    if ps > 1:
        scratch.append(pltpu.VMEM((rp, wp, hd), x.dtype))  # pooled q
    out = pl.pallas_call(
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
    if ws > 0 and ss != ws:
        q_ss, qv = ss // ps, ws // ps
        out = out.reshape(b, nh, q_ss, nw, q_ss, c)[:, :, :qv, :, :qv]
        out = out.reshape(b, nh * qv, nw * qv, c)
    oh, ow = true_h // ps, true_w // ps
    if out.shape[1] != oh or out.shape[2] != ow:
        out = out[:, :oh, :ow]
    return out


def hiera_block_xla(blk, x, *, num_heads: int, ws: int,
                    q_stride: Optional[Tuple[int, int]], eps: float):
    """XLA oracle with identical semantics (hieradet MultiScaleBlock):
    also the backward path (recompute-from-x, differentiated by JAX)."""
    from video_llava_seg_tpu.ops import nn

    ps = q_stride[0] if q_stride is not None else 1
    b, h, w, _ = x.shape
    xn = nn.layer_norm(blk["norm1"], x, eps)
    if "proj" in blk:
        shortcut = nn.dense(blk["proj"], xn)
    else:
        shortcut = x
    if ps > 1:
        from video_llava_seg_tpu.models.sam2.hiera import _max_pool_2x2
        shortcut = _max_pool_2x2(shortcut, q_stride)
    if ws == 0:
        # global block == one window spanning the whole map
        ws = h
        assert w == h and ps == 1
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        # POST-norm zero padding, matching hieradet's window_partition
        xn = jnp.pad(xn, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    qkv = nn.dense(blk["qkv"], xn)
    hd = (qkv.shape[-1] // 3) // num_heads
    o = window_attention_xla(qkv, num_heads=num_heads, ws=ws,
                             scale=1.0 / math.sqrt(hd), ps=ps)
    if o.shape[1] != h // ps or o.shape[2] != w // ps:
        o = o[:, :h // ps, :w // ps]
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
    """Kernel legality. Non-divisible maps are padded in-kernel with a
    POST-norm validity mask (matching the reference's post-norm zero
    padding); Mosaic-odd window sides are stored gap-padded at the next
    legal even side; ws == 0 (global attention) runs a q-chunked full-map
    SDPA for square, 8-aligned, unpooled maps. Windowed requirement: the
    pool stride must divide the window so 2x2 pooling never mixes valid
    and gap cells."""
    if ws == 0:
        return h == w and h % 8 == 0 and ps == 1
    return ws % ps == 0


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
