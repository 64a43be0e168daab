"""Fully-fused ViT encoder layer for TPU (CLIP / RADIO towers).

One Pallas pass per transformer layer: LN1 -> q/k/v denses -> per-frame
SDPA -> out projection -> residual -> LN2 -> activation MLP -> residual.
TPU-native replacement for the reference encoder layer
(HF CLIPEncoderLayer used via llava/model/multimodal_encoder/
clip_encoder.py:11-138), which runs as ~10 separate kernels.

Why (measured on v5e, BENCH_NOTES.md "ViT encode decomposition"): at the
serving shape [128 frames, 577, 1024] the unfused tower spends 306 ms of
a 585 ms encode in the attention region (relayouts around the flash
custom call + fixed per-call overhead) and ~22 ms in LayerNorms, against
a ~320 ms MXU floor for the denses. Per-layer weights are 24 MB at
CLIP-L dims and sit whole in VMEM; each layer then costs one HBM read +
one write of the token batch.

Layout contract: tokens padded to a multiple of 8 (Mosaic sublane) by
the caller ONCE for the whole tower — `kv_len` masks pad keys with -inf
inside the softmax; pad queries produce garbage that never contaminates
real tokens (LN/MLP are token-local) and the caller slices them off
after the last layer.

Differentiable: backward recomputes through the XLA oracle under
jax.custom_vjp (same pattern as ops/hiera_block.py).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_llava_seg_tpu.ops.hiera_block import (
    _gelu_f32,
    _ln_f32,
)

_MASK = -1e30

# Opt-in switch for the fused W8A8 megakernel on real TPUs — see the
# routing comment in vit_layer(): it intermittently faults the worker at
# the CLIP-L serving shape, so hardware defaults to the stable XLA W8A8
# path until root-caused. Interpret-mode tests always exercise the kernel.
# Env override (VLS_FUSED_I8=1) lets on-chip A/B runs flip it per process.
FUSED_I8_ON_TPU = os.environ.get("VLS_FUSED_I8", "0") == "1"


def _quick_gelu_f32(x):
    """CLIP's quick_gelu: x * sigmoid(1.702 x) (f32)."""
    return x * (1.0 / (1.0 + jnp.exp(-1.702 * x)))


_ACTS = {"quick_gelu": _quick_gelu_f32, "gelu": _gelu_f32}


def _vit_kernel(x_ref, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
                ln2s, ln2b, w1, b1, w2, b2, o_ref, qkv_buf,
                h1_ref, *, heads: int, hd: int, scale: float, eps: float,
                kv_len: int, act: str, in_tile, mlp_tile):
    """One tile of `fb` frames x `sp` (8-aligned) tokens x D channels.

    Chunking runs along the TOKEN axis in (t, n_main, tail) tiles —
    multiples of 8 so every flattened (frames*tokens, D) view collapses
    cleanly onto the (8,128) vector tiles, main chunks via fori_loop
    (one iteration's fp32 transients on the Mosaic stack, reused) plus
    one static tail chunk. Tile sizes target a few-MiB f32 transient so
    each dense runs hundreds of MXU rows: the old equal-division
    chunking could only pick 73 chunks at sp=584 (the sole divisor
    respecting 8-alignment), i.e. 32-row dots that starved the MXU."""
    fb, sp, d = x_ref.shape
    c = heads * hd
    t_i, n_i, tail_i = in_tile
    act_f = _ACTS[act]

    # front end: LN1 -> q/k/v denses into the qkv scratch [fb, sp, 3c].
    # The 1/sqrt(hd) attention scale folds into q HERE, in f32 before the
    # cast — softmax((q*scale)@k.T) == softmax(scale * (q@k.T)) — so the
    # SDPA loop below never runs a scale pass over the [*, sp, sp] scores
    def _front_at(off, size):
        sl = pl.ds(off, size)
        xf = x_ref[:, sl].astype(jnp.float32)
        xn = _ln_f32(xf, ln1s[0], ln1b[0], eps).astype(x_ref.dtype)
        xn = xn.reshape(fb * size, d)
        for j, (w, bias) in enumerate(((wq, bq), (wk, bk), (wv, bv))):
            y = jax.lax.dot_general(
                xn, w[...].astype(xn.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = y + bias[0].astype(jnp.float32)
            if j == 0:
                y = y * scale
            qkv_buf[:, sl, pl.ds(j * c, c)] = y.astype(
                x_ref.dtype).reshape(fb, size, c)

    def _front(ci, carry):
        _front_at(ci * t_i, t_i)
        return carry

    jax.lax.fori_loop(0, n_i, _front, 0)
    if tail_i:
        _front_at(n_i * t_i, tail_i)

    # key-padding mask: tokens at index >= kv_len are caller padding
    key_pad = None
    if kv_len < sp:
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp), 2)
        key_pad = kk >= kv_len

    # per-head, frame-batched SDPA. Each head's ctx parks in its (dead
    # from here) q slot of the qkv scratch, so the out projection runs as
    # ONE [rows, c] @ [c, d] dot — full 128-deep MXU reduction instead of
    # `heads` separate hd-deep dots.
    # Softmax is VPU-bound at these shapes (BENCH_NOTES "ViT encode
    # decomposition"), so the big [*, sp, sp] score matrix gets the
    # minimum number of elementwise passes: q arrives pre-scaled from the
    # front end and normalization is deferred past the ctx dot — one
    # divide over [*, sp, hd] instead of [*, sp, sp]. Deferral keeps the
    # unnormalized p tile live through the ctx dot, so the frame axis is
    # sub-chunked (att_fb) to hold peak f32 scores-liveness at the level
    # the pre-deferral kernel already fit.
    att_fb = fb if fb <= 2 else 2
    if fb % att_fb:
        att_fb = 1
    for h in range(heads):

        def _attn(fi, carry, h=h):
            fs = pl.ds(fi * att_fb, att_fb)
            q = qkv_buf[fs, :, h * hd:(h + 1) * hd]
            k = qkv_buf[fs, :, c + h * hd:c + (h + 1) * hd]
            v = qkv_buf[fs, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if key_pad is not None:
                s = jnp.where(key_pad, _MASK, s)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            ctx = jax.lax.dot_general(
                p.astype(x_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) / l
            qkv_buf[fs, :, h * hd:(h + 1) * hd] = ctx.astype(x_ref.dtype)
            return carry

        jax.lax.fori_loop(0, fb // att_fb, _attn, 0)

    # back end: out projection, then LN2 -> activation MLP -> residual;
    # both token-chunked so the f32 transients reuse one chunk's stack
    t_m, n_m, tail_m = mlp_tile

    def _proj_at(off, size):
        sl = pl.ds(off, size)
        rows = qkv_buf[:, sl, :c].reshape(fb * size, c)
        pr = jax.lax.dot_general(
            rows, wo[...].astype(x_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        h1_ref[:, sl] = x_ref[:, sl] + (pr.reshape(fb, size, c)
                                        + bo[0].astype(jnp.float32)).astype(
            x_ref.dtype)

    def _proj(ci, carry):
        _proj_at(ci * t_m, t_m)
        return carry

    jax.lax.fori_loop(0, n_m, _proj, 0)
    if tail_m:
        _proj_at(n_m * t_m, tail_m)

    def _back_at(off, size):
        sl = pl.ds(off, size)
        seg = h1_ref[:, sl]
        hn = _ln_f32(seg.astype(jnp.float32), ln2s[0], ln2b[0],
                     eps).astype(x_ref.dtype)
        hh = jax.lax.dot_general(
            hn.reshape(fb * size, d), w1[...].astype(x_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        hh = act_f(hh + b1[0].astype(jnp.float32)).astype(x_ref.dtype)
        mlp = jax.lax.dot_general(
            hh, w2[...].astype(x_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mlp = (mlp + b2[0].astype(jnp.float32)).astype(x_ref.dtype)
        o_ref[:, sl] = seg + mlp.reshape(fb, size, d)

    def _back(ci, carry):
        _back_at(ci * t_m, t_m)
        return carry

    jax.lax.fori_loop(0, n_m, _back, 0)
    if tail_m:
        _back_at(n_m * t_m, tail_m)


def _quant_rows_f32(xf):
    """nn.dense W8A8 activation quant (quantize_activations_rowwise):
    dynamic symmetric per-row int8. xf: f32 [rows, in]."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dense_i8(xq, a_scale, wq_ref, ws_row, b_row, dtype):
    """int8 x int8 -> int32 MXU dot, rescaled by act-row x weight-col
    scales (exact nn.dense kernel_qa semantics, bias added in dtype)."""
    y = jax.lax.dot_general(xq, wq_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * a_scale
         * ws_row[0].astype(jnp.float32)).astype(dtype)
    return y + b_row[0].astype(dtype)


def _vit_kernel_i8(x_ref, ln1s, ln1b, wq, wqs, bq, wk, wks, bk, wv, wvs, bv,
                   wo, wos, bo, ln2s, ln2b, w1, w1s, b1, w2, w2s, b2,
                   o_ref, qkv_buf, h1_ref, *, heads: int, hd: int,
                   scale: float, eps: float, kv_len: int, act: str,
                   in_tile, mlp_tile):
    """W8A8 variant of _vit_kernel: every dense runs as an int8 MXU dot
    with in-kernel dynamic per-row activation quant (the quant/rescale
    elementwise passes that made standalone W8A8 a wash at ViT dims now
    fuse into the resident pass — see BENCH_NOTES 'W8A8').

    Weight refs are int8 [in, out] + f32 [1, out] per-output-channel
    scales (ops/quantization.py act_quant layout). Attention itself
    (scores/softmax/ctx) stays bf16/f32 — it is VPU-bound, not MXU-bound.
    Per-head ctx tiles land in qkv_buf's q-slot (head h's q is dead once
    its ctx exists) so the out projection runs as ONE [rows, c] int8 dot
    with the oracle's full-row activation scale."""
    fb, sp, d = x_ref.shape
    c = heads * hd
    t_i, n_i, tail_i = in_tile
    dtype = x_ref.dtype
    act_f = _ACTS[act]

    def _front_at(off, size):
        sl = pl.ds(off, size)
        xf = x_ref[:, sl].astype(jnp.float32)
        xn = _ln_f32(xf, ln1s[0], ln1b[0], eps).astype(dtype)
        xq, a_s = _quant_rows_f32(
            xn.reshape(fb * size, d).astype(jnp.float32))
        for j, (w, ws, b) in enumerate(((wq, wqs, bq), (wk, wks, bk),
                                        (wv, wvs, bv))):
            y = _dense_i8(xq, a_s, w, ws, b, dtype)
            if j == 0:
                # attention scale folded into q (see _vit_kernel _front)
                y = y * dtype.type(scale)
            qkv_buf[:, sl, pl.ds(j * c, c)] = y.reshape(fb, size, c)

    def _front(ci, carry):
        _front_at(ci * t_i, t_i)
        return carry

    jax.lax.fori_loop(0, n_i, _front, 0)
    if tail_i:
        _front_at(n_i * t_i, tail_i)

    key_pad = None
    if kv_len < sp:
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sp), 2)
        key_pad = kk >= kv_len

    # q pre-scaled at the front + deferred normalization: two fewer VPU
    # passes over the [*, sp, sp] scores; frame-axis sub-chunking bounds
    # the deferred p tile's liveness (see _vit_kernel)
    att_fb = fb if fb <= 2 else 2
    if fb % att_fb:
        att_fb = 1
    for h in range(heads):

        def _attn(fi, carry, h=h):
            fs = pl.ds(fi * att_fb, att_fb)
            q = qkv_buf[fs, :, h * hd:(h + 1) * hd]
            k = qkv_buf[fs, :, c + h * hd:c + (h + 1) * hd]
            v = qkv_buf[fs, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if key_pad is not None:
                s = jnp.where(key_pad, _MASK, s)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            ctx = jax.lax.dot_general(
                p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) / l
            # head h's q slot is dead from here on: park ctx_h in it so
            # the out projection sees the full [rows, c] ctx contiguous
            qkv_buf[fs, :, h * hd:(h + 1) * hd] = ctx.astype(dtype)
            return carry

        jax.lax.fori_loop(0, fb // att_fb, _attn, 0)

    t_m, n_m, tail_m = mlp_tile

    def _proj_at(off, size):
        sl = pl.ds(off, size)
        cq, c_s = _quant_rows_f32(
            qkv_buf[:, sl, :c].reshape(fb * size, c).astype(jnp.float32))
        proj = _dense_i8(cq, c_s, wo, wos, bo, dtype)
        h1_ref[:, sl] = x_ref[:, sl] + proj.reshape(fb, size, d)

    def _proj(ci, carry):
        _proj_at(ci * t_m, t_m)
        return carry

    jax.lax.fori_loop(0, n_m, _proj, 0)
    if tail_m:
        _proj_at(n_m * t_m, tail_m)

    def _back_at(off, size):
        sl = pl.ds(off, size)
        seg = h1_ref[:, sl]
        hn = _ln_f32(seg.astype(jnp.float32), ln2s[0], ln2b[0],
                     eps).astype(dtype)
        hq, h_s = _quant_rows_f32(
            hn.reshape(fb * size, d).astype(jnp.float32))
        hh = _dense_i8(hq, h_s, w1, w1s, b1, dtype)
        hh = act_f(hh.astype(jnp.float32)).astype(dtype)
        gq, g_s = _quant_rows_f32(hh.astype(jnp.float32))
        mlp = _dense_i8(gq, g_s, w2, w2s, b2, dtype)
        o_ref[:, sl] = seg + mlp.reshape(fb, size, d)

    def _back(ci, carry):
        _back_at(ci * t_m, t_m)
        return carry

    jax.lax.fori_loop(0, n_m, _back, 0)
    if tail_m:
        _back_at(n_m * t_m, tail_m)


_DENSE_NAMES = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


def layer_quant_kind(p):
    """None (all-fp layer), 'w8a8' (ALL six denses kernel_qa) or 'w8'
    (anything else quantized / mixed — routed to the XLA oracle, whose
    nn.dense dispatch handles every per-dense mix)."""
    kinds = set()
    for name in _DENSE_NAMES:
        d = p[name]
        kinds.add("kernel_qa" if "kernel_qa" in d
                  else "kernel_q" if "kernel_q" in d else "fp")
    if kinds == {"kernel_qa"}:
        return "w8a8"
    if kinds == {"fp"}:
        return None
    return "w8"


def _flat_weights_i8(p):
    def vec(v):
        return v.reshape(1, -1)

    out = [vec(p["layer_norm1"]["scale"]), vec(p["layer_norm1"]["bias"])]
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        out += [p[name]["kernel_qa"], vec(p[name]["kernel_scale"]),
                vec(p[name]["bias"])]
    out += [vec(p["layer_norm2"]["scale"]), vec(p["layer_norm2"]["bias"])]
    for name in ("fc1", "fc2"):
        out += [p[name]["kernel_qa"], vec(p[name]["kernel_scale"]),
                vec(p[name]["bias"])]
    return out


#: f32-tile budget for the i8 kernel's row chunking (bytes). The quant +
#: int8 dots run per [rows, width] chunk; sweepable (scripts/i8_vit_speed)
#: to test the rows-per-tile hypothesis for the kernel's 30x slowdown.
I8_ROW_BUDGET = 2 << 20

#: f32-tile budget for the bf16 kernel's dense chunking (bytes). Bigger
#: tiles = more MXU rows per dense dot; bounded by the Mosaic stack.
#: Swept on-chip at the CLIP-L serving shape: 8 MiB -> 360.6 f/s,
#: 16 -> 377.0, 24 -> 384.6, 32 -> 384.4 (flat). Env-sweepable
#: (VLS_DENSE_TILE_MB) for future A/Bs.
DENSE_TILE_BUDGET = int(os.environ.get("VLS_DENSE_TILE_MB", "24")) << 20


def _token_tile(sp: int, fb: int, width: int, budget: int,
                ps: int = 8):
    """Token-axis tile (t, n_main, tail): t a multiple of ps with the f32
    [fb*t, width] transient under `budget`; tail = the (ps-aligned)
    remainder chunk. Unlike equal-division chunking, t is free to be any
    multiple of ps — at sp=584 the only 8-aligned equal divisions are 1 or
    73 chunks, and 73 means 32-row dots that starve the MXU."""
    t = max(ps, (budget // (fb * width * 4)) // ps * ps)
    t = min(t, sp)
    n_main = sp // t
    tail = sp - n_main * t
    return t, n_main, tail


def _vit_layer_pallas_i8(x, weights, *, num_heads: int, eps: float,
                         kv_len: int, act: str, interpret: bool):
    """Forward-only (inference) W8A8 fused layer; no custom_vjp — the
    rounding in the activation quant has no useful gradient."""
    bt, sp, d = x.shape
    hd = d // num_heads
    dff = weights[17].shape[1]
    fb = _frames_per_step(bt, sp, d, dff, x.dtype.itemsize)
    kernel = functools.partial(
        _vit_kernel_i8, heads=num_heads, hd=hd, scale=1.0 / math.sqrt(hd),
        eps=eps, kv_len=kv_len, act=act,
        in_tile=_token_tile(sp, fb, 3 * d, I8_ROW_BUDGET),
        mlp_tile=_token_tile(sp, fb, dff, I8_ROW_BUDGET))

    full = lambda t: pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bt // fb,),
        in_specs=[pl.BlockSpec((fb, sp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [full(t) for t in weights],
        out_specs=pl.BlockSpec((fb, sp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, sp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((fb, sp, 3 * d), x.dtype),
                        pltpu.VMEM((fb, sp, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(x, *weights)


def _flat_weights(p):
    def vec(v):
        return v.reshape(1, -1)

    return [vec(p["layer_norm1"]["scale"]), vec(p["layer_norm1"]["bias"]),
            p["q_proj"]["kernel"], vec(p["q_proj"]["bias"]),
            p["k_proj"]["kernel"], vec(p["k_proj"]["bias"]),
            p["v_proj"]["kernel"], vec(p["v_proj"]["bias"]),
            p["out_proj"]["kernel"], vec(p["out_proj"]["bias"]),
            vec(p["layer_norm2"]["scale"]), vec(p["layer_norm2"]["bias"]),
            p["fc1"]["kernel"], vec(p["fc1"]["bias"]),
            p["fc2"]["kernel"], vec(p["fc2"]["bias"])]


def _frames_per_step(bt: int, sp: int, d: int, dff: int,
                     itemsize: int) -> int:
    """Largest divisor of bt whose per-step VMEM stays ~<= 60 MiB beyond
    the resident weights (x in/out double-buffered + qkv + h1 + f32 attn
    accum + the ~2 live per-head fp32 score tiles)."""
    budget = 60 << 20
    per_frame = (sp * d * itemsize * (2 * 2 + 1)      # x (dbuf), out, h1
                 + sp * 3 * d * itemsize              # qkv scratch
                 + sp * d * 4                         # attn accum f32
                 + 2 * sp * sp * 4)                   # live score tiles
    fb = max(1, min(bt, budget // max(1, per_frame)))
    while bt % fb:
        fb -= 1
    return fb


def _vit_layer_pallas(x, weights, *, num_heads: int, eps: float,
                      kv_len: int, act: str, interpret: bool):
    bt, sp, d = x.shape
    hd = d // num_heads
    dff = weights[12].shape[1]
    fb = _frames_per_step(bt, sp, d, dff, x.dtype.itemsize)
    # token-axis main+tail tiling, multiples of 8 (clean (8,128)-tile
    # collapse) sized for hundreds of MXU rows per dense dot
    kernel = functools.partial(
        _vit_kernel, heads=num_heads, hd=hd, scale=1.0 / math.sqrt(hd),
        eps=eps, kv_len=kv_len, act=act,
        in_tile=_token_tile(sp, fb, 3 * d, DENSE_TILE_BUDGET),
        mlp_tile=_token_tile(sp, fb, dff, DENSE_TILE_BUDGET))

    full = lambda t: pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bt // fb,),
        in_specs=[pl.BlockSpec((fb, sp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [full(t) for t in weights],
        out_specs=pl.BlockSpec((fb, sp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, sp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((fb, sp, 3 * d), x.dtype),
                        pltpu.VMEM((fb, sp, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(x, *weights)


def vit_layer_xla(p, x, *, num_heads: int, eps: float, kv_len: int, act):
    """XLA oracle with identical semantics (also the backward source)."""
    from video_llava_seg_tpu.ops import nn

    residual = x
    h = nn.layer_norm(p["layer_norm1"], x, eps)
    b, n, d = h.shape
    hd = d // num_heads
    q = nn.dense(p["q_proj"], h).reshape(b, n, num_heads, hd)
    k = nn.dense(p["k_proj"], h).reshape(b, n, num_heads, hd)
    v = nn.dense(p["v_proj"], h).reshape(b, n, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    s = s / math.sqrt(hd)
    if kv_len < n:
        s = jnp.where(jnp.arange(n)[None, None, None, :] >= kv_len,
                      _MASK, s)
    p_att = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p_att, v).reshape(b, n, d)
    x = residual + nn.dense(p["out_proj"], o)
    residual = x
    h = nn.layer_norm(p["layer_norm2"], x, eps)
    h = nn.dense(p["fc2"], act(nn.dense(p["fc1"], h)))
    return residual + h


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _vl(static, x, weights):
    num_heads, eps, kv_len, act, interpret = static
    return _vit_layer_pallas(x, weights, num_heads=num_heads, eps=eps,
                             kv_len=kv_len, act=act, interpret=interpret)


def _weights_to_p(weights):
    names = ["layer_norm1", None, "q_proj", None, "k_proj", None,
             "v_proj", None, "out_proj", None, "layer_norm2", None,
             "fc1", None, "fc2", None]
    p = {}
    for i in range(0, 16, 2):
        name = names[i]
        if "norm" in name:
            p[name] = {"scale": weights[i][0], "bias": weights[i + 1][0]}
        else:
            p[name] = {"kernel": weights[i], "bias": weights[i + 1][0]}
    return p


def _vl_fwd(static, x, weights):
    return _vl(static, x, weights), (x, weights)


def _vl_bwd(static, res, g):
    num_heads, eps, kv_len, act, _ = static
    x, weights = res
    from video_llava_seg_tpu.ops import nn

    act_f = {"quick_gelu": _xla_quick_gelu, "gelu": nn.gelu}[act]

    def f(x, weights):
        return vit_layer_xla(_weights_to_p(weights), x,
                             num_heads=num_heads, eps=eps, kv_len=kv_len,
                             act=act_f)

    _, vjp = jax.vjp(f, x, weights)
    return vjp(g)


def _xla_quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_vl.defvjp(_vl_fwd, _vl_bwd)


def vit_layer_supported(n_tokens: int, d: int, num_heads: int) -> bool:
    """8-aligned token count (caller pads once for the whole tower) and
    lane-aligned model dim."""
    return n_tokens % 8 == 0 and d % num_heads == 0 and d % 128 == 0


def vit_layer(p, x, *, num_heads: int, eps: float, kv_len: int = -1,
              act: str = "quick_gelu", backend: str = "auto",
              interpret: bool = False):
    """Fused ViT encoder layer on TPU; XLA oracle elsewhere.

    x: [BT, SP, D] with SP % 8 == 0 (pad tokens beyond kv_len are masked
    as attention keys and otherwise passed through token-locally)."""
    bt, sp, d = x.shape
    if kv_len < 0:
        kv_len = sp
    qk = layer_quant_kind(p)
    if backend == "auto":
        from video_llava_seg_tpu.ops.attention import _on_tpu
        backend = ("pallas" if ((_on_tpu() or interpret)
                                and vit_layer_supported(sp, d, num_heads))
                   else "xla")
    # weight-only quantized layers have no fused path (dequant-per-step
    # would re-traverse the weights every grid step); nn.dense's fused
    # int8->bf16 convert dot via the XLA oracle is the right call there
    if backend == "xla" or qk == "w8":
        if act == "quick_gelu":
            act_f = _xla_quick_gelu
        else:
            from video_llava_seg_tpu.ops import nn
            act_f = nn.gelu
        return vit_layer_xla(p, x, num_heads=num_heads, eps=eps,
                             kv_len=kv_len, act=act_f)
    assert backend == "pallas", backend
    if qk == "w8a8":
        # forward-only (inference) fused int8 path. OFF on hardware by
        # default, for speed as much as stability: a solo standalone
        # trial at [128, 584, 1024] ran ~145 ms/layer vs ~4.5 ms for the
        # structurally identical bf16 kernel (in-kernel int8 relayouts
        # into the MXU appear to hit a slow Mosaic path when the int8
        # operands are VPU-computed rather than ref-loaded), and earlier
        # runs intermittently faulted the worker. The XLA W8A8 path
        # (nn.dense kernel_qa) is stable and fast (252 f/s, config 3).
        if FUSED_I8_ON_TPU or interpret:
            return _vit_layer_pallas_i8(x, _flat_weights_i8(p),
                                        num_heads=num_heads, eps=eps,
                                        kv_len=kv_len, act=act,
                                        interpret=interpret)
        if act == "quick_gelu":
            act_f = _xla_quick_gelu
        else:
            from video_llava_seg_tpu.ops import nn
            act_f = nn.gelu
        return vit_layer_xla(p, x, num_heads=num_heads, eps=eps,
                             kv_len=kv_len, act=act_f)
    static = (num_heads, eps, kv_len, act, interpret)
    return _vl(static, x, _flat_weights(p))
