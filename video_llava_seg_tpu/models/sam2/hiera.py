"""Hiera hierarchical ViT trunk, TPU-native.

Behavioral parity with sam2/modeling/backbones/hieradet.py (windowed
attention, q-pooling at stage transitions, global attention at fixed block
ids, windowed absolute position embeddings) re-expressed as pure functions
over NHWC token maps. Window partitioning is a reshape/transpose (windows
become the batch dim); attention dispatches to the Pallas flash kernel for
long sequences and plain XLA einsum attention for small windows.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.models.sam2.config import HieraConfig
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.attention import attention
from video_llava_seg_tpu.ops.hiera_block import (
    hiera_block,
    hiera_block_supported,
)
from video_llava_seg_tpu.ops.resize import interpolate
from video_llava_seg_tpu.ops.window_attention import window_attention

_LN_EPS = 1e-6  # hieradet norm_layer = partial(LayerNorm, eps=1e-6)

# A/B switches (benchmarks flip these to measure in context; both fused
# paths are numerically equivalent to the legacy partition path):
# USE_FUSED_BLOCK: whole-block Pallas megakernel (ops/hiera_block.py) for
# window-divisible maps; USE_FUSED_WINDOW_ATTN: fused window SDPA only.
USE_FUSED_BLOCK = True
USE_FUSED_WINDOW_ATTN = True


def window_partition(x, ws: int):
    """[B, H, W, C] -> ([B*nW, ws, ws, C], (Hp, Wp)) with zero padding."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(windows, ws: int, pad_hw: Tuple[int, int],
                       hw: Tuple[int, int]):
    """Inverse of window_partition, cropping padding."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp * wp) // (ws * ws))
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _max_pool_2x2(x, stride: Tuple[int, int]):
    """NHWC max pool, kernel == stride (hieradet do_pool)."""
    sh, sw = stride
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, sh, sw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID")


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_dims(cfg: HieraConfig):
    """Per-block (dim_in, dim_out, num_heads, window_size, has_q_pool)."""
    dims = []
    embed_dim, num_heads = cfg.embed_dim, cfg.num_heads
    cur_stage = 1
    stage_ends = set(cfg.stage_ends)
    q_pool_blocks = set(cfg.q_pool_blocks)
    for i in range(cfg.depth):
        dim_out = embed_dim
        window_size = cfg.window_spec[cur_stage - 1]
        if i in cfg.global_att_blocks:
            window_size = 0
        if i - 1 in stage_ends:
            dim_out = int(embed_dim * cfg.dim_mul)
            num_heads = int(num_heads * cfg.head_mul)
            cur_stage += 1
        dims.append((embed_dim, dim_out, num_heads, window_size,
                     i in q_pool_blocks))
        embed_dim = dim_out
    return dims


def init(key, cfg: HieraConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.depth + 3)
    p = {
        "patch_embed": nn.conv2d_init(
            keys[0], 3, cfg.embed_dim,
            (cfg.patch_kernel, cfg.patch_kernel), dtype=dtype),
        "pos_embed": jnp.zeros(
            (1, *cfg.window_pos_embed_bkg_spatial_size, cfg.embed_dim), dtype),
        "pos_embed_window": jnp.zeros(
            (1, cfg.window_spec[0], cfg.window_spec[0], cfg.embed_dim), dtype),
        "blocks": [],
    }
    for i, (din, dout, heads, ws, has_pool) in enumerate(_block_dims(cfg)):
        bk = jax.random.split(keys[i + 3], 4)
        blk = {
            "norm1": nn.layer_norm_init(din, dtype),
            "qkv": nn.dense_init(bk[0], din, dout * 3, dtype=dtype),
            "proj_attn": nn.dense_init(bk[1], dout, dout, dtype=dtype),
            "norm2": nn.layer_norm_init(dout, dtype),
            "mlp": nn.mlp_init(bk[2], [dout, int(dout * cfg.mlp_ratio), dout],
                               dtype=dtype),
        }
        if din != dout:
            blk["proj"] = nn.dense_init(bk[3], din, dout, dtype=dtype)
        p["blocks"].append(blk)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _get_pos_embed(params, hw: Tuple[int, int]):
    """Bicubic-resize the background pos embed + tiled window embed
    (hieradet.py:273-281)."""
    h, w = hw
    bkg = interpolate(params["pos_embed"], (h, w), "bicubic")
    win = params["pos_embed_window"]
    wh, ww = win.shape[1], win.shape[2]
    tiled = jnp.tile(win, (1, h // wh, w // ww, 1))
    return bkg + tiled


def _attention_fused_windows(blk, x, num_heads: int, ws: int,
                             q_stride=None, interpret: bool = False):
    """Windowed block attention without ever materializing the partitioned
    layout: qkv dense on the map, fused window SDPA (Pallas), out proj on
    the map. Replaces partition->SDPA->unpartition (hieradet.py:84-166 +
    backbones/utils.py:16-62) on every windowed block, including the
    q-pool stage transitions.

    Non-divisible maps are zero-padded BEFORE the qkv dense — identical
    to the reference, whose window_partition pads the post-norm map so
    pad tokens carry the qkv bias as keys — and the output is cropped
    (at pooled resolution for q-pool blocks, = the shortcut's dims)."""
    b, h, w, _ = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    qkv = nn.dense(blk["qkv"], x)                  # [B, Hp, Wp, 3*dout]
    o = window_attention(qkv, num_heads=num_heads, ws=ws,
                         q_pool=q_stride, interpret=interpret)
    ps = q_stride[0] if q_stride is not None else 1
    oh, ow = h // ps, w // ps
    if o.shape[1] != oh or o.shape[2] != ow:
        o = o[:, :oh, :ow]
    return nn.dense(blk["proj_attn"], o)


def _attention(blk, x, num_heads: int, q_stride, interpret: bool = False):
    """MultiScaleAttention: qkv -> optional q max-pool -> SDPA -> proj."""
    b, h, w, _ = x.shape
    qkv = nn.dense(blk["qkv"], x.reshape(b, h * w, -1))
    dout = qkv.shape[-1] // 3
    head_dim = dout // num_heads
    qkv = qkv.reshape(b, h * w, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    oh, ow = h, w
    if q_stride is not None:
        q = q.reshape(b, h, w, -1)
        q = _max_pool_2x2(q, q_stride)
        oh, ow = q.shape[1], q.shape[2]
        q = q.reshape(b, oh * ow, num_heads, head_dim)

    # [B, N, H, D] -> [B, H, N, D]
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    backend = "auto" if q.shape[2] >= 256 else "xla"
    o = attention(q, k, v, backend=backend, interpret=interpret)
    o = o.transpose(0, 2, 1, 3).reshape(b, oh, ow, dout)
    return nn.dense(blk["proj_attn"], o)


def apply(params, cfg: HieraConfig, x, interpret: bool = False,
          blocks_limit: Optional[int] = None) -> List:
    """x: [B, 3, H, W] is NOT accepted — pass NHWC [B, H, W, 3].

    Returns the per-stage feature pyramid, highest resolution first, each
    [B, Hs, Ws, Cs] (reference returns NCHW; we stay NHWC).

    blocks_limit: run only the first N blocks (profiling knob — prefix
    timing isolates per-stage cost on hardware); the partial map is
    appended so the traced function has a data-dependent output.
    """
    x = nn.conv2d(params["patch_embed"], x,
                  stride=(cfg.patch_stride, cfg.patch_stride),
                  padding=[(cfg.patch_padding, cfg.patch_padding)] * 2)
    x = x + _get_pos_embed(params, (x.shape[1], x.shape[2])).astype(x.dtype)

    outputs = []
    dims = _block_dims(cfg)
    stage_ends = set(cfg.stage_ends)
    for i, (blk, (din, dout, heads, ws, has_pool)) in enumerate(
            zip(params["blocks"], dims)):
        q_stride = cfg.q_stride if has_pool else None
        if (USE_FUSED_BLOCK
                and hiera_block_supported(x.shape[1], x.shape[2], ws,
                                          q_stride[0] if q_stride else 1)):
            # hottest path: the WHOLE block (LN1 -> qkv -> window/global
            # SDPA -> proj -> residual -> LN2 -> MLP) in one Pallas pass —
            # one HBM read + one write of the token map per block, weights
            # VMEM-resident, no inter-block relayout copies
            x = hiera_block(blk, x, num_heads=heads, ws=ws,
                            q_stride=q_stride, eps=_LN_EPS,
                            interpret=interpret)
            if i in stage_ends:
                outputs.append(x)
            if blocks_limit is not None and i + 1 >= blocks_limit:
                outputs.append(x)
                return outputs
            continue
        shortcut = x
        xn = nn.layer_norm(blk["norm1"], x, _LN_EPS)
        if din != dout:
            shortcut = nn.dense(blk["proj"], xn)
            if q_stride is not None:
                shortcut = _max_pool_2x2(shortcut, q_stride)

        h, w = xn.shape[1], xn.shape[2]
        if USE_FUSED_WINDOW_ATTN and ws > 0:
            # fused partition+SDPA+unpartition, no 6-D relayouts (also the
            # fallback for non-ws-divisible maps, e.g. tiny's ws=14 at 70)
            xw = _attention_fused_windows(blk, xn, heads, ws, q_stride,
                                          interpret)
        else:
            win = ws
            if win > 0:
                xw, pad_hw = window_partition(xn, win)
            else:
                xw, pad_hw = xn, (h, w)

            xw = _attention(blk, xw, heads, q_stride, interpret)

            if q_stride is not None:
                win = win // cfg.q_stride[0] if win > 0 else 0
                h, w = shortcut.shape[1], shortcut.shape[2]
                if win > 0:
                    pad_h = (win - h % win) % win
                    pad_w = (win - w % win) % win
                    pad_hw = (h + pad_h, w + pad_w)

            if ws > 0:
                xw = window_unpartition(xw, win, pad_hw, (h, w))
        x = shortcut + xw
        x = x + nn.mlp_apply(blk["mlp"], nn.layer_norm(blk["norm2"], x,
                                                       _LN_EPS), act=nn.gelu)
        if i in stage_ends:
            outputs.append(x)
        if blocks_limit is not None and i + 1 >= blocks_limit:
            outputs.append(x)
            return outputs
    return outputs
