"""SAM2 memory encoder + memory attention (TPU-native).

Parity targets: sam2/modeling/memory_encoder.py (MaskDownSampler stride-16
conv stack + ConvNeXt fuser + out projection to mem_dim) and
sam2/modeling/memory_attention.py (4 layers of RoPE self-attention over the
current frame's 64x64 tokens + RoPE cross-attention into the concatenated
memory tokens, with object-pointer tokens excluded from RoPE).

All features NHWC; token sequences [B, N, C]."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.models.sam2.config import SAM2Config
from video_llava_seg_tpu.models.sam2.position_encoding import sine_pos_embed_hw
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.attention import attention
from video_llava_seg_tpu.ops.rope import apply_axial_rope

_LN_EPS = 1e-5


# ---------------------------------------------------------------------------
# memory encoder
# ---------------------------------------------------------------------------

def memory_encoder_init(key, cfg: SAM2Config, dtype=jnp.float32):
    me = cfg.memory_encoder
    ks = jax.random.split(key, 16)
    # mask downsampler: 4x (conv k3 s2 p1 -> LN2d -> GELU), channels x4 each
    layers = []
    cin = 1
    for i in range(4):
        cout = cin * 4
        layers.append({
            "conv": nn.conv2d_init(ks[i], cin, cout, (3, 3), dtype=dtype),
            "ln": nn.layer_norm_init(cout, dtype),
        })
        cin = cout
    p = {
        "mask_downsampler": {
            "layers": layers,
            "final": nn.conv2d_init(ks[4], cin,
                                    me.mask_downsampler_embed_dim, (1, 1),
                                    dtype=dtype),
        },
        "pix_feat_proj": nn.conv2d_init(ks[5], me.in_dim, me.in_dim, (1, 1),
                                        dtype=dtype),
        "fuser": {"layers": []},
    }
    for i in range(me.fuser_layers):
        k = jax.random.split(ks[6 + i], 4)
        p["fuser"]["layers"].append({
            "dwconv": nn.conv2d_init(k[0], 1, me.in_dim, (7, 7), dtype=dtype),
            "norm": nn.layer_norm_init(me.in_dim, dtype),
            "pwconv1": nn.dense_init(k[1], me.in_dim, 4 * me.in_dim,
                                     dtype=dtype),
            "pwconv2": nn.dense_init(k[2], 4 * me.in_dim, me.in_dim,
                                     dtype=dtype),
            "gamma": 1e-6 * jnp.ones((me.in_dim,), dtype),
        })
    if me.out_dim != me.in_dim:
        p["out_proj"] = nn.conv2d_init(ks[12], me.in_dim, me.out_dim, (1, 1),
                                       dtype=dtype)
    return p


def _cx_block(p, x):
    """ConvNeXt block, NHWC (memory_encoder.py:61-121)."""
    inp = x
    dim = x.shape[-1]
    x = nn.conv2d(p["dwconv"], x, padding=[(3, 3), (3, 3)], groups=dim)
    x = nn.layer_norm(p["norm"], x, 1e-6)
    x = nn.dense(p["pwconv1"], x)
    x = nn.gelu(x)
    x = nn.dense(p["pwconv2"], x)
    x = x * p["gamma"].astype(x.dtype)
    return inp + x


def memory_encoder_apply(params, cfg: SAM2Config, pix_feat, masks,
                         skip_mask_sigmoid: bool = False):
    """pix_feat: [B, H, W, C_in]; masks: [B, 16H, 16W, 1] logits.

    Returns (vision_features [B, H, W, mem_dim], vision_pos_enc [H, W, mem_dim])."""
    if not skip_mask_sigmoid:
        masks = jax.nn.sigmoid(masks)
    x = masks
    for layer in params["mask_downsampler"]["layers"]:
        x = nn.conv2d(layer["conv"], x, stride=(2, 2),
                      padding=[(1, 1), (1, 1)])
        x = nn.layer_norm(layer["ln"], x, 1e-6)
        x = nn.gelu(x)
    mask_emb = nn.conv2d(params["mask_downsampler"]["final"], x)

    y = nn.conv2d(params["pix_feat_proj"], pix_feat)
    y = y + mask_emb
    for layer in params["fuser"]["layers"]:
        y = _cx_block(layer, y)
    if "out_proj" in params:
        y = nn.conv2d(params["out_proj"], y)
    pos = sine_pos_embed_hw(y.shape[1], y.shape[2],
                            cfg.memory_encoder.pos_num_feats)
    return y, jnp.asarray(pos, y.dtype)


# ---------------------------------------------------------------------------
# memory attention
# ---------------------------------------------------------------------------

def _rope_attn_init(key, d_model, kv_in_dim=None, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    kv_in = kv_in_dim if kv_in_dim is not None else d_model
    return {
        "q_proj": nn.dense_init(ks[0], d_model, d_model, dtype=dtype),
        "k_proj": nn.dense_init(ks[1], kv_in, d_model, dtype=dtype),
        "v_proj": nn.dense_init(ks[2], kv_in, d_model, dtype=dtype),
        "out_proj": nn.dense_init(ks[3], d_model, d_model, dtype=dtype),
    }


def _rope_attn_apply(p, cfg: SAM2Config, q, k, v, *, rope_k_repeat: bool,
                     num_k_exclude_rope: int = 0, interpret: bool = False,
                     kv_mask=None):
    """RoPEAttention (transformer.py:289-360): project, apply axial RoPE on a
    sqrt(Nq) x sqrt(Nq) grid, attend."""
    ma = cfg.memory_attention
    heads = ma.num_heads
    q = nn.dense(p["q_proj"], q)
    k = nn.dense(p["k_proj"], k)
    v = nn.dense(p["v_proj"], v)
    b, nq, c = q.shape
    hd = c // heads
    qh = q.reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, k.shape[1], heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, v.shape[1], heads, hd).transpose(0, 2, 1, 3)

    side = int(round(math.sqrt(nq)))
    assert side * side == nq, f"RoPE grid must be square, got {nq}"
    qh, kh = apply_axial_rope(qh, kh, side, side, ma.rope_theta,
                              repeat_freqs_k=rope_k_repeat,
                              num_k_exclude=num_k_exclude_rope)
    backend = "auto" if nq >= 256 else "xla"
    o = attention(qh, kh, vh, backend=backend, interpret=interpret,
                  kv_mask=kv_mask)
    o = o.transpose(0, 2, 1, 3).reshape(b, nq, c)
    return nn.dense(p["out_proj"], o)


def memory_attention_init(key, cfg: SAM2Config, dtype=jnp.float32):
    ma = cfg.memory_attention
    ks = jax.random.split(key, ma.num_layers + 1)
    layers = []
    for i in range(ma.num_layers):
        k = jax.random.split(ks[i], 4)
        layers.append({
            "self_attn": _rope_attn_init(k[0], ma.d_model, dtype=dtype),
            "cross_attn_image": _rope_attn_init(k[1], ma.d_model,
                                                ma.kv_in_dim, dtype=dtype),
            "linear1": nn.dense_init(k[2], ma.d_model, ma.dim_feedforward,
                                     dtype=dtype),
            "linear2": nn.dense_init(k[3], ma.dim_feedforward, ma.d_model,
                                     dtype=dtype),
            "norm1": nn.layer_norm_init(ma.d_model, dtype),
            "norm2": nn.layer_norm_init(ma.d_model, dtype),
            "norm3": nn.layer_norm_init(ma.d_model, dtype),
        })
    return {"layers": layers, "norm": nn.layer_norm_init(ma.d_model, dtype)}


def memory_attention_apply(params, cfg: SAM2Config, curr, memory, curr_pos,
                           memory_pos, num_obj_ptr_tokens: int = 0,
                           interpret: bool = False, memory_mask=None):
    """curr: [B, N, C] current-frame tokens; memory: [B, M, kv_in_dim];
    curr_pos/memory_pos: matching positional encodings. Returns [B, N, C].

    Mirrors MemoryAttention.forward with pos_enc_at_input (adds 0.1*pos) and
    the sam2.1 layer flag set (keys get pos enc, queries don't)."""
    ma = cfg.memory_attention
    output = curr
    if ma.pos_enc_at_input and curr_pos is not None:
        output = output + 0.1 * curr_pos

    for layer in params["layers"]:
        # self-attention (pos_enc_at_attn=False: no pos added to q/k)
        t2 = nn.layer_norm(layer["norm1"], output, _LN_EPS)
        t2 = _rope_attn_apply(layer["self_attn"], cfg, t2, t2, t2,
                              rope_k_repeat=False, interpret=interpret)
        output = output + t2
        # cross-attention into memory
        t2 = nn.layer_norm(layer["norm2"], output, _LN_EPS)
        q_in = t2 + curr_pos if ma.pos_enc_at_cross_attn_queries else t2
        k_in = memory + memory_pos if ma.pos_enc_at_cross_attn_keys else memory
        t2 = _rope_attn_apply(layer["cross_attn_image"], cfg, q_in, k_in,
                              memory, rope_k_repeat=True,
                              num_k_exclude_rope=num_obj_ptr_tokens,
                              interpret=interpret, kv_mask=memory_mask)
        output = output + t2
        # FFN (relu)
        t2 = nn.layer_norm(layer["norm3"], output, _LN_EPS)
        t2 = nn.dense(layer["linear2"], jax.nn.relu(
            nn.dense(layer["linear1"], t2)))
        output = output + t2
    return nn.layer_norm(params["norm"], output, _LN_EPS)
