"""ViT vision towers (CLIP-shaped and RADIO-shaped), TPU-native.

Capability parity with llava/model/multimodal_encoder/clip_encoder.py
(HF CLIPVisionModel tap at `select_layer`, CLS drop for 'patch', bicubic
position-embedding resize with align_corners=True at non-native image sizes,
[B, T, C, H, W] video batches flattened through the tower) and
radio_encoder.py (RADIO-shaped: no CLS token, per-variant hidden sizes).

All T frames of a clip batch through the tower in one call — the [B*T] flatten
is the only reshape, everything else is batched matmuls on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import VisionTowerConfig
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.attention import attention
from video_llava_seg_tpu.ops.resize import interpolate


# whole-layer Pallas megakernel on TPU (ops/vit_block.py); False = the
# per-op XLA composition with the flash-attention custom call
USE_FUSED_VIT_BLOCK = True


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init(key, cfg: VisionTowerConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 4)
    d = cfg.hidden_size
    num_pos = cfg.num_patches + (1 if cfg.use_cls_token else 0)
    p = {
        "patch_embedding": nn.conv2d_init(
            keys[0], 3, d, (cfg.patch_size, cfg.patch_size), bias=False,
            dtype=dtype),
        "position_embedding": nn.trunc_normal(keys[1], (num_pos, d), 0.02,
                                              dtype),
        "pre_layrnorm": nn.layer_norm_init(d, dtype),
        "layers": [],
    }
    if cfg.use_cls_token:
        p["class_embedding"] = nn.trunc_normal(keys[2], (d,), 0.02, dtype)
    if cfg.num_register_tokens > 0:
        p["register_tokens"] = nn.trunc_normal(
            keys[2], (cfg.num_register_tokens, d), 0.02, dtype)
    if cfg.is_radio:
        # RADIO input conditioner (normalization folded into the model;
        # radio_encoder.py:60 plumbs its dtype) — identity until a converter
        # loads the checkpoint stats
        p["input_conditioner"] = {"mean": jnp.zeros((3,), dtype),
                                  "std": jnp.ones((3,), dtype)}
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[i + 3], 6)
        p["layers"].append({
            "layer_norm1": nn.layer_norm_init(d, dtype),
            "q_proj": nn.dense_init(k[0], d, d, dtype=dtype),
            "k_proj": nn.dense_init(k[1], d, d, dtype=dtype),
            "v_proj": nn.dense_init(k[2], d, d, dtype=dtype),
            "out_proj": nn.dense_init(k[3], d, d, dtype=dtype),
            "layer_norm2": nn.layer_norm_init(d, dtype),
            "fc1": nn.dense_init(k[4], d, cfg.intermediate_size, dtype=dtype),
            "fc2": nn.dense_init(k[5], cfg.intermediate_size, d, dtype=dtype),
        })
    p["post_layernorm"] = nn.layer_norm_init(d, dtype)
    return p


def resize_position_embedding(params, cfg: VisionTowerConfig,
                              native_size: int):
    """Bicubic align_corners=True spatial resize of the position table
    (clip_encoder.py:50-74) when cfg.image_size != the checkpoint's native
    size. Returns updated params."""
    if cfg.image_size == native_size:
        return params
    pe = params["position_embedding"]
    n_old = native_size // cfg.patch_size
    n_new = cfg.num_patches_per_side
    if cfg.use_cls_token:
        cls_embed, spatial = pe[:1], pe[1:]
    else:
        cls_embed, spatial = None, pe
    spatial = spatial.reshape(n_old, n_old, -1)
    spatial = interpolate(spatial, (n_new, n_new), "bicubic",
                          align_corners=True)
    spatial = spatial.reshape(n_new * n_new, -1)
    new_pe = (jnp.concatenate([cls_embed, spatial], axis=0)
              if cls_embed is not None else spatial)
    out = dict(params)
    out["position_embedding"] = new_pe
    return out


def _encoder_layer(p, x, num_heads: int, eps: float, act,
                   interpret: bool = False):
    residual = x
    h = nn.layer_norm(p["layer_norm1"], x, eps)
    b, n, d = h.shape
    hd = d // num_heads
    # CLIP scales q by 1/sqrt(hd) inside q_proj path; standard SDPA scale
    q = nn.dense(p["q_proj"], h).reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    k = nn.dense(p["k_proj"], h).reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    v = nn.dense(p["v_proj"], h).reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    o = attention(q, k, v, backend="auto" if n >= 256 else "xla",
                  interpret=interpret)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    x = residual + nn.dense(p["out_proj"], o)
    residual = x
    h = nn.layer_norm(p["layer_norm2"], x, eps)
    h = nn.dense(p["fc2"], act(nn.dense(p["fc1"], h)))
    return residual + h


def apply(params, cfg: VisionTowerConfig, images, interpret: bool = False):
    """images: [B, H, W, 3] (or [B, T, H, W, 3] video) normalized.

    Returns features at `select_layer` with CLS handling per
    `select_feature`: [B(, T), N_patches, hidden]."""
    video = images.ndim == 5
    if video:
        b, t = images.shape[:2]
        images = images.reshape(b * t, *images.shape[2:])

    if cfg.is_radio and "input_conditioner" in params:
        cond = params["input_conditioner"]
        images = (images - cond["mean"].astype(images.dtype)) / \
            cond["std"].astype(images.dtype)

    x = nn.conv2d(params["patch_embedding"], images,
                  stride=(cfg.patch_size, cfg.patch_size), padding="VALID")
    bt, gh, gw, d = x.shape
    x = x.reshape(bt, gh * gw, d)
    if cfg.use_cls_token:
        cls_tok = jnp.broadcast_to(
            params["class_embedding"].reshape(1, 1, d).astype(x.dtype),
            (bt, 1, d))
        x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + params["position_embedding"][None].astype(x.dtype)
    n_reg = cfg.num_register_tokens
    if n_reg > 0:
        # RADIO cls/register tokens join AFTER the position add
        # (ViTPatchGenerator: pos embeds apply to patches only)
        reg = jnp.broadcast_to(
            params["register_tokens"][None].astype(x.dtype), (bt, n_reg, d))
        x = jnp.concatenate([reg, x], axis=1)
    if not cfg.is_radio:
        x = nn.layer_norm(params["pre_layrnorm"], x, cfg.layernorm_eps)

    act = quick_gelu if not cfg.is_radio else nn.gelu
    # hidden_states[0] = embeddings; select_layer=-2 -> stop before last layer
    n_run = cfg.num_layers + cfg.select_layer + 1 if cfg.select_layer < 0 \
        else cfg.select_layer
    n_run = max(0, min(n_run, cfg.num_layers))

    from video_llava_seg_tpu.ops.attention import _on_tpu
    from video_llava_seg_tpu.ops.vit_block import (
        vit_layer,
        vit_layer_supported,
    )
    n_tok = x.shape[1]
    sp = -(-n_tok // 8) * 8
    fused = (USE_FUSED_VIT_BLOCK and (_on_tpu() or interpret)
             and vit_layer_supported(sp, x.shape[-1], cfg.num_heads))
    if fused:
        # whole-layer Pallas megakernel: pad tokens to the 8-aligned
        # storage count ONCE for the whole tower (pad keys masked in the
        # kernel's softmax; everything else is token-local) and slice off
        # after the tap
        if sp != n_tok:
            x = jnp.pad(x, ((0, 0), (0, sp - n_tok), (0, 0)))
        act_kind = "quick_gelu" if not cfg.is_radio else "gelu"
        for layer in params["layers"][:n_run]:
            x = vit_layer(layer, x, num_heads=cfg.num_heads,
                          eps=cfg.layernorm_eps, kv_len=n_tok,
                          act=act_kind, backend="pallas",
                          interpret=interpret)
        if sp != n_tok:
            x = x[:, :n_tok]
    else:
        for layer in params["layers"][:n_run]:
            x = _encoder_layer(layer, x, cfg.num_heads, cfg.layernorm_eps,
                               act, interpret)
    if cfg.final_norm:
        # RADIO spatial features are final-norm'd (timm forward_features)
        x = nn.layer_norm(params["post_layernorm"], x, cfg.layernorm_eps)

    if cfg.select_feature == "patch" and cfg.use_cls_token:
        x = x[:, 1:]
    elif cfg.select_feature not in ("patch", "cls_patch"):
        raise ValueError(f"Unexpected select feature: {cfg.select_feature}")
    if n_reg > 0 and cfg.select_feature == "patch":
        x = x[:, n_reg:]

    if video:
        x = x.reshape(b, t, *x.shape[1:])
    return x


def apply_s2(params, cfg: VisionTowerConfig, images, interpret: bool = False):
    """S2 multi-scale forward (CLIPVisionTowerS2, clip_encoder.py:142-197;
    algorithm of bfshi/scaling_on_scales `multiscale_forward`).

    images: [B(,T), S, S, 3] at the LARGEST scale. For each scale s (sorted
    ascending, smallest = split size): resize to s, split into (s/s0)^2
    crops of s0, batch through the tower, reassemble the crop grid, pool
    back to the base grid (area average), and concat channels ascending.
    Returns [B(,T), (s0/patch)^2, hidden * n_scales] — CLS must be dropped
    (select_feature='patch') since crops have no joint CLS."""
    assert cfg.s2_enabled, "apply_s2 requires cfg.s2_scales"
    assert cfg.select_feature == "patch", "S2 merges patch grids only"
    scales = sorted(cfg.s2_scales)
    s0 = scales[0]
    video = images.ndim == 5
    if video:
        b, t = images.shape[:2]
        images = images.reshape(b * t, *images.shape[2:])
    n = images.shape[0]
    g0 = s0 // cfg.patch_size          # base token grid
    outs = []
    for s in scales:
        x = images
        if x.shape[1] != s:
            x = interpolate(x, (s, s), "bicubic")
        k = s // s0                    # crops per side
        if k > 1:
            # [n, k, s0, k, s0, 3] -> crops as batch
            x = x.reshape(n, k, s0, k, s0, 3).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(n * k * k, s0, s0, 3)
        feats = apply(params, cfg, x, interpret)       # [n*k*k, g0*g0, C]
        c = feats.shape[-1]
        feats = feats.reshape(n, k, k, g0, g0, c).transpose(0, 1, 3, 2, 4, 5)
        feats = feats.reshape(n, k * g0, k * g0, c)
        if k > 1:
            # area-average pool back to the base grid
            feats = feats.reshape(n, g0, k, g0, k, c).mean(axis=(2, 4))
        else:
            feats = feats.reshape(n, g0, g0, c)
        outs.append(feats)
    out = jnp.concatenate(outs, axis=-1).reshape(n, g0 * g0, -1)
    if video:
        out = out.reshape(b, t, *out.shape[1:])
    return out
