"""NVIDIA RADIO checkpoint -> framework ViT params.

The reference's published training runs all use the RADIO tower
(scripts/train/llama3/stage1_pretrain.sh:25 `--vision_tower nvidia/RADIO`;
llava/model/multimodal_encoder/radio_encoder.py loads it via HF remote code).
RADIO's trunk is a timm VisionTransformer (ViT-H/16 for nvidia/RADIO) with a
ViTPatchGenerator front end:

  radio_model.model.patch_generator.embedder.{weight,bias}  Linear(3*p*p, d)
  radio_model.model.patch_generator.pos_embed               [1, N, d]
  radio_model.model.patch_generator.cls_token.token         [1, K, d]
  radio_model.model.blocks.{i}.norm1|attn.qkv|attn.proj|norm2|mlp.fc1|mlp.fc2
  radio_model.model.norm.{weight,bias}                      final LayerNorm
  radio_model.input_conditioner.norm_{mean,std}             input stats

This converter reproduces the reference's load-time adaptations
(llava/train/misc.py:19-46): bicubic align_corners=True interpolation of the
patch embedder when the checkpoint patch size differs, and spatial resize of
the absolute position table (ViTPatchGenerator._load_embed) when the token
grid differs. Spatial features = final-norm'd patch tokens with the K
cls/register tokens dropped (RADIOModel forward semantics).
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import jax.numpy as jnp

from video_llava_seg_tpu.config import VisionTowerConfig
from video_llava_seg_tpu.ops.resize import interpolate


def _t(x):
    return jnp.asarray(np.asarray(x))


def _lin(sd, prefix):
    p = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _split_qkv(sd, prefix, d):
    """timm fused qkv Linear(d, 3d) -> separate q/k/v dense params."""
    w = np.asarray(sd[f"{prefix}.weight"])         # [3d, d]
    out = {}
    names = ("q_proj", "k_proj", "v_proj")
    for i, name in enumerate(names):
        p = {"kernel": jnp.asarray(w[i * d:(i + 1) * d].T)}
        if f"{prefix}.bias" in sd:
            b = np.asarray(sd[f"{prefix}.bias"])
            p["bias"] = jnp.asarray(b[i * d:(i + 1) * d])
        out[name] = p
    return out


def _convert_embedder(sd, cfg: VisionTowerConfig):
    """ViTPatchLinear -> conv kernel [p, p, 3, d], with bicubic patch-size
    interpolation when the checkpoint patch size differs (misc.py:36-46)."""
    w = np.asarray(sd["patch_generator.embedder.weight"])  # [d, 3*ps*ps]
    d = w.shape[0]
    src_p = int(math.sqrt(w.shape[1] // 3))
    assert src_p * src_p * 3 == w.shape[1], w.shape
    k = w.reshape(d, 3, src_p, src_p)              # (c h w) flattening order
    if src_p != cfg.patch_size:
        hw_last = jnp.asarray(k.transpose(2, 3, 1, 0).reshape(
            src_p, src_p, 3 * d))
        hw_last = interpolate(hw_last, (cfg.patch_size, cfg.patch_size),
                              "bicubic", align_corners=True)
        kernel = hw_last.reshape(cfg.patch_size, cfg.patch_size, 3, d)
    else:
        kernel = jnp.asarray(k.transpose(2, 3, 1, 0))
    p = {"kernel": kernel}
    if "patch_generator.embedder.bias" in sd:
        p["bias"] = _t(sd["patch_generator.embedder.bias"])
    return p


def _convert_pos_embed(sd, cfg: VisionTowerConfig):
    """[1, N, d] absolute table -> [num_patches, d], bicubic-resized to the
    configured grid when sizes differ (ViTPatchGenerator._load_embed)."""
    pe = np.asarray(sd["patch_generator.pos_embed"])[0]    # [N, d]
    n_src = int(math.sqrt(pe.shape[0]))
    assert n_src * n_src == pe.shape[0], pe.shape
    n_dst = cfg.num_patches_per_side
    if n_src != n_dst:
        grid = jnp.asarray(pe.reshape(n_src, n_src, -1))
        grid = interpolate(grid, (n_dst, n_dst), "bicubic",
                           align_corners=True)
        return grid.reshape(n_dst * n_dst, -1)
    return jnp.asarray(pe)


def convert_radio(sd: Dict[str, np.ndarray], cfg: VisionTowerConfig,
                  prefix: str = "radio_model.") -> dict:
    """Convert a RADIO state dict (keys relative to the RADIOVisionTower's
    `vision_tower` module, i.e. starting with `radio_model.`)."""
    model_sd = {k[len(prefix) + len("model."):]: v for k, v in sd.items()
                if k.startswith(prefix + "model.")}
    d = cfg.hidden_size
    p = {
        "patch_embedding": _convert_embedder(model_sd, cfg),
        "position_embedding": _convert_pos_embed(model_sd, cfg),
        # unused for RADIO (no pre-norm) but kept so the param tree is
        # structurally identical to init()
        "pre_layrnorm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "post_layernorm": _ln(model_sd, "norm"),
        "layers": [],
    }
    cls_key = "patch_generator.cls_token.token"
    if cls_key in model_sd:
        tok = np.asarray(model_sd[cls_key])[0]     # [K, d]
        assert tok.shape[0] == cfg.num_register_tokens, (
            f"checkpoint has {tok.shape[0]} cls/register tokens, config "
            f"expects {cfg.num_register_tokens}")
        p["register_tokens"] = jnp.asarray(tok)
    mean_key = f"{prefix}input_conditioner.norm_mean"
    std_key = f"{prefix}input_conditioner.norm_std"
    if mean_key in sd:
        p["input_conditioner"] = {
            "mean": _t(sd[mean_key]).reshape(3),
            "std": _t(sd[std_key]).reshape(3),
        }
    else:
        p["input_conditioner"] = {"mean": jnp.zeros((3,)),
                                  "std": jnp.ones((3,))}
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        layer = {
            "layer_norm1": _ln(model_sd, f"{b}.norm1"),
            "layer_norm2": _ln(model_sd, f"{b}.norm2"),
            "out_proj": _lin(model_sd, f"{b}.attn.proj"),
            "fc1": _lin(model_sd, f"{b}.mlp.fc1"),
            "fc2": _lin(model_sd, f"{b}.mlp.fc2"),
        }
        layer.update(_split_qkv(model_sd, f"{b}.attn.qkv", d))
        p["layers"].append(layer)
    return p
