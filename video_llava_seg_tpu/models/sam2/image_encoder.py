"""FPN neck + image encoder wrapper (sam2/modeling/backbones/image_encoder.py).

Top-down FPN over the Hiera pyramid: 1x1 lateral convs to d_model, nearest
(or bilinear) x2 top-down upsampling on the configured levels, sine positional
encodings per level. `scalp` discards the lowest-resolution level(s).
All feature maps NHWC."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.models.sam2 import hiera
from video_llava_seg_tpu.models.sam2.config import SAM2Config
from video_llava_seg_tpu.models.sam2.position_encoding import sine_pos_embed_hw
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.resize import interpolate


def init(key, cfg: SAM2Config, dtype=jnp.float32):
    channel_list = cfg.hiera.channel_list  # lowest-res first
    keys = jax.random.split(key, len(channel_list) + 1)
    return {
        "trunk": hiera.init(keys[0], cfg.hiera, dtype),
        "neck": {
            "convs": [nn.conv2d_init(k, c, cfg.fpn.d_model, (1, 1),
                                     dtype=dtype)
                      for k, c in zip(keys[1:], channel_list)],
        },
    }


def apply_neck(params, cfg: SAM2Config, xs: List):
    """xs: Hiera pyramid, highest-res first, NHWC. Returns (features, pos),
    each highest-res first."""
    convs = params["neck"]["convs"]
    n = len(convs) - 1
    out = [None] * len(convs)
    pos = [None] * len(convs)
    prev = None
    for i in range(n, -1, -1):
        lateral = nn.conv2d(convs[n - i], xs[i])
        if i in cfg.fpn.fpn_top_down_levels and prev is not None:
            h, w = lateral.shape[1], lateral.shape[2]
            td = interpolate(prev.astype(jnp.float32), (h, w),
                             cfg.fpn.fpn_interp_model).astype(lateral.dtype)
            prev = lateral + td
            if cfg.fpn.fuse_type == "avg":
                prev = prev / 2
        else:
            prev = lateral
        out[i] = prev
        pe = sine_pos_embed_hw(prev.shape[1], prev.shape[2],
                               cfg.fpn.pos_num_feats, cfg.fpn.pos_temperature)
        pos[i] = jnp.broadcast_to(jnp.asarray(pe, prev.dtype)[None],
                                  prev.shape[:3] + (pe.shape[-1],))
    return out, pos


def apply(params, cfg: SAM2Config, images, interpret: bool = False) -> Dict:
    """images: [B, H, W, 3] normalized. Returns dict with NHWC features:
    {vision_features, vision_pos_enc, backbone_fpn} (image_encoder.py:14-42)."""
    pyramid = hiera.apply(params["trunk"], cfg.hiera, images, interpret)
    features, pos = apply_neck(params, cfg, pyramid)
    if cfg.fpn.scalp > 0:
        features = features[: -cfg.fpn.scalp]
        pos = pos[: -cfg.fpn.scalp]
    return {
        "vision_features": features[-1],
        "vision_pos_enc": pos,
        "backbone_fpn": features,
    }
