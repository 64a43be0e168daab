"""Prompt encoder: points/boxes/masks -> sparse + dense embeddings.

Parity: sam2/modeling/sam/prompt_encoder.py. Boxes are expressed as two
points with labels 2 (top-left) and 3 (bottom-right) — the decoder treats
them identically — so the sparse path is one static-shape vectorized op:

    emb[i] = (label==-1) ? not_a_point : PE(coord) + point_type_embed[label]

Label padding (-1) replaces the PE entirely, matching the reference's
"zero then add not_a_point" behavior.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.models.sam2.config import SAM2Config
from video_llava_seg_tpu.models.sam2.position_encoding import (
    random_pe_coords,
    random_pe_grid,
    random_pe_init,
)
from video_llava_seg_tpu.ops import nn


def init(key, cfg: SAM2Config, dtype=jnp.float32):
    d = cfg.hidden_dim
    keys = jax.random.split(key, 10)
    mask_ch = cfg.mask_in_chans
    return {
        "pe_layer": random_pe_init(keys[0], d // 2),
        # 4 point types: neg click, pos click, box TL, box BR
        "point_embeddings": nn.trunc_normal(keys[1], (4, d), 1.0, dtype),
        "not_a_point_embed": nn.trunc_normal(keys[2], (1, d), 1.0, dtype),
        "no_mask_embed": nn.trunc_normal(keys[3], (1, d), 1.0, dtype),
        "mask_downscaling": {
            "conv1": nn.conv2d_init(keys[4], 1, mask_ch // 4, (2, 2),
                                    dtype=dtype),
            "ln1": nn.layer_norm_init(mask_ch // 4, dtype),
            "conv2": nn.conv2d_init(keys[5], mask_ch // 4, mask_ch, (2, 2),
                                    dtype=dtype),
            "ln2": nn.layer_norm_init(mask_ch, dtype),
            "conv3": nn.conv2d_init(keys[6], mask_ch, d, (1, 1), dtype=dtype),
        },
    }


def get_dense_pe(params, cfg: SAM2Config):
    """[H, W, C] positional grid for the image embedding."""
    s = cfg.image_embedding_size
    return random_pe_grid(params["pe_layer"], (s, s))


def embed_points(params, cfg: SAM2Config, coords, labels):
    """coords: [B, P, 2] absolute pixel (x, y); labels: [B, P] int
    (-1 pad, 0 neg, 1 pos, 2 box-TL, 3 box-BR). Returns [B, P, C]."""
    coords = coords.astype(jnp.float32) + 0.5  # pixel-center shift
    pe = random_pe_coords(params["pe_layer"], coords,
                          (cfg.image_size, cfg.image_size))
    pe = jnp.where((labels == -1)[..., None], 0.0, pe)
    type_table = jnp.concatenate(
        [params["not_a_point_embed"], params["point_embeddings"]], axis=0)
    type_emb = jnp.take(type_table, jnp.clip(labels + 1, 0, 4), axis=0)
    return pe + type_emb


def embed_masks(params, masks_nhwc):
    """masks: [B, 4H, 4W, 1] -> dense embeddings [B, H, W, C]."""
    p = params["mask_downscaling"]
    x = nn.conv2d(p["conv1"], masks_nhwc, stride=(2, 2), padding="VALID")
    x = nn.layer_norm(p["ln1"], x, 1e-6)
    x = nn.gelu(x)
    x = nn.conv2d(p["conv2"], x, stride=(2, 2), padding="VALID")
    x = nn.layer_norm(p["ln2"], x, 1e-6)
    x = nn.gelu(x)
    return nn.conv2d(p["conv3"], x)


def apply(params, cfg: SAM2Config, coords, labels,
          masks: Optional[jnp.ndarray] = None,
          boxes: Optional[jnp.ndarray] = None):
    """Returns (sparse [B, N, C], dense [B, H, W, C]).

    boxes: [B, 4] (x0, y0, x1, y1) appended as two labeled corner points.
    When the reference pads points with an empty (-1) point unless boxes are
    given, callers replicate that by appending a (-1)-labeled point."""
    sparse = embed_points(params, cfg, coords, labels)
    if boxes is not None:
        b = boxes.reshape(boxes.shape[0], 2, 2)
        blabels = jnp.broadcast_to(jnp.asarray([2, 3]), b.shape[:2])
        bemb = embed_points(params, cfg, b, blabels)
        sparse = jnp.concatenate([sparse, bemb], axis=1)
    if masks is not None:
        dense = embed_masks(params, masks)
    else:
        s = cfg.image_embedding_size
        dense = jnp.broadcast_to(
            params["no_mask_embed"].reshape(1, 1, 1, -1),
            (sparse.shape[0], s, s, cfg.hidden_dim))
    return sparse, dense
