"""Multimodal projector: vision features -> LLM embedding space.

Parity with llava/model/multimodal_projector/builder.py:33-51:
'linear' | 'mlpNx_gelu' | 'identity'."""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import ProjectorConfig
from video_llava_seg_tpu.ops import nn


def init(key, cfg: ProjectorConfig, dtype=jnp.float32):
    t = cfg.projector_type
    if t == "identity":
        return {"layers": []}
    if t == "linear":
        return {"layers": [nn.dense_init(key, cfg.mm_hidden_size,
                                         cfg.hidden_size, dtype=dtype)]}
    m = re.match(r"^mlp(\d+)x_gelu$", t)
    if m:
        depth = int(m.group(1))
        keys = jax.random.split(key, depth)
        layers = [nn.dense_init(keys[0], cfg.mm_hidden_size, cfg.hidden_size,
                                dtype=dtype)]
        for i in range(1, depth):
            layers.append(nn.dense_init(keys[i], cfg.hidden_size,
                                        cfg.hidden_size, dtype=dtype))
        return {"layers": layers}
    raise ValueError(f"Unknown projector type: {t}")


def apply(params, x):
    # structure carries the type: no layers = identity, 1 = linear, N = mlp
    if not params.get("layers"):
        return x
    out = nn.dense(params["layers"][0], x)
    for layer in params["layers"][1:]:
        out = nn.dense(layer, nn.gelu(out))
    return out


def convert_torch(sd, cfg: ProjectorConfig, prefix: str = "") -> dict:
    """Torch mm_projector state dict ('0.weight', '2.weight', ...)."""
    import numpy as np
    t = cfg.projector_type
    if t == "identity":
        return {"layers": []}
    layers = []
    idx = 0
    while f"{prefix}{idx}.weight" in sd:
        layers.append({
            "kernel": jnp.asarray(np.asarray(sd[f"{prefix}{idx}.weight"])).T,
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}{idx}.bias"])),
        })
        idx += 2  # GELU between linears
    return {"layers": layers}
