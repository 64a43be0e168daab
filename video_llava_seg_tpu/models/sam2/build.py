"""SAM2 model builder — dataclass-config equivalent of sam2/build_sam.py.

`build_sam2(variant_or_path, checkpoint=...)` returns (params, cfg). Accepts
the reference's HF model ids ('facebook/sam2.1-hiera-small'), bare variant
names, or a local torch checkpoint path. With no checkpoint, params are
randomly initialized (useful for tests/benchmarks)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.models.sam2 import base
from video_llava_seg_tpu.models.sam2.config import SAM2Config, sam2_config


def load_torch_state_dict(path: str):
    """Load a torch .pt checkpoint's 'model' state dict as numpy arrays
    (build_sam.py:141-151 key layout)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    return {k: v.float().numpy() if hasattr(v, "numpy") else v
            for k, v in sd.items()}


def build_sam2(variant: str = "small",
               checkpoint: Optional[str] = None,
               image_size: int = 1024,
               seed: int = 0,
               dtype=jnp.float32,
               apply_postprocessing: bool = True,
               **overrides) -> Tuple[dict, SAM2Config]:
    cfg = sam2_config(variant, image_size=image_size, **overrides)
    if checkpoint is None and os.path.exists(str(variant)):
        checkpoint = str(variant)
    if checkpoint is not None:
        from video_llava_seg_tpu.convert.sam2_torch import convert_sam2_base

        sd = load_torch_state_dict(checkpoint)
        params = convert_sam2_base(sd, cfg)
    else:
        params = base.init(jax.random.PRNGKey(seed), cfg, dtype)
    return params, cfg


def build_sam2_image_predictor(variant: str = "small",
                               checkpoint: Optional[str] = None,
                               **kwargs):
    from video_llava_seg_tpu.models.sam2.image_predictor import (
        SAM2ImagePredictor,
    )

    params, cfg = build_sam2(variant, checkpoint)
    # video-predictor-style postprocessing defaults (build_sam.py:88-102)
    return SAM2ImagePredictor(params, cfg, **kwargs)


def build_sam2_video_predictor(variant: str = "small",
                               checkpoint: Optional[str] = None,
                               **kwargs):
    from video_llava_seg_tpu.models.sam2.video_predictor import (
        SAM2VideoPredictor,
    )

    params, cfg = build_sam2(variant, checkpoint)
    return SAM2VideoPredictor(params, cfg, **kwargs)
