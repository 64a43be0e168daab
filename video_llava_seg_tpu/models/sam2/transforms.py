"""SAM2 input/output transforms (sam2/utils/transforms.py parity).

Resize+normalize runs as a jitted device function (fused by XLA into the
encoder's first conv rather than done on host); mask postprocessing uses the
TPU connected-components op instead of the reference's CUDA kernel, with the
same skip-on-failure semantics made unnecessary (the op cannot fail)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.ops.connected_components import (
    fill_holes_and_sprinkles,
)
from video_llava_seg_tpu.ops.resize import interpolate, interpolate_hw

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


class SAM2Transforms:
    def __init__(self, resolution: int, mask_threshold: float = 0.0,
                 max_hole_area: float = 0.0, max_sprinkle_area: float = 0.0):
        self.resolution = resolution
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area

    @functools.partial(jax.jit, static_argnums=0)
    def _prep(self, img):
        x = img.astype(jnp.float32) / 255.0
        x = interpolate(x, (self.resolution, self.resolution), "bilinear",
                        antialias=True)
        mean = jnp.asarray(MEAN, jnp.float32)
        std = jnp.asarray(STD, jnp.float32)
        return (x - mean) / std

    def __call__(self, image: np.ndarray):
        """uint8 [H, W, 3] -> normalized [res, res, 3] float32 (device)."""
        return self._prep(jnp.asarray(image))

    def forward_batch(self, images):
        """list of uint8 [H, W, 3] (any sizes) -> [B, res, res, 3]."""
        return jnp.stack([self._prep(jnp.asarray(i)) for i in images])

    def transform_coords(self, coords, normalize=False,
                         orig_hw: Optional[Tuple[int, int]] = None):
        """[..., 2] (x, y) -> model-frame coords in [0, resolution]."""
        coords = np.asarray(coords, np.float32).copy()
        if normalize:
            h, w = orig_hw
            coords[..., 0] = coords[..., 0] / w
            coords[..., 1] = coords[..., 1] / h
        return coords * self.resolution

    def transform_boxes(self, boxes, normalize=False, orig_hw=None):
        return self.transform_coords(
            np.asarray(boxes).reshape(-1, 2, 2), normalize, orig_hw)

    def postprocess_masks(self, masks, orig_hw: Tuple[int, int]):
        """[B, M, H, W] logits -> hole-filled, resized to orig_hw."""
        b, m = masks.shape[0], masks.shape[1]
        x = masks.astype(jnp.float32).reshape(b * m, *masks.shape[2:])
        if self.max_hole_area > 0 or self.max_sprinkle_area > 0:
            x = fill_holes_and_sprinkles(
                x, self.mask_threshold, self.max_hole_area,
                self.max_sprinkle_area)
        x = x.reshape(b, m, *x.shape[1:])
        return interpolate_hw(x, orig_hw, "bilinear")
