"""SAM2ImagePredictor — public API parity with
sam2/sam2_image_predictor.py:85-438 (set_image/set_image_batch/predict/
predict_batch), backed by jitted JAX functions.

The encoder runs once per image (jit-cached by shape); predict embeds prompts
and runs only the mask decoder, exactly like the reference's cached-features
design. Prompt shapes are padded to a small set of bucket sizes so repeated
clicks don't trigger recompilation."""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.models.sam2 import base, mask_decoder, prompt_encoder
from video_llava_seg_tpu.models.sam2.config import SAM2Config
from video_llava_seg_tpu.models.sam2.transforms import SAM2Transforms


def _bucket(n: int) -> int:
    """Round prompt count up to a recompile-friendly bucket."""
    for b in (2, 4, 8, 16, 32):
        if n <= b:
            return b
    return ((n + 31) // 32) * 32


class SAM2ImagePredictor:
    def __init__(self, params, cfg: SAM2Config, mask_threshold: float = 0.0,
                 max_hole_area: float = 0.0, max_sprinkle_area: float = 0.0,
                 interpret: bool = False, compute_dtype=None):
        # bf16 on TPU (reference runs SAM2 inference in bf16,
        # sam2_video_predictor.py:952-957), fp32 elsewhere for parity tests
        if compute_dtype is None:
            try:
                on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            except Exception:
                on_tpu = False
            compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
        self.compute_dtype = compute_dtype
        params = jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, params)
        self.params = params
        self.cfg = cfg
        self.mask_threshold = mask_threshold
        self.interpret = interpret
        self._transforms = SAM2Transforms(
            resolution=cfg.image_size, mask_threshold=mask_threshold,
            max_hole_area=max_hole_area, max_sprinkle_area=max_sprinkle_area)
        self._features = None
        self._orig_hw: List[Tuple[int, int]] = []
        self._is_image_set = False
        self._is_batch = False

        self._encode = jax.jit(functools.partial(self._encode_impl))
        self._decode = jax.jit(
            functools.partial(self._decode_impl),
            static_argnames=("multimask_output", "has_mask", "orig_hw",
                             "return_logits"))

    @classmethod
    def from_pretrained(cls, model_id: str, **kwargs) -> "SAM2ImagePredictor":
        from video_llava_seg_tpu.models.sam2.build import build_sam2
        params, cfg = build_sam2(model_id)
        return cls(params, cfg, **kwargs)

    # ------------------------------------------------------------------
    def _encode_impl(self, params, images):
        # raw [B, H, W, 3] uint8/float frames: resize+normalize IN-GRAPH
        # (one dispatch per set_image; retraces per input resolution, like
        # the reference's per-image CPU transform cost but fused on device)
        if images.shape[1:3] != (self.cfg.image_size, self.cfg.image_size) \
                or images.dtype == jnp.uint8:
            images = jax.vmap(self._transforms._prep)(images)
        images = images.astype(self.compute_dtype)
        out = base.forward_image(params, self.cfg, images,
                                 self.interpret)
        feats, pos, sizes = base.prepare_backbone_features(self.cfg, out)
        # add no_mem_embed to the lowest-res level (set_image parity)
        if self.cfg.directly_add_no_mem_embed:
            low = feats[-1]
            b, h, w, c = low.shape
            low = (low.reshape(b, h * w, c)
                   + params["no_mem_embed"]).reshape(b, h, w, c)
            feats = feats[:-1] + [low]
        return {"image_embed": feats[-1], "high_res_feats": feats[:-1]}

    def set_image(self, image) -> None:
        """image: np.ndarray [H, W, 3] uint8 RGB (or PIL Image)."""
        self.reset_predictor()
        if hasattr(image, "size") and not isinstance(image, np.ndarray):
            w, h = image.size
            self._orig_hw = [(h, w)]
            image = np.asarray(image.convert("RGB"))
        else:
            image = np.asarray(image)
            self._orig_hw = [image.shape[:2]]
        # raw frame in; transform happens inside the encode jit
        self._features = self._encode(self.params, jnp.asarray(image)[None])
        self._is_image_set = True

    def set_image_batch(self, image_list: List[np.ndarray]) -> None:
        self.reset_predictor()
        self._orig_hw = [im.shape[:2] for im in image_list]
        x = self._transforms.forward_batch(image_list)
        self._features = self._encode(self.params, x)
        self._is_image_set = True
        self._is_batch = True

    # ------------------------------------------------------------------
    def _decode_impl(self, params, image_embed, high_res_feats, coords,
                     labels,
                     mask_input, multimask_output: bool, has_mask: bool,
                     orig_hw=None, return_logits: bool = True):
        cfg = self.cfg
        sparse, dense = prompt_encoder.apply(
            params["prompt_encoder"], cfg, coords, labels,
            masks=mask_input if has_mask else None)
        image_pe = prompt_encoder.get_dense_pe(
            params["prompt_encoder"], cfg)
        low_res, ious, _, _ = mask_decoder.apply(
            params["mask_decoder"], cfg, image_embed, image_pe, sparse,
            dense, multimask_output=multimask_output,
            high_res_features=list(high_res_feats), interpret=self.interpret)
        low_res = low_res.astype(jnp.float32)
        ious = ious.astype(jnp.float32)
        if orig_hw is None:
            return low_res, ious
        # postprocess fused in-graph: hole fill + resize to original dims;
        # threshold + bit-pack in-graph — packed bits leave the device 32x
        # smaller than fp32 logits (device->host bytes are the dominant
        # predict cost on a tunneled chip, see BENCH_NOTES.md); the caller
        # unpacks to the API's bool array on host
        masks = self._transforms.postprocess_masks(low_res, orig_hw)
        if not return_logits:
            masks = jnp.packbits(masks > self.mask_threshold, axis=-1)
        return masks, ious, jnp.clip(low_res, -32.0, 32.0)

    def _prep_prompts(self, point_coords, point_labels, box, mask_input,
                      normalize_coords, img_idx: int):
        orig_hw = self._orig_hw[img_idx]
        pts = []
        lbl = []
        if box is not None:
            b = self._transforms.transform_boxes(
                np.asarray(box, np.float32), normalize_coords, orig_hw)
            pts.append(b.reshape(-1, 2))
            lbl.append(np.asarray([2, 3], np.int32))
        if point_coords is not None:
            assert point_labels is not None
            c = self._transforms.transform_coords(
                np.asarray(point_coords, np.float32), normalize_coords,
                orig_hw)
            pts.append(c.reshape(-1, 2))
            lbl.append(np.asarray(point_labels, np.int32).reshape(-1))
        # pad point (reference pads when no box is passed to the encoder —
        # in the predictor path boxes become points, so always pad)
        pts.append(np.zeros((1, 2), np.float32))
        lbl.append(np.asarray([-1], np.int32))
        # NOTE: no padding beyond the single reference pad point — extra
        # (-1) tokens participate in attention and would change numerics.
        coords = np.concatenate(pts, axis=0)
        labels = np.concatenate(lbl, axis=0)
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32)
            if m.ndim == 3:
                m = m[None]
            m = m.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        else:
            s4 = self.cfg.image_embedding_size * 4
            m = np.zeros((1, s4, s4, 1), np.float32)
        return coords[None], labels[None], m

    def predict(self, point_coords=None, point_labels=None, box=None,
                mask_input=None, multimask_output: bool = True,
                return_logits: bool = False, normalize_coords: bool = True):
        """Reference-parity predict (sam2_image_predictor.py:237-303).

        Returns (masks [M, H, W], iou [M], low_res_masks [M, 256, 256])
        as numpy arrays."""
        if not self._is_image_set:
            raise RuntimeError(
                "An image must be set with .set_image(...) before mask "
                "prediction.")
        return self._predict_idx(point_coords, point_labels, box, mask_input,
                                 multimask_output, return_logits,
                                 normalize_coords, img_idx=-1)

    def _predict_idx(self, point_coords, point_labels, box, mask_input,
                     multimask_output, return_logits, normalize_coords,
                     img_idx: int):
        coords, labels, m = self._prep_prompts(
            point_coords, point_labels, box, mask_input, normalize_coords,
            img_idx)
        image_embed = self._features["image_embed"][img_idx][None]
        high_res = [f[img_idx][None] for f in self._features["high_res_feats"]]
        masks, ious, low_res = self._decode(
            self.params,
            image_embed, tuple(high_res), jnp.asarray(coords),
            jnp.asarray(labels), jnp.asarray(m),
            multimask_output=multimask_output,
            has_mask=mask_input is not None,
            orig_hw=tuple(self._orig_hw[img_idx]),
            return_logits=bool(return_logits))
        masks_np = np.asarray(masks[0])
        if not return_logits:  # unpack the in-graph bit-packing
            w = self._orig_hw[img_idx][1]
            masks_np = np.unpackbits(
                masks_np, axis=-1)[..., :w].astype(bool)
        return (masks_np, np.asarray(ious[0]), np.asarray(low_res[0]))

    def predict_batch(self, point_coords_batch=None, point_labels_batch=None,
                      box_batch=None, mask_input_batch=None,
                      multimask_output: bool = True,
                      return_logits: bool = False,
                      normalize_coords: bool = True):
        """Per-image prompts against a batch set with set_image_batch."""
        assert self._is_batch, "predict_batch requires set_image_batch"
        n = len(self._orig_hw)

        def get(lst, i):
            return None if lst is None else lst[i]

        all_masks, all_ious, all_low = [], [], []
        for i in range(n):
            m, io, lo = self._predict_idx(
                get(point_coords_batch, i), get(point_labels_batch, i),
                get(box_batch, i), get(mask_input_batch, i),
                multimask_output, return_logits, normalize_coords, img_idx=i)
            all_masks.append(m)
            all_ious.append(io)
            all_low.append(lo)
        return all_masks, all_ious, all_low

    def get_image_embedding(self):
        if not self._is_image_set:
            raise RuntimeError("set_image must be called first")
        return self._features["image_embed"]

    def reset_predictor(self) -> None:
        self._is_image_set = False
        self._features = None
        self._orig_hw = []
        self._is_batch = False
