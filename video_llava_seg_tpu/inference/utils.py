"""Inference helpers (llava/inference/utils.py parity)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from video_llava_seg_tpu.ops.masks import encode_rle
from video_llava_seg_tpu.vision_utils import get_resize_padding_params


def preprocess_seg_inputs(seg_frames: np.ndarray, seg_meta: Dict[str, Any],
                          tgt_size: int, normalize: bool = False,
                          seg_masks: Optional[np.ndarray] = None,
                          pad_mode: str = "topleft"):
    """Resize long-dim->tgt + pad (utils.py:11-68 parity; normalize=False
    for the SAM2-backed head which normalizes internally).

    seg_frames: uint8 [T, H, W, 3]. Returns float32 NHWC frames in [0, 1]."""
    from video_llava_seg_tpu.ops.resize import resize_host

    x = seg_frames.astype(np.float32) / 255.0
    if normalize:
        mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
        x = (x - mean) / std
    h, w = x.shape[1:3]
    (nh, nw), (pl, pr, pt, pb) = get_resize_padding_params(
        h, w, tgt_size, pad_mode=pad_mode)
    x = resize_host(x.transpose(0, 3, 1, 2), (nh, nw), "bilinear")
    x = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    x = x.transpose(0, 2, 3, 1)
    out_masks = None
    if seg_masks is not None:
        m = resize_host(seg_masks.astype(np.float32), (nh, nw), "nearest")
        m = np.pad(m, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
        out_masks = m.astype(seg_masks.dtype)
    seg_meta["resized_image_size"] = (nh, nw)
    seg_meta["padding"] = (pl, pr, pt, pb)
    if out_masks is None:
        return x, seg_meta
    return x, out_masks, seg_meta


def mask_tensor_to_rle(mask_tensor: np.ndarray,
                       decode_utf8: bool = True) -> List[List[Dict]]:
    """[N, T, H, W] bool -> per-track, per-frame COCO RLEs (utils.py:71-85)."""
    assert mask_tensor.dtype in (bool, np.uint8, np.bool_)
    out = []
    for track in mask_tensor.astype(np.uint8):
        rles = []
        for frame in track:
            rle = encode_rle(frame)
            if decode_utf8:
                rle["counts"] = rle["counts"].decode("utf-8")
            rles.append(rle)
        out.append(rles)
    return out


def get_null_mask_rle(height: int, width: int, decode_utf8: bool = True):
    rle = encode_rle(np.zeros((height, width), np.uint8))
    if decode_utf8:
        rle["counts"] = rle["counts"].decode("utf-8")
    return rle
