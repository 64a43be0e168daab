"""SAM2 base model: composition of image encoder, prompt encoder, mask
decoder, memory attention and memory encoder.

Functional parity with sam2/modeling/sam2_base.py (init 22-196,
_forward_sam_heads 257-413, _encode_new_memory 676-724, non-overlap 889-907),
re-expressed with static shapes and NHWC features. The dict-driven memory
bank logic (497-674) lives in video_predictor.py as a fixed-slot structure.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.models.sam2 import (
    image_encoder,
    mask_decoder,
    memory,
    prompt_encoder,
)
from video_llava_seg_tpu.models.sam2.config import SAM2Config
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.resize import interpolate_hw

# Placeholder score for missing objects (sam2_base.py NO_OBJ_SCORE)
NO_OBJ_SCORE = -1024.0


def init(key, cfg: SAM2Config, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 12)
    c = cfg.hidden_dim
    p = {
        "image_encoder": image_encoder.init(ks[0], cfg, dtype),
        "prompt_encoder": prompt_encoder.init(ks[1], cfg, dtype),
        "mask_decoder": mask_decoder.init(ks[2], cfg, dtype),
        "memory_attention": memory.memory_attention_init(ks[3], cfg, dtype),
        "memory_encoder": memory.memory_encoder_init(ks[4], cfg, dtype),
        "no_mem_embed": nn.trunc_normal(ks[5], (1, 1, c), 0.02, dtype),
        "no_mem_pos_enc": nn.trunc_normal(ks[6], (1, 1, c), 0.02, dtype),
        "maskmem_tpos_enc": nn.trunc_normal(
            ks[7], (cfg.num_maskmem, 1, 1, cfg.mem_dim), 0.02, dtype),
    }
    if cfg.use_obj_ptrs_in_encoder:
        p["mask_downsample"] = nn.conv2d_init(ks[8], 1, 1, (4, 4),
                                              dtype=dtype)
        if cfg.use_mlp_for_obj_ptr_proj:
            p["obj_ptr_proj"] = nn.mlp_init(ks[9], [c, c, c], dtype=dtype)
        else:
            p["obj_ptr_proj"] = nn.dense_init(ks[9], c, c, dtype=dtype)
        if cfg.pred_obj_scores:
            p["no_obj_ptr"] = nn.trunc_normal(ks[10], (1, c), 0.02, dtype)
    if cfg.proj_tpos_enc_in_obj_ptrs:
        p["obj_ptr_tpos_proj"] = nn.dense_init(ks[11], c, cfg.mem_dim,
                                               dtype=dtype)
    if cfg.no_obj_embed_spatial:
        p["no_obj_embed_spatial"] = nn.trunc_normal(
            jax.random.fold_in(key, 99), (1, cfg.mem_dim), 0.02, dtype)
    return p


# ---------------------------------------------------------------------------
# image features
# ---------------------------------------------------------------------------

def forward_image(params, cfg: SAM2Config, images, interpret: bool = False):
    """images: [B, H, W, 3] normalized -> backbone dict with the SAM decoder's
    high-res projections precomputed (sam2_base.py:467-478)."""
    out = image_encoder.apply(params["image_encoder"], cfg, images, interpret)
    if cfg.use_high_res_features_in_sam:
        fpn = list(out["backbone_fpn"])
        fpn[0] = nn.conv2d(params["mask_decoder"]["conv_s0"], fpn[0])
        fpn[1] = nn.conv2d(params["mask_decoder"]["conv_s1"], fpn[1])
        out["backbone_fpn"] = fpn
    return out


def prepare_backbone_features(cfg: SAM2Config, backbone_out):
    """Select the last num_feature_levels maps (NHWC, high->low res)."""
    n = cfg.num_feature_levels
    feats = backbone_out["backbone_fpn"][-n:]
    pos = backbone_out["vision_pos_enc"][-n:]
    sizes = [(f.shape[1], f.shape[2]) for f in feats]
    return feats, pos, sizes


# ---------------------------------------------------------------------------
# SAM heads
# ---------------------------------------------------------------------------

def forward_sam_heads(params, cfg: SAM2Config, backbone_features,
                      point_coords=None, point_labels=None,
                      mask_inputs=None, high_res_features=None,
                      multimask_output: bool = False,
                      interpret: bool = False):
    """_forward_sam_heads parity (sam2_base.py:257-413), NHWC features.

    backbone_features: [B, H, W, C]; point_coords [B, P, 2] / labels [B, P]
    (pass None for the reference's empty-point path); mask_inputs
    [B, 16H, 16W, 1] float logits/binary.

    Returns (low_res_multimasks, high_res_multimasks, ious, low_res_masks,
    high_res_masks, obj_ptr, object_score_logits); masks are [B, M, h, w]."""
    b = backbone_features.shape[0]
    s = cfg.image_embedding_size
    if point_coords is None:
        point_coords = jnp.zeros((b, 1, 2), jnp.float32)
        point_labels = -jnp.ones((b, 1), jnp.int32)
    else:
        # the reference prompt encoder pads points with an extra (-1) point
        # whenever no boxes are passed (prompt_encoder.py:89-94); this path
        # never passes boxes
        point_coords = jnp.concatenate(
            [point_coords, jnp.zeros((b, 1, 2), point_coords.dtype)], axis=1)
        point_labels = jnp.concatenate(
            [point_labels, -jnp.ones((b, 1), point_labels.dtype)], axis=1)

    sam_mask_prompt = None
    if mask_inputs is not None:
        target = cfg.image_embedding_size * 4
        if mask_inputs.shape[1] != target:
            m = interpolate_hw(mask_inputs[..., 0].astype(jnp.float32),
                               (target, target), "bilinear", antialias=True)
            sam_mask_prompt = m[..., None]
        else:
            sam_mask_prompt = mask_inputs.astype(jnp.float32)

    sparse, dense = prompt_encoder.apply(
        params["prompt_encoder"], cfg, point_coords, point_labels,
        masks=sam_mask_prompt)
    image_pe = prompt_encoder.get_dense_pe(params["prompt_encoder"], cfg)

    low_res_multimasks, ious, sam_output_tokens, object_score_logits = (
        mask_decoder.apply(
            params["mask_decoder"], cfg, backbone_features, image_pe, sparse,
            dense, multimask_output=multimask_output,
            high_res_features=high_res_features, interpret=interpret))

    if cfg.pred_obj_scores:
        is_obj_appearing = object_score_logits > 0
        low_res_multimasks = jnp.where(is_obj_appearing[:, None, None],
                                       low_res_multimasks, NO_OBJ_SCORE)
    low_res_multimasks = low_res_multimasks.astype(jnp.float32)
    high_res_multimasks = interpolate_hw(
        low_res_multimasks, (cfg.image_size, cfg.image_size), "bilinear")

    sam_output_token = sam_output_tokens[:, 0]
    if multimask_output:
        best = jnp.argmax(ious, axis=-1)
        bi = jnp.arange(b)
        low_res_masks = low_res_multimasks[bi, best][:, None]
        high_res_masks = high_res_multimasks[bi, best][:, None]
        if sam_output_tokens.shape[1] > 1:
            sam_output_token = sam_output_tokens[bi, best]
    else:
        low_res_masks, high_res_masks = low_res_multimasks, high_res_multimasks

    if cfg.use_obj_ptrs_in_encoder:
        if cfg.use_mlp_for_obj_ptr_proj:
            obj_ptr = nn.mlp_apply(params["obj_ptr_proj"], sam_output_token)
        else:
            obj_ptr = nn.dense(params["obj_ptr_proj"], sam_output_token)
    else:
        obj_ptr = sam_output_token
    if cfg.pred_obj_scores:
        if cfg.soft_no_obj_ptr:
            lam = jax.nn.sigmoid(object_score_logits)
        else:
            lam = is_obj_appearing.astype(obj_ptr.dtype)
        if cfg.fixed_no_obj_ptr:
            obj_ptr = lam * obj_ptr
        obj_ptr = obj_ptr + (1.0 - lam) * params["no_obj_ptr"]

    return (low_res_multimasks, high_res_multimasks, ious, low_res_masks,
            high_res_masks, obj_ptr, object_score_logits)


def use_mask_as_output(params, cfg: SAM2Config, backbone_features,
                       high_res_features, mask_inputs):
    """_use_mask_as_output parity: turn a binary mask input directly into
    output logits (+/-10), with an obj_ptr decoded from the mask."""
    out_scale, out_bias = 20.0, -10.0
    mask_f = mask_inputs.astype(jnp.float32)          # [B, H, W, 1]
    high_res_masks = (mask_f * out_scale + out_bias)[..., 0][:, None]
    low_res_masks = interpolate_hw(
        high_res_masks,
        (high_res_masks.shape[-2] // 4, high_res_masks.shape[-1] // 4),
        "bilinear", antialias=True)
    ious = jnp.ones((mask_f.shape[0], 1), jnp.float32)
    if not cfg.use_obj_ptrs_in_encoder:
        obj_ptr = jnp.zeros((mask_f.shape[0], cfg.hidden_dim), jnp.float32)
    else:
        small = nn.conv2d(params["mask_downsample"], mask_f, stride=(4, 4),
                          padding="VALID")
        _, _, _, _, _, obj_ptr, _ = forward_sam_heads(
            params, cfg, backbone_features, mask_inputs=small,
            high_res_features=high_res_features)
    is_obj = jnp.any(mask_f.reshape(mask_f.shape[0], -1) > 0.0,
                     axis=1)[..., None]
    lam = is_obj.astype(jnp.float32)
    object_score_logits = out_scale * lam + out_bias
    if cfg.pred_obj_scores:
        if cfg.fixed_no_obj_ptr:
            obj_ptr = lam * obj_ptr
        obj_ptr = obj_ptr + (1.0 - lam) * params["no_obj_ptr"]
    return (low_res_masks, high_res_masks, ious, low_res_masks,
            high_res_masks, obj_ptr, object_score_logits)


# ---------------------------------------------------------------------------
# memory encoding
# ---------------------------------------------------------------------------

def encode_new_memory(params, cfg: SAM2Config, pix_feat, high_res_masks,
                      object_score_logits, is_mask_from_pts: bool = False):
    """_encode_new_memory parity. pix_feat: [B, H, W, C];
    high_res_masks: [B, 1, 16H, 16W] logits. Returns
    (maskmem_features [B, H, W, mem_dim], maskmem_pos_enc [H, W, mem_dim])."""
    if cfg.non_overlap_masks_for_mem_enc:
        high_res_masks = apply_non_overlapping_constraints(high_res_masks)
    binarize = cfg.binarize_mask_from_pts_for_mem_enc and is_mask_from_pts
    if binarize:
        mask_for_mem = (high_res_masks > 0).astype(jnp.float32)
    else:
        mask_for_mem = jax.nn.sigmoid(high_res_masks)
    mask_for_mem = (mask_for_mem * cfg.sigmoid_scale_for_mem_enc
                    + cfg.sigmoid_bias_for_mem_enc)
    mask_nhwc = mask_for_mem[:, 0][..., None]
    feats, pos = memory.memory_encoder_apply(
        params["memory_encoder"], cfg, pix_feat, mask_nhwc,
        skip_mask_sigmoid=True)
    if cfg.no_obj_embed_spatial:
        is_obj = (object_score_logits > 0).astype(feats.dtype)  # [B, 1]
        feats = feats + (1.0 - is_obj)[:, :, None, None] * \
            params["no_obj_embed_spatial"].reshape(1, 1, 1, -1)
    return feats, pos


def apply_non_overlapping_constraints(pred_masks):
    """Keep only the highest-scoring object per pixel (sam2_base.py:889-907).
    pred_masks: [N_obj, 1, H, W]."""
    n = pred_masks.shape[0]
    if n == 1:
        return pred_masks
    max_obj = jnp.argmax(pred_masks, axis=0, keepdims=True)
    obj_ids = jnp.arange(n)[:, None, None, None]
    keep = max_obj == obj_ids
    return jnp.where(keep, pred_masks, jnp.clip(pred_masks, a_max=-10.0))
