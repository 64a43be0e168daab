"""[SEG]-token-driven SAM2 segmentation head.

Parity target: llava/model/seg_head/sam2.py (SegmentationHeadSAM2) — the
core novel component of Video-LLaVA-Seg. Each [SEG] token's LLM hidden state
is projected to Q sparse prompt embeddings; the SAM2 mask decoder decodes a
mask per (object-query, frame) against per-frame Hiera features.

TPU-first difference: the reference loops python-side over frames
(sam2.py:102-124); here the decode batches all (frames x objects x queries)
pairs through one mask-decoder call with broadcast image/prompt embeddings —
a single MXU-friendly batched program."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import SegHeadConfig
from video_llava_seg_tpu.models.sam2 import (
    image_encoder as sam2_image_encoder,
    mask_decoder as sam2_mask_decoder,
    prompt_encoder as sam2_prompt_encoder,
)
from video_llava_seg_tpu.models.sam2.config import SAM2Config, sam2_config
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.resize import interpolate_hw

IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


def make_sam2_cfg(cfg: SegHeadConfig) -> SAM2Config:
    return sam2_config(cfg.seg_backbone, image_size=cfg.image_size)


def init(key, cfg: SegHeadConfig, llm_hidden_size: int,
         sam2_cfg: Optional[SAM2Config] = None, dtype=jnp.float32):
    sam2_cfg = sam2_cfg or make_sam2_cfg(cfg)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "image_encoder": sam2_image_encoder.init(k1, sam2_cfg, dtype),
        "prompt_encoder": sam2_prompt_encoder.init(k2, sam2_cfg, dtype),
        "mask_decoder": sam2_mask_decoder.init(k3, sam2_cfg, dtype),
        "no_mem_embed": nn.trunc_normal(k4, (1, 1, sam2_cfg.hidden_dim),
                                        0.02, dtype),
        "proj_token": nn.dense_init(
            k5, llm_hidden_size, sam2_cfg.hidden_dim * cfg.seg_num_queries,
            dtype=dtype),
    }


def convert_torch(sd, cfg: SegHeadConfig, sam2_cfg: SAM2Config,
                  prefix: str = "", no_mem_embed=None) -> Dict:
    """Torch SegmentationHeadSAM2 state dict -> params (keys:
    image_encoder.*, prompt_encoder.*, mask_decoder.*, no_mem_embed,
    proj_token).

    no_mem_embed: the reference head holds it as a PLAIN tensor attribute
    (llava/model/seg_head/sam2.py:24), so a saved LLaVA checkpoint does
    NOT contain it — the reference re-obtains it from the hub SAM2
    checkpoint at build time (sam2.py:15). Real-checkpoint callers must
    pass it here (from the SAM2 backbone checkpoint's 'no_mem_embed'
    param); test fixtures save it into sd directly."""
    import numpy as np

    from video_llava_seg_tpu.convert.sam2_torch import (
        convert_image_encoder,
        convert_mask_decoder,
        convert_prompt_encoder,
    )

    if f"{prefix}no_mem_embed" in sd:
        no_mem = np.asarray(sd[f"{prefix}no_mem_embed"])
    elif no_mem_embed is not None:
        no_mem = np.asarray(no_mem_embed)
    else:
        raise KeyError(
            "no_mem_embed is not in the seg-head state dict (the reference "
            "stores it as a non-persistent attribute, "
            "llava/model/seg_head/sam2.py:24) — pass the SAM2 backbone "
            "checkpoint's no_mem_embed via the no_mem_embed= argument "
            "(load_llava_weights(sam2_dir=...) / golden_parity --sam2_ckpt)")
    if no_mem.ndim == 4:  # stored as [1, C, 1, 1] in the reference head
        no_mem = no_mem.reshape(1, 1, -1)
    return {
        "image_encoder": convert_image_encoder(sd,
                                               f"{prefix}image_encoder."),
        "prompt_encoder": convert_prompt_encoder(sd,
                                                 f"{prefix}prompt_encoder."),
        "mask_decoder": convert_mask_decoder(sd, sam2_cfg,
                                             f"{prefix}mask_decoder."),
        "no_mem_embed": jnp.asarray(no_mem),
        "proj_token": {
            "kernel": jnp.asarray(
                np.asarray(sd[f"{prefix}proj_token.weight"])).T,
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}proj_token.bias"])),
        },
    }


def encode_video_frames(params, sam2_cfg: SAM2Config, frames,
                        interpret: bool = False):
    """frames: [T, H, W, 3] RGB in [0, 1] (seg head normalizes internally,
    sam2.py:33-47). Returns (backbone_feats [T, h, w, C], high_res list)."""
    mean = jnp.asarray(IMAGE_MEAN, frames.dtype)
    std = jnp.asarray(IMAGE_STD, frames.dtype)
    x = (frames - mean) / std
    out = sam2_image_encoder.apply(params["image_encoder"], sam2_cfg, x,
                                   interpret)
    fpn = out["backbone_fpn"]
    high_res = [
        nn.conv2d(params["mask_decoder"]["conv_s0"], fpn[0]),
        nn.conv2d(params["mask_decoder"]["conv_s1"], fpn[1]),
    ]
    feats = fpn[2] + params["no_mem_embed"].reshape(1, 1, 1, -1).astype(
        fpn[2].dtype)
    return feats, high_res


def decode_masks(params, cfg: SegHeadConfig, sam2_cfg: SAM2Config,
                 backbone_feats, high_res_feats, seg_tokens,
                 interpret: bool = False):
    """Decode masks for one video.

    backbone_feats: [T, h, w, C]; high_res_feats: list of [T, ., ., .];
    seg_tokens: [N, llm_hidden] ([SEG] hidden states for N objects).

    Returns low-res mask logits [N, Q, T, 4h, 4w] — PER QUERY: the
    reference takes the max over an object's Q queries only AFTER
    postprocess interpolation (sam2.py:102-128), and max does not commute
    with bilinear resize; callers postprocess then reduce."""
    out = decode_masks_batched(
        params, cfg, sam2_cfg, backbone_feats[None],
        [h[None] for h in high_res_feats], seg_tokens[None], interpret)
    return out[0]


def decode_masks_batched(params, cfg: SegHeadConfig, sam2_cfg: SAM2Config,
                         backbone_feats, high_res_feats, seg_tokens,
                         interpret: bool = False):
    """Decode masks for a BATCH of videos in one mask-decoder dispatch.

    backbone_feats: [B, T, h, w, C]; high_res_feats: list of [B, T, ...];
    seg_tokens: [B, N, llm_hidden]. Returns [B, N, Q, T, 4h, 4w] — the
    batched replacement for the reference's per-video/per-frame decode loop
    (llava/model/seg_head/sam2.py:102-124); the whole (B x T x N x Q)
    product runs as one flat decoder batch so compile time and dispatch
    count do not scale with the per-chip batch size. The Q axis stays
    unreduced: the reference maxes over queries AFTER its postprocess
    interpolation (sam2.py:126-128), so callers resize first, then max."""
    q = cfg.seg_num_queries
    bsz, t = backbone_feats.shape[:2]
    n = seg_tokens.shape[1]
    c = sam2_cfg.hidden_dim

    sparse = nn.dense(params["proj_token"], seg_tokens)     # [B, N, Q*C]
    sparse = sparse.reshape(bsz, n * q, 1, c)

    # dense prompt = no_mask_embed (prompt encoder with no inputs)
    s = sam2_cfg.image_embedding_size
    dense = jnp.broadcast_to(
        params["prompt_encoder"]["no_mask_embed"].reshape(1, 1, 1, c),
        (1, s, s, c))
    image_pe = sam2_prompt_encoder.get_dense_pe(params["prompt_encoder"],
                                                sam2_cfg)

    # flat batch layout [B, T, NQ]: image feats repeat over NQ, prompts
    # broadcast over T
    def tile_img(x):
        flat = x.reshape(bsz * t, *x.shape[2:])
        return jnp.repeat(flat, n * q, axis=0)              # [B*T*NQ, ...]

    img = tile_img(backbone_feats)
    hr = [tile_img(h) for h in high_res_feats]
    sp = jnp.broadcast_to(sparse[:, None], (bsz, t, n * q, 1, c)).reshape(
        bsz * t * n * q, 1, c)
    dn = jnp.broadcast_to(dense, (bsz * t * n * q, s, s, c))

    low_res, ious, _, _ = sam2_mask_decoder.apply(
        params["mask_decoder"], sam2_cfg, img, image_pe, sp, dn,
        multimask_output=False, high_res_features=hr, interpret=interpret)
    # [B*T*NQ, 1, 4s, 4s] -> [B, N, Q, T, 4s, 4s]
    low_res = low_res.reshape(bsz, t, n, q, 4 * s, 4 * s)
    return low_res.transpose(0, 2, 3, 1, 4, 5)


def postprocess_masks(masks, meta: Dict[str, Any], image_size: int,
                      resize_to_original_dims: bool):
    """Upscale to model res, unpad, optionally resize to original dims
    (sam2.py:133-182 parity). masks: [N, T, h, w]."""
    masks = interpolate_hw(masks.astype(jnp.float32),
                           (image_size, image_size), "bilinear")
    pl, pr, pt, pb = meta["padding"]
    h0, w0 = meta["resized_image_size"]
    masks = masks[..., pt:image_size - pb, pl:image_size - pr]
    assert masks.shape[-2:] == (h0, w0), (masks.shape, meta)
    if not resize_to_original_dims:
        return masks
    th, tw = meta["orig_image_size"]
    return interpolate_hw(masks, (th, tw), "bilinear")


def forward(params, cfg: SegHeadConfig, sam2_cfg: SAM2Config,
            video_frames: List, seg_tokens: List,
            seg_meta: List[Dict[str, Any]], resize_to_original_dims: bool,
            interpret: bool = False) -> List:
    """Reference forward (sam2.py:49-131): per-video list in, list of
    [N, T, H', W'] mask logits out. Frames in [0, 1] RGB, NHWC."""
    outputs = []
    for frames, tokens, meta in zip(video_frames, seg_tokens, seg_meta):
        feats, high_res = encode_video_frames(params, sam2_cfg, frames,
                                              interpret)
        low = decode_masks(params, cfg, sam2_cfg, feats, high_res, tokens,
                           interpret)                     # [N, Q, T, h, w]
        post = postprocess_masks(low, meta, sam2_cfg.image_size,
                                 resize_to_original_dims)
        # max over per-object queries AFTER postprocess (sam2.py:126-128;
        # max does not commute with the bilinear resizes above)
        outputs.append(jnp.max(post, axis=1))
    return outputs
