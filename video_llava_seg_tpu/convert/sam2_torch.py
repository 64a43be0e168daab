"""Convert SAM2 torch checkpoints (Meta's sam2.1 state dicts, key layout as
loaded by sam2/build_sam.py:141-151) into this framework's param pytrees.

Layout changes:
  torch Linear weight [out, in]        -> kernel [in, out]
  torch Conv2d weight OIHW             -> HWIO
  torch ConvTranspose2d weight IOHW    -> HWIO
  NCHW positional buffers              -> NHWC
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from video_llava_seg_tpu.models.sam2.config import SAM2Config


def _t(x):
    return jnp.asarray(np.asarray(x))


def _lin(sd, prefix):
    p = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _conv(sd, prefix):
    p = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _convT(sd, prefix):
    # torch ConvTranspose2d (IOHW) == jax conv_transpose with the spatial
    # axes flipped (jax does not flip the kernel; torch's transposed conv
    # effectively does)
    w = np.asarray(sd[f"{prefix}.weight"])[:, :, ::-1, ::-1]
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1).copy())}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix, n):
    return {"layers": [_lin(sd, f"{prefix}.layers.{i}") for i in range(n)]}


def convert_hiera(sd: Mapping, prefix: str = "") -> Dict:
    """Hiera trunk state dict -> params (see models/sam2/hiera.init)."""
    g = lambda k: sd[prefix + k]  # noqa: E731
    num_blocks = 0
    while f"{prefix}blocks.{num_blocks}.norm1.weight" in sd:
        num_blocks += 1
    blocks = []
    for i in range(num_blocks):
        b = f"{prefix}blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "qkv": _lin(sd, f"{b}.attn.qkv"),
            "proj_attn": _lin(sd, f"{b}.attn.proj"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": _mlp(sd, f"{b}.mlp", 2),
        }
        if f"{b}.proj.weight" in sd:
            blk["proj"] = _lin(sd, f"{b}.proj")
        blocks.append(blk)
    return {
        "patch_embed": _conv(sd, f"{prefix}patch_embed.proj"),
        "pos_embed": _t(g("pos_embed")).transpose(0, 2, 3, 1),
        "pos_embed_window": _t(g("pos_embed_window")).transpose(0, 2, 3, 1),
        "blocks": blocks,
    }


def convert_image_encoder(sd: Mapping, prefix: str = "image_encoder.") -> Dict:
    num_convs = 0
    while f"{prefix}neck.convs.{num_convs}.conv.weight" in sd:
        num_convs += 1
    return {
        "trunk": convert_hiera(sd, f"{prefix}trunk."),
        "neck": {"convs": [_conv(sd, f"{prefix}neck.convs.{i}.conv")
                           for i in range(num_convs)]},
    }


def convert_prompt_encoder(sd: Mapping,
                           prefix: str = "sam_prompt_encoder.") -> Dict:
    pts = [np.asarray(sd[f"{prefix}point_embeddings.{i}.weight"])[0]
           for i in range(4)]
    return {
        "pe_layer": {"gaussian_matrix": _t(
            sd[f"{prefix}pe_layer.positional_encoding_gaussian_matrix"])},
        "point_embeddings": jnp.asarray(np.stack(pts, axis=0)),
        "not_a_point_embed": _t(sd[f"{prefix}not_a_point_embed.weight"]),
        "no_mask_embed": _t(sd[f"{prefix}no_mask_embed.weight"]),
        "mask_downscaling": {
            "conv1": _conv(sd, f"{prefix}mask_downscaling.0"),
            "ln1": _ln(sd, f"{prefix}mask_downscaling.1"),
            "conv2": _conv(sd, f"{prefix}mask_downscaling.3"),
            "ln2": _ln(sd, f"{prefix}mask_downscaling.4"),
            "conv3": _conv(sd, f"{prefix}mask_downscaling.6"),
        },
    }


def _attn(sd, prefix):
    return {
        "q_proj": _lin(sd, f"{prefix}.q_proj"),
        "k_proj": _lin(sd, f"{prefix}.k_proj"),
        "v_proj": _lin(sd, f"{prefix}.v_proj"),
        "out_proj": _lin(sd, f"{prefix}.out_proj"),
    }


def convert_mask_decoder(sd: Mapping, cfg: SAM2Config,
                         prefix: str = "sam_mask_decoder.") -> Dict:
    num_mask_tokens = cfg.num_multimask_outputs + 1
    layers = []
    for i in range(cfg.twoway_depth):
        b = f"{prefix}transformer.layers.{i}"
        layers.append({
            "self_attn": _attn(sd, f"{b}.self_attn"),
            "norm1": _ln(sd, f"{b}.norm1"),
            "cross_attn_t2i": _attn(sd, f"{b}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": _mlp(sd, f"{b}.mlp", 2),
            "norm3": _ln(sd, f"{b}.norm3"),
            "norm4": _ln(sd, f"{b}.norm4"),
            "cross_attn_i2t": _attn(sd, f"{b}.cross_attn_image_to_token"),
        })
    p = {
        "transformer": {
            "layers": layers,
            "final_attn": _attn(sd,
                                f"{prefix}transformer.final_attn_token_to_image"),
            "norm_final": _ln(sd, f"{prefix}transformer.norm_final_attn"),
        },
        "iou_token": _t(sd[f"{prefix}iou_token.weight"]),
        "mask_tokens": _t(sd[f"{prefix}mask_tokens.weight"]),
        "output_upscaling": {
            "dc1": _convT(sd, f"{prefix}output_upscaling.0"),
            "ln": _ln(sd, f"{prefix}output_upscaling.1"),
            "dc2": _convT(sd, f"{prefix}output_upscaling.3"),
        },
        "output_hypernetworks_mlps": [
            _mlp(sd, f"{prefix}output_hypernetworks_mlps.{i}", 3)
            for i in range(num_mask_tokens)
        ],
        "iou_prediction_head": _mlp(sd, f"{prefix}iou_prediction_head",
                                    cfg.iou_head_depth),
    }
    if f"{prefix}conv_s0.weight" in sd:
        p["conv_s0"] = _conv(sd, f"{prefix}conv_s0")
        p["conv_s1"] = _conv(sd, f"{prefix}conv_s1")
    if f"{prefix}obj_score_token.weight" in sd:
        p["obj_score_token"] = _t(sd[f"{prefix}obj_score_token.weight"])
        if f"{prefix}pred_obj_score_head.layers.0.weight" in sd:
            p["pred_obj_score_head"] = _mlp(
                sd, f"{prefix}pred_obj_score_head", 3)
        else:
            p["pred_obj_score_head"] = _lin(sd,
                                            f"{prefix}pred_obj_score_head")
    return p


def convert_memory_encoder(sd: Mapping,
                           prefix: str = "memory_encoder.") -> Dict:
    layers = []
    for i in range(4):
        base_i = 3 * i
        layers.append({
            "conv": _conv(sd, f"{prefix}mask_downsampler.encoder.{base_i}"),
            "ln": _ln(sd, f"{prefix}mask_downsampler.encoder.{base_i + 1}"),
        })
    p = {
        "mask_downsampler": {
            "layers": layers,
            "final": _conv(sd, f"{prefix}mask_downsampler.encoder.12"),
        },
        "pix_feat_proj": _conv(sd, f"{prefix}pix_feat_proj"),
        "fuser": {"layers": []},
    }
    i = 0
    while f"{prefix}fuser.layers.{i}.dwconv.weight" in sd:
        b = f"{prefix}fuser.layers.{i}"
        p["fuser"]["layers"].append({
            "dwconv": _conv(sd, f"{b}.dwconv"),
            "norm": _ln(sd, f"{b}.norm"),
            "pwconv1": _lin(sd, f"{b}.pwconv1"),
            "pwconv2": _lin(sd, f"{b}.pwconv2"),
            "gamma": _t(sd[f"{b}.gamma"]),
        })
        i += 1
    if f"{prefix}out_proj.weight" in sd:
        p["out_proj"] = _conv(sd, f"{prefix}out_proj")
    return p


def convert_memory_attention(sd: Mapping, cfg: SAM2Config,
                             prefix: str = "memory_attention.") -> Dict:
    layers = []
    for i in range(cfg.memory_attention.num_layers):
        b = f"{prefix}layers.{i}"
        layers.append({
            "self_attn": _attn(sd, f"{b}.self_attn"),
            "cross_attn_image": _attn(sd, f"{b}.cross_attn_image"),
            "linear1": _lin(sd, f"{b}.linear1"),
            "linear2": _lin(sd, f"{b}.linear2"),
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "norm3": _ln(sd, f"{b}.norm3"),
        })
    return {"layers": layers, "norm": _ln(sd, f"{prefix}norm")}


def convert_sam2_base(sd: Mapping, cfg: SAM2Config) -> Dict:
    """Full SAM2Base state dict -> framework params."""
    p = {
        "image_encoder": convert_image_encoder(sd),
        "prompt_encoder": convert_prompt_encoder(sd),
        "mask_decoder": convert_mask_decoder(sd, cfg),
        "memory_attention": convert_memory_attention(sd, cfg),
        "memory_encoder": convert_memory_encoder(sd),
        "no_mem_embed": _t(sd["no_mem_embed"]),
        "no_mem_pos_enc": _t(sd["no_mem_pos_enc"]),
        "maskmem_tpos_enc": _t(sd["maskmem_tpos_enc"]),
    }
    # conv_s0/s1 live inside the mask decoder's params but are applied in
    # forward_image, mirroring the reference weight layout exactly.
    if "mask_downsample.weight" in sd:
        p["mask_downsample"] = _conv(sd, "mask_downsample")
    if "obj_ptr_proj.layers.0.weight" in sd:
        p["obj_ptr_proj"] = _mlp(sd, "obj_ptr_proj", 3)
    elif "obj_ptr_proj.weight" in sd:
        p["obj_ptr_proj"] = _lin(sd, "obj_ptr_proj")
    if "obj_ptr_tpos_proj.weight" in sd:
        p["obj_ptr_tpos_proj"] = _lin(sd, "obj_ptr_tpos_proj")
    if "no_obj_ptr" in sd:
        p["no_obj_ptr"] = _t(sd["no_obj_ptr"])
    if "no_obj_embed_spatial" in sd:
        p["no_obj_embed_spatial"] = _t(sd["no_obj_embed_spatial"])
    return p
