"""SAM2 model configs — dataclass equivalents of the reference's Hydra YAMLs
(sam2/configs/sam2.1/sam2.1_hiera_{t,s,b+,l}.yaml, sam2/build_sam.py:50-138).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class HieraConfig:
    """Hierarchical ViT trunk (sam2/modeling/backbones/hieradet.py:169-266)."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    q_pool: int = 3
    q_stride: Tuple[int, int] = (2, 2)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    mlp_ratio: float = 4.0
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3

    @property
    def depth(self) -> int:
        return sum(self.stages)

    @property
    def stage_ends(self) -> Tuple[int, ...]:
        s = []
        total = 0
        for n in self.stages:
            total += n
            s.append(total - 1)
        return tuple(s)

    @property
    def q_pool_blocks(self) -> Tuple[int, ...]:
        return tuple(e + 1 for e in self.stage_ends[:-1])[: self.q_pool]

    @property
    def channel_list(self) -> Tuple[int, ...]:
        """Per-stage output dims, lowest-res first (reversed), matching the
        trunk.channel_list the neck consumes."""
        dims = []
        d = self.embed_dim
        for i in range(len(self.stages)):
            if i > 0:
                d = int(d * self.dim_mul)
            dims.append(d)
        return tuple(reversed(dims))


@dataclass(frozen=True)
class FpnConfig:
    d_model: int = 256
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    fpn_interp_model: str = "nearest"
    fuse_type: str = "sum"
    scalp: int = 1
    pos_num_feats: int = 256
    pos_temperature: int = 10000


@dataclass(frozen=True)
class MemoryAttentionConfig:
    d_model: int = 256
    num_layers: int = 4
    num_heads: int = 1
    dim_feedforward: int = 2048
    rope_theta: float = 10000.0
    rope_feat_size: int = 64  # 64x64 grid for 1024 input
    kv_in_dim: int = 64
    pos_enc_at_input: bool = True
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False


@dataclass(frozen=True)
class MemoryEncoderConfig:
    out_dim: int = 64
    in_dim: int = 256
    mask_downsampler_embed_dim: int = 256
    fuser_layers: int = 2
    pos_num_feats: int = 64


@dataclass(frozen=True)
class SAM2Config:
    """Full SAM2 model (sam2/modeling/sam2_base.py:22-196 semantics,
    sam2.1 flag set)."""

    name: str = "sam2.1-hiera-small"
    hiera: HieraConfig = field(default_factory=HieraConfig)
    fpn: FpnConfig = field(default_factory=FpnConfig)
    memory_attention: MemoryAttentionConfig = field(
        default_factory=MemoryAttentionConfig)
    memory_encoder: MemoryEncoderConfig = field(
        default_factory=MemoryEncoderConfig)

    image_size: int = 1024
    backbone_stride: int = 16
    num_maskmem: int = 7
    mem_dim: int = 64
    hidden_dim: int = 256

    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    binarize_mask_from_pts_for_mem_enc: bool = False
    use_mask_input_as_output_without_sam: bool = True
    max_cond_frames_in_attn: int = -1
    directly_add_no_mem_embed: bool = True
    use_high_res_features_in_sam: bool = True
    multimask_output_in_sam: bool = True
    multimask_min_pt_num: int = 0
    multimask_max_pt_num: int = 1
    multimask_output_for_tracking: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    iou_prediction_use_sigmoid: bool = True
    memory_temporal_stride_for_eval: int = 1
    non_overlap_masks_for_mem_enc: bool = False
    use_obj_ptrs_in_encoder: bool = True
    max_obj_ptrs_in_encoder: int = 16
    add_tpos_enc_to_obj_ptrs: bool = True
    proj_tpos_enc_in_obj_ptrs: bool = True
    use_signed_tpos_enc_to_obj_ptrs: bool = True
    only_obj_ptrs_in_the_past_for_eval: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    fixed_no_obj_ptr: bool = True
    soft_no_obj_ptr: bool = False
    use_mlp_for_obj_ptr_proj: bool = True
    no_obj_embed_spatial: bool = True

    # mask decoder
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    twoway_depth: int = 2
    twoway_heads: int = 8
    twoway_mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    mask_in_chans: int = 16
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98

    @property
    def image_embedding_size(self) -> int:
        return self.image_size // self.backbone_stride

    @property
    def num_feature_levels(self) -> int:
        return 3 if self.use_high_res_features_in_sam else 1


_HIERA_VARIANTS = {
    "tiny": HieraConfig(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                        global_att_blocks=(5, 7, 9),
                        window_pos_embed_bkg_spatial_size=(7, 7)),
    "small": HieraConfig(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                         global_att_blocks=(7, 10, 13),
                         window_pos_embed_bkg_spatial_size=(7, 7)),
    "base_plus": HieraConfig(embed_dim=112, num_heads=2),
    "large": HieraConfig(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
                         global_att_blocks=(23, 33, 43),
                         window_spec=(8, 4, 16, 8)),
}

_ALIASES = {
    "t": "tiny", "hiera_t": "tiny", "sam2.1-hiera-tiny": "tiny",
    "facebook/sam2.1-hiera-tiny": "tiny",
    "s": "small", "hiera_s": "small", "sam2.1-hiera-small": "small",
    "facebook/sam2.1-hiera-small": "small",
    "b+": "base_plus", "hiera_b+": "base_plus",
    "sam2.1-hiera-base-plus": "base_plus",
    "facebook/sam2.1-hiera-base-plus": "base_plus",
    "l": "large", "hiera_l": "large", "sam2.1-hiera-large": "large",
    "facebook/sam2.1-hiera-large": "large",
}

# SAM2 v2.0 checkpoint family (sam2/configs/sam2/sam2_hiera_*.yaml;
# hub map sam2/build_sam.py:14-31). Same trunks; the generation differs
# ONLY in four flags the 2.1 yamls added (diff of the two yaml families):
# no_obj_embed_spatial, add_tpos_enc_to_obj_ptrs, proj_tpos_enc_in_obj_ptrs,
# use_signed_tpos_enc_to_obj_ptrs — all absent/false in 2.0.
_ALIASES_V20 = {
    "sam2-hiera-tiny": "tiny", "facebook/sam2-hiera-tiny": "tiny",
    "sam2-hiera-t": "tiny",
    "sam2-hiera-small": "small", "facebook/sam2-hiera-small": "small",
    "sam2-hiera-s": "small",
    "sam2-hiera-base-plus": "base_plus", "sam2-hiera-b+": "base_plus",
    "facebook/sam2-hiera-base-plus": "base_plus",
    "sam2-hiera-large": "large", "facebook/sam2-hiera-large": "large",
    "sam2-hiera-l": "large",
}

V20_FLAGS = dict(no_obj_embed_spatial=False,
                 add_tpos_enc_to_obj_ptrs=False,
                 proj_tpos_enc_in_obj_ptrs=False,
                 use_signed_tpos_enc_to_obj_ptrs=False)


def sam2_config(variant: str = "small", image_size: int = 1024,
                **overrides) -> SAM2Config:
    """Build a SAM2Config for a named variant (tiny/small/base_plus/large,
    or any reference checkpoint alias like 'facebook/sam2.1-hiera-small')."""
    if variant in ("sam2-test-tiny", "test-tiny"):
        # CPU-testable miniature, resolvable through SegHeadConfig
        # .seg_backbone so composition tests thread the tiny backbone
        # through make_sam2_cfg like any real variant
        cfg = sam2_tiny_test_config()
        if image_size != cfg.image_size and image_size != 1024:
            cfg = dataclasses.replace(cfg, image_size=image_size)
        return dataclasses.replace(cfg, **overrides) if overrides else cfg
    if variant in _ALIASES_V20:
        key = _ALIASES_V20[variant]
        return SAM2Config(name=f"sam2-hiera-{key}",
                          hiera=_HIERA_VARIANTS[key], image_size=image_size,
                          **{**V20_FLAGS, **overrides})
    key = _ALIASES.get(variant, variant)
    if key not in _HIERA_VARIANTS:
        raise ValueError(f"unknown SAM2 variant: {variant}")
    return SAM2Config(name=f"sam2.1-hiera-{key}", hiera=_HIERA_VARIANTS[key],
                      image_size=image_size, **overrides)


def sam2_tiny_test_config() -> SAM2Config:
    """CPU-testable miniature with the same topology (image_size 128)."""
    hiera = HieraConfig(embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
                        global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
                        window_pos_embed_bkg_spatial_size=(7, 7))
    return SAM2Config(
        name="sam2-test-tiny", hiera=hiera,
        fpn=FpnConfig(d_model=64, pos_num_feats=64),
        memory_attention=MemoryAttentionConfig(
            d_model=64, num_layers=2, dim_feedforward=128, kv_in_dim=16,
            rope_feat_size=8),
        memory_encoder=MemoryEncoderConfig(out_dim=16, in_dim=64,
                                           mask_downsampler_embed_dim=64,
                                           pos_num_feats=16),
        image_size=128, hidden_dim=64, mem_dim=16,
        twoway_mlp_dim=128, iou_head_hidden_dim=64, max_obj_ptrs_in_encoder=4)
