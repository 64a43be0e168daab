"""Construct the REFERENCE torch SAM2 modules from a framework SAM2Config.

Used two ways:
- parity tests instantiate these with random weights as golden oracles
  (tests/test_sam2_memory_parity.py, test_seg_head.py);
- scripts/golden_parity.py instantiates them at REAL variant shape and
  `load_state_dict(strict=True)`s a real checkpoint into them (the same
  strictness contract as the reference loader, sam2/build_sam.py:141-151).

Call tests.reference_loader.load_reference_sam2() before importing these.
Constructor args mirror sam2/configs/sam2.1/sam2.1_hiera_{t,s,b+,l}.yaml.
"""

import torch


def ref_memory_encoder(cfg, seed: int = 10):
    from sam2.modeling.memory_encoder import (CXBlock, Fuser, MaskDownSampler,
                                              MemoryEncoder)
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    torch.manual_seed(seed)
    me = cfg.memory_encoder
    return MemoryEncoder(
        out_dim=me.out_dim,
        mask_downsampler=MaskDownSampler(
            embed_dim=me.mask_downsampler_embed_dim, kernel_size=3, stride=2,
            padding=1),
        fuser=Fuser(CXBlock(dim=me.in_dim, kernel_size=7, padding=3,
                            layer_scale_init_value=1e-6, use_dwconv=True),
                    num_layers=me.fuser_layers),
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=me.pos_num_feats, normalize=True, scale=None,
            temperature=10000),
        in_dim=me.in_dim).eval()


def ref_memory_attention(cfg, seed: int = 11):
    from sam2.modeling.memory_attention import (MemoryAttention,
                                                MemoryAttentionLayer)
    from sam2.modeling.sam.transformer import RoPEAttention

    torch.manual_seed(seed)
    ma = cfg.memory_attention
    fs = [ma.rope_feat_size, ma.rope_feat_size]
    layer = MemoryAttentionLayer(
        activation="relu", dim_feedforward=ma.dim_feedforward, dropout=0.1,
        pos_enc_at_attn=False, d_model=ma.d_model,
        pos_enc_at_cross_attn_keys=ma.pos_enc_at_cross_attn_keys,
        pos_enc_at_cross_attn_queries=ma.pos_enc_at_cross_attn_queries,
        self_attention=RoPEAttention(rope_theta=ma.rope_theta, feat_sizes=fs,
                                     embedding_dim=ma.d_model,
                                     num_heads=ma.num_heads,
                                     downsample_rate=1, dropout=0.1),
        cross_attention=RoPEAttention(rope_theta=ma.rope_theta, feat_sizes=fs,
                                      rope_k_repeat=True,
                                      embedding_dim=ma.d_model,
                                      num_heads=ma.num_heads,
                                      downsample_rate=1, dropout=0.1,
                                      kv_in_dim=ma.kv_in_dim))
    return MemoryAttention(d_model=ma.d_model,
                           pos_enc_at_input=ma.pos_enc_at_input,
                           layer=layer, num_layers=ma.num_layers).eval()


def ref_image_encoder(cfg, seed: int = 13):
    from sam2.modeling.backbones.hieradet import Hiera
    from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    torch.manual_seed(seed)
    h = cfg.hiera
    trunk = Hiera(embed_dim=h.embed_dim, num_heads=h.num_heads,
                  stages=h.stages, global_att_blocks=h.global_att_blocks,
                  window_spec=h.window_spec,
                  window_pos_embed_bkg_spatial_size=
                  h.window_pos_embed_bkg_spatial_size)
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=cfg.fpn.pos_num_feats, normalize=True, scale=None,
            temperature=cfg.fpn.pos_temperature),
        d_model=cfg.fpn.d_model,
        backbone_channel_list=list(h.channel_list),
        fpn_top_down_levels=list(cfg.fpn.fpn_top_down_levels),
        fpn_interp_model=cfg.fpn.fpn_interp_model)
    return ImageEncoder(trunk=trunk, neck=neck, scalp=cfg.fpn.scalp)


def ref_sam2_base(cfg, seed: int = 13):
    """Full reference SAM2Base at the shape given by `cfg` — sam2.1 flag
    set (sam2.1_hiera_*.yaml)."""
    from sam2.modeling.sam2_base import SAM2Base

    enc = ref_image_encoder(cfg, seed)
    mem_att = ref_memory_attention(cfg)
    mem_enc = ref_memory_encoder(cfg)
    model = SAM2Base(
        image_encoder=enc, memory_attention=mem_att, memory_encoder=mem_enc,
        num_maskmem=cfg.num_maskmem, image_size=cfg.image_size,
        sigmoid_scale_for_mem_enc=cfg.sigmoid_scale_for_mem_enc,
        sigmoid_bias_for_mem_enc=cfg.sigmoid_bias_for_mem_enc,
        use_mask_input_as_output_without_sam=
        cfg.use_mask_input_as_output_without_sam,
        directly_add_no_mem_embed=cfg.directly_add_no_mem_embed,
        no_obj_embed_spatial=cfg.no_obj_embed_spatial,
        use_high_res_features_in_sam=cfg.use_high_res_features_in_sam,
        multimask_output_in_sam=cfg.multimask_output_in_sam,
        iou_prediction_use_sigmoid=cfg.iou_prediction_use_sigmoid,
        use_obj_ptrs_in_encoder=cfg.use_obj_ptrs_in_encoder,
        max_obj_ptrs_in_encoder=cfg.max_obj_ptrs_in_encoder,
        add_tpos_enc_to_obj_ptrs=cfg.add_tpos_enc_to_obj_ptrs,
        proj_tpos_enc_in_obj_ptrs=cfg.proj_tpos_enc_in_obj_ptrs,
        use_signed_tpos_enc_to_obj_ptrs=cfg.use_signed_tpos_enc_to_obj_ptrs,
        only_obj_ptrs_in_the_past_for_eval=
        cfg.only_obj_ptrs_in_the_past_for_eval,
        pred_obj_scores=cfg.pred_obj_scores,
        pred_obj_scores_mlp=cfg.pred_obj_scores_mlp,
        fixed_no_obj_ptr=cfg.fixed_no_obj_ptr,
        multimask_output_for_tracking=cfg.multimask_output_for_tracking,
        use_multimask_token_for_obj_ptr=cfg.use_multimask_token_for_obj_ptr,
        multimask_min_pt_num=cfg.multimask_min_pt_num,
        multimask_max_pt_num=cfg.multimask_max_pt_num,
        use_mlp_for_obj_ptr_proj=cfg.use_mlp_for_obj_ptr_proj,
        sam_mask_decoder_extra_args={
            "dynamic_multimask_via_stability":
                cfg.dynamic_multimask_via_stability,
            "dynamic_multimask_stability_delta":
                cfg.dynamic_multimask_stability_delta,
            "dynamic_multimask_stability_thresh":
                cfg.dynamic_multimask_stability_thresh,
        }).eval()
    return model


def ref_seg_head(cfg_seg, sam2_cfg, llm_dim: int, seed: int = 0):
    """Reference SegmentationHeadSAM2 (llava/model/seg_head/sam2.py:11-27)
    assembled around a ref_sam2_base — bypassing the hub download in
    SAM2ImagePredictor.from_pretrained, identical wiring otherwise."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from llava.model.seg_head.sam2 import SegmentationHeadSAM2

    torch.manual_seed(seed)
    sam2 = ref_sam2_base(sam2_cfg).float()
    head = SegmentationHeadSAM2.__new__(SegmentationHeadSAM2)
    torch.nn.Module.__init__(head)
    head.n_seg_queries = cfg_seg.seg_num_queries
    head.proj_token = torch.nn.Linear(
        llm_dim, sam2_cfg.hidden_dim * cfg_seg.seg_num_queries)
    head.image_encoder = sam2.image_encoder
    head.prompt_encoder = sam2.sam_prompt_encoder
    head.mask_decoder = sam2.sam_mask_decoder
    head.no_mem_embed = sam2.no_mem_embed.permute(0, 2, 1)[:, :, :, None]
    head.register_buffer(
        "image_mean",
        torch.tensor([0.485, 0.456, 0.406])[None, :, None, None])
    head.register_buffer(
        "image_std", torch.tensor([0.229, 0.224, 0.225])[None, :, None, None])

    # the reference hardcodes img_size=1024 in postprocess_masks
    # (sam2.py:155); re-bind with the config's size so tiny fixtures work —
    # byte-identical math at the real 1024
    import types as pytypes

    import torch.nn.functional as F

    def postprocess_masks(self, masks, meta_dict, resize_to_original_dims):
        img_size = sam2_cfg.image_size
        masks = F.interpolate(masks.float(), (img_size, img_size),
                              mode="bilinear", align_corners=False)
        reverse_padding = [-1 * p for p in meta_dict["padding"]]
        masks = F.pad(masks, reverse_padding)
        assert list(masks.shape[-2:]) == list(meta_dict["resized_image_size"])
        if not resize_to_original_dims:
            return masks
        tgt_h, tgt_w = meta_dict["orig_image_size"]
        return F.interpolate(masks, (tgt_h, tgt_w), mode="bilinear",
                             align_corners=False)

    head.postprocess_masks = pytypes.MethodType(postprocess_masks, head)
    return head.eval()
