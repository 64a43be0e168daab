"""Parity: memory encoder, memory attention, and SAM2Base heads vs reference."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import load_reference_sam2  # noqa: E402

from video_llava_seg_tpu.convert.sam2_torch import (  # noqa: E402
    convert_memory_attention,
    convert_memory_encoder,
    convert_sam2_base,
)
from video_llava_seg_tpu.models.sam2 import base as jbase  # noqa: E402
from video_llava_seg_tpu.models.sam2 import memory as jmem  # noqa: E402
from video_llava_seg_tpu.models.sam2.config import (  # noqa: E402
    sam2_tiny_test_config,
)

load_reference_sam2()

TINY = sam2_tiny_test_config()


def _ref_memory_encoder():
    from sam2.modeling.memory_encoder import (CXBlock, Fuser, MaskDownSampler,
                                              MemoryEncoder)
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    torch.manual_seed(10)
    me = TINY.memory_encoder
    return MemoryEncoder(
        out_dim=me.out_dim,
        mask_downsampler=MaskDownSampler(embed_dim=me.mask_downsampler_embed_dim,
                                         kernel_size=3, stride=2, padding=1),
        fuser=Fuser(CXBlock(dim=me.in_dim, kernel_size=7, padding=3,
                            layer_scale_init_value=1e-6, use_dwconv=True),
                    num_layers=2),
        position_encoding=PositionEmbeddingSine(num_pos_feats=me.pos_num_feats,
                                                normalize=True, scale=None,
                                                temperature=10000),
        in_dim=me.in_dim).eval()


def test_memory_encoder_parity():
    ref = _ref_memory_encoder()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_memory_encoder(sd, prefix="")
    s = TINY.image_embedding_size
    pix = torch.randn(1, TINY.memory_encoder.in_dim, s, s)
    masks = torch.randn(1, 1, 16 * s, 16 * s)
    with torch.no_grad():
        out = ref(pix, masks, skip_mask_sigmoid=False)
    feats, pos = jmem.memory_encoder_apply(
        params, TINY, jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(masks.numpy().transpose(0, 2, 3, 1)),
        skip_mask_sigmoid=False)
    np.testing.assert_allclose(
        np.asarray(feats),
        out["vision_features"].numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pos), out["vision_pos_enc"][0].numpy()[0].transpose(1, 2, 0),
        atol=1e-5, rtol=1e-5)


def _ref_memory_attention():
    from sam2.modeling.memory_attention import (MemoryAttention,
                                                MemoryAttentionLayer)
    from sam2.modeling.sam.transformer import RoPEAttention
    torch.manual_seed(11)
    ma = TINY.memory_attention
    layer = MemoryAttentionLayer(
        activation="relu", dim_feedforward=ma.dim_feedforward, dropout=0.1,
        pos_enc_at_attn=False, d_model=ma.d_model,
        pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
        self_attention=RoPEAttention(rope_theta=10000.0, feat_sizes=[8, 8],
                                     embedding_dim=ma.d_model,
                                     num_heads=ma.num_heads,
                                     downsample_rate=1, dropout=0.1),
        cross_attention=RoPEAttention(rope_theta=10000.0, feat_sizes=[8, 8],
                                      rope_k_repeat=True,
                                      embedding_dim=ma.d_model,
                                      num_heads=ma.num_heads,
                                      downsample_rate=1, dropout=0.1,
                                      kv_in_dim=ma.kv_in_dim))
    return MemoryAttention(d_model=ma.d_model, pos_enc_at_input=True,
                           layer=layer, num_layers=ma.num_layers).eval()


def test_memory_attention_parity():
    ref = _ref_memory_attention()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_memory_attention(sd, TINY, prefix="")
    ma = TINY.memory_attention
    n = 64  # 8x8 grid
    n_mem_frames = 2
    n_obj_ptr = 4
    m = n_mem_frames * n + n_obj_ptr
    torch.manual_seed(12)
    curr = torch.randn(n, 1, ma.d_model)       # seq-first
    curr_pos = torch.randn(n, 1, ma.d_model)
    memory = torch.randn(m, 1, ma.kv_in_dim)
    memory_pos = torch.randn(m, 1, ma.kv_in_dim)
    with torch.no_grad():
        out = ref(curr=curr, memory=memory, curr_pos=curr_pos,
                  memory_pos=memory_pos, num_obj_ptr_tokens=n_obj_ptr)
    jout = jmem.memory_attention_apply(
        params, TINY,
        jnp.asarray(curr.numpy().transpose(1, 0, 2)),
        jnp.asarray(memory.numpy().transpose(1, 0, 2)),
        jnp.asarray(curr_pos.numpy().transpose(1, 0, 2)),
        jnp.asarray(memory_pos.numpy().transpose(1, 0, 2)),
        num_obj_ptr_tokens=n_obj_ptr)
    np.testing.assert_allclose(np.asarray(jout)[0],
                               out.numpy()[:, 0], atol=2e-4, rtol=2e-4)


def _ref_sam2_base():
    from sam2.modeling.backbones.hieradet import Hiera
    from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    from sam2.modeling.sam2_base import SAM2Base
    torch.manual_seed(13)
    h = TINY.hiera
    trunk = Hiera(embed_dim=h.embed_dim, num_heads=h.num_heads,
                  stages=h.stages, global_att_blocks=h.global_att_blocks,
                  window_spec=h.window_spec,
                  window_pos_embed_bkg_spatial_size=
                  h.window_pos_embed_bkg_spatial_size)
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=TINY.fpn.pos_num_feats, normalize=True, scale=None,
            temperature=10000),
        d_model=TINY.fpn.d_model,
        backbone_channel_list=list(h.channel_list),
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest")
    enc = ImageEncoder(trunk=trunk, neck=neck, scalp=1)
    mem_att = _ref_memory_attention()
    mem_enc = _ref_memory_encoder()
    model = SAM2Base(
        image_encoder=enc, memory_attention=mem_att, memory_encoder=mem_enc,
        num_maskmem=7, image_size=TINY.image_size,
        sigmoid_scale_for_mem_enc=20.0, sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True, no_obj_embed_spatial=True,
        use_high_res_features_in_sam=True, multimask_output_in_sam=True,
        iou_prediction_use_sigmoid=True, use_obj_ptrs_in_encoder=True,
        add_tpos_enc_to_obj_ptrs=True, proj_tpos_enc_in_obj_ptrs=True,
        use_signed_tpos_enc_to_obj_ptrs=True,
        only_obj_ptrs_in_the_past_for_eval=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True, multimask_min_pt_num=0,
        multimask_max_pt_num=1, use_mlp_for_obj_ptr_proj=True,
        sam_mask_decoder_extra_args={
            "dynamic_multimask_via_stability": True,
            "dynamic_multimask_stability_delta": 0.05,
            "dynamic_multimask_stability_thresh": 0.98,
        }).eval()
    # shrink the decoder dims to the tiny config
    return model


@pytest.fixture(scope="module")
def ref_base():
    return _ref_sam2_base()


def test_sam2_base_forward_image_and_heads(ref_base):
    sd = {k: v.numpy() for k, v in ref_base.state_dict().items()}
    params = convert_sam2_base(sd, TINY)
    img = torch.randn(1, 3, TINY.image_size, TINY.image_size)
    with torch.no_grad():
        bo = ref_base.forward_image(img)
        _, vfeats, vpos, sizes = ref_base._prepare_backbone_features(bo)
        s = TINY.image_embedding_size
        pix = vfeats[-1].permute(1, 2, 0).view(1, -1, s, s)
        pix = pix + ref_base.no_mem_embed.permute(0, 2, 1).reshape(
            1, -1, 1, 1) * 0  # heads take raw features here
        high_res = [
            x.permute(1, 2, 0).view(x.size(1), x.size(2), *sz)
            for x, sz in zip(vfeats[:-1], sizes[:-1])
        ]
        pts = torch.tensor([[[40.0, 50.0]]])
        lbl = torch.tensor([[1]], dtype=torch.int32)
        ref_out = ref_base._forward_sam_heads(
            backbone_features=pix,
            point_inputs={"point_coords": pts, "point_labels": lbl},
            high_res_features=high_res, multimask_output=True)

    jbo = jbase.forward_image(params, TINY,
                              jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))
    jfeats, jpos, jsizes = jbase.prepare_backbone_features(TINY, jbo)
    # backbone parity first
    for jf, rf in zip(jfeats, vfeats):
        hw = int(np.sqrt(rf.shape[0]))
        rfm = rf.permute(1, 2, 0).reshape(1, -1, hw, hw).numpy()
        np.testing.assert_allclose(np.asarray(jf),
                                   rfm.transpose(0, 2, 3, 1),
                                   atol=3e-4, rtol=3e-4)
    jout = jbase.forward_sam_heads(
        params, TINY, jfeats[-1],
        point_coords=jnp.asarray(pts.numpy()),
        point_labels=jnp.asarray(lbl.numpy()),
        high_res_features=jfeats[:-1], multimask_output=True)
    names = ["low_res_multimasks", "high_res_multimasks", "ious",
             "low_res_masks", "high_res_masks", "obj_ptr",
             "object_score_logits"]
    for name, j, r in zip(names, jout, ref_out):
        np.testing.assert_allclose(
            np.asarray(j), r.detach().numpy(), atol=5e-3, rtol=5e-3,
            err_msg=name)


def test_encode_new_memory_parity(ref_base):
    sd = {k: v.numpy() for k, v in ref_base.state_dict().items()}
    params = convert_sam2_base(sd, TINY)
    s = TINY.image_embedding_size
    torch.manual_seed(14)
    feat = torch.randn(s * s, 1, TINY.hidden_dim)  # (HW)BC
    masks = torch.randn(1, 1, TINY.image_size, TINY.image_size)
    score = torch.tensor([[-3.0]])
    with torch.no_grad():
        ref_feats, ref_pos = ref_base._encode_new_memory(
            [feat], [(s, s)], masks, score, False)
    jfeat = jnp.asarray(feat.numpy()[:, 0].reshape(s, s, -1)[None])
    jfeats, jpos = jbase.encode_new_memory(
        params, TINY, jfeat, jnp.asarray(masks.numpy()),
        jnp.asarray(score.numpy()), is_mask_from_pts=False)
    np.testing.assert_allclose(
        np.asarray(jfeats), ref_feats.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(jpos), ref_pos[0].numpy()[0].transpose(1, 2, 0),
        atol=1e-5, rtol=1e-5)
