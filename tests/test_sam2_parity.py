"""Numeric parity of the JAX SAM2 image stack vs the reference torch modules
(random weights, CPU golden activations)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import load_reference_sam2  # noqa: E402

from video_llava_seg_tpu.convert.sam2_torch import (  # noqa: E402
    convert_hiera,
    convert_image_encoder,
    convert_mask_decoder,
    convert_prompt_encoder,
)
from video_llava_seg_tpu.models.sam2 import (  # noqa: E402
    hiera as jhiera,
    image_encoder as jenc,
    mask_decoder as jdec,
    prompt_encoder as jprompt,
)
from video_llava_seg_tpu.models.sam2.config import (  # noqa: E402
    HieraConfig,
    sam2_tiny_test_config,
)

load_reference_sam2()

TINY = sam2_tiny_test_config()


def _ref_hiera():
    from sam2.modeling.backbones.hieradet import Hiera
    torch.manual_seed(0)
    h = TINY.hiera
    return Hiera(embed_dim=h.embed_dim, num_heads=h.num_heads,
                 stages=h.stages, global_att_blocks=h.global_att_blocks,
                 window_spec=h.window_spec,
                 window_pos_embed_bkg_spatial_size=
                 h.window_pos_embed_bkg_spatial_size).eval()


def test_hiera_parity():
    ref = _ref_hiera()
    x = torch.randn(2, 3, 128, 128)
    with torch.no_grad():
        ref_outs = ref(x)  # list of NCHW
    params = convert_hiera({k: v.numpy() for k, v in ref.state_dict().items()})
    outs = jhiera.apply(params, TINY.hiera,
                        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(outs) == len(ref_outs)
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=2e-4)


def test_image_encoder_parity():
    from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    torch.manual_seed(1)
    trunk = _ref_hiera()
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(num_pos_feats=TINY.fpn.pos_num_feats,
                                                normalize=True, scale=None,
                                                temperature=10000),
        d_model=TINY.fpn.d_model,
        backbone_channel_list=list(TINY.hiera.channel_list),
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest")
    enc = ImageEncoder(trunk=trunk, neck=neck, scalp=1).eval()
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        ref_out = enc(x)
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    params = convert_image_encoder(sd, prefix="")
    out = jenc.apply(params, TINY, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(out["backbone_fpn"]) == len(ref_out["backbone_fpn"])
    for o, r in zip(out["backbone_fpn"], ref_out["backbone_fpn"]):
        np.testing.assert_allclose(np.asarray(o),
                                   r.numpy().transpose(0, 2, 3, 1),
                                   atol=3e-4, rtol=3e-4)
    for o, r in zip(out["vision_pos_enc"], ref_out["vision_pos_enc"]):
        np.testing.assert_allclose(np.asarray(o),
                                   r.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-5, rtol=1e-5)


def _ref_prompt_encoder():
    from sam2.modeling.sam.prompt_encoder import PromptEncoder
    torch.manual_seed(2)
    s = TINY.image_embedding_size
    return PromptEncoder(embed_dim=TINY.hidden_dim,
                         image_embedding_size=(s, s),
                         input_image_size=(TINY.image_size, TINY.image_size),
                         mask_in_chans=TINY.mask_in_chans).eval()


def test_prompt_encoder_parity_points_and_boxes():
    pe = _ref_prompt_encoder()
    sd = {k: v.numpy() for k, v in pe.state_dict().items()}
    params = convert_prompt_encoder(sd, prefix="")

    coords = torch.tensor([[[10.0, 20.0], [50.0, 60.0]]])
    labels = torch.tensor([[1, 0]])
    boxes = torch.tensor([[8.0, 9.0, 100.0, 110.0]])
    with torch.no_grad():
        ref_sparse, ref_dense = pe(points=(coords, labels), boxes=boxes,
                                   masks=None)
    sparse, dense = jprompt.apply(params, TINY, jnp.asarray(coords.numpy()),
                                  jnp.asarray(labels.numpy()),
                                  boxes=jnp.asarray(boxes.numpy()))
    np.testing.assert_allclose(np.asarray(sparse), ref_sparse.detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dense),
                               ref_dense.detach().numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-5)
    # dense PE grid
    ref_pe = pe.get_dense_pe().detach().numpy()
    jax_pe = jprompt.get_dense_pe(params, TINY)
    np.testing.assert_allclose(np.asarray(jax_pe),
                               ref_pe[0].transpose(1, 2, 0), atol=1e-5)


def test_prompt_encoder_parity_padded_point_and_mask():
    pe = _ref_prompt_encoder()
    sd = {k: v.numpy() for k, v in pe.state_dict().items()}
    params = convert_prompt_encoder(sd, prefix="")
    coords = torch.tensor([[[30.0, 40.0]]])
    labels = torch.tensor([[1]])
    s4 = TINY.image_embedding_size * 4
    mask = torch.randn(1, 1, s4, s4)
    with torch.no_grad():
        ref_sparse, ref_dense = pe(points=(coords, labels), boxes=None,
                                   masks=mask)
    # reference pads with an extra (-1) point when no boxes
    jc = jnp.asarray(np.concatenate([coords.numpy(), np.zeros((1, 1, 2),
                                                              np.float32)], 1))
    jl = jnp.asarray(np.concatenate([labels.numpy(),
                                     -np.ones((1, 1), np.int64)], 1))
    sparse, dense = jprompt.apply(
        params, TINY, jc, jl,
        masks=jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(sparse), ref_sparse.detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dense),
                               ref_dense.detach().numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=2e-5)


def test_mask_decoder_parity():
    from sam2.modeling.sam.mask_decoder import MaskDecoder
    from sam2.modeling.sam.transformer import TwoWayTransformer
    torch.manual_seed(3)
    d = TINY.hidden_dim
    ref = MaskDecoder(
        num_multimask_outputs=3,
        transformer=TwoWayTransformer(depth=2, embedding_dim=d,
                                      mlp_dim=TINY.twoway_mlp_dim,
                                      num_heads=8),
        transformer_dim=d, iou_head_depth=3,
        iou_head_hidden_dim=TINY.iou_head_hidden_dim,
        use_high_res_features=True, iou_prediction_use_sigmoid=True,
        pred_obj_scores=True, pred_obj_scores_mlp=True,
        use_multimask_token_for_obj_ptr=True).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_mask_decoder(sd, TINY, prefix="")

    s = TINY.image_embedding_size
    b = 2
    img = torch.randn(b, d, s, s)
    img_pe = torch.randn(1, d, s, s)
    sparse = torch.randn(b, 3, d)
    dense = torch.randn(b, d, s, s)
    hs0 = torch.randn(b, d // 8, 4 * s, 4 * s)
    hs1 = torch.randn(b, d // 4, 2 * s, 2 * s)
    for multimask in (False, True):
        with torch.no_grad():
            r_masks, r_iou, r_tok, r_obj = ref(
                image_embeddings=img, image_pe=img_pe,
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=multimask, repeat_image=False,
                high_res_features=[hs0, hs1])
        masks, iou, tok, obj = jdec.apply(
            params, TINY,
            jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(img_pe.numpy()[0].transpose(1, 2, 0)),
            jnp.asarray(sparse.numpy()),
            jnp.asarray(dense.numpy().transpose(0, 2, 3, 1)),
            multimask_output=multimask,
            high_res_features=[
                jnp.asarray(hs0.numpy().transpose(0, 2, 3, 1)),
                jnp.asarray(hs1.numpy().transpose(0, 2, 3, 1))])
        np.testing.assert_allclose(np.asarray(masks), r_masks.detach().numpy(),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(iou), r_iou.detach().numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(tok), r_tok.detach().numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(obj), r_obj.detach().numpy(),
                                   atol=1e-4, rtol=1e-4)
