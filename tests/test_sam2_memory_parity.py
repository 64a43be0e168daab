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
    from tests.reference_builders import ref_memory_encoder
    return ref_memory_encoder(TINY)


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
    from tests.reference_builders import ref_memory_attention
    return ref_memory_attention(TINY)


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
    # the original tiny oracle was built with the DEFAULT
    # max_obj_ptrs_in_encoder (16), not TINY's 4 — keep that behavior
    import dataclasses

    from tests.reference_builders import ref_sam2_base
    return ref_sam2_base(
        dataclasses.replace(TINY, max_obj_ptrs_in_encoder=16))


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
