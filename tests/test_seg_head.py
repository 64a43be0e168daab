"""Seg head parity vs the reference SegmentationHeadSAM2 (tiny SAM2)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import load_reference_sam2  # noqa: E402

load_reference_sam2()

from tests.test_sam2_memory_parity import TINY, _ref_sam2_base  # noqa: E402

from video_llava_seg_tpu.config import SegHeadConfig  # noqa: E402
from video_llava_seg_tpu.models import seg_head as jhead  # noqa: E402

LLM_DIM = 32
Q = 2


def _ref_seg_head():
    import sys
    sys.path.insert(0, "/root/reference")
    from llava.model.seg_head.sam2 import SegmentationHeadSAM2
    torch.manual_seed(0)
    sam2 = _ref_sam2_base().float()
    head = SegmentationHeadSAM2.__new__(SegmentationHeadSAM2)
    torch.nn.Module.__init__(head)
    head.n_seg_queries = Q
    head.proj_token = torch.nn.Linear(LLM_DIM, TINY.hidden_dim * Q)
    head.image_encoder = sam2.image_encoder
    head.prompt_encoder = sam2.sam_prompt_encoder
    head.mask_decoder = sam2.sam_mask_decoder
    head.no_mem_embed = sam2.no_mem_embed.permute(0, 2, 1)[:, :, :, None]
    head.register_buffer(
        "image_mean",
        torch.tensor([0.485, 0.456, 0.406])[None, :, None, None])
    head.register_buffer(
        "image_std", torch.tensor([0.229, 0.224, 0.225])[None, :, None, None])

    # the reference hardcodes img_size=1024 (sam2.py:157); re-bind with the
    # tiny test size, same math
    import types as pytypes
    import torch.nn.functional as F

    def postprocess_masks(self, masks, meta_dict, resize_to_original_dims):
        img_size = TINY.image_size
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


def test_seg_head_forward_parity():
    ref = _ref_seg_head()
    cfg = SegHeadConfig(seg_num_queries=Q, image_size=TINY.image_size)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    # the reference head doesn't register no_mem_embed as param; add manually
    sd["no_mem_embed"] = ref.no_mem_embed.detach().numpy()
    params = jhead.convert_torch(sd, cfg, TINY)

    t, n = 3, 2
    s = TINY.image_size
    torch.manual_seed(1)
    frames = torch.rand(t, 3, s, s)
    seg_tokens = torch.randn(n, LLM_DIM)
    meta = {
        "padding": (0, 0, 8, 8),
        "resized_image_size": (s - 16, s),
        "orig_image_size": (60, 100),
    }
    with torch.no_grad():
        ref_out = ref(
            video_frames=[frames], seg_tokens=[seg_tokens], seg_meta=[meta],
            resize_to_original_dims=True)
    out = jhead.forward(
        params, cfg, TINY,
        [jnp.asarray(frames.numpy().transpose(0, 2, 3, 1))],
        [jnp.asarray(seg_tokens.numpy())], [meta],
        resize_to_original_dims=True)
    assert len(out) == 1
    r = ref_out[0].numpy()  # [N, T, H', W']
    m = np.asarray(out[0])
    assert m.shape == r.shape == (n, t, 60, 100)
    np.testing.assert_allclose(m, r, atol=3e-2, rtol=3e-2)
    # binarized agreement should be near-total
    agree = np.mean((m > 0) == (r > 0))
    assert agree > 0.95


def test_seg_head_no_resize():
    ref = _ref_seg_head()
    cfg = SegHeadConfig(seg_num_queries=Q, image_size=TINY.image_size)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd["no_mem_embed"] = ref.no_mem_embed.detach().numpy()
    params = jhead.convert_torch(sd, cfg, TINY)
    s = TINY.image_size
    frames = jnp.zeros((2, s, s, 3))
    tokens = jnp.zeros((1, LLM_DIM))
    meta = {"padding": (0, 0, 0, 0), "resized_image_size": (s, s),
            "orig_image_size": (s, s)}
    out = jhead.forward(params, cfg, TINY, [frames], [tokens], [meta],
                        resize_to_original_dims=False)
    assert np.asarray(out[0]).shape == (1, 2, s, s)
