"""SAM2 v2.0 generation support: registry presets + converter acceptance +
propagation parity with the reference under the 2.0 flag set.

The reference ships BOTH checkpoint generations
(/root/reference/sam2/configs/sam2/sam2_hiera_*.yaml and
configs/sam2.1/*.yaml; hub map /root/reference/sam2/build_sam.py:14-47).
The yaml families differ in exactly four flags, all absent/false in 2.0:
no_obj_embed_spatial, add_tpos_enc_to_obj_ptrs, proj_tpos_enc_in_obj_ptrs,
use_signed_tpos_enc_to_obj_ptrs."""

import dataclasses
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_loader import load_reference_sam2  # noqa: E402

load_reference_sam2()

from tests.test_sam2_memory_parity import TINY  # noqa: E402

from video_llava_seg_tpu.convert.sam2_torch import (  # noqa: E402
    convert_sam2_base,
)
from video_llava_seg_tpu.models.sam2.config import (  # noqa: E402
    V20_FLAGS,
    sam2_config,
)
from video_llava_seg_tpu.models.sam2.video_predictor import (  # noqa: E402
    SAM2VideoPredictor,
)

TINY20 = dataclasses.replace(TINY, **V20_FLAGS)


def test_v20_registry_presets():
    for alias, key in [("facebook/sam2-hiera-tiny", "tiny"),
                       ("sam2-hiera-small", "small"),
                       ("sam2-hiera-b+", "base_plus"),
                       ("facebook/sam2-hiera-large", "large")]:
        cfg = sam2_config(alias)
        assert cfg.name == f"sam2-hiera-{key}"
        assert not cfg.no_obj_embed_spatial
        assert not cfg.add_tpos_enc_to_obj_ptrs
        assert not cfg.proj_tpos_enc_in_obj_ptrs
        assert not cfg.use_signed_tpos_enc_to_obj_ptrs
        # trunk identical to the 2.1 variant of the same size
        assert cfg.hiera == sam2_config(f"sam2.1-hiera-{key}"
                                        .replace("base_plus",
                                                 "base-plus")).hiera
    # 2.1 names unaffected
    c21 = sam2_config("facebook/sam2.1-hiera-tiny")
    assert c21.no_obj_embed_spatial and c21.add_tpos_enc_to_obj_ptrs


def _ref_v20_predictor():
    from sam2.sam2_video_predictor import SAM2VideoPredictor as RefVP

    from tests.reference_builders import ref_sam2_base

    ref_base = ref_sam2_base(TINY20)
    vp = RefVP.__new__(RefVP)
    torch.nn.Module.__init__(vp)
    vp.__dict__.update(ref_base.__dict__)
    vp.fill_hole_area = 0
    vp.non_overlap_masks = False
    vp.clear_non_cond_mem_around_input = False
    vp.clear_non_cond_mem_for_multi_obj = False
    vp.add_all_frames_to_correct_as_cond = False
    return vp.eval()


def test_v20_checkpoint_accept_and_propagate_parity(tmp_path):
    """A v2.0-flagged reference model's state dict (which lacks the
    2.1-only no_obj_embed_spatial / obj_ptr_tpos_proj params —
    build_sam.py:141-151 loads it strict) converts cleanly, and
    propagation matches the reference under the 2.0 obj-ptr handling
    (zero temporal pos enc — sam2_base.py else-branch)."""
    from PIL import Image

    ref = _ref_v20_predictor()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    assert "no_obj_embed_spatial" not in sd
    assert "obj_ptr_tpos_proj.weight" not in sd
    params = convert_sam2_base(sd, TINY20)
    assert "no_obj_embed_spatial" not in params
    assert "obj_ptr_tpos_proj" not in params
    mine = SAM2VideoPredictor(params, TINY20)

    rng = np.random.RandomState(0)
    noise = rng.randint(0, 40, (128, 128, 3), np.uint8)
    for t in range(5):
        img = noise.copy()
        img[40:80, 20 + 8 * t:60 + 8 * t] = 220
        Image.fromarray(img).save(os.path.join(str(tmp_path), f"{t}.jpg"),
                                  quality=95)

    ref_state = ref.init_state(str(tmp_path), offload_video_to_cpu=False)
    my_state = mine.init_state(str(tmp_path))
    pts = np.array([[40.0, 60.0]], np.float32)
    lbl = np.array([1], np.int32)
    with torch.no_grad():
        ref.add_new_points_or_box(ref_state, 0, 1, points=pts, labels=lbl)
    mine.add_new_points_or_box(my_state, 0, 1, points=pts, labels=lbl)

    ref_outs = {}
    with torch.no_grad():
        for fidx, _, masks in ref.propagate_in_video(ref_state):
            ref_outs[fidx] = masks.detach().numpy()
    my_outs = {}
    for fidx, _, masks in mine.propagate_in_video(my_state):
        my_outs[fidx] = np.asarray(masks)

    assert set(my_outs) == set(ref_outs)
    for fidx in ref_outs:
        agree = np.mean((my_outs[fidx] > 0) == (ref_outs[fidx] > 0))
        assert agree > 0.97, f"frame {fidx}: agreement {agree}"
