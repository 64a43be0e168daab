"""Automatic mask generator: smoke + utils tests."""

import numpy as np
import pytest

from video_llava_seg_tpu.models.sam2.amg import (
    batched_mask_to_box,
    batched_nms,
    build_point_grid,
    calculate_stability_score,
    generate_crop_boxes,
    mask_to_rle,
    remove_small_regions,
    rle_to_mask,
)


def test_point_grid():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert g.min() > 0 and g.max() < 1


def test_crop_boxes():
    boxes, layers = generate_crop_boxes((100, 200), 1, 0.2)
    assert boxes[0] == [0, 0, 200, 100]
    assert layers[0] == 0
    assert len(boxes) == 1 + 4


def test_mask_box_and_nms():
    m = np.zeros((2, 10, 10), bool)
    m[0, 2:5, 3:7] = True
    boxes = batched_mask_to_box(m)
    np.testing.assert_array_equal(boxes[0], [3, 2, 7, 5])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])
    keep = batched_nms(np.array([[0, 0, 10, 10], [1, 1, 10, 10],
                                 [20, 20, 30, 30]], np.float32),
                       np.array([0.9, 0.8, 0.7], np.float32), 0.5)
    assert sorted(keep.tolist()) == [0, 2]


def test_stability_score():
    masks = np.full((1, 4, 4), 5.0, np.float32)
    assert calculate_stability_score(masks, 0.0, 1.0)[0] == 1.0


def test_remove_small_regions():
    m = np.zeros((20, 20), bool)
    m[2:12, 2:12] = True
    m[5, 5] = False       # small hole
    m[17, 17] = True      # small island
    out, changed = remove_small_regions(m, 4, "holes")
    assert changed and out[5, 5]
    out2, changed2 = remove_small_regions(out, 4, "islands")
    assert changed2 and not out2[17, 17]
    assert out2[3, 3]


def test_rle_roundtrip():
    m = np.random.RandomState(0).rand(13, 17) > 0.5
    assert (rle_to_mask(mask_to_rle(m)) == m).all()


def test_amg_generate_smoke():
    torch = pytest.importorskip("torch")
    from tests.reference_loader import load_reference_sam2
    load_reference_sam2()
    from tests.test_sam2_memory_parity import TINY, _ref_sam2_base
    from video_llava_seg_tpu.convert.sam2_torch import convert_sam2_base
    from video_llava_seg_tpu.models.sam2.automatic_mask_generator import (
        SAM2AutomaticMaskGenerator,
    )

    ref = _ref_sam2_base()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    amg = SAM2AutomaticMaskGenerator(
        (convert_sam2_base(sd, TINY), TINY), points_per_side=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        output_mode="coco_rle")
    img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(np.uint8)
    anns = amg.generate(img)
    assert isinstance(anns, list)
    if anns:
        a = anns[0]
        assert set(a) >= {"segmentation", "area", "bbox", "predicted_iou",
                          "point_coords", "stability_score", "crop_box"}
        assert a["segmentation"]["size"] == [96, 128]
