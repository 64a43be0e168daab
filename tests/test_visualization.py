"""Visualization overlay tests (llava/inference/visualization.py parity)."""

import numpy as np

from video_llava_seg_tpu.inference.visualization import (
    annotate_image_instance,
    create_color_map,
    viz_pred_and_gt_masks,
)
from video_llava_seg_tpu.ops.masks import encode_rle


def test_color_map_is_voc_style():
    cmap = create_color_map()
    assert cmap.shape == (256, 3)
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])     # VOC class 1
    np.testing.assert_array_equal(cmap[2], [0, 128, 0])
    assert len(np.unique(cmap, axis=0)) == 256


def test_annotate_blends_and_borders():
    img = np.full((20, 20, 3), 100, np.uint8)
    mask = np.zeros((20, 20), np.uint8)
    mask[5:15, 5:15] = 1
    out = annotate_image_instance(img, mask, (255, 0, 0),
                                  mask_border=3, mask_opacity=0.4)
    assert out.shape == img.shape and out.dtype == np.uint8
    # interior blended: 0.6*100 + 0.4*255 = 162
    assert abs(int(out[10, 10, 0]) - 162) <= 1
    assert out[10, 10, 1] < 100  # channel pulled toward 0
    # untouched outside
    np.testing.assert_array_equal(out[0, 0], [100, 100, 100])


def _rle(mask):
    r = encode_rle(mask.astype(np.uint8))
    r["counts"] = r["counts"].decode("utf-8")
    return r


def test_viz_pred_and_gt_masks_shapes():
    h, w = 32, 48
    mask = np.zeros((h, w), np.uint8)
    mask[4:12, 4:20] = 1
    gt = {
        "video_id": 7,
        "caption_raw_en": "a caption",
        "object_referrals": [{"track_ids": [1], "prompt": "the thing"}],
        "segmentations": [
            {"filename": "f0.jpg", "track_ids": [1],
             "mask_rles": [_rle(mask)]},
        ],
    }
    pred = {
        "video_id": 7,
        "pred_object_referral_masks": [
            [{"filename": "f0.jpg", "mask_rles": [_rle(mask)]}],
        ],
    }
    frames = {"f0.jpg": np.zeros((h, w, 3), np.uint8)}
    images, fnames = viz_pred_and_gt_masks(pred, gt, frames)
    assert fnames == ["f0.jpg"]
    assert len(images) == 1 and len(images[0]) == 1
    # w > h -> stacked vertically
    assert images[0][0].shape == (2 * h, w, 3)
