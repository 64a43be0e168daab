"""LG-VIS eval utility tests."""

import numpy as np

from video_llava_seg_tpu.inference.eval import evaluate_video, referral_iou
from video_llava_seg_tpu.ops.masks import encode_rle


def _rle(mask):
    r = encode_rle(mask.astype(np.uint8))
    r["counts"] = r["counts"].decode("utf-8")
    return r


def test_perfect_and_half_iou():
    m = np.zeros((16, 16), np.uint8)
    m[:8] = 1
    half = np.zeros((16, 16), np.uint8)
    half[:4] = 1
    gt = {
        "video_id": 1,
        "object_referrals": [{"track_ids": [3], "prompt": "x"}],
        "segmentations": [
            {"filename": "a.jpg", "track_ids": [3], "mask_rles": [_rle(m)]},
            {"filename": "b.jpg", "track_ids": [3], "mask_rles": [_rle(m)]},
        ],
    }
    pred_perfect = {"video_id": 1, "pred_object_referral_masks": [[
        {"filename": "a.jpg", "mask_rles": [_rle(m)]},
        {"filename": "b.jpg", "mask_rles": [_rle(m)]}]]}
    pred_half = {"video_id": 1, "pred_object_referral_masks": [[
        {"filename": "a.jpg", "mask_rles": [_rle(half)]},
        {"filename": "b.jpg", "mask_rles": [_rle(half)]}]]}
    assert evaluate_video(pred_perfect, gt) == [1.0]
    np.testing.assert_allclose(evaluate_video(pred_half, gt), [0.5])


def test_multi_object_union():
    a = np.zeros((8, 8), np.uint8); a[:, :4] = 1
    b = np.zeros((8, 8), np.uint8); b[:, 4:] = 1
    gt = {"video_id": 2,
          "object_referrals": [{"track_ids": [1, 2], "prompt": "both"}],
          "segmentations": [{"filename": "f.jpg", "track_ids": [1, 2],
                             "mask_rles": [_rle(a), _rle(b)]}]}
    full = np.ones((8, 8), np.uint8)
    pred = {"video_id": 2, "pred_object_referral_masks": [[
        {"filename": "f.jpg", "mask_rles": [_rle(full)]}]]}
    assert evaluate_video(pred, gt) == [1.0]
