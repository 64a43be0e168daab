"""Prediction/GT mask visualization (llava/inference/visualization.py parity).

The reference depends on the external `vicas` package for `create_color_map`
and `annotate_image_instance`; this module is self-contained (numpy + cv2
with a graceful numpy-only fallback for the border drawing).

CLI parity:
    python -m video_llava_seg_tpu.inference.visualization \
        --pred_dir <pred jsons> [--gt_dir ...] [--output_dir ...]
Writes, per video and referral, side-by-side pred|GT overlays plus a
language.txt with the prompt and captions (visualization.py:104-115)."""

from __future__ import annotations

import copy
import json
import os
import os.path as osp
from argparse import ArgumentParser
from glob import glob
from typing import Dict, List, Optional, Tuple

import numpy as np

from video_llava_seg_tpu.ops.masks import decode_rle


def create_color_map(n: int = 256) -> np.ndarray:
    """PASCAL-VOC-style deterministic label colormap [n, 3] uint8 (the
    standard bit-shuffle construction the vicas package uses)."""

    def bit(v, i):
        return (v >> i) & 1

    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bit(c, 0) << (7 - j)
            g |= bit(c, 1) << (7 - j)
            b |= bit(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def annotate_image_instance(image: np.ndarray, mask: np.ndarray, color,
                            mask_border: int = 3,
                            mask_opacity: float = 0.4) -> np.ndarray:
    """Alpha-blend `mask` onto `image` with a solid border.

    image: [H, W, 3] uint8; mask: [H, W] {0,1}; color: (3,) 0-255."""
    out = image.astype(np.float32)
    m = mask.astype(bool)
    color = np.asarray(color, np.float32)
    out[m] = (1.0 - mask_opacity) * out[m] + mask_opacity * color
    if mask_border > 0:
        border = _mask_border(mask.astype(np.uint8), mask_border)
        out[border.astype(bool)] = color
    return out.astype(np.uint8)


def _mask_border(mask: np.ndarray, thickness: int) -> np.ndarray:
    try:
        import cv2

        kernel = np.ones((thickness, thickness), np.uint8)
        return cv2.dilate(mask, kernel) - cv2.erode(mask, kernel)
    except Exception:
        # numpy fallback: XOR of shifted masks
        pad = np.pad(mask, thickness)
        dil = np.zeros_like(pad)
        ero = np.ones_like(pad)
        for dy in range(-thickness, thickness + 1):
            for dx in range(-thickness, thickness + 1):
                s = np.roll(np.roll(pad, dy, 0), dx, 1)
                dil |= s
                ero &= s
        t = thickness
        return (dil ^ ero)[t:-t, t:-t]


def _decode(rle: Dict) -> np.ndarray:
    rle = copy.deepcopy(rle)
    if isinstance(rle["counts"], str):
        rle["counts"] = rle["counts"].encode("utf-8")
    return decode_rle(rle).astype(np.uint8)


def viz_pred_and_gt_masks(pred_content: Dict, gt_content: Dict,
                          frames_by_name: Dict[str, np.ndarray]
                          ) -> Tuple[List[List[np.ndarray]], List[str]]:
    """Per-referral, per-frame side-by-side (pred | GT) overlays
    (visualization.py:18-77). frames_by_name: filename -> [H, W, 3] uint8."""
    video_id = pred_content["video_id"]
    assert gt_content["video_id"] == video_id
    cmap = create_color_map().tolist()
    gt_seg = {s["filename"]: s for s in gt_content["segmentations"]}
    assert (len(gt_content["object_referrals"])
            == len(pred_content["pred_object_referral_masks"]))

    viz_images: List[List[np.ndarray]] = []
    frame_filenames: List[str] = []
    for i, referral in enumerate(gt_content["object_referrals"]):
        track_ids = referral["track_ids"]
        viz_images.append([])
        for pred_t in pred_content["pred_object_referral_masks"][i]:
            fname = pred_t["filename"]
            image_pred = np.copy(frames_by_name[fname])
            image_gt = np.copy(frames_by_name[fname])
            frame_filenames.append(fname)

            gt_t = gt_seg[fname]
            for track_id in track_ids:
                if track_id not in gt_t["track_ids"]:
                    print(f"ERROR: {track_id} not found in seg list")
                    continue
                idx = gt_t["track_ids"].index(track_id)
                mask = _decode(gt_t["mask_rles"][idx])
                image_gt = annotate_image_instance(
                    image_gt, mask, color=cmap[track_id % 256])
            for j, rle in enumerate(pred_t["mask_rles"], 1):
                mask = _decode(rle)
                image_pred = annotate_image_instance(
                    image_pred, mask, color=cmap[j])

            h, w = image_pred.shape[:2]
            axis = 1 if h > w else 0
            viz_images[-1].append(
                np.concatenate((image_pred, image_gt), axis))
    return viz_images, frame_filenames


def main(args=None):
    import cv2

    from video_llava_seg_tpu.inference.video_fetcher import (
        VideoAndFrameFetcher,
    )
    from video_llava_seg_tpu.paths import Paths

    parser = ArgumentParser()
    parser.add_argument("--pred_dir", "-i", required=True)
    parser.add_argument("--gt_dir", required=False)
    parser.add_argument("--output_dir", "-o", required=False)
    parser.add_argument("--dataset_version", default="0.3")
    a = parser.parse_args(args)
    out_dir = a.output_dir or a.pred_dir + "_viz"
    gt_dir = a.gt_dir or Paths.vicas_annotations_dir(a.dataset_version)
    fetcher = VideoAndFrameFetcher(a)

    for f in sorted(glob(osp.join(a.pred_dir, "*.json"))):
        with open(f) as fh:
            pred = json.load(fh)
        vid = pred["video_id"]
        gt_jsons = glob(osp.join(gt_dir, f"{vid:06d}*.json"))
        assert len(gt_jsons) == 1, gt_jsons
        with open(gt_jsons[0]) as fh:
            gt = json.load(fh)
        frames, meta = fetcher.get_frames(gt)
        # RGB [T,H,W,3] -> BGR for cv2
        frames_by_name = {n: fr[..., ::-1]
                          for n, fr in zip(meta["filenames"], frames)}
        images, fnames = viz_pred_and_gt_masks(pred, gt, frames_by_name)
        for i, seq in enumerate(images):
            d = osp.join(out_dir, f"{vid:06d}", f"referral_{i}")
            os.makedirs(d, exist_ok=True)
            for fname, img in zip(fnames, seq):
                cv2.imwrite(osp.join(d, fname), img)
            with open(osp.join(d, "language.txt"), "w") as fh:
                fh.write("Prompt: "
                         + gt["object_referrals"][i]["prompt"] + "\n")
                fh.write("Caption: " + gt["caption_raw_en"] + "\n")
                fh.write("Caption (GPT): "
                         + gt.get("caption_raw_en_gpt", "") + "\n")


if __name__ == "__main__":
    main()
