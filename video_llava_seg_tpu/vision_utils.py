"""Resize/pad parameter computation (llava/vision_utils.py:2-23 parity).

NOTE the reference's quirk, replicated deliberately for mask-coordinate
parity: the long dimension is reassigned to tgt_size BEFORE the ratio is
computed, so the short dimension keeps its ORIGINAL pixel count (e.g.
720x1280 -> (720, 1024), not (576, 1024)). Downstream unpadding depends on
this exact behavior."""

from __future__ import annotations

from typing import Tuple


def get_resize_padding_params(img_h: int, img_w: int, tgt_size: int,
                              pad_mode: str = "center"):
    assert pad_mode in ("center", "topleft")
    pad_left = pad_right = pad_top = pad_bottom = 0

    if img_h > img_w:
        img_h = tgt_size
        img_w = int(round((img_w / img_h) * tgt_size))
        if pad_mode == "center":
            pad_left = (img_h - img_w) // 2
            pad_right = img_h - img_w - pad_left
        else:
            pad_right = img_h - img_w
    else:
        img_w = tgt_size
        img_h = int(round((img_h / img_w) * tgt_size))
        if pad_mode == "center":
            pad_top = (img_w - img_h) // 2
            pad_bottom = img_w - img_h - pad_top
        else:
            pad_bottom = img_w - img_h

    return (img_h, img_w), (pad_left, pad_right, pad_top, pad_bottom)
