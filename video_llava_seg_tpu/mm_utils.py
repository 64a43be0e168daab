"""Tokenization & multimodal utilities (llava/mm_utils.py parity)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX


def tokenizer_image_token(prompt: str, tokenizer,
                          image_token_index: int = IMAGE_TOKEN_INDEX,
                          return_tensors: Optional[str] = None):
    """Split the prompt on '<image>' and interleave the sentinel id
    (mm_utils.py:185-204 parity, incl. BOS offset handling)."""
    prompt_chunks = [tokenizer(chunk).input_ids
                     for chunk in prompt.split("<image>")]

    def insert_separator(X, sep):
        return [ele for sublist in zip(X, [sep] * len(X))
                for ele in sublist][:-1]

    input_ids: List[int] = []
    offset = 0
    if (len(prompt_chunks) > 0 and len(prompt_chunks[0]) > 0
            and prompt_chunks[0][0] == tokenizer.bos_token_id):
        offset = 1
        input_ids.append(prompt_chunks[0][0])
    for x in insert_separator(prompt_chunks,
                              [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])

    if return_tensors == "np":
        return np.asarray(input_ids, np.int64)
    if return_tensors is not None:
        raise ValueError(f"Unsupported tensor type: {return_tensors}")
    return input_ids


def expand2square(pil_img, background_color):
    """Pad a PIL image to square (mm_utils.py expand2square parity)."""
    from PIL import Image

    width, height = pil_img.size
    if width == height:
        return pil_img
    if width > height:
        result = Image.new(pil_img.mode, (width, width), background_color)
        result.paste(pil_img, (0, (width - height) // 2))
        return result
    result = Image.new(pil_img.mode, (height, height), background_color)
    result.paste(pil_img, ((height - width) // 2, 0))
    return result


def get_model_name_from_path(model_path: str) -> str:
    model_path = model_path.strip("/")
    parts = model_path.split("/")
    if parts[-1].startswith("checkpoint-"):
        return parts[-2] + "_" + parts[-1]
    return parts[-1]


def trim_at_keywords(text: str, keywords: List[str]) -> str:
    """Decode-side equivalent of KeywordsStoppingCriteria
    (mm_utils.py:215-247): cut the generation at the first keyword."""
    cut = len(text)
    for kw in keywords:
        idx = text.find(kw)
        if idx != -1:
            cut = min(cut, idx)
    return text[:cut]


# ---------------------------------------------------------------------------
# anyres helpers (mm_utils.py:12-145) — LLaVA-1.6 variable-resolution tiling
# ---------------------------------------------------------------------------

def select_best_resolution(original_size, possible_resolutions):
    """Pick the (w, h) grid maximizing effective resolution then minimizing
    waste (mm_utils.py:12-39)."""
    ow, oh = original_size
    best_fit = None
    max_eff = 0
    min_waste = float("inf")
    for w, h in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best_fit = eff, waste, (w, h)
    return best_fit


def resize_and_pad_image(image, target_resolution):
    """Aspect-preserving resize + black center pad (mm_utils.py:42-75)."""
    import math

    from PIL import Image

    ow, oh = image.size
    tw, th = target_resolution
    if tw / ow < th / oh:
        nw, nh = tw, min(math.ceil(oh * tw / ow), th)
    else:
        nh, nw = th, min(math.ceil(ow * th / oh), tw)
    resized = image.resize((nw, nh))
    out = Image.new("RGB", (tw, th), (0, 0, 0))
    out.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
    return out


def divide_to_patches(image, patch_size: int):
    """Crop into a raster-order grid of patch_size tiles
    (mm_utils.py:78-97)."""
    patches = []
    w, h = image.size
    for i in range(0, h, patch_size):
        for j in range(0, w, patch_size):
            patches.append(image.crop((j, i, j + patch_size,
                                       i + patch_size)))
    return patches


def get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size: int):
    """(w, h) tile-grid shape for an image under anyres
    (mm_utils.py:100-117)."""
    import ast

    res = (grid_pinpoints if isinstance(grid_pinpoints, list)
           else ast.literal_eval(grid_pinpoints))
    w, h = select_best_resolution(image_size, res)
    return w // patch_size, h // patch_size


def process_anyres_image(image, grid_pinpoints, crop_size: int,
                         shortest_edge: int, preprocess_fn):
    """Tile an arbitrary-resolution image: [base resize] + grid crops, each
    run through preprocess_fn -> stacked [N, ...] (mm_utils.py:120-145).

    preprocess_fn: PIL image -> np/jnp array (the framework's functional
    stand-in for the HF processor object)."""
    import ast

    res = (grid_pinpoints if isinstance(grid_pinpoints, list)
           else ast.literal_eval(grid_pinpoints))
    best = select_best_resolution(image.size, res)
    padded = resize_and_pad_image(image, best)
    patches = divide_to_patches(padded, crop_size)
    base = image.resize((shortest_edge, shortest_edge))
    return np.stack([np.asarray(preprocess_fn(p))
                     for p in [base] + patches], axis=0)


def load_image_from_base64(image_b64: str):
    """mm_utils.py load_image_from_base64 parity."""
    import base64
    from io import BytesIO

    from PIL import Image

    return Image.open(BytesIO(base64.b64decode(image_b64)))
