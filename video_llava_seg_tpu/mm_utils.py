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
