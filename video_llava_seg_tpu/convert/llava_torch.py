"""Full Video-LLaVA-Seg torch checkpoint -> framework params.

Mirrors llava/train/misc.py:49-121 (multi-shard safetensors/bin loading,
vocab-size padding with the mean embedding, tolerance for a missing seg
head on cross-stage warm starts) over the reference's HF key layout:
model.layers.* (LLM), model.vision_tower.vision_tower.* (CLIP),
model.mm_projector.*, model.seg_head.*."""

from __future__ import annotations

import glob
import json
import os.path as osp
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from video_llava_seg_tpu.config import VideoLlavaConfig


def load_torch_shards(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors (or pytorch_model*.bin) shards into numpy."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(osp.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as fh:
                for k in fh.keys():
                    sd[k] = fh.get_tensor(k)
        return sd
    bin_files = sorted(glob.glob(osp.join(model_dir, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint shards in {model_dir}")
    import torch

    for f in bin_files:
        part = torch.load(f, map_location="cpu", weights_only=True)
        sd.update({k: v.float().numpy() for k, v in part.items()})
    return sd


def _pad_vocab(weight: np.ndarray, target: int) -> np.ndarray:
    """Pad new vocab rows with the mean embedding (misc.py:90-108)."""
    cur = weight.shape[0]
    if cur >= target:
        return weight[:target]
    mean = weight.mean(axis=0, keepdims=True)
    pad = np.repeat(mean, target - cur, axis=0)
    return np.concatenate([weight, pad], axis=0)


def convert_llava_state_dict(sd: Dict[str, np.ndarray],
                             cfg: VideoLlavaConfig,
                             params: Optional[dict] = None,
                             sam2_no_mem_embed=None) -> dict:
    """Convert a full reference state dict; fall back to `params` entries for
    components missing from the checkpoint (e.g. seg head at stage 2->3).

    sam2_no_mem_embed: the SAM2 backbone checkpoint's no_mem_embed tensor —
    required when converting a REAL reference checkpoint with a seg head,
    because the reference never serializes it (seg_head.convert_torch)."""
    from video_llava_seg_tpu.convert.hf_clip import convert_clip_vision
    from video_llava_seg_tpu.convert.hf_llama import convert_llama
    from video_llava_seg_tpu.models import projector as proj_mod
    from video_llava_seg_tpu.models import seg_head as seg_mod

    out = dict(params) if params is not None else {}

    # LLM (with vocab padding for added special tokens)
    llm_sd = {k: v for k, v in sd.items()
              if k.startswith(("model.layers", "model.embed_tokens",
                               "model.norm", "lm_head"))}
    if llm_sd:
        emb_key = "model.embed_tokens.weight"
        if emb_key in llm_sd:
            llm_sd[emb_key] = _pad_vocab(np.asarray(llm_sd[emb_key]),
                                         cfg.llm.vocab_size)
        if "lm_head.weight" in llm_sd:
            llm_sd["lm_head.weight"] = _pad_vocab(
                np.asarray(llm_sd["lm_head.weight"]), cfg.llm.vocab_size)
        out["llm"] = convert_llama(llm_sd, cfg.llm)

    # vision tower: CLIP (vision_model.*) or RADIO (radio_model.*)
    vt_base = "model.vision_tower.vision_tower."
    vt_prefix = vt_base + "vision_model."
    radio_prefix = vt_base + "radio_model."
    if any(k.startswith(vt_prefix) for k in sd):
        vt_sd = {k[len(vt_base):]: v
                 for k, v in sd.items() if k.startswith(vt_prefix)}
        out["vision_tower"] = convert_clip_vision(vt_sd,
                                                  cfg.vision.num_layers)
    elif any(k.startswith(radio_prefix) for k in sd):
        from video_llava_seg_tpu.convert.radio import convert_radio
        vt_sd = {k[len(vt_base):]: v
                 for k, v in sd.items() if k.startswith(radio_prefix)}
        out["vision_tower"] = convert_radio(vt_sd, cfg.vision)

    # projector ('model.mm_projector.0.weight' style)
    if any(k.startswith("model.mm_projector.") for k in sd):
        proj_sd = {k[len("model.mm_projector."):]: v for k, v in sd.items()
                   if k.startswith("model.mm_projector.")}
        out["mm_projector"] = proj_mod.convert_torch(proj_sd, cfg.projector)

    # seg head (tolerated missing, misc.py:111-118)
    if cfg.seg is not None and any(k.startswith("model.seg_head.")
                                   for k in sd):
        seg_sd = {k[len("model.seg_head."):]: v for k, v in sd.items()
                  if k.startswith("model.seg_head.")}
        sam2_cfg = seg_mod.make_sam2_cfg(cfg.seg)
        out["seg_head"] = seg_mod.convert_torch(
            seg_sd, cfg.seg, sam2_cfg, no_mem_embed=sam2_no_mem_embed)
    return out


def load_llava_weights(model_dir: str, cfg: VideoLlavaConfig,
                       params: Optional[dict] = None,
                       sam2_ckpt: Optional[str] = None) -> dict:
    """sam2_ckpt: path to the SAM2 backbone .pt checkpoint — supplies the
    non-serialized no_mem_embed when the llava checkpoint carries a seg
    head (mirrors the reference re-building the head from the hub,
    llava/model/seg_head/builder.py + sam2/build_sam.py:141-151)."""
    no_mem = None
    if sam2_ckpt is not None:
        import torch

        ck = torch.load(sam2_ckpt, map_location="cpu", weights_only=True)
        no_mem = ck.get("model", ck)["no_mem_embed"].float().numpy()
    return convert_llava_state_dict(load_torch_shards(model_dir), cfg,
                                    params, sam2_no_mem_embed=no_mem)
