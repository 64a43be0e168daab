"""Video-LLaVA-Seg multimodal meta-architecture (the flagship model).

Capability parity with llava/model/llava_arch.py + llava_llama.py:
vision tower -> projector -> slow/fast temporal token split -> splice visual
embeddings at IMAGE_TOKEN_INDEX sentinels -> Llama forward/generate ->
[SEG]-token hidden states -> SAM2 seg head.

TPU-first re-design of the splice: the reference builds each sample's
embedding sequence with a per-sample python loop over image chunks
(llava_arch.py:327-369). Here the layout is planned host-side in numpy (a
[L]-length gather map per sample: text-position or visual-position) and the
device does ONE fused gather from concat(text_embeds, visual_tokens) — no
data-dependent control flow inside jit."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.config import VideoLlavaConfig
from video_llava_seg_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from video_llava_seg_tpu.models import llama, projector, vit
from video_llava_seg_tpu.models import seg_head as seg_head_mod
from video_llava_seg_tpu.ops.pooling import adaptive_avg_pool_2d


def init(key, cfg: VideoLlavaConfig, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "llm": llama.init(k1, cfg.llm, dtype),
        "vision_tower": vit.init(k2, cfg.vision, dtype),
        "mm_projector": projector.init(k3, cfg.projector, dtype),
    }
    if cfg.seg is not None:
        sam2_cfg = seg_head_mod.make_sam2_cfg(cfg.seg)
        p["seg_head"] = seg_head_mod.init(k4, cfg.seg, cfg.llm.hidden_size,
                                          sam2_cfg, dtype)
    return p


# ---------------------------------------------------------------------------
# video encoding: slow/fast token scheme
# ---------------------------------------------------------------------------

def encode_video(params, cfg: VideoLlavaConfig, video,
                 interpret: bool = False):
    """video: [B, T, H, W, 3] normalized frames.

    Returns (slow [B, T_slow, N, D], fast [B, T, p*p, D] or None) —
    llava_arch.py:183-198: slow frames keep all patch tokens, every frame is
    adaptively avg-pooled to fast_pool_size^2 tokens."""
    from video_llava_seg_tpu.parallel.mesh import maybe_constrain

    tower = vit.apply_s2 if cfg.vision.s2_enabled else vit.apply
    feats = tower(params["vision_tower"], cfg.vision, video, interpret)
    feats = projector.apply(params["mm_projector"], feats)  # [B, T, N, D]
    # pin batch-sharded layout through the slice/reshape chain below (SPMD
    # otherwise falls back to involuntary full rematerialization in the vjp)
    feats = maybe_constrain(feats, "data")
    t = feats.shape[1]
    if cfg.num_slow_frames != cfg.num_frames:
        frame_ids = jnp.linspace(0, t - 1, cfg.num_slow_frames).astype(
            jnp.int32)
        slow = jnp.take(feats, frame_ids, axis=1)
        side = int(round(np.sqrt(feats.shape[2])))
        grid = maybe_constrain(
            feats.reshape(*feats.shape[:2], side, side, feats.shape[-1]),
            "data")
        fast = adaptive_avg_pool_2d(
            grid, (cfg.fast_pool_size, cfg.fast_pool_size))
        fast = fast.reshape(*feats.shape[:2], cfg.fast_pool_size**2,
                            feats.shape[-1])
        return slow, fast
    return feats, None


def visual_tokens_per_sample(cfg: VideoLlavaConfig) -> List[int]:
    """Token count per <image> sentinel: slow frames then fast frames."""
    if cfg.num_slow_frames != cfg.num_frames:
        return ([cfg.tokens_per_slow_frame] * cfg.num_slow_frames
                + [cfg.tokens_per_fast_frame] * cfg.num_frames)
    return [cfg.tokens_per_slow_frame] * cfg.num_frames


def flatten_visual_features(slow, fast):
    """[B, Ts, N, D] + [B, T, n, D] -> [B, Nvis, D] in splice order."""
    b = slow.shape[0]
    parts = [slow.reshape(b, -1, slow.shape[-1])]
    if fast is not None:
        parts.append(fast.reshape(b, -1, fast.shape[-1]))
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# splice planning (host-side numpy) + device assembly
# ---------------------------------------------------------------------------

class SplicePlan(NamedTuple):
    text_ids: np.ndarray      # [B, S_text] sentinel-free ids (0 at sentinels)
    gather_idx: np.ndarray    # [B, L] index into concat(text, visual)
    is_visual: np.ndarray     # [B, L] bool
    labels: np.ndarray        # [B, L] (IGNORE at visual + pad positions)
    attn_mask: np.ndarray     # [B, L] bool
    position_ids: np.ndarray  # [B, L]
    seq_lens: np.ndarray      # [B]


def build_splice_plan(input_ids: np.ndarray,
                      tokens_per_image: List[int],
                      labels: Optional[np.ndarray] = None,
                      max_length: Optional[int] = None,
                      pad_to: Optional[int] = None,
                      pad_side: str = "right",
                      input_lens: Optional[np.ndarray] = None) -> SplicePlan:
    """Plan the multimodal splice for a padded batch.

    input_ids: [B, S] with IMAGE_TOKEN_INDEX sentinels (and 0/pad elsewhere);
    tokens_per_image: expansion size of the i-th sentinel in every sample.
    The gather source is [text_embeds (S slots); visual tokens (Nvis slots)]
    per sample.

    pad_side='left' aligns every row's LAST real token at L-1 — the layout
    ragged batched generation needs (llama.greedy_generate pad_lens): the
    next-token logits sit at position -1 for all rows. Training keeps the
    default right padding (losses mask on labels/attn).

    input_lens: optional [B] — row b's real ids are input_ids[b, :len];
    trailing slots are collator padding, not text (ragged batches)."""
    b, s = input_ids.shape
    nvis_total = int(sum(tokens_per_image))
    rows = []
    for bi in range(b):
        row_len = s if input_lens is None else int(input_lens[bi])
        ids = input_ids[bi, :row_len]
        lbl = (labels[bi, :row_len] if labels is not None
               else np.full_like(ids, IGNORE_INDEX))
        img_pos = np.flatnonzero(ids == IMAGE_TOKEN_INDEX)
        gather, vis, lab = [], [], []
        vis_off = 0
        prev = 0
        for n_img, pos in enumerate(img_pos):
            for j in range(prev, pos):
                gather.append(j)
                vis.append(False)
                lab.append(lbl[j])
            count = tokens_per_image[n_img]
            for j in range(count):
                gather.append(s + vis_off + j)
                vis.append(True)
                lab.append(IGNORE_INDEX)
            vis_off += count
            prev = pos + 1
        for j in range(prev, row_len):
            gather.append(j)
            vis.append(False)
            lab.append(lbl[j])
        assert len(img_pos) in (0, len(tokens_per_image)), (
            f"expected 0 or {len(tokens_per_image)} image sentinels, got "
            f"{len(img_pos)}")
        rows.append((np.asarray(gather, np.int32),
                     np.asarray(vis, bool), np.asarray(lab, np.int64)))

    lens = np.asarray([len(r[0]) for r in rows])
    max_len = int(lens.max())
    if max_length is not None and max_len > max_length:
        max_len = max_length
    if pad_to is not None:
        max_len = max(max_len, pad_to)

    gather_idx = np.zeros((b, max_len), np.int32)
    is_visual = np.zeros((b, max_len), bool)
    out_labels = np.full((b, max_len), IGNORE_INDEX, np.int64)
    attn = np.zeros((b, max_len), bool)
    position_ids = np.zeros((b, max_len), np.int32)
    seq_lens = np.zeros((b,), np.int32)
    assert pad_side in ("right", "left"), pad_side
    for bi, (g, v, l) in enumerate(rows):
        n = min(len(g), max_len)
        sl = slice(max_len - n, None) if pad_side == "left" else slice(0, n)
        gather_idx[bi, sl] = g[:n]
        is_visual[bi, sl] = v[:n]
        out_labels[bi, sl] = l[:n]
        attn[bi, sl] = True
        position_ids[bi, sl] = np.arange(n)
        seq_lens[bi] = n

    text_ids = np.where(input_ids == IMAGE_TOKEN_INDEX, 0, input_ids)
    text_ids = np.where(text_ids < 0, 0, text_ids)
    return SplicePlan(text_ids.astype(np.int32), gather_idx, is_visual,
                      out_labels, attn, position_ids, seq_lens)


def assemble_embeds(params, plan_text_ids, gather_idx, visual_flat):
    """Device-side splice: one gather from concat(text_embeds, visual).

    plan_text_ids: [B, S]; gather_idx: [B, L]; visual_flat: [B, Nvis, D].
    Returns [B, L, D]."""
    text_embeds = llama.embed(params["llm"], plan_text_ids)
    source = jnp.concatenate(
        [text_embeds, visual_flat.astype(text_embeds.dtype)], axis=1)
    return jnp.take_along_axis(source, gather_idx[..., None], axis=1)


# ---------------------------------------------------------------------------
# forward (training) and generate (inference)
# ---------------------------------------------------------------------------

def forward(params, cfg: VideoLlavaConfig, video, plan: Dict,
            interpret: bool = False, remat: bool = False,
            return_logits: bool = True):
    """Training/eval forward on a spliced batch.

    video: [B, T, H, W, 3]; plan: dict of device arrays from
    build_splice_plan. remat = gradient checkpointing on the LLM blocks.
    return_logits=False skips the unembed (the train step computes text
    CE with the chunked fused lm-head loss instead — see llama.forward).
    Returns (logits | None, hidden_states)."""
    slow, fast = encode_video(params, cfg, video, interpret)
    visual = flatten_visual_features(slow, fast)
    embeds = assemble_embeds(params, plan["text_ids"], plan["gather_idx"],
                             visual)
    logits, hidden = llama.forward(params["llm"], cfg.llm, embeds,
                                   plan["position_ids"],
                                   interpret=interpret, remat=remat,
                                   return_logits=return_logits)
    return logits, hidden


def generate(params, cfg: VideoLlavaConfig, input_ids: np.ndarray, video,
             max_new_tokens: int = 256,
             eos_token_ids: Tuple[int, ...] = (),
             stop_sequences: Tuple[Tuple[int, ...], ...] = (),
             pad_side: str = "right",
             input_lens: Optional[np.ndarray] = None,
             temperature: float = 0.0, top_p=None, rng=None,
             num_beams: int = 1, length_penalty: float = 1.0,
             interpret: bool = False):
    """Caption generation, batch-native; greedy by default, in-graph
    temperature/top_p sampling when temperature > 0 (reference
    inference/main.py:124-138 do_sample gate — see llama._select_token).

    The reference hard-asserts batch 1 here (llava_llama.py:313); this
    path serves B clips per dispatch (bench config 7) — equal-length
    prompts batch directly, ragged prompts batch with pad_side='left'
    (pad keys masked in prefill and decode, rows stop per-row).

    input_ids: [B, S] numpy with IMAGE_TOKEN_INDEX sentinels;
    video: [B, T, H, W, 3] normalized — or [1, T, H, W, 3] with B > 1
    prompts, in which case the video encodes ONCE and its visual tokens
    broadcast across rows (several queries about one video, the
    --batch_queries serving mode; the reference re-encodes per query).

    Returns (tokens [B, max_new], hidden [B, max_new, D], n_generated)."""
    plan = build_splice_plan(np.asarray(input_ids),
                             visual_tokens_per_sample(cfg),
                             max_length=cfg.tokenizer_model_max_length,
                             pad_side=pad_side, input_lens=input_lens)
    slow, fast = encode_video(params, cfg, jnp.asarray(video), interpret)
    visual = flatten_visual_features(slow, fast)
    b = plan.text_ids.shape[0]
    if visual.shape[0] == 1 and b > 1:
        visual = jnp.broadcast_to(visual, (b,) + visual.shape[1:])
    embeds = assemble_embeds(params, jnp.asarray(plan.text_ids),
                             jnp.asarray(plan.gather_idx), visual)
    pad_lens = None
    if pad_side == "left":
        pad_lens = jnp.asarray(
            plan.gather_idx.shape[1] - plan.seq_lens, jnp.int32)
    if num_beams > 1:
        if temperature:
            raise ValueError("beam search and sampling are exclusive "
                             "(HF beam-sample is not supported)")
        if embeds.shape[0] != 1:
            raise ValueError("beam search serves one prompt at a time")
        return llama.beam_generate(
            params["llm"], cfg.llm, embeds, prompt_len=embeds.shape[1],
            max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
            num_beams=num_beams, length_penalty=length_penalty,
            stop_sequences=stop_sequences, interpret=interpret)
    tokens, hidden, n = llama.greedy_generate(
        params["llm"], cfg.llm, embeds, prompt_len=embeds.shape[1],
        max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
        stop_sequences=stop_sequences, pad_lens=pad_lens,
        temperature=temperature, top_p=top_p, rng=rng,
        interpret=interpret)
    return tokens, hidden, n


def extract_seg_hidden(tokens: np.ndarray, hidden, seg_token_idx: int,
                       n_generated: int, fallback_first: bool = False):
    """Gather the hidden states whose positions emitted [SEG] tokens
    (llava_llama.py:184-199 semantics). Returns [N_seg, D] numpy.

    fallback_first: when no [SEG] token was emitted, warn and treat the
    token at index 0 as the seg token — the reference's inference-time
    behavior (llava_llama.py:316-318), so a referral query always yields
    a mask."""
    tokens = np.asarray(tokens)[0, :n_generated]
    hid = np.asarray(hidden)[0, :n_generated]
    sel = tokens == seg_token_idx
    if fallback_first and not sel.any() and n_generated > 0:
        print(f"WARN: No seg token found in output. Assuming that token at "
              f"index 0 with ID {int(tokens[0])} is the seg token")
        sel = np.zeros_like(sel)
        sel[0] = True
    return hid[sel]


def forward_seg_head_inference(params, cfg: VideoLlavaConfig, tokens, hidden,
                               n_generated: int, seg_frames,
                               seg_meta: List[Dict[str, Any]],
                               interpret: bool = False):
    """Run the seg head on [SEG] hidden states (llava_llama.py:304-338).

    seg_frames: list of [T, H, W, 3] in [0, 1]. Returns list of
    [N, T, H', W'] mask logits."""
    seg_hidden = extract_seg_hidden(tokens, hidden, cfg.seg_token_idx,
                                    n_generated, fallback_first=True)
    if seg_hidden.shape[0] == 0:
        return None
    sam2_cfg = seg_head_mod.make_sam2_cfg(cfg.seg)
    return seg_head_mod.forward(
        params["seg_head"], cfg.seg, sam2_cfg,
        [jnp.asarray(f) for f in seg_frames],
        [jnp.asarray(seg_hidden)], seg_meta,
        resize_to_original_dims=True, interpret=interpret)
