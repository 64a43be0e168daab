"""The pjit-compiled training step.

TPU-native equivalent of the reference's HF-Trainer + DeepSpeed ZeRO-2 loop
(llava/train/llava_trainer.py:534-595): one jitted function computing
text CE + seg mask losses, grads, and the optax update, sharded over the
('data','model') mesh. ZeRO-equivalence comes from sharding optimizer state
like the (optionally FSDP-sharded) params; gradient checkpointing via
jax.checkpoint on the LLM blocks is handled by remat policy flags."""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from video_llava_seg_tpu.config import TrainConfig, VideoLlavaConfig
from video_llava_seg_tpu.models import llama, llava
from video_llava_seg_tpu.models import seg_head as seg_head_mod
from video_llava_seg_tpu.train import losses


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tcfg: TrainConfig) -> Tuple[TrainState, Any]:
    from video_llava_seg_tpu.train.optimizer import build_optimizer

    tx = build_optimizer(tcfg, params)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state), tx


def compute_loss(params, cfg: VideoLlavaConfig, batch: Dict, rng,
                 interpret: bool = False, remat: bool = False,
                 dice_w=None, ce_w=None):
    """Caption CE + optional mask loss for a spliced batch.

    batch keys: video [B,T,H,W,3], text_ids, gather_idx, position_ids,
    labels; optional seg: seg_frames [B,Ts,H,W,3] in [0,1], seg_masks
    [B,N,Ts,h,w] bool, seg_valid [B,N] bool, seg_token_pos [B,N] int
    (position of each [SEG]'s producing hidden state, -1 = none),
    has_masks [B] bool (caption-only samples take the dummy path)."""
    logits, hidden = llava.forward(params, cfg, batch["video"], batch,
                                   interpret=interpret, remat=remat)
    loss_text, num_tok = losses.text_ce_loss(logits, batch["labels"])
    metrics = {"loss_text": loss_text, "num_text_tokens": num_tok}
    total = loss_text

    if "seg_frames" in batch and cfg.seg is not None:
        from video_llava_seg_tpu.ops.resize import interpolate_hw

        sam2_cfg = seg_head_mod.make_sam2_cfg(cfg.seg)
        b = batch["seg_frames"].shape[0]
        img_sz = sam2_cfg.image_size
        loss_mask_sum = 0.0
        dice_sum = 0.0
        ce_sum = 0.0
        iou_sum = 0.0
        n_tracks = 0.0
        for bi in range(b):  # B static and small (per-chip batch 1-2)
            frames = batch["seg_frames"][bi]
            feats, high_res = seg_head_mod.encode_video_frames(
                params["seg_head"], sam2_cfg, frames, interpret)
            pos = batch["seg_token_pos"][bi]            # [N]
            seg_tokens = jnp.take(hidden[bi], jnp.clip(pos, 0, None),
                                  axis=0)               # [N, D]
            low = seg_head_mod.decode_masks(
                params["seg_head"], cfg.seg, sam2_cfg, feats, high_res,
                seg_tokens, interpret)                  # [N, Ts, s/4, s/4]
            # reference computes the loss at the model-res UNPADDED size
            # (forward_seg_head_train uses resize_to_original_dims=False);
            # static-shape equivalent: upsample to padded img_sz and mask
            # the padded region out of every loss term
            pred = interpolate_hw(low.astype(jnp.float32),
                                  (img_sz, img_sz), "bilinear")
            pad = batch["seg_padding"][bi]              # [4] l, r, t, b
            ys = jnp.arange(img_sz)
            xs = jnp.arange(img_sz)
            pixel_mask = ((ys[:, None] >= pad[2])
                          & (ys[:, None] < img_sz - pad[3])
                          & (xs[None, :] >= pad[0])
                          & (xs[None, :] < img_sz - pad[1]))
            gt = batch["seg_masks"][bi]                 # [N, Ts, img, img]
            valid = (batch["seg_valid"][bi][:, None]
                     & batch["seg_frame_valid"][bi][None, :])
            key = jax.random.fold_in(rng, bi)
            out_real = losses.mask_loss(pred, gt, valid_mask=valid, key=key,
                                        dummy=False, pixel_mask=pixel_mask,
                                        dice_weight=dice_w, ce_weight=ce_w)
            out_dummy = losses.mask_loss(pred, gt, valid_mask=valid,
                                         dummy=True, align=False)
            use_dummy = jnp.logical_not(batch["has_masks"][bi])
            pick = lambda a, b_: jnp.where(use_dummy, b_, a)  # noqa: E731
            loss_mask_sum += pick(out_real["loss_mask"],
                                  out_dummy["loss_mask"])
            dice_sum += pick(out_real["loss_mask_dice"],
                             out_dummy["loss_mask_dice"])
            ce_sum += pick(out_real["loss_mask_ce"],
                           out_dummy["loss_mask_ce"])
            iou_sum += pick(jnp.sum(out_real["mask_ious"]), 0.0)
            n_tracks += pick(jnp.sum(batch["seg_valid"][bi].astype(
                jnp.float32)), 0.0)
        total = total + loss_mask_sum
        metrics.update({
            "loss_mask": loss_mask_sum, "loss_mask_dice": dice_sum,
            "loss_mask_ce": ce_sum, "mask_iou_sum": iou_sum,
            "num_object_tracks": n_tracks,
        })
    metrics["loss"] = total
    return total, metrics


def make_train_step(cfg: VideoLlavaConfig, tcfg: TrainConfig, tx,
                    donate: bool = True, interpret: bool = False):
    """Build the jitted train step closure."""

    def loss_of(p, batch, rng):
        if tcfg.lora_enable and "lora" in p:
            from video_llava_seg_tpu.train import lora as lora_mod

            base = {k: v for k, v in p.items() if k != "lora"}
            p = lora_mod.merge(base, p["lora"], tcfg.lora_alpha)
        return compute_loss(p, cfg, batch, rng, interpret,
                            remat=tcfg.gradient_checkpointing,
                            dice_w=tcfg.mask_dice_weight,
                            ce_w=tcfg.mask_ce_weight)

    def step_fn(state: TrainState, batch: Dict, rng):
        grad_fn = jax.value_and_grad(
            lambda p: loss_of(p, batch, rng), has_aux=True)
        (loss, metrics), grads = grad_fn(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
