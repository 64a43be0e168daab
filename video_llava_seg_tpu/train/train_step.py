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
    _, hidden = llava.forward(params, cfg, batch["video"], batch,
                              interpret=interpret, remat=remat,
                              return_logits=False)
    # chunked fused lm-head + CE: equal to text_ce_loss(unembed(hidden))
    # without the full fp32 [S, V] logits buffer (see losses.py)
    loss_text, num_tok = losses.text_ce_loss_fused(
        params["llm"], cfg.llm, hidden, batch["labels"])
    metrics = {"loss_text": loss_text, "num_text_tokens": num_tok}
    total = loss_text

    if "seg_frames" in batch and cfg.seg is not None:
        from video_llava_seg_tpu.ops.resize import interpolate_hw

        sam2_cfg = seg_head_mod.make_sam2_cfg(cfg.seg)
        b, ts = batch["seg_frames"].shape[:2]
        img_sz = sam2_cfg.image_size

        # one flat [B*Ts] Hiera dispatch + one batched mask decode (compile
        # time and dispatch count stay constant in per_device_batch_size)
        from video_llava_seg_tpu.parallel.mesh import maybe_constrain_grad

        frames_flat = batch["seg_frames"].reshape(
            b * ts, *batch["seg_frames"].shape[2:])
        feats, high_res = seg_head_mod.encode_video_frames(
            params["seg_head"], sam2_cfg, frames_flat, interpret)
        # keep seg-head activations sharded along 'data' across the reshape
        # in BOTH directions: without the primal constraint SPMD does a full
        # involuntary rematerialization on the forward, and without the
        # cotangent constraint it does the same on transpose(jvp()) — both
        # seen in the 4x2 dryrun tails (r1 fwd, r2 bwd)
        feats = maybe_constrain_grad(
            feats.reshape(b, ts, *feats.shape[1:]), "data")
        high_res = [maybe_constrain_grad(h.reshape(b, ts, *h.shape[1:]),
                                         "data")
                    for h in high_res]
        pos = jnp.clip(batch["seg_token_pos"], 0, None)     # [B, N]
        seg_tokens = jnp.take_along_axis(hidden, pos[..., None],
                                         axis=1)            # [B, N, D]
        low = seg_head_mod.decode_masks_batched(
            params["seg_head"], cfg.seg, sam2_cfg, feats, high_res,
            seg_tokens, interpret)               # [B, N, Q, Ts, s/4, s/4]
        low = maybe_constrain_grad(low, "data")
        # reference computes the loss at the model-res UNPADDED size
        # (forward_seg_head_train uses resize_to_original_dims=False);
        # static-shape equivalent: upsample to padded img_sz and mask
        # the padded region out of every loss term. The max over an
        # object's Q queries comes AFTER the upsample (sam2.py:126-128 —
        # max does not commute with bilinear resize).
        pred = interpolate_hw(low.astype(jnp.float32),
                              (img_sz, img_sz), "bilinear")
        pred = jnp.max(pred, axis=2)                # [B, N, Ts, img, img]

        def per_sample(pred_b, gt_b, valid_b, n_valid_b, pad_b, has_b, key):
            ys = jnp.arange(img_sz)
            xs = jnp.arange(img_sz)
            pixel_mask = ((ys[:, None] >= pad_b[2])
                          & (ys[:, None] < img_sz - pad_b[3])
                          & (xs[None, :] >= pad_b[0])
                          & (xs[None, :] < img_sz - pad_b[1]))
            out_real = losses.mask_loss(pred_b, gt_b, valid_mask=valid_b,
                                        key=key, dummy=False,
                                        pixel_mask=pixel_mask,
                                        dice_weight=dice_w, ce_weight=ce_w)
            out_dummy = losses.mask_loss(pred_b, gt_b, valid_mask=valid_b,
                                         dummy=True, align=False)
            use_dummy = jnp.logical_not(has_b)
            pick = lambda a, b_: jnp.where(use_dummy, b_, a)  # noqa: E731
            return (pick(out_real["dice_sum"], out_dummy["dice_sum"]),
                    pick(out_real["ce_sum"], out_dummy["ce_sum"]),
                    pick(out_real["num_masks"], 0.0),
                    pick(jnp.sum(out_real["mask_ious"]), 0.0),
                    pick(n_valid_b, 0.0))

        valid = (batch["seg_valid"][:, :, None]
                 & batch["seg_frame_valid"][:, None, :])    # [B, N, Ts]
        n_valid = jnp.sum(batch["seg_valid"].astype(jnp.float32), axis=1)
        dsum, csum, nmask, iou, ntr = jax.vmap(per_sample)(
            pred, batch["seg_masks"], valid, n_valid, batch["seg_padding"],
            batch["has_masks"], jax.random.split(rng, b))
        # batch-GLOBAL normalization: the reference concatenates every
        # sample's (N*T) masks and divides the summed dice/BCE once by the
        # total count (mask_loss.py:43-57) — per-sample means summed over
        # the batch would overweight small-object samples by up to Bx
        # (caught by tests/test_e2e_reference_parity.py)
        num_total = jnp.sum(nmask)
        loss_dice = jnp.sum(dsum) / (num_total + 1e-8)
        loss_ce = jnp.sum(csum) / (num_total + 1e-8)
        dw = losses.DICE_WEIGHT if dice_w is None else dice_w
        cw = losses.CE_WEIGHT if ce_w is None else ce_w
        loss_mask = loss_dice * dw + loss_ce * cw
        total = total + loss_mask
        metrics.update({
            "loss_mask": loss_mask, "loss_mask_dice": loss_dice,
            "loss_mask_ce": loss_ce, "mask_iou_sum": jnp.sum(iou),
            "num_object_tracks": jnp.sum(ntr),
        })
    metrics["loss"] = total
    return total, metrics


def canonical_state_shardings(state) -> Optional[TrainState]:
    """The state-sharding fixed point for make_train_step: mesh-sharded
    leaves keep their NamedSharding, everything else (step, optax count
    scalars — created uncommitted by tx.init) pins mesh-REPLICATED. This
    is also exactly how restore_checkpoint re-pins restored scalars, so
    fresh, mid-run, and restored states share one executable. Returns
    None when no leaf is mesh-sharded (single-device runs)."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = next((leaf.sharding.mesh
                 for leaf in jax.tree_util.tree_leaves(state)
                 if isinstance(getattr(leaf, "sharding", None),
                               NamedSharding)), None)
    if mesh is None:
        return None
    rep = NamedSharding(mesh, PartitionSpec())

    def f(x):
        s = getattr(x, "sharding", None)
        return s if isinstance(s, NamedSharding) else rep

    return jax.tree_util.tree_map(f, state)


def make_train_step(cfg: VideoLlavaConfig, tcfg: TrainConfig, tx,
                    donate: bool = True, interpret: bool = False,
                    state_shardings: Optional[TrainState] = None):
    """Build the jitted train step closure.

    state_shardings: pin the OUTPUT state's shardings (pass
    `jax.tree_util.tree_map(lambda x: x.sharding, state)`). Without it,
    GSPMD is free to emit outputs with compiler-chosen shardings that
    differ from the canonical shard_params layout; the state's sharding
    then drifts after step 1, and a checkpoint-restored state (canonical
    layout) dispatches a DIFFERENT executable variant than a mid-run
    state — ULP-level divergence that breaks bitwise resume
    (tests/test_fsdp_training.py pins this). With it, the state layout is
    a fixed point of the step, so fresh, mid-run, and restored states all
    hit one executable."""

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
        # allow_int: a quantized (QLoRA) base carries int8/packed kernels;
        # their float0 cotangents are replaced below. Zeroing FROZEN
        # components' grads right here (not in the optimizer) lets XLA
        # dead-code their weight-grad einsums out of the backward pass —
        # activations still backprop THROUGH frozen blocks, but the
        # per-weight grads (~1/3 of backward FLOPs per frozen component)
        # are never computed — and makes grad_norm cover trainable params
        # only (HF Trainer clips over params requiring grad).
        from video_llava_seg_tpu.train.optimizer import trainable_mask

        mask = trainable_mask(tcfg, state.params)
        grad_fn = jax.value_and_grad(
            lambda p: loss_of(p, batch, rng), has_aux=True, allow_int=True)
        (loss, metrics), grads = grad_fn(state.params)
        grads = jax.tree_util.tree_map(
            # int (quantized) params get FLOAT zero grads: optax's clip
            # can't scale int8, and apply_updates casts back to the param
            # dtype anyway, so the int8 base stays bit-identical
            lambda m, g, p: g if m else jnp.zeros(
                p.shape,
                p.dtype if jnp.issubdtype(p.dtype, jnp.inexact)
                else jnp.float32),
            mask, grads, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(
            [g for m, g in zip(jax.tree_util.tree_leaves(mask),
                               jax.tree_util.tree_leaves(grads)) if m])
        return TrainState(state.step + 1, params, opt_state), metrics

    kw = {}
    if state_shardings is not None:
        kw["out_shardings"] = (state_shardings, None)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else (), **kw)
