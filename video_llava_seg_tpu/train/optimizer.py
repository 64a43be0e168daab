"""Optimizer: per-component learning rates + decay/no-decay split.

TPU-native equivalent of the reference trainer's 9 optimizer param groups
(llava/train/llava_trainer.py:201-365): {llm, vision_tower, projector,
seg_encoder, seg_decoder} x {decay, no_decay} via optax.multi_transform,
with cosine schedule + warmup and frozen-component masking
(train.py:492-534 freeze policy)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from video_llava_seg_tpu.config import TrainConfig


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def component_of(path: str) -> str:
    if path.startswith("lora"):
        return "lora"
    if path.startswith("seg_head/image_encoder"):
        return "seg_encoder"
    if path.startswith("seg_head"):
        return "seg_decoder"
    if path.startswith("vision_tower"):
        return "vision_tower"
    if path.startswith("mm_projector"):
        return "projector"
    return "llm"


def _no_decay(path: str, leaf) -> bool:
    """Norms/biases/embedding-like 1-D params skip weight decay."""
    return leaf.ndim <= 1 or "norm" in path or "bias" in path


def param_labels(params):
    def f(path, leaf):
        p = _path_str(path)
        return f"{component_of(p)}/{'nd' if _no_decay(p, leaf) else 'wd'}"

    return jax.tree_util.tree_map_with_path(f, params)


def frozen_components(cfg: TrainConfig) -> Dict[str, bool]:
    """Which optimizer components receive no updates (freeze policy +
    peft semantics: LoRA implies frozen base LLM, train.py:410-426)."""
    return {
        "llm": cfg.freeze_llm or cfg.lora_enable,
        "vision_tower": cfg.freeze_vision_tower,
        "projector": cfg.freeze_projector,
        "seg_encoder": cfg.freeze_seg_encoder,
        "seg_decoder": cfg.freeze_seg_decoder,
        "lora": not cfg.lora_enable,
    }


def trainable_mask(cfg: TrainConfig, params):
    """Per-leaf python-bool tree: True where the optimizer will update.

    Integer leaves (int8/int4-packed quantized kernels) are never
    trainable regardless of component. train_step uses this to ZERO
    frozen gradients right after the backward pass — XLA then dead-codes
    the frozen components' weight-grad computations entirely, and the
    reported grad_norm covers trainable params only (HF Trainer
    semantics: the clip norm is over params requiring grad)."""
    frozen = frozen_components(cfg)

    def f(path, leaf):
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
            return False
        return not frozen[component_of(_path_str(path))]

    return jax.tree_util.tree_map_with_path(f, params)


def build_optimizer(cfg: TrainConfig, params):
    """Returns an optax GradientTransformation over the full param tree."""
    lrs = {
        "llm": cfg.lrs.llm,
        "vision_tower": cfg.lrs.vision_tower,
        "projector": cfg.lrs.projector,
        "seg_encoder": cfg.lrs.seg_encoder,
        "seg_decoder": cfg.lrs.seg_decoder,
        "lora": cfg.lrs.lora,
    }
    frozen = frozen_components(cfg)
    warmup = max(1, int(cfg.warmup_ratio * cfg.num_train_steps))
    # keep decay_steps positive on tiny runs (warmup must be < total)
    warmup = min(warmup, max(1, cfg.num_train_steps - 1))

    def make_sched(peak):
        if cfg.num_train_steps <= 1:
            return peak
        if cfg.lr_schedule == "cosine":
            return optax.warmup_cosine_decay_schedule(
                0.0, peak, warmup, cfg.num_train_steps)
        # HF 'linear': warmup to peak then linear decay to 0 over the rest
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, warmup),
             optax.linear_schedule(peak, 0.0, cfg.num_train_steps - warmup)],
            [warmup])

    transforms: Dict[str, Any] = {}
    for comp, peak in lrs.items():
        for decay_key, wd in (("wd", cfg.lrs.weight_decay), ("nd", 0.0)):
            label = f"{comp}/{decay_key}"
            if frozen[comp]:
                transforms[label] = optax.set_to_zero()
            else:
                transforms[label] = optax.adamw(
                    make_sched(peak), b1=cfg.adam_b1, b2=cfg.adam_b2,
                    eps=cfg.adam_eps, weight_decay=wd)
    labels = param_labels(params)
    # one GLOBAL clip across the whole gradient tree (HF/DeepSpeed trainer
    # semantics) — clipping inside each group would compute 12 per-group
    # norms and overshoot max_grad_norm by up to sqrt(#groups)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.multi_transform(transforms, labels))
    if cfg.gradient_accumulation_steps > 1:
        # micro-batch accumulation (DeepSpeed gradient_accumulation_steps /
        # HF --gradient_accumulation_steps equivalent); train_loop steps are
        # micro-steps, params update every k-th
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
