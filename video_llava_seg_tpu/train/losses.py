"""Training losses: masked text CE + dice/BCE mask losses + Hungarian
matching.

Parity targets: llava/model/seg_head/mask_loss.py (scaled dice with
scale=1000, sigmoid BCE, weights dice=1.0 ce=2.0, per-mask IoU logging,
zero-multiplied dummy path that keeps multi-device graphs identical) and
hungarian_matcher.py (point-sampled BCE+dice cost; assignment solved on host
via scipy — same CPU sync the reference takes at hungarian_matcher.py:186,
expressed as a jax.pure_callback so it composes with jit)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.constants import IGNORE_INDEX

DICE_WEIGHT = 1.0
CE_WEIGHT = 2.0
MATCHER_NUM_POINTS = 12544


# ---------------------------------------------------------------------------
# text loss
# ---------------------------------------------------------------------------

def text_ce_loss(logits, labels):
    """Shifted causal LM loss with IGNORE_INDEX masking.

    logits: [B, S, V] fp32; labels: [B, S] int. Returns (loss, num_tokens)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / n, jnp.sum(valid)


def text_ce_loss_fused(llm_params, llm_cfg, hidden, labels, chunk=512):
    """Chunked fused lm-head + CE: numerically equal to
    `text_ce_loss(unembed(hidden), labels)` without ever materializing the
    full fp32 [S, V] logits (2.5 GB at the 5k-token budget, and its
    cotangent doubles it — the allocation that OOMed the full-depth
    QLoRA step on a 16 GB chip).

    hidden: [B, S, D] post-norm; labels: [B, S]. Tokens are flattened,
    shifted, padded to a chunk multiple, and processed by a rematerialized
    `lax.map` — live memory is one [chunk, V] fp32 logits buffer forward
    and one on backward (the chunk's logits recompute from hidden).
    lm-head weight grads accumulate across chunks inside the map's
    transpose scan."""
    from video_llava_seg_tpu.models import llama

    b, s, d = hidden.shape
    h = hidden[:, :-1].reshape(b * (s - 1), d)
    y = labels[:, 1:].reshape(b * (s - 1))
    valid = y != IGNORE_INDEX
    y_safe = jnp.where(valid, y, 0)

    n_tok = h.shape[0]
    pad = (-n_tok) % chunk
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        y_safe = jnp.pad(y_safe, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    nc = h.shape[0] // chunk

    @jax.checkpoint
    def chunk_nll(args):
        hc, yc, mc = args
        logits = llama.unembed(llm_params, llm_cfg,
                               hc).astype(jnp.float32)   # [chunk, V]
        lse = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, yc[:, None], axis=-1)[:, 0]
        mf = mc.astype(jnp.float32)
        return jnp.sum((lse - gold) * mf), jnp.sum(mf)

    sums, counts = jax.lax.map(
        chunk_nll, (h.reshape(nc, chunk, d), y_safe.reshape(nc, chunk),
                    valid.reshape(nc, chunk)))
    n = jnp.maximum(jnp.sum(counts), 1.0)
    return jnp.sum(sums) / n, jnp.sum(counts).astype(jnp.int32)


# ---------------------------------------------------------------------------
# mask losses (mask_loss.py parity)
# ---------------------------------------------------------------------------

def dice_loss_per_mask(inputs, targets, scale=1000.0, eps=1e-6,
                       pixel_mask=None):
    """inputs: [M, H, W] logits; targets: [M, H, W] in {0,1} -> [M].

    pixel_mask: optional [H, W] bool restricting the loss to a spatial
    region (the unpadded area — reference computes losses on unpadded
    masks; region masking is the static-shape equivalent)."""
    p = jax.nn.sigmoid(inputs.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    if pixel_mask is not None:
        pm = pixel_mask.astype(jnp.float32)[None]
        p = p * pm
        t = t * pm
    p = p.reshape(p.shape[0], -1)
    t = t.reshape(t.shape[0], -1)
    numerator = 2.0 * jnp.sum(p / scale * t, axis=-1)
    denominator = jnp.sum(p / scale, axis=-1) + jnp.sum(t / scale, axis=-1)
    return 1.0 - (numerator + eps) / (denominator + eps)


def sigmoid_ce_loss_per_mask(inputs, targets, pixel_mask=None):
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # binary_cross_entropy_with_logits
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if pixel_mask is None:
        return loss.reshape(loss.shape[0], -1).mean(axis=1)
    pm = pixel_mask.astype(jnp.float32)[None]
    num = jnp.sum(loss * pm, axis=(1, 2))
    return num / jnp.maximum(jnp.sum(pm), 1.0)


def dice_loss(inputs, targets, num_masks, scale=1000.0, eps=1e-6):
    return jnp.sum(dice_loss_per_mask(inputs, targets, scale, eps)) / (
        num_masks + 1e-8)


def sigmoid_ce_loss(inputs, targets, num_masks):
    return jnp.sum(sigmoid_ce_loss_per_mask(inputs, targets)) / (
        num_masks + 1e-8)


def mask_iou(pred_masks, gt_masks, pixel_mask=None):
    """[N, T, H, W] logits vs bool -> [N] IoU (compute_iou parity)."""
    p = pred_masks > 0.0
    g = gt_masks.astype(bool)
    if pixel_mask is not None:
        p = jnp.logical_and(p, pixel_mask[None, None])
        g = jnp.logical_and(g, pixel_mask[None, None])
    p = p.reshape(p.shape[0], -1)
    g = g.reshape(g.shape[0], -1)
    inter = jnp.sum(jnp.logical_and(p, g).astype(jnp.float32), axis=1)
    union = jnp.sum(jnp.logical_or(p, g).astype(jnp.float32), axis=1)
    return inter / jnp.clip(union, a_min=1e-4)


# ---------------------------------------------------------------------------
# Hungarian matching (hungarian_matcher.py parity)
# ---------------------------------------------------------------------------

def _pairwise_dice_cost(p, t):
    """p: [N, K] sigmoid probs; t: [M, K]. Returns [N, M]."""
    numerator = 2.0 * jnp.einsum("nk,mk->nm", p, t)
    denom = p.sum(-1)[:, None] + t.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denom + 1.0)


def _pairwise_bce_cost(logits, t):
    """batch_sigmoid_ce semantics: mean over points of BCE(pred_n, gt_m)."""
    x = logits
    pos = jnp.maximum(x, 0) - x + jnp.log1p(jnp.exp(-jnp.abs(x)))   # BCE(t=1)
    neg = jnp.maximum(x, 0) + jnp.log1p(jnp.exp(-jnp.abs(x)))       # BCE(t=0)
    k = x.shape[-1]
    return (jnp.einsum("nk,mk->nm", pos, t)
            + jnp.einsum("nk,mk->nm", neg, 1.0 - t)) / k


def hungarian_match(pred_masks, gt_masks, key,
                    num_points: int = MATCHER_NUM_POINTS, obj_valid=None):
    """Match N predicted mask tracks to N GT tracks.

    pred_masks/gt_masks: [N, T, H, W]. Cost = point-sampled BCE + dice over
    the flattened (T*H*W) volume with shared random points (the Mask2Former
    trick, hungarian_matcher.py:123-191). Returns (pred_idx, gt_idx) int32
    arrays of length N via a scipy host callback.

    obj_valid: optional [N] bool marking real (non-padded) object slots. The
    reference matches only the actual N objects (mask_loss.py:67-82); with
    fixed-capacity padding the equivalent is biasing the cost so valid
    predictions can only match valid GTs (padding slots pair off among
    themselves at zero cost), which also degenerates to the identity
    assignment when a single slot is valid — the reference's num_objs>1
    gate."""
    n = pred_masks.shape[0]
    flat_p = pred_masks.reshape(n, -1).astype(jnp.float32)
    flat_g = gt_masks.reshape(n, -1).astype(jnp.float32)
    k = min(num_points, flat_p.shape[1])
    idx = jax.random.choice(key, flat_p.shape[1], shape=(k,), replace=False)
    sp = jnp.take(flat_p, idx, axis=1)
    sg = jnp.take(flat_g, idx, axis=1)
    cost = (_pairwise_bce_cost(sp, sg)
            + _pairwise_dice_cost(jax.nn.sigmoid(sp), sg))
    if obj_valid is not None:
        v = obj_valid.astype(bool)
        cross = v[:, None] != v[None, :]
        both_invalid = jnp.logical_and(~v[:, None], ~v[None, :])
        cost = jnp.where(cross, 1e9, jnp.where(both_invalid, 0.0, cost))

    return _solve_assignment(jax.lax.stop_gradient(cost))


# On-device exact assignment by permutation enumeration, used up to this
# many objects (8! = 40320 candidate sums — trivial VPU work). Beyond it we
# fall back to the scipy host callback, which some TPU runtimes (axon PJRT)
# and multi-host pjit do not support — at ViCaS object counts the enumeration
# path is the one that runs in practice.
_ENUM_MAX_N = 8


def _solve_assignment(cost):
    n = cost.shape[0]
    if n <= _ENUM_MAX_N:
        return _solve_assignment_enum(cost)
    return _solve_assignment_callback(cost)


def _solve_assignment_enum(cost):
    """Exact linear sum assignment via static permutation enumeration —
    jit/TPU/multi-host-safe (no host callback)."""
    import itertools

    n = cost.shape[0]
    perms = jnp.asarray(
        np.asarray(list(itertools.permutations(range(n))), np.int32))
    totals = jnp.sum(cost[jnp.arange(n)[None, :], perms], axis=1)
    best = perms[jnp.argmin(totals)]
    return (jnp.arange(n, dtype=jnp.int32), best.astype(jnp.int32))


@jax.custom_vjp
def _solve_assignment_callback(cost):
    """Host scipy linear_sum_assignment; non-differentiable (the reference
    also solves on CPU under no_grad, hungarian_matcher.py:186)."""
    n = cost.shape[0]

    def solve(c):
        from scipy.optimize import linear_sum_assignment
        r, cc = linear_sum_assignment(np.asarray(c, np.float64))
        return (np.asarray(r, np.int32), np.asarray(cc, np.int32))

    return jax.pure_callback(
        solve, (jax.ShapeDtypeStruct((n,), jnp.int32),
                jax.ShapeDtypeStruct((n,), jnp.int32)), cost)


def _solve_fwd(cost):
    return _solve_assignment_callback(cost), cost.shape


def _solve_bwd(shape, g):
    return (jnp.zeros(shape, jnp.float32),)


_solve_assignment_callback.defvjp(_solve_fwd, _solve_bwd)


def mask_loss(pred_masks, gt_masks, valid_mask=None, key=None,
              dummy: bool = False, align: bool = True, pixel_mask=None,
              dice_weight=None, ce_weight=None):
    """Full MaskLoss for one video (mask_loss.py:20-65 semantics).

    pred_masks: [N, T, H, W] logits; gt_masks: [N, T, H, W] bool;
    valid_mask: optional [N] or [N, T] bool for padded object/frame slots
    (TPU static-shape batching); pixel_mask: optional [H, W] bool for the
    unpadded spatial region; dummy=True takes the zero-multiplied path that
    keeps the computation graph identical across devices."""
    n = pred_masks.shape[0]
    if align and n > 1 and not dummy:
        assert key is not None
        ov = None
        if valid_mask is not None:
            ov = (valid_mask if valid_mask.ndim == 1
                  else jnp.any(valid_mask, axis=1))
        pi, gi = hungarian_match(pred_masks, gt_masks, key, obj_valid=ov)
        pred_masks = jnp.take(pred_masks, pi, axis=0)
        gt_masks = jnp.take(gt_masks, gi, axis=0)
        if valid_mask is not None:
            valid_mask = jnp.take(valid_mask, gi, axis=0)

    ious = mask_iou(pred_masks, gt_masks, pixel_mask)
    p = pred_masks.reshape(-1, *pred_masks.shape[2:])
    g = gt_masks.reshape(-1, *gt_masks.shape[2:])
    ld_pm = dice_loss_per_mask(p, g, pixel_mask=pixel_mask)
    lc_pm = sigmoid_ce_loss_per_mask(p, g, pixel_mask=pixel_mask)
    if valid_mask is not None:
        if valid_mask.ndim == 1:
            vm = jnp.repeat(valid_mask, pred_masks.shape[1])
        else:
            vm = valid_mask.reshape(-1)
        vm = vm.astype(jnp.float32)
        ld_pm = ld_pm * vm
        lc_pm = lc_pm * vm
        num_masks = jnp.sum(vm)
        obj_valid = (valid_mask if valid_mask.ndim == 1
                     else jnp.any(valid_mask, axis=1))
        ious = jnp.where(obj_valid, ious, 0.0)
    else:
        num_masks = jnp.asarray(p.shape[0], jnp.float32)

    if dummy:
        zero = jnp.sum(p) * 0.0
        return {"loss_mask_dice": zero, "loss_mask_ce": zero,
                "loss_mask": zero, "mask_ious": ious * 0.0,
                "num_masks": jnp.zeros(()),
                "dice_sum": zero, "ce_sum": zero}
    ld = jnp.sum(ld_pm) / (num_masks + 1e-8)
    lc = jnp.sum(lc_pm) / (num_masks + 1e-8)
    dw = DICE_WEIGHT if dice_weight is None else dice_weight
    cw = CE_WEIGHT if ce_weight is None else ce_weight
    # dice_sum/ce_sum: unnormalized per-sample sums — the reference
    # normalizes by the BATCH-global mask count (mask_loss.py:43-57 cats
    # all samples' masks before dividing by num_masks), so batched callers
    # must aggregate sums and divide once (train_step.compute_loss)
    return {"loss_mask_dice": ld, "loss_mask_ce": lc,
            "loss_mask": ld * dw + lc * cw,
            "mask_ious": ious, "num_masks": num_masks,
            "dice_sum": jnp.sum(ld_pm), "ce_sum": jnp.sum(lc_pm)}
