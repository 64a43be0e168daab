"""Connected components on TPU via iterative min-label propagation.

TPU-native equivalent of the reference's single CUDA kernel
(sam2/csrc/connected_components.cu:213-289): 8-connectivity labeling of binary
masks plus per-pixel component areas, used for hole filling / sprinkle removal
in SAM2 mask postprocessing (sam2/utils/transforms.py:76-118,
sam2/utils/misc.py:312-338).

TPUs have no global atomics, so instead of union-find we do label propagation:
initialize each foreground pixel with its flat index + 1, then repeatedly take
the minimum label over the 8-neighborhood (a dilation with min), converging in
O(longest geodesic path) iterations. A `lax.while_loop` exits early on a
fixpoint, bounded by `max_iters` for compile-time safety. Areas come from a
one-hot-free segment-sum (bincount) over the final labels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _min_neighbor(labels, big):
    """Min over the 8-neighborhood (labels padded with `big` outside)."""
    p = jnp.pad(labels, ((0, 0), (1, 1), (1, 1)), constant_values=big)
    best = labels
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = p[:, 1 + dy: p.shape[1] - 1 + dy,
                        1 + dx: p.shape[2] - 1 + dx]
            best = jnp.minimum(best, shifted)
    return best


@functools.partial(jax.jit, static_argnames=("max_iters",))
def connected_components(mask, max_iters: int = 256):
    """Label 8-connected components of a binary mask.

    Args:
      mask: bool/int [N, H, W] (True = foreground).
      max_iters: hard bound on propagation sweeps.

    Returns:
      labels: int32 [N, H, W]; 0 on background, >0 component ids (ids are the
        flat index of the component's minimum pixel, +1 — deterministic).
      areas: int32 [N, H, W]; per-pixel area of the containing component
        (0 on background). Matches the CUDA kernel's (labels, counts) contract.
    """
    mask = mask.astype(bool)
    n, h, w = mask.shape
    big = jnp.int32(h * w + 2)
    flat = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w) + 1
    init = jnp.where(mask, flat, big)

    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def jump(labels):
        """Pointer jumping: a label is a flat pixel index + 1; hop to that
        pixel's current label (path compression — log-depth convergence)."""
        flat_lbl = labels.reshape(n, h * w)
        idx = jnp.clip(flat_lbl - 1, 0, h * w - 1)
        hopped = jnp.take_along_axis(flat_lbl, idx, axis=1)
        hopped = jnp.where(flat_lbl <= h * w, hopped, flat_lbl)
        return jnp.minimum(flat_lbl, hopped).reshape(n, h, w)

    def body(state):
        labels, _, it = state
        nxt = jnp.where(mask, jnp.minimum(labels, _min_neighbor(labels, big)),
                        big)
        nxt = jnp.where(mask, jump(nxt), big)
        nxt = jnp.where(mask, jnp.minimum(nxt, _min_neighbor(nxt, big)), big)
        nxt = jnp.where(mask, jump(nxt), big)
        return nxt, jnp.any(nxt != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body,
                                      (init, jnp.bool_(True), jnp.int32(0)))
    labels = jnp.where(mask, labels, 0).astype(jnp.int32)

    # per-pixel component areas via bincount over each image
    def area_of(lbl):
        counts = jnp.zeros((h * w + 1,), jnp.int32).at[lbl.reshape(-1)].add(1)
        a = counts[lbl.reshape(-1)].reshape(h, w)
        return jnp.where(lbl > 0, a, 0)

    areas = jax.vmap(area_of)(labels)
    return labels, areas


def fill_holes_and_sprinkles(mask_logits, mask_threshold: float = 0.0,
                             max_hole_area: float = 0.0,
                             max_sprinkle_area: float = 0.0,
                             max_iters: int = 256):
    """SAM2 mask cleanup (sam2/utils/transforms.py:86-104 semantics).

    mask_logits: [N, H, W] float logits. Small background components become
    +10 above threshold (holes filled); small foreground components become
    -10 below threshold (sprinkles removed).
    """
    out = mask_logits
    if max_hole_area > 0:
        labels, areas = connected_components(out <= mask_threshold, max_iters)
        is_hole = (labels > 0) & (areas <= max_hole_area)
        out = jnp.where(is_hole, mask_threshold + 10.0, out)
    if max_sprinkle_area > 0:
        labels, areas = connected_components(out > mask_threshold, max_iters)
        is_sprinkle = (labels > 0) & (areas <= max_sprinkle_area)
        out = jnp.where(is_sprinkle, mask_threshold - 10.0, out)
    return out
