"""Decompose SAM2 video-propagation time on the real chip (config 2).

Times, per variant at 480p:
  1. encode ms/frame        (trunk + FPN, batch-8 precompute)
  2. scan-track ms/frame    (memory attention + SAM heads + memory
                             encoder + hole fill + vidres, one lax.scan)
  3. standalone sub-jits of the track step at the same shapes, so the
     scan time decomposes: memory attention | SAM heads | memory
     encoder | hole fill | vidres resize.

Standalone numbers only GUIDE where to look — optimizations must be
re-measured inside the full propagation jit (BENCH_NOTES.md: two
standalone-win/in-context-loss reversals).

Usage: python scripts/profile_propagation.py [tiny|large] [n_frames]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from video_llava_seg_tpu.models.sam2 import base  # noqa: E402
from video_llava_seg_tpu.models.sam2.build import (  # noqa: E402
    build_sam2_video_predictor,
)


def timed(fn, *args, iters=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args, **kw) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / iters, out


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    hw = (480, 854)

    pred = build_sam2_video_predictor(variant)
    params, cfg = pred.params, pred.cfg
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_frames, *hw, 3), np.uint8)

    # ---- end-to-end propagation (the config-2 scenario) ----
    state = pred.init_state(frames)
    pred.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.asarray([[hw[1] / 2, hw[0] / 2]], np.float32),
        labels=np.asarray([1], np.int32))
    masks = [m for _f, _i, m in pred.propagate_in_video(state)]
    jax.block_until_ready(masks)

    # encode: batch-8 precompute (already cached features -> reset first)
    state2 = pred.init_state(frames)
    t0 = time.time()
    pred.precompute_image_features(state2, chunk_size=8)
    jax.block_until_ready(state2["cached_features"][0][1])
    t_enc = (time.time() - t0) / n_frames
    print(f"[{variant}] encode (batch-8 precompute): "
          f"{1e3 * t_enc:.2f} ms/frame")

    # full propagation, features prewarmed (bench parity)
    pred.add_new_points_or_box(
        state2, frame_idx=0, obj_id=1,
        points=np.asarray([[hw[1] / 2, hw[0] / 2]], np.float32),
        labels=np.asarray([1], np.int32))
    t0 = time.time()
    masks = [m for _f, _i, m in pred.propagate_in_video(state2)]
    jax.block_until_ready(masks)
    t_prop = (time.time() - t0) / len(masks)
    print(f"[{variant}] propagate (post-interaction, feats cached): "
          f"{1e3 * t_prop:.2f} ms/frame -> {1.0 / t_prop:.1f} fps")

    # ---- standalone sub-steps at the track shapes ----
    b = 1
    size = pred.image_size
    g = size // 16                       # low-res feature grid (64 @1024)
    c = cfg.hidden_dim
    mem_dim = cfg.mem_dim
    key = jax.random.PRNGKey(0)
    dt = pred.compute_dtype
    low = jax.random.normal(key, (b, g, g, c), dt)
    high0 = jax.random.normal(key, (b, g * 4, g * 4, 32), dt)
    high1 = jax.random.normal(key, (b, g * 2, g * 2, 64), dt)
    feats = (high0, high1, low)

    # memory attention: 1 cond + (num_maskmem-1) non-cond spatial slots,
    # max_obj_ptrs pointers — the steady-state shape
    s_slots = cfg.num_maskmem
    p_slots = min(cfg.max_obj_ptrs_in_encoder, n_frames)
    mem_feats = jax.random.normal(key, (b, s_slots, g * g, mem_dim), dt)
    slot_tpos = jnp.arange(s_slots, dtype=jnp.int32)
    slot_valid = jnp.ones((s_slots,), bool)
    ptrs = jax.random.normal(key, (b, p_slots, c), dt)
    ptr_tpos = jnp.arange(p_slots, dtype=jnp.int32)
    ptr_valid = jnp.ones((p_slots,), bool)

    memattn = jax.jit(lambda p, lo, mf: pred._condition_on_memory(
        p, lo, mf, slot_tpos, slot_valid, ptrs, ptr_tpos, ptr_valid))
    t, pix = timed(memattn, params, low, mem_feats)
    print(f"[{variant}] memory attention ({s_slots}x{g * g} spatial + "
          f"{p_slots} ptrs): {1e3 * t:.2f} ms")

    heads = jax.jit(lambda p, px, hi: base.forward_sam_heads(
        p, cfg, px, point_coords=None, point_labels=None,
        mask_inputs=None, high_res_features=hi, multimask_output=False))
    t, outs = timed(heads, params, pix, list(feats[:-1]))
    print(f"[{variant}] SAM heads (prompt+decoder): {1e3 * t:.2f} ms")
    high_res_masks = outs[4]
    scores = outs[6]

    encmem = jax.jit(lambda p, px, hm, sc: base.encode_new_memory(
        p, cfg, px, hm, sc, is_mask_from_pts=False))
    t, _ = timed(encmem, params, pix, high_res_masks, scores)
    print(f"[{variant}] memory encoder: {1e3 * t:.2f} ms")

    low_res = jax.random.normal(key, (b, 1, g * 4, g * 4), jnp.float32)
    t, _ = timed(pred._fill_holes_jit, low_res)
    print(f"[{variant}] hole fill (low-res): {1e3 * t:.2f} ms")

    vidres = jax.jit(lambda m: pred._vidres_impl(m, hw=hw))
    t, _ = timed(vidres, low_res)
    print(f"[{variant}] vidres resize {g * 4}->{hw}: {1e3 * t:.2f} ms")


if __name__ == "__main__":
    main()
