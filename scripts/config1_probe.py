"""Config-1 decomposition: batch-1 Hiera-T@1024 predict, stage by stage.

VERDICT r4 weak #5: config 1's 50.9 ms device compute had no decomposition
and no target. This probe prefix-times the trunk (hiera.apply
blocks_limit=k), isolates neck+high-res convs and the mask decoder, all
with in-graph lax.scan repetition + two-point subtraction so tunnel RTT
and dispatch overhead cancel (the hardened-timer discipline,
BENCH_NOTES.md "Tunnel barrier"/"Relay result cache").

Usage: python scripts/config1_probe.py [--iters 10] [--variant tiny]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_NONCE = int(time.time_ns() % 999983)


def timed(fn, iters):
    """Async-dispatch repetition, ONE value-pull sync at the end (the
    bench device_ms methodology — the in-order device queue makes the last
    value's arrival a barrier for all prior dispatches, and its ~35 ms
    RTT amortizes over iters). One compile per fn — scan-wrapped
    repetition reproducibly drops the tunnel's remote-compile helper on
    the Hiera megakernel programs. fn(salt scalar) -> device scalar."""
    g = jax.jit(fn)
    float(g(jnp.float32(_NONCE * 1e-9)))     # compile + warmup
    t0 = time.time()
    outs = [g(jnp.float32(_NONCE * 1e-9 + i * 1e-6))
            for i in range(1, iters + 1)]
    float(outs[-1])                          # value pull = barrier
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variant", default="tiny")
    args = ap.parse_args()

    from video_llava_seg_tpu.models.sam2 import hiera as hiera_mod
    from video_llava_seg_tpu.models.sam2 import (
        image_encoder as enc_mod,
        mask_decoder as dec_mod,
        prompt_encoder as pe_mod,
    )
    from video_llava_seg_tpu.models.sam2.build import build_sam2

    print(f"devices: {jax.devices()}  nonce={_NONCE}")
    params, cfg = build_sam2(args.variant, dtype=jnp.bfloat16)
    img = jnp.asarray(np.random.default_rng(0).random(
        (1, cfg.image_size, cfg.image_size, 3), np.float32))
    n_blocks = len(params["image_encoder"]["trunk"]["blocks"])

    # trunk prefixes at stage boundaries (each prefix = one tunnel
    # compile, so keep the set small: stage ends + the first block)
    hp = params["image_encoder"]["trunk"]
    ends = sorted(cfg.hiera.stage_ends)
    limits = sorted({1, *[e + 1 for e in ends]})
    t_prefix = {}
    for k in limits:
        t_prefix[k] = timed(
            lambda s, k=k: jnp.sum(hiera_mod.apply(
                hp, cfg.hiera, (img + s).astype(jnp.bfloat16),
                blocks_limit=k)[-1].astype(jnp.float32)), args.iters)
        print(f"prefix {k:2d} blocks: {t_prefix[k]*1e3:7.2f} ms",
              flush=True)
    prev = 0.0
    for k in limits:
        print(f"blocks ..{k:2d}: prefix {t_prefix[k]*1e3:7.2f} ms  "
              f"delta {(t_prefix[k]-prev)*1e3:6.2f} ms")
        prev = t_prefix[k]

    t_trunk = t_prefix[limits[-1]]
    t_enc = timed(
        lambda s: jnp.sum(enc_mod.apply(
            params["image_encoder"], cfg,
            (img + s).astype(jnp.bfloat16))["vision_features"]
            .astype(jnp.float32)), args.iters)
    print(f"trunk total    {t_trunk*1e3:7.2f} ms")
    print(f"encoder total  {t_enc*1e3:7.2f} ms  (neck+pe "
          f"{(t_enc-t_trunk)*1e3:.2f} ms)")

    # full encode incl. the high-res convs (what set_image runs)
    def full_encode(s):
        out = enc_mod.apply(params["image_encoder"], cfg,
                            (img + s).astype(jnp.bfloat16))
        from video_llava_seg_tpu.ops import nn as nn_ops
        s0 = nn_ops.conv2d(params["mask_decoder"]["conv_s0"],
                           out["backbone_fpn"][0])
        s1 = nn_ops.conv2d(params["mask_decoder"]["conv_s1"],
                           out["backbone_fpn"][1])
        return (jnp.sum(out["vision_features"].astype(jnp.float32))
                + jnp.sum(s0.astype(jnp.float32))
                + jnp.sum(s1.astype(jnp.float32)))

    t_full_enc = timed(full_encode, args.iters)
    print(f"encode+convs   {t_full_enc*1e3:7.2f} ms")

    # decoder alone (box prompt, multimask) at cached-features shapes
    feats = jax.jit(lambda: enc_mod.apply(params["image_encoder"], cfg,
                                          img.astype(jnp.bfloat16)))()
    from video_llava_seg_tpu.ops import nn as nn_ops
    s0 = nn_ops.conv2d(params["mask_decoder"]["conv_s0"],
                       feats["backbone_fpn"][0])
    s1 = nn_ops.conv2d(params["mask_decoder"]["conv_s1"],
                       feats["backbone_fpn"][1])
    embed = feats["vision_features"]
    coords = jnp.asarray([[[256.0, 256.0], [768.0, 768.0]]])
    labels = jnp.asarray([[2, 3]], jnp.int32)
    image_pe = pe_mod.get_dense_pe(params["prompt_encoder"], cfg)

    def decode(s):
        sparse, dense = pe_mod.apply(params["prompt_encoder"], cfg,
                                     coords + s, labels, None)
        low, ious, _, _ = dec_mod.apply(
            params["mask_decoder"], cfg, embed, image_pe, sparse, dense,
            multimask_output=True, high_res_features=[s0, s1])
        return jnp.sum(ious.astype(jnp.float32))

    t_dec = timed(decode, args.iters)
    print(f"decode         {t_dec*1e3:7.2f} ms")
    print(f"SUM encode+convs+decode {1e3*(t_full_enc + t_dec):7.2f} ms "
          f"(bench device_ms compares here)")


if __name__ == "__main__":
    main()
