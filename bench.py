"""Benchmark entry point (driver contract: ONE JSON line on stdout).

Headline metric: vision-encode throughput (frames/s/chip) of the video
tower — the north-star metric from BASELINE.json (target 2000 frames/s/chip
on a v5e). Measures the CLIP-L-336-shaped tower (the clip-encoder config the
reference supports; published runs use the RADIO tower of comparable size)
encoding a 32-frame clip through vision tower + mm projector + slow/fast
pooling, jitted, bf16, steady-state over repeated runs.
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.config import (
        ProjectorConfig,
        VideoLlavaConfig,
        VisionTowerConfig,
    )
    from video_llava_seg_tpu.models import llava

    # CLIP-L/14-336 tower + mlp2x_gelu projector into a 4096-dim LLM space
    vis = VisionTowerConfig(name="clip-vit-large-336")
    cfg = VideoLlavaConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=vis.hidden_size,
                                  hidden_size=4096),
        num_frames=32, num_slow_frames=8)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    from video_llava_seg_tpu.models import projector, vit

    params = {
        "vision_tower": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), vit.init(k1, cfg.vision)),
        "mm_projector": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            projector.init(k2, cfg.projector)),
    }

    video = jax.random.normal(
        k3, (1, cfg.num_frames, vis.image_size, vis.image_size, 3),
        jnp.bfloat16)

    @jax.jit
    def encode(params, video, salt):
        # in-graph salt defeats any transparent result caching in the
        # runtime while keeping host->device traffic to one scalar
        slow, fast = llava.encode_video(params, cfg, video + salt)
        return (jnp.sum(slow.astype(jnp.float32))
                + jnp.sum(fast.astype(jnp.float32)))

    # compile + warmup
    float(encode(params, video, jnp.bfloat16(0)))
    # steady state: fetch the scalar result every iteration (full sync)
    iters = 10
    t0 = time.time()
    for i in range(1, iters + 1):
        float(encode(params, video, jnp.bfloat16(i * 1e-3)))
    dt = (time.time() - t0) / iters
    frames_per_sec = cfg.num_frames / dt

    target = 2000.0  # BASELINE.json north star
    print(json.dumps({
        "metric": "vision_encode_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / target, 4),
    }))


if __name__ == "__main__":
    main()
