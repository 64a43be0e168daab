"""Minimal repro / bisection driver for the batch-2 serving fault.

Round-3 bisection (BENCH_NOTES.md "Batch-2 serving fault"): a full-depth
W4A8 + int8-KV generate at EXACTLY batch 2 crashes the TPU worker, but only
when the vision-encode executable is resident and has executed in the same
process. Batches 1/4/8 with the identical structure pass; every component
passes solo; fused ViT megakernel on/off both crash.

This script runs ONE variant per process (a crash kills the worker, so
variants can't share a process) and exits 0 if the variant survives:

  python scripts/batch2_repro.py --variant baseline   # expected: crash
  python scripts/batch2_repro.py --variant scan       # scan-layer layout
  python scripts/batch2_repro.py --variant w8a8       # 8-bit instead of 4
  python scripts/batch2_repro.py --variant bf16       # no quantization
  python scripts/batch2_repro.py --variant layers16   # half depth
  python scripts/batch2_repro.py --variant nokvint8   # fp bf16 KV cache
  python scripts/batch2_repro.py --variant batch3     # batch 3 baseline

Reference bar: the reference hard-asserts batch 1 at inference
(/root/reference/llava/model/language_model/llava_llama.py:313)."""

import argparse
import dataclasses
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="baseline")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--decode_tokens", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.config import (
        LlamaConfig,
        ProjectorConfig,
        VideoLlavaConfig,
        VisionTowerConfig,
    )
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.models import llama, llava

    variant = args.variant
    b = 3 if variant == "batch3" else args.batch
    n_frames = 16

    vis = VisionTowerConfig(name="clip-vit-large-336")
    llm_cfg = LlamaConfig()
    if variant != "nokvint8" and variant != "bf16":
        llm_cfg = dataclasses.replace(llm_cfg, kv_cache_int8=True)
    if variant == "layers16":
        llm_cfg = dataclasses.replace(llm_cfg, num_layers=16)
    cfg = VideoLlavaConfig(
        llm=llm_cfg, vision=vis,
        projector=ProjectorConfig(mm_hidden_size=vis.hidden_size,
                                  hidden_size=4096),
        num_frames=n_frames, num_slow_frames=8)

    cfg_stub = dataclasses.replace(
        cfg, llm=dataclasses.replace(llm_cfg, num_layers=1))
    params = llava.init(jax.random.PRNGKey(0), cfg_stub, dtype=jnp.bfloat16)
    bits = 8 if variant == "w8a8" else 4
    t0 = time.time()
    if variant == "bf16":
        # full-depth bf16 does not fit 16 GB; halve depth to keep the
        # encode-resident + generate structure while removing quantization
        llm_cfg = dataclasses.replace(llm_cfg, num_layers=16)
        cfg = dataclasses.replace(cfg, llm=llm_cfg)
        params["llm"] = llama.init(jax.random.PRNGKey(0), llm_cfg,
                                   dtype=jnp.bfloat16)
    else:
        params["llm"] = llama.init_quantized(
            jax.random.PRNGKey(0), llm_cfg, bits=bits, act_quant=True,
            stacked=(variant == "scan"))
    print(f"[repro] params ready in {time.time() - t0:.1f}s "
          f"variant={variant} batch={b}", flush=True)

    tpi = llava.visual_tokens_per_sample(cfg)
    rng = np.random.default_rng(0)

    @jax.jit
    def encode(params, video, text_ids, gather_idx):
        slow, fast = llava.encode_video(params, cfg,
                                        video.astype(jnp.bfloat16))
        visual = llava.flatten_visual_features(slow, fast)
        return llava.assemble_embeds(params, text_ids, gather_idx, visual)

    @jax.jit
    def generate(llm_params, embeds):
        return llama.greedy_generate(
            llm_params, cfg.llm, embeds, prompt_len=embeds.shape[1],
            max_new_tokens=args.decode_tokens, eos_token_ids=(999999,))

    ids = np.concatenate([
        np.tile([[1, 2, 3]], (b, 1)),
        np.full((b, len(tpi)), IMAGE_TOKEN_INDEX),
        np.tile([[4, 5, 6]], (b, 1)),
    ], axis=1)
    plan = llava.build_splice_plan(ids, tpi)
    video = jnp.asarray(rng.random(
        (b, n_frames, vis.image_size, vis.image_size, 3), np.float32))

    t0 = time.time()
    embeds = encode(params, video, jnp.asarray(plan.text_ids),
                    jnp.asarray(plan.gather_idx))
    jax.block_until_ready(embeds)
    print(f"[repro] encode done in {time.time() - t0:.1f}s "
          f"embeds={embeds.shape}", flush=True)

    if variant == "hostcopy":
        # round-trip the encode output through the HOST: if generate then
        # survives, the interaction is in the device-side handoff (layout /
        # allocator state), not the values
        embeds = jnp.asarray(np.asarray(embeds))
        print("[repro] embeds round-tripped through host", flush=True)
    elif variant == "devcopy":
        # on-device copy only (fresh buffer, default layout)
        embeds = jax.block_until_ready(jnp.copy(embeds))
        print("[repro] embeds copied on device", flush=True)
    elif variant == "delexe":
        # drop the resident encode executable before generate
        del encode
        import gc

        gc.collect()
        print("[repro] encode executable deleted", flush=True)

    t0 = time.time()
    tokens, hidden, n = generate(params["llm"], embeds)
    n = int(jax.device_get(n))
    jax.block_until_ready(tokens)
    print(f"[repro] SURVIVED: generate done in {time.time() - t0:.1f}s "
          f"n={n} variant={variant} batch={b}", flush=True)


if __name__ == "__main__":
    main()
