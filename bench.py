"""Benchmark entry point (driver contract: ONE JSON line on stdout).

Default run = the COMPACT FULL LADDER (--round): all seven configs at
reduced iters, headline (config 3, vision-encode frames/s/chip vs the
2000 f/s north star) first, under a wall-clock budget, with every
config's number embedded in the driver line's "ladder" key and the full
entries merged into BENCH_DETAIL.json. `--configs i,j` runs a subset at
full iters:

  1. SAM2 Hiera-T image predictor: one frame + one box prompt -> mask
  2. SAM2 Hiera-L video predictor: propagation over a 16-frame clip
  3. vision tower: ViT encode of a 32-frame clip + pooling + projector
  4. caption-only LLM: prefill tokens/s + decode ms/token (Llama-3-8B shape;
     measured on an N-layer slice and extrapolated — 8B bf16 params alone
     exceed one v5e's 16 GB HBM)
  5. full LG-VIS: p50 caption+mask latency on a 16-frame clip

Per-config results print as JSON lines on stderr and aggregate into
BENCH_DETAIL.json; stdout stays exactly one line (the headline). All timers
salt the inputs every iteration with a process-unique nonce (the axon relay
caches byte-identical executions ACROSS processes). Throughput timers
dispatch every iteration async and sync once at the end BY PULLING THE LAST
OUTPUT'S VALUE — `jax.block_until_ready` intermittently returns early over
this tunnel and is never used as a timing barrier (BENCH_NOTES "Tunnel
barrier"); the device queue is in-order, so the last value's arrival
implies every prior dispatch finished, and its single ~35 ms RTT amortizes
over the iters. Latency timers (configs 1 and 5) keep per-iteration value
pulls, since latency includes them.
"""

import argparse
import json
import os
import sys
import time

# Process-unique salt base. The axon relay caches byte-identical
# (program, inputs) executions ACROSS processes, so per-iteration salts
# alone (i * 1e-3) are not enough: a rerun of the same bench would
# re-measure relay cache hits and report physically impossible numbers
# (BENCH_NOTES "Relay result cache" — a cached fused-layer dispatch
# returned in 0.33 ms, a fake 5.7 PF/s). Every timer folds _NONCE into
# its salt so no two processes ever dispatch identical bytes.
_NONCE_I = int(time.time_ns() % 999983)
_NONCE = _NONCE_I * 1e-9


def _eprint(obj):
    print(json.dumps(obj), file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# config 3 — vision tower (headline)
# ---------------------------------------------------------------------------

def bench_vision(n_clips=4):
    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.config import (
        ProjectorConfig,
        VideoLlavaConfig,
        VisionTowerConfig,
    )
    from video_llava_seg_tpu.models import llava, projector, vit

    # CLIP-L/14-336 tower + mlp2x_gelu projector into a 4096-dim LLM space.
    # n_clips clips (n_clips*32 frames) batch through one dispatch — the
    # serving shape for chunked data-parallel inference.
    vis = VisionTowerConfig(name="clip-vit-large-336")
    cfg = VideoLlavaConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=vis.hidden_size,
                                  hidden_size=4096),
        num_frames=32, num_slow_frames=8)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "vision_tower": vit.init(k1, cfg.vision, dtype=jnp.bfloat16),
        "mm_projector": projector.init(k2, cfg.projector,
                                       dtype=jnp.bfloat16),
    }

    video = jax.random.normal(
        k3, (n_clips, cfg.num_frames, vis.image_size, vis.image_size, 3),
        jnp.bfloat16)

    @jax.jit
    def encode(params, video, salt):
        slow, fast = llava.encode_video(params, cfg, video + salt)
        return (jnp.sum(slow.astype(jnp.float32))
                + jnp.sum(fast.astype(jnp.float32)))

    try:
        float(encode(params, video, jnp.bfloat16(0)))   # compile + warmup
    except Exception:  # pragma: no cover - chip-side guard: the fused
        # megakernel path must never cost us the headline; fall back to
        # the per-op composition and report which path ran
        from video_llava_seg_tpu.models import vit as vit_mod

        vit_mod.USE_FUSED_VIT_BLOCK = False
        encode = jax.jit(encode.__wrapped__)
        float(encode(params, video, jnp.bfloat16(0)))
    # throughput timing: dispatch all iters async, then pull the LAST
    # output's VALUE. A value pull is the only trustworthy barrier on this
    # tunnel: jax.block_until_ready intermittently returns early (measured
    # 9 ms for 40 dispatches of a 23.6 ms kernel — BENCH_NOTES "Tunnel
    # barrier"). The device queue is in-order, so the last scalar's
    # arrival implies every prior dispatch finished; its single ~35 ms
    # RTT amortizes over the iters.
    iters = 10
    t0 = time.time()
    outs = [encode(params, video, jnp.bfloat16(_NONCE + i * 1e-3))
            for i in range(1, iters + 1)]
    float(outs[-1])
    dt = (time.time() - t0) / iters
    frames_per_sec = n_clips * cfg.num_frames / dt

    # --- W8A8 int8 variant: int8xint8 MXU dots (v5e int8 peak ~2x bf16)
    # pushes compute-bound encode past the bf16 physics ceiling; accuracy
    # delta vs bf16 reported alongside, never hidden
    from video_llava_seg_tpu.ops.quantization import quantize_tree

    params_q = quantize_tree(params, bits=8, act_quant=True)

    @jax.jit
    def feats_of(params, clip):
        slow, fast = llava.encode_video(params, cfg, clip)
        return slow.astype(jnp.float32), fast.astype(jnp.float32)

    # guarded: the W8A8 leg must never take down the bf16 headline
    try:
        s_bf, f_bf = feats_of(params, video[:1])
        s_q, f_q = feats_of(params_q, video[:1])
        denom = float(jnp.std(s_bf)) + 1e-9
        rel = jnp.abs(s_q - s_bf) / denom
        int8_err = {"int8_rel_err_mean": round(float(jnp.mean(rel)), 4),
                    "int8_rel_err_p99": round(
                        float(jnp.percentile(rel, 99.0)), 4)}

        float(encode(params_q, video, jnp.bfloat16(0)))
        t0 = time.time()
        outs = [encode(params_q, video, jnp.bfloat16(_NONCE + i * 1e-3))
                for i in range(1, iters + 1)]
        float(outs[-1])                # value pull = the reliable barrier
        dt_q = (time.time() - t0) / iters
        frames_per_sec_q = n_clips * cfg.num_frames / dt_q
    except Exception as e:  # pragma: no cover - chip-side guard
        int8_err = {"int8_error": f"{type(e).__name__}: {e}"[:200]}
        frames_per_sec_q = float("nan")

    # achieved TF/s + MFU so the gap decomposes into kernel quality vs the
    # physics of the 2000 f/s target. FLOPs/frame for the tower fwd:
    # 23 layers x (4 S D^2 attn-proj + 2 S^2 D attn + 4 S D D_ff mlp), S=577
    s_tok = cfg.vision.num_patches + 1
    d = cfg.vision.hidden_size
    dff = cfg.vision.intermediate_size
    n_layers = cfg.vision.num_layers + cfg.vision.select_layer + 1
    flops_frame = 2 * n_layers * (4 * s_tok * d * d + 2 * s_tok * s_tok * d
                                  + 2 * s_tok * d * dff)
    tf_s = flops_frame * frames_per_sec / 1e12
    peak_tf = 169.0  # measured in-graph bf16 peak on this chip (8192^3 chain)
    return {
        "config": 3, "metric": "vision_encode_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2), "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / 2000.0, 4),
        "achieved_tflops_s": round(tf_s, 1),
        "mfu_vs_measured_peak": round(tf_s / peak_tf, 3),
        "n_clips_per_dispatch": n_clips,
        "fused_vit_megakernel": vit.USE_FUSED_VIT_BLOCK,
        # W8A8 int8 variant (quantize_tree(act_quant=True)): int8 MXU dots
        "int8_w8a8_frames_per_sec": (round(frames_per_sec_q, 2)
                                     if frames_per_sec_q == frames_per_sec_q
                                     else None),
        "int8_speedup_vs_bf16": (round(frames_per_sec_q / frames_per_sec, 3)
                                 if frames_per_sec_q == frames_per_sec_q
                                 else None),
        **int8_err,
        # physics: 2000 f/s x 365 GF/frame = 731 TF/s > the chip's bf16
        # peak (197 spec / 169 measured in-graph), so the north star is
        # compute-infeasible for CLIP-L/336 dense bf16 on one v5e; the
        # per-chip ceiling is ~460 f/s at 100% MFU. See BENCH_NOTES.md.
        "chip_bf16_ceiling_frames_s": round(peak_tf * 1e12 / flops_frame, 0),
    }


# ---------------------------------------------------------------------------
# config 1 — SAM2 image predictor
# ---------------------------------------------------------------------------

def bench_sam2_image():
    import jax
    import numpy as np

    from video_llava_seg_tpu.models.sam2.build import (
        build_sam2_image_predictor,
    )

    pred = build_sam2_image_predictor("tiny")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1024, 1024, 3), np.uint8)
    box = np.asarray([256.0, 256.0, 768.0, 768.0])

    def once(salt):
        im = img.copy()
        # two salt bytes: defeat result caching across processes too
        im[0, 0, 0] = salt % 255
        im[0, 0, 1] = (salt // 255) % 255
        t0 = time.time()
        pred.set_image(im)             # dispatch (incl. image push)
        # value pull = reliable barrier (block_until_ready can early-
        # return on this tunnel — BENCH_NOTES "Tunnel barrier"); the
        # scalar slice is a queued device op, so its arrival implies
        # the encode finished and the set/predict split is meaningful
        float(pred._features["image_embed"][-1][0, 0, 0])
        t_set = time.time() - t0
        t0 = time.time()
        masks, ious, _ = pred.predict(box=box)
        float(np.asarray(ious).sum())  # sync
        t_pred = time.time() - t0
        return t_set, t_pred

    once(0)                            # compile + warmup
    iters = 5
    rows = [once(_NONCE_I + i) for i in range(1, iters + 1)]
    sets, preds = (np.asarray(r) for r in zip(*rows))

    # device-compute isolation: the WHOLE predict (encode + high-res convs
    # + prompt encode + mask decode + mask upscale) repeated inside ONE
    # lax.scan program, timed by two-point subtraction (t20 - t10)/10 — no
    # per-dispatch RPC at all. The round-4 async-dispatch variant (one
    # dispatch pair per iteration, one final sync) reported 50.9 ms/iter,
    # which scripts/config1_probe.py decomposed to be ~85% per-dispatch
    # tunnel send/queue overhead: the true in-graph figure is ~7 ms.
    import jax.numpy as jnp

    from video_llava_seg_tpu.models.sam2 import (
        image_encoder as _enc_mod,
        mask_decoder as _dec_mod,
        prompt_encoder as _pe_mod,
    )
    from video_llava_seg_tpu.ops import nn as _nn_ops
    from video_llava_seg_tpu.ops.resize import interpolate_hw as _interp

    cfgm = pred.cfg
    img_dev = jax.block_until_ready(
        jnp.asarray(img, jnp.float32)[None] / 255.0)
    coords = jnp.asarray([[[256.0, 256.0], [768.0, 768.0]]])
    labels = jnp.asarray([[2, 3]], jnp.int32)
    image_pe = _pe_mod.get_dense_pe(pred.params["prompt_encoder"], cfgm)

    def full_predict(s):
        out = _enc_mod.apply(pred.params["image_encoder"], cfgm,
                             (img_dev + s).astype(jnp.bfloat16))
        s0 = _nn_ops.conv2d(pred.params["mask_decoder"]["conv_s0"],
                            out["backbone_fpn"][0])
        s1 = _nn_ops.conv2d(pred.params["mask_decoder"]["conv_s1"],
                            out["backbone_fpn"][1])
        sparse, dense = _pe_mod.apply(pred.params["prompt_encoder"], cfgm,
                                      coords + s, labels, None)
        low, ious, _, _ = _dec_mod.apply(
            pred.params["mask_decoder"], cfgm, out["vision_features"],
            image_pe, sparse, dense, multimask_output=True,
            high_res_features=[s0, s1])
        masks = _interp(low.astype(jnp.float32),
                        (cfgm.image_size, cfgm.image_size), "bilinear")
        return jnp.sum(ious.astype(jnp.float32)) + jnp.sum(masks) * 1e-9

    def scan_run(n):
        def body(c, i):
            return c + full_predict(c * 1e-20 + i * 1e-6 + _NONCE), None

        g = jax.jit(lambda c0: jax.lax.scan(body, c0,
                                            jnp.arange(n))[0])
        # warmup and timed call take DIFFERENT seed bytes: the relay
        # caches byte-identical executions, and a warmed-up rerun of the
        # same program+inputs measures the cache, not the chip
        float(g(jnp.float32(_NONCE * 1e-9)))    # compile + warmup
        t0 = time.time()
        v = g(jnp.float32(_NONCE * 1e-9 + 0.125))
        float(v)                   # value pull = reliable barrier
        return time.time() - t0

    t10, t20 = scan_run(10), scan_run(20)
    device_ms = 1e3 * (t20 - t10) / 10

    return {
        "config": 1, "metric": "sam2_image_predict_latency",
        "set_image_ms": round(1e3 * float(np.median(sets)), 1),
        "predict_ms": round(1e3 * float(np.median(preds)), 1),
        "e2e_ms": round(1e3 * float(np.median(sets + preds)), 1),
        "value": round(device_ms, 1),
        "unit": "ms device compute (full predict, in-graph)",
        "device_ms": round(device_ms, 1),
        "device_ms_note": "full predict (encode+convs+prompt+decode+mask "
                          "upscale) in-graph scan, two-point (t20-t10)/10 "
                          "— zero dispatch overhead; r4's 50.9 ms was "
                          "~85% per-dispatch tunnel cost "
                          "(scripts/config1_probe.py decomposition)",
        "variant": "hiera-tiny@1024",
        # transfer-dominated on this host: the 3 MB uint8 image push and
        # the result pulls ride a ~35 ms-RTT / ~15-70 MB/s tunnel
        # (BENCH_NOTES.md); device_ms above isolates the compute.
        # Masks cross the link bit-packed (32x smaller than fp32 logits).
        "note": "tunneled-chip latency; includes host<->device transfers",
    }


# ---------------------------------------------------------------------------
# config 2 — SAM2 video propagation
# ---------------------------------------------------------------------------

def bench_sam2_video(variants=("large", "tiny"), n_frames=16,
                     hw=(480, 854)):
    """Config 2: headline = hiera-large fps; hiera-tiny reported
    alongside (the upstream ~27 fps GPU comment is for a smaller 768^2
    model; both variants here run the full 1024^2 serving size)."""
    import jax
    import numpy as np

    from video_llava_seg_tpu.models.sam2.build import (
        build_sam2_video_predictor,
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_frames, hw[0], hw[1], 3), np.uint8)
    fps = {}
    for variant in variants:
        pred = build_sam2_video_predictor(variant)

        def run(salt):
            fr = frames.copy()
            fr[0, 0, 0, 0] = salt % 255        # defeat relay result cache
            fr[0, 0, 0, 1] = (salt // 255) % 255
            state = pred.init_state(fr)
            pred.add_new_points_or_box(
                state, frame_idx=0, obj_id=1,
                points=np.asarray([[hw[1] / 2, hw[0] / 2]], np.float32),
                labels=np.asarray([1], np.int32))
            import jax.numpy as jnp

            t0 = time.time()
            # yields are device-resident (reference parity: GPU tensors);
            # sync once at clip end by PULLING a reduction of the last
            # frame's mask — the in-order queue makes the scalar's arrival
            # imply every frame finished (block_until_ready early-returns
            # on this tunnel; round 3's 27.3 fps was measured with it and
            # is re-validated here — BENCH_NOTES "Tunnel barrier")
            masks = [m for _f, _i, m in pred.propagate_in_video(state)]
            float(jnp.sum(masks[-1].astype(jnp.float32)))
            return (time.time() - t0) / len(masks)

        run(_NONCE_I)                  # compile + warmup
        fps[variant] = round(
            1.0 / min(run(_NONCE_I + i) for i in range(1, 3)), 2)
        del pred
        jax.clear_caches()

    head = variants[0]
    return {
        "config": 2, "metric": "sam2_video_propagation_fps",
        "value": fps[head], "unit": "frames/s",
        "variant": f"hiera-{head}@{hw[0]}p", "n_frames": n_frames,
        "upstream_gpu_reference_fps": 27,
        **{f"hiera_{v}_fps": fps[v] for v in variants[1:]},
    }


# ---------------------------------------------------------------------------
# config 4 — caption-only LLM throughput (Llama-3-8B shape, layer slice)
# ---------------------------------------------------------------------------

def _llm_prefill_decode_times(params, cfg, prefill_len, decode_steps,
                              iters=4, batch=1, decode_only=False):
    """Measured prefill s/call and decode s/step for one param tree.
    batch > 1 measures batched serving (per-step time covers all rows).
    decode_only skips the prefill TIMING loop (one prefill still runs to
    build the cache): each async prefill materializes a fresh multi-GB KV
    cache, and at batch 8 two in flight OOM a 16 GB chip even though
    decode itself fits."""
    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.models import llama

    emb = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, prefill_len, cfg.hidden_size), jnp.bfloat16)

    @jax.jit
    def run_prefill(params, emb, salt):
        cache = llama.init_kv_cache(cfg, batch, prefill_len + decode_steps,
                                    dtype=jnp.bfloat16)
        pos = jnp.arange(prefill_len)[None]
        logits, hidden, cache = llama.prefill(params, cfg, emb + salt, pos,
                                              cache, last_logit_only=True)
        return jnp.sum(logits[:, -1].astype(jnp.float32)), cache

    s, cache = run_prefill(params, emb, jnp.bfloat16(0))
    float(s)
    t_prefill = None
    if not decode_only:
        t0 = time.time()
        outs = [run_prefill(params, emb, jnp.bfloat16(_NONCE + i * 1e-3))[0]
                for i in range(1, iters + 1)]
        float(outs[-1])                # value pull = reliable barrier
        t_prefill = (time.time() - t0) / iters

    @jax.jit
    def run_decode(params, cache, salt):
        tok = jnp.zeros((batch, 1, cfg.hidden_size), jnp.bfloat16) + salt

        def body(c, _):
            logits, h, c2 = llama.decode_step(params, cfg, tok, c)
            return c2, jnp.sum(logits.astype(jnp.float32))

        c, sums = jax.lax.scan(body, cache, None, length=decode_steps)
        return jnp.sum(sums)

    float(run_decode(params, cache, jnp.bfloat16(0)))
    t0 = time.time()
    outs = [run_decode(params, cache, jnp.bfloat16(_NONCE + i * 1e-3))
            for i in range(1, iters + 1)]
    float(outs[-1])                    # value pull = reliable barrier
    t_decode = (time.time() - t0) / iters / decode_steps
    return t_prefill, t_decode


def bench_caption(n_layers=8, prefill_len=5120, decode_steps=32,
                  full_depth=True):
    """Config 4. Headline = MEASURED full-depth (32-layer) int8 numbers on
    the real chip (init_quantized fits 8B in ~8 GB); the bf16 layer-slice
    numbers + their linear extrapolation are kept alongside, labeled."""
    import dataclasses
    import gc

    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.config import LlamaConfig
    from video_llava_seg_tpu.models import llama
    from video_llava_seg_tpu.ops.quantization import (
        quantize_tree,
        quantized_nbytes,
    )

    full = LlamaConfig()               # Llama-3-8B shape
    cfg = dataclasses.replace(full, num_layers=n_layers)
    params = llama.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    t_prefill, t_decode = _llm_prefill_decode_times(
        params, cfg, prefill_len, decode_steps)

    # int8 weight-only on the same slice (kept for the int8-vs-bf16 delta)
    params_q = quantize_tree(params, bits=8)
    del params
    gc.collect()
    _, t_decode_q = _llm_prefill_decode_times(
        params_q, cfg, prefill_len, decode_steps)
    del params_q
    gc.collect()

    scale = full.num_layers / n_layers  # extrapolate slice -> 32 layers
    out = {
        "config": 4, "metric": "caption_llm_throughput",
        "prefill_tok_s_slice_bf16": round(prefill_len / t_prefill, 0),
        "decode_ms_per_tok_slice_bf16": round(1e3 * t_decode, 2),
        "prefill_tok_s_extrap_32L": round(prefill_len / (t_prefill * scale),
                                          0),
        "decode_ms_per_tok_extrap_32L": round(1e3 * t_decode * scale, 2),
        "decode_ms_per_tok_int8_slice": round(1e3 * t_decode_q, 2),
        "n_layers_slice": n_layers, "prefill_len": prefill_len,
    }
    if not full_depth:
        out["note"] = "slice only (full_depth disabled)"
        return out

    # --- the real thing: full 32-layer 8B-shape model, int8 weight-only ---
    params_full = llama.init_quantized(jax.random.PRNGKey(0), full, bits=8)
    out["full_model_weight_gb"] = round(
        quantized_nbytes(params_full) / 2**30, 2)
    t_prefill_f, t_decode_f = _llm_prefill_decode_times(
        params_full, full, prefill_len, decode_steps)
    del params_full
    gc.collect()
    out.update({
        "prefill_tok_s_full_int8": round(prefill_len / t_prefill_f, 0),
        "decode_ms_per_tok_full_int8": round(1e3 * t_decode_f, 2),
        "n_layers_full": full.num_layers,
        "note": "full-depth numbers MEASURED on chip (int8 weight-only,"
                " ~8 GB); bf16 slice + linear extrapolation kept alongside",
    })

    # --- W8A8 at full depth: same HBM footprint, but the dots run
    # int8 x int8 on the MXU (v5e int8 peak ~2x bf16) — targets the
    # compute-bound prefill share; decode stays bandwidth-bound.
    params_w8a8 = llama.init_quantized(jax.random.PRNGKey(0), full, bits=8,
                                       act_quant=True)
    t_prefill_a, t_decode_a = _llm_prefill_decode_times(
        params_w8a8, full, prefill_len, decode_steps)
    del params_w8a8
    gc.collect()
    out.update({
        "prefill_tok_s_full_w8a8": round(prefill_len / t_prefill_a, 0),
        "decode_ms_per_tok_full_w8a8": round(1e3 * t_decode_a, 2),
    })

    # --- W4A8 at full depth (opt-in lossy mode, reference load_4bit
    # equivalent): nibble-packed int4 weights (~4 GB) halve decode's
    # weight HBM reads; activations stay int8 so prefill keeps the MXU
    # int8 rate. ops/int4.py Pallas unpack+dot kernel. Guarded: must not
    # take down the measured int8 numbers above.
    try:
        params_w4a8 = llama.init_quantized(jax.random.PRNGKey(0), full,
                                           bits=4, act_quant=True)
        out["w4a8_model_weight_gb"] = round(
            quantized_nbytes(params_w4a8) / 2**30, 2)
        t_prefill_4, t_decode_4 = _llm_prefill_decode_times(
            params_w4a8, full, prefill_len, decode_steps)
        del params_w4a8
        gc.collect()
        out.update({
            "prefill_tok_s_full_w4a8": round(prefill_len / t_prefill_4, 0),
            "decode_ms_per_tok_full_w4a8": round(1e3 * t_decode_4, 2),
        })
    except Exception as e:  # pragma: no cover - chip-side guard
        out["w4a8_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- int8 KV cache on top of W4A8 weights: decode's HBM reads are
    # weights + cache; at 5k context the bf16 cache is ~2 GB, int8 halves
    # it (scales fold exactly — tests/test_kv_int8.py). Guarded likewise.
    try:
        full_kv8 = dataclasses.replace(full, kv_cache_int8=True)
        params_w4a8 = llama.init_quantized(jax.random.PRNGKey(0), full,
                                           bits=4, act_quant=True)
        t_prefill_5, t_decode_5 = _llm_prefill_decode_times(
            params_w4a8, full_kv8, prefill_len, decode_steps)
        out.update({
            "prefill_tok_s_full_w4a8_kv8": round(prefill_len / t_prefill_5,
                                                 0),
            "decode_ms_per_tok_full_w4a8_kv8": round(1e3 * t_decode_5, 2),
        })
        # fused wqkv / w_gateup layout on top (token-exact,
        # llama.fuse_qkv_gateup) — the fastest single-chip serving config
        params_fused = llama.fuse_qkv_gateup(params_w4a8)
        del params_w4a8
        gc.collect()
        _, t_decode_6 = _llm_prefill_decode_times(
            params_fused, full_kv8, prefill_len, decode_steps)
        del params_fused
        gc.collect()
        out["decode_ms_per_tok_full_w4a8_kv8_fused"] = round(
            1e3 * t_decode_6, 2)
    except Exception as e:  # pragma: no cover - chip-side guard
        out["kv8_error"] = f"{type(e).__name__}: {e}"[:200]
    # headline value for single-config summary lines: best measured
    # full-depth decode latency across the serving ladder
    decode_keys = [v for k, v in out.items()
                   if k.startswith("decode_ms_per_tok_full")]
    if decode_keys:
        out["value"] = min(decode_keys)
        out["unit"] = "ms/tok decode (best full-depth serving ladder)"
    return out


# ---------------------------------------------------------------------------
# config 5 — full LG-VIS e2e p50 (16-frame clip, caption + mask)
# ---------------------------------------------------------------------------

def bench_e2e(n_llm_layers=32, n_frames=16, decode_tokens=64,
              llm_int8=True):
    """Config 5. Default = FULL-DEPTH 32-layer LLM with int8 weight-only
    dense kernels (measured, not extrapolated); vision tower + seg head
    stay bf16. n_llm_layers/llm_int8 kept as knobs for the slice ablation."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_llava_seg_tpu.config import (
        LlamaConfig,
        ProjectorConfig,
        SegHeadConfig,
        VideoLlavaConfig,
        VisionTowerConfig,
    )
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.models import llama, llava
    from video_llava_seg_tpu.models import seg_head as seg_head_mod

    vis = VisionTowerConfig(name="clip-vit-large-336")
    full_layers = 32
    llm_cfg = dataclasses.replace(LlamaConfig(), num_layers=n_llm_layers)
    cfg = VideoLlavaConfig(
        llm=llm_cfg,
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=vis.hidden_size,
                                  hidden_size=4096),
        seg=SegHeadConfig(seg_backbone="sam2.1-hiera-small",
                          max_seg_frames=8),
        num_frames=n_frames, num_slow_frames=8, seg_token_idx=128010)
    if llm_int8:
        # init vision/projector/seg with a 1-layer LLM stand-in, then swap
        # in the full-depth int8 LLM (bf16 8B would not fit the chip)
        cfg_stub = dataclasses.replace(
            cfg, llm=dataclasses.replace(llm_cfg, num_layers=1))
        params = llava.init(jax.random.PRNGKey(0), cfg_stub,
                            dtype=jnp.bfloat16)
        # W8A8: same ~8 GB footprint as weight-only, equal decode ms/tok,
        # but prefill rides int8 MXU dots (~1.5x measured on config 4)
        params["llm"] = llama.init_quantized(jax.random.PRNGKey(0), llm_cfg,
                                             bits=8, act_quant=True)
    else:
        params = llava.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    sam2_cfg = seg_head_mod.make_sam2_cfg(cfg.seg)

    tpi = llava.visual_tokens_per_sample(cfg)
    ids = np.concatenate([
        np.asarray([[1, 2, 3]]),
        np.full((1, len(tpi)), IMAGE_TOKEN_INDEX),
        np.asarray([[4, 5, 6]]),
    ], axis=1)
    rng = np.random.default_rng(0)
    video = rng.random((1, n_frames, vis.image_size, vis.image_size, 3),
                       np.float32).astype(np.float32)
    seg_frames = rng.random((cfg.seg.max_seg_frames, 1024, 1024, 3),
                            np.float32)

    # one fused dispatch: encode + splice + prefill + greedy decode
    plan = llava.build_splice_plan(ids, tpi)

    def make_caption(ccfg):
        @jax.jit
        def caption(params, video, text_ids, gather_idx, salt):
            slow, fast = llava.encode_video(
                params, ccfg, video.astype(jnp.bfloat16) + salt)
            visual = llava.flatten_visual_features(slow, fast)
            embeds = llava.assemble_embeds(params, text_ids, gather_idx,
                                           visual)
            tokens, hidden, n = llama.greedy_generate(
                params["llm"], ccfg.llm, embeds,
                prompt_len=embeds.shape[1],
                max_new_tokens=decode_tokens, eos_token_ids=(999999,))
            return tokens, hidden, n
        return caption

    caption = make_caption(cfg)

    @jax.jit
    def seg(seg_params, frames, seg_hidden, salt):
        feats, high_res = seg_head_mod.encode_video_frames(
            seg_params, sam2_cfg,
            frames.astype(jnp.bfloat16) + salt)
        masks = seg_head_mod.decode_masks(
            seg_params, cfg.seg, sam2_cfg, feats, high_res,
            seg_hidden.astype(jnp.bfloat16))
        return jnp.sum(masks.astype(jnp.float32)), masks.shape

    tids = jnp.asarray(plan.text_ids)
    gidx = jnp.asarray(plan.gather_idx)
    vdev = jnp.asarray(video)
    fdev = jnp.asarray(seg_frames)
    seg_hidden = jnp.zeros((1, cfg.llm.hidden_size))

    def once(salt):
        t0 = time.time()
        tokens, hidden, n = caption(params, vdev, tids, gidx,
                                    jnp.bfloat16(salt))
        int(jax.device_get(n))
        t1 = time.time()
        s, _shape = seg(params["seg_head"], fdev, seg_hidden,
                        jnp.bfloat16(salt))
        float(s)
        t2 = time.time()
        return t2 - t0, t2 - t1

    once(0.0)                          # compile + warmup
    rows = [once(_NONCE + i * 1e-3) for i in range(1, 8)]
    times = sorted(t for t, _ in rows)
    p50 = times[len(times) // 2]
    seg_s = sorted(t for _, t in rows)[len(rows) // 2]
    full = n_llm_layers == full_layers
    unit = ("s (16-frame clip, full-depth int8 LLM)" if full and llm_int8
            else f"s (16-frame clip, {n_llm_layers}-layer slice LLM)")
    out = {
        "config": 5, "metric": "e2e_caption_mask_p50_s",
        "value": round(p50, 3), "unit": unit,
        "vs_baseline": round(1.5 / p50, 3),
        "n_llm_layers": n_llm_layers, "llm_int8": llm_int8,
        "decode_tokens": decode_tokens,
        # SAM2 seg-head share (SURVEY §6 first-measurement list): encode
        # + decode of max_seg_frames 1024^2 frames, per frame
        "seg_head_ms_per_frame": round(
            1e3 * seg_s / cfg.seg.max_seg_frames, 2),
    }
    if full:
        out["note"] = ("MEASURED at full 32-layer depth (W8A8 int8 LLM, "
                       "bf16 vision+seg) — no extrapolation")
    else:
        out["note"] = (f"LLM is a {n_llm_layers}-layer slice; LLM share "
                       f"scales ~x{full_layers / n_llm_layers:.0f} at full "
                       "depth")

    if full and llm_int8:
        # --- fastest-serving variant: W4A8 LLM (nibble-packed int4, the
        # reference's load_4bit equivalent; opt-in LOSSY mode — accuracy
        # delta documented on config 4) + int8 KV cache. Decode's weight
        # AND cache reads both halve.
        import gc

        try:
            params["llm"] = None
            gc.collect()
            params["llm"] = llama.fuse_qkv_gateup(
                llama.init_quantized(jax.random.PRNGKey(0), llm_cfg,
                                     bits=4, act_quant=True))
            cfg_kv8 = dataclasses.replace(
                cfg, llm=dataclasses.replace(llm_cfg, kv_cache_int8=True))
            caption = make_caption(cfg_kv8)
            once(0.0)                  # compile the q4+kv8 caption path
            rows4 = [once(_NONCE + i * 1e-3) for i in range(1, 8)]
            t4 = sorted(t for t, _ in rows4)
            out["p50_w4a8_kv8_s"] = round(t4[len(t4) // 2], 3)
        except Exception as e:  # pragma: no cover - chip-side guard
            out["w4a8_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# config 6 — QLoRA train step (full-depth int8 base) on one chip
# ---------------------------------------------------------------------------

def bench_serving(n_frames=16, decode_tokens=64, batches=(1, 2, 4, 8),
                  decode_curve=False, serve_clips=True):
    """Config 7 (beyond BASELINE's five): batched offline serving
    throughput, clips/s/chip for the full caption+mask pipeline.

    The reference cannot batch inference at all — it hard-asserts
    batch_size == 1 in the seg-head generate path
    (llava/model/language_model/llava_llama.py:313) and scales out only by
    forking one process per GPU (scripts/infer.sh). Here the whole pipeline
    is batch-native (splice plans are [B, L] gathers, the KV cache carries
    a batch axis, greedy decode stops per-row), and decode is
    weight-HBM-bound (~4.5 GB of W4A8 weights stream per step), so serving
    B clips amortizes that stream: aggregate decode tok/s scales
    near-linearly in B until the KV-cache reads (per-clip) take over.

    Model: full-depth 32-layer W4A8 LLM + int8 KV cache + bf16 CLIP-L
    tower + bf16 SAM2 seg head — the fastest measured serving ladder from
    configs 4/5."""
    import dataclasses
    import gc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_llava_seg_tpu.config import (
        LlamaConfig,
        ProjectorConfig,
        SegHeadConfig,
        VideoLlavaConfig,
        VisionTowerConfig,
    )
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.models import llama, llava
    from video_llava_seg_tpu.models import seg_head as seg_head_mod

    vis = VisionTowerConfig(name="clip-vit-large-336")
    llm_cfg = dataclasses.replace(LlamaConfig(), kv_cache_int8=True)
    cfg = VideoLlavaConfig(
        llm=llm_cfg,
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=vis.hidden_size,
                                  hidden_size=4096),
        seg=SegHeadConfig(seg_backbone="sam2.1-hiera-small",
                          max_seg_frames=8),
        num_frames=n_frames, num_slow_frames=8, seg_token_idx=128010)
    cfg_stub = dataclasses.replace(
        cfg, llm=dataclasses.replace(llm_cfg, num_layers=1))
    params = llava.init(jax.random.PRNGKey(0), cfg_stub, dtype=jnp.bfloat16)
    # UNROLLED layer layout on purpose: the scanned (stack_layers) variant
    # compiles 32x faster but XLA materializes a copy of each layer's
    # weight slice before every pallas_call, doubling decode's weight HBM
    # traffic (measured: 1.38 -> 1.97 s/clip at batch 1). The unrolled
    # 32-layer program is heavy on the tunnel's compile helper, so sweep
    # ONE batch size per process (--serving_batches) and let the
    # persistent compile cache accumulate across invocations.
    params["llm"] = llama.init_quantized(jax.random.PRNGKey(0), llm_cfg,
                                         bits=4, act_quant=True)
    sam2_cfg = seg_head_mod.make_sam2_cfg(cfg.seg)

    tpi = llava.visual_tokens_per_sample(cfg)
    rng = np.random.default_rng(0)

    # vision and LLM run as SEPARATE jits (embeds stay on device; the
    # extra dispatch is ~0.5 ms async): the fused program at batch>=2
    # reproducibly crashed the tunnel's remote compile helper — program
    # size, not shapes (the split LLM program alone compiles)
    @jax.jit
    def encode(params, video, text_ids, gather_idx, salt):
        slow, fast = llava.encode_video(params, cfg,
                                        video.astype(jnp.bfloat16) + salt)
        visual = llava.flatten_visual_features(slow, fast)
        return llava.assemble_embeds(params, text_ids, gather_idx, visual)

    @jax.jit
    def generate(llm_params, embeds):
        return llama.greedy_generate(
            llm_params, cfg.llm, embeds, prompt_len=embeds.shape[1],
            max_new_tokens=decode_tokens, eos_token_ids=(999999,))

    def caption(params, video, text_ids, gather_idx, salt):
        embeds = encode(params, video, text_ids, gather_idx, salt)
        return generate(params["llm"], embeds)

    @jax.jit
    def seg(seg_params, frames, seg_hidden, salt):
        feats, high_res = seg_head_mod.encode_video_frames(
            seg_params, sam2_cfg, frames.astype(jnp.bfloat16) + salt)
        masks = seg_head_mod.decode_masks(
            seg_params, cfg.seg, sam2_cfg, feats, high_res,
            seg_hidden.astype(jnp.bfloat16))
        return jnp.sum(masks.astype(jnp.float32))

    seg_frames = jnp.asarray(
        rng.random((cfg.seg.max_seg_frames, 1024, 1024, 3), np.float32))
    seg_hidden = jnp.zeros((1, cfg.llm.hidden_size))

    out = {
        "config": 7, "metric": "serving_throughput_clips_per_s",
        "unit": "clips/s/chip (16-frame caption+mask, W4A8 + int8 KV)",
        "decode_tokens": decode_tokens,
        "note": "batch-native serving: the reference hard-asserts batch 1 "
                "at inference (llava_llama.py:313); decode's weight stream "
                "amortizes across the batch",
    }
    # merge with prior sweeps: each batch size runs in its own process
    # (one heavy unrolled-32-layer compile per invocation — kinder to the
    # tunnel's compile helper; the persistent cache accumulates)
    prior = {}
    try:
        with open("BENCH_DETAIL.json") as fh:
            prior = json.load(fh).get("7", {})
    except (OSError, ValueError):
        pass
    clips_s = {int(k): v
               for k, v in prior.get("clips_per_s_by_batch", {}).items()}
    decode_tok_s = {int(k): v
                    for k, v in prior.get("decode_tok_s_by_batch",
                                          {}).items()}
    # notes travel with their numbers across partial reruns (a decode-only
    # invocation must not drop the clips run's fence note, and vice versa)
    for k, v in prior.items():
        if k.endswith("_note"):
            out[k] = v
    for b in (batches if serve_clips else ()):
        try:
            # serve through the CLI's batch fence: batch 2 faults the TPU
            # worker (BENCH_NOTES "Batch-2 serving fault"), so the product
            # pads it to the bisected-green batch 3 with ONE duplicate row
            # and discards the dummy — measure what the product does,
            # counting only the b REAL clips toward throughput
            from video_llava_seg_tpu.inference.main import _green_batch

            bd = _green_batch(b)
            if bd != b:
                out[f"batch{b}_note"] = (f"served fenced: padded to batch "
                                         f"{bd}, {b} real rows counted")
            ids = np.concatenate([
                np.tile([[1, 2, 3]], (bd, 1)),
                np.full((bd, len(tpi)), IMAGE_TOKEN_INDEX),
                np.tile([[4, 5, 6]], (bd, 1)),
            ], axis=1)
            plan = llava.build_splice_plan(ids, tpi)
            tids = jnp.asarray(plan.text_ids)
            gidx = jnp.asarray(plan.gather_idx)
            video = jnp.asarray(rng.random(
                (bd, n_frames, vis.image_size, vis.image_size, 3),
                np.float32))

            def once(salt):
                t0 = time.time()
                tokens, hidden, n = caption(params, video, tids, gidx,
                                            jnp.bfloat16(salt))
                int(jax.device_get(n))
                # one seg-head dispatch per clip, async; sync once at the end
                sums = [seg(params["seg_head"], seg_frames, seg_hidden,
                            jnp.bfloat16(salt + 1e-4 * i)) for i in range(b)]
                float(sums[-1])        # value pull = reliable barrier
                return time.time() - t0

            once(0.0)                          # compile + warmup
            times = sorted(once(_NONCE + i * 1e-3) for i in range(1, 4))
            clips_s[b] = round(b / times[len(times) // 2], 3)
        except Exception as e:  # pragma: no cover - chip-side OOM guard
            out[f"batch{b}_error"] = f"{type(e).__name__}: {e}"[:160]
            break
    out["clips_per_s_by_batch"] = {k: clips_s[k] for k in sorted(clips_s)}
    if clips_s:
        best = max(clips_s, key=lambda b: clips_s[b])
        out["value"] = clips_s[best]
        out["batch"] = best
        if 1 in clips_s:
            out["speedup_vs_batch1"] = round(clips_s[best] / clips_s[1], 2)

    # decode-only scaling: aggregate tok/s vs batch (the bandwidth-
    # amortization curve, measured without the prefill/vision share);
    # opt-in per invocation (--serving_decode_curve) — each batch size
    # costs its own full-depth prefill+decode compile
    if decode_curve:
        try:
            gc.collect()
            for b in batches:
                if b == 2 and serve_clips:
                    # the encode executable is resident in this process and
                    # the batch-2 full-depth program after encode faults the
                    # worker (BENCH_NOTES bisection; solo it measures
                    # 8.07 ms/step). Skip rather than kill the bench run.
                    # (--serving_decode_only runs no encode, so there b=2
                    # decodes fine solo.)
                    out["decode_batch2_note"] = (
                        "skipped in-process (encode-resident batch-2 fault);"
                        " solo-verified 8.07 ms/step")
                    continue
                _, t_dec = _llm_prefill_decode_times(
                    params["llm"], llm_cfg, 5120, 32, iters=2, batch=b,
                    decode_only=True)
                decode_tok_s[b] = round(b / t_dec, 1)
        except Exception as e:  # pragma: no cover - chip-side guard
            out["decode_scaling_error"] = f"{type(e).__name__}: {e}"[:160]
    if decode_tok_s:
        out["decode_tok_s_by_batch"] = {
            k: decode_tok_s[k] for k in sorted(decode_tok_s)}
    return out


def bench_qlora_train(n_text_tokens=128, rank=64, steps=4):
    """Config 6 (beyond BASELINE's five): one measured stage-2-shaped
    training step — full 32-layer Llama-3-8B base in weight-only int8
    (~8 GB) + fp32 LoRA adapters + bf16 CLIP-L tower (frozen) + trainable
    projector, batch 1 at the published 32-frame slow/fast token budget.

    The reference needs 8-32 A100-80GB for its fine-tunes
    (README.md:79); the QLoRA path fits the whole fine-tune on ONE 16 GB
    v5e because the frozen base carries no grads or optimizer state
    (train/optimizer.py::trainable_mask dead-codes its weight-grad
    einsums) and the int8 base halves weight HBM."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_llava_seg_tpu.config import (
        LlamaConfig,
        ProjectorConfig,
        TrainConfig,
        VideoLlavaConfig,
        VisionTowerConfig,
    )
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.models import llama, llava
    from video_llava_seg_tpu.train import lora as lora_mod
    from video_llava_seg_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    vis = VisionTowerConfig(name="clip-vit-large-336")
    llm_cfg = LlamaConfig()                    # full 32-layer 8B shape
    cfg = VideoLlavaConfig(
        llm=llm_cfg, vision=vis,
        projector=ProjectorConfig(mm_hidden_size=vis.hidden_size,
                                  hidden_size=4096),
        num_frames=32, num_slow_frames=8)
    cfg_stub = dataclasses.replace(
        cfg, llm=dataclasses.replace(llm_cfg, num_layers=1))
    params = llava.init(jax.random.PRNGKey(0), cfg_stub,
                        dtype=jnp.bfloat16)
    params["llm"] = llama.init_quantized(
        jax.random.PRNGKey(0), llm_cfg, bits=8,
        train_mode=True)   # weight-only + bf16 compute (see quantize_tree)
    tcfg = TrainConfig(
        bits=8, lora_enable=True, lora_rank=rank, num_train_steps=100,
        warmup_ratio=0.0, gradient_checkpointing=True,
        gradient_accumulation_steps=1, freeze_vision_tower=True)
    params["lora"] = lora_mod.init_lora(
        jax.random.PRNGKey(1), params, rank)
    state, tx = create_train_state(params, tcfg)
    del params
    step_fn = make_train_step(cfg, tcfg, tx, donate=True)

    tpi = llava.visual_tokens_per_sample(cfg)
    rng = np.random.default_rng(0)
    text = rng.integers(10, 1000, (1, n_text_tokens))
    ids = np.concatenate(
        [text[:, :4], np.full((1, len(tpi)), IMAGE_TOKEN_INDEX),
         text[:, 4:]], axis=1)
    plan = llava.build_splice_plan(ids, tpi, labels=ids)
    batch = {
        "video": jnp.asarray(
            rng.random((1, cfg.num_frames, vis.image_size, vis.image_size,
                        3), np.float32), jnp.bfloat16),
        "text_ids": jnp.asarray(plan.text_ids),
        "gather_idx": jnp.asarray(plan.gather_idx),
        "position_ids": jnp.asarray(plan.position_ids),
        "labels": jnp.asarray(plan.labels),
    }
    seq_len = int(plan.gather_idx.shape[1])    # expanded (visual-spliced)

    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    float(metrics["loss"])                     # compile + warmup (value
    # pull — block_until_ready early-returned on these donated outputs)
    times = []
    for i in range(steps):
        t0 = time.time()
        state, metrics = step_fn(state, batch,
                                 jax.random.PRNGKey(_NONCE_I + 3 + i))
        float(metrics["loss"])   # host pull: forces full-step completion
        # (block_until_ready on the donated-aliased outputs returned
        # early here — 48 ms for a 2.6 s step; the scalar pull is the
        # trustworthy barrier on this tunneled chip)
        times.append(time.time() - t0)
    step_s = min(times)
    return {
        "config": 6, "metric": "qlora_train_step",
        "value": round(step_s, 3), "unit": "s/step (bs1, full-depth int8)",
        "train_tokens_per_s": round(seq_len / step_s, 1),
        "seq_len": seq_len, "lora_rank": rank,
        "n_llm_layers": llm_cfg.num_layers,
        "loss": round(float(metrics["loss"]), 4),
        "grad_norm": round(float(metrics["grad_norm"]), 4),
        "note": "stage-2-shaped caption fine-tune step ON ONE CHIP: "
                "int8 frozen 8B base + LoRA r=%d + trainable projector "
                "(reference hardware: 4x8 A100-80GB)" % rank,
    }


BENCHES = {1: bench_sam2_image, 2: bench_sam2_video, 3: bench_vision,
           4: bench_caption, 5: bench_e2e, 6: bench_qlora_train,
           7: bench_serving}


def main():
    # persistent compilation cache: remote-compiles over the tunneled chip
    # take minutes; cache them across bench invocations
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None,
                    help="comma-separated BASELINE config ids (1-7); "
                         "default = the compact full ladder (--round)")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--round", action="store_true",
                    help="compact full ladder: all 7 configs at reduced "
                         "iters, headline (config 3) first, under a "
                         "wall-clock budget — the driver-artifact mode")
    ap.add_argument("--budget_s", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 2400)),
                    help="round-mode wall budget: stop starting new "
                         "configs past this many seconds")
    ap.add_argument("--serving_batches", default=None,
                    help="config 7: comma-separated batch sizes to sweep "
                         "in THIS process (results merge across runs)")
    ap.add_argument("--serving_decode_curve", action="store_true",
                    help="config 7: also measure decode-only tok/s at the "
                         "swept batch sizes")
    ap.add_argument("--serving_decode_only", action="store_true",
                    help="config 7: skip the clips sweep and measure ONLY "
                         "the decode curve (fresh process, no encode "
                         "resident — lets batch sizes the clips sweep "
                         "can't co-run, like 2, or can't fit, like 8 "
                         "after the sweep's executables, measure solo)")
    args = ap.parse_args()
    round_mode = args.round or (args.configs is None and not args.all)
    if args.all:
        ids = [1, 2, 3, 4, 5]
    elif round_mode:
        # headline first so a budget/tunnel death still leaves the driver
        # line; cheap configs next, heavy unrolled-32L programs last
        ids = [3, 1, 2, 4, 6, 5, 7]
        import functools

        # compact variants: reduced iters/decode budgets, same hardened
        # timers — every headline lands in BENCH_r{N}.json each round
        # (VERDICT r4 weak #3) instead of only config 3
        BENCHES[4] = functools.partial(bench_caption, decode_steps=16)
        BENCHES[5] = functools.partial(bench_e2e, decode_tokens=32)
        BENCHES[6] = functools.partial(bench_qlora_train, steps=3)
        BENCHES[7] = functools.partial(bench_serving, batches=(1, 2),
                                       decode_curve=False)
    else:
        ids = [int(x) for x in args.configs.split(",")]
    if args.serving_batches is not None:
        import functools

        BENCHES[7] = functools.partial(
            bench_serving,
            batches=tuple(int(x) for x in args.serving_batches.split(",")),
            decode_curve=(args.serving_decode_curve
                          or args.serving_decode_only),
            serve_clips=not args.serving_decode_only)

    def merge_detail(results):
        # merge into the existing detail file: a partial run (--configs 1,2)
        # must not drop the measured entries of configs it didn't touch
        detail = {}
        try:
            with open("BENCH_DETAIL.json") as fh:
                detail = json.load(fh)
        except (OSError, ValueError):
            pass
        detail.update({str(k): v for k, v in results.items()})
        with open("BENCH_DETAIL.json", "w") as fh:
            json.dump(dict(sorted(detail.items())), fh, indent=1)

    results = {}
    t_start = time.time()
    for i in ids:
        if (round_mode and results
                and time.time() - t_start > args.budget_s):
            # budget guard: never risk the driver's timeout killing the
            # process before the headline line prints
            results[i] = {"config": i,
                          "skipped_budget": round(time.time() - t_start)}
            _eprint(results[i])
            continue
        try:
            r = BENCHES[i]()
        except Exception as e:  # keep the headline alive if one config dies
            r = {"config": i, "error": f"{type(e).__name__}: {e}"}
        results[i] = r
        _eprint(r)
        # write after EVERY config (single-config runs included): a tunnel
        # drop / timeout mid-run must not lose the configs already measured
        merge_detail(results)
        if len(ids) > 1:
            # drop executables + their pinned buffers between configs so a
            # big config (8B-slice LLM) can't OOM the next one's HBM
            import jax

            jax.clear_caches()

    head = results.get(3) or next(iter(results.values()))
    line = {
        "metric": head.get("metric", "error"),
        "value": head.get("value", 0),
        "unit": head.get("unit", ""),
        "vs_baseline": head.get("vs_baseline", 0),
    }
    if round_mode:
        # compact per-config summary inside the single driver line
        line["ladder"] = {
            str(i): ({"value": r.get("value"), "unit": r.get("unit")}
                     if "value" in r else
                     {k: r[k] for k in ("error", "skipped_budget")
                      if k in r})
            for i, r in sorted(results.items())}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
