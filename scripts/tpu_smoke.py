"""Single-chip TPU smoke: flash-attention grad parity + one real train step.

The CPU test suite runs Pallas in interpret mode and the XLA attention path,
so it structurally cannot catch Mosaic-compilation or TPU-training breakage
(round-1 verdict: training could not backprop on the real chip because the
flash kernel had no VJP). This script runs on the default (axon TPU) platform:

  1. flash_attention forward + backward (Mosaic-compiled) vs the XLA
     reference at a Llama-3-like shape and a GQA shape.
  2. One full make_train_step step (tiny config incl. seg head) on the chip,
     asserting a finite loss.

Run: python scripts/tpu_smoke.py   (~2-4 min incl. compiles over the tunnel)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def check_flash_grads():
    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.ops.attention import (
        attention_reference,
        flash_attention,
    )

    print(f"devices: {jax.devices()}")
    assert jax.devices()[0].platform in ("tpu", "axon"), jax.devices()

    cases = [
        # (B, Hq, Hkv, Sq, Skv, D, causal)  llama-like + GQA + short-kv
        (1, 8, 8, 1024, 1024, 128, True),
        (1, 8, 2, 2048, 2048, 128, True),
        (2, 4, 4, 577, 577, 64, False),   # ViT regime (single-block path)
        # batch>1 memory-attention regime: the kv_bias block spec was only
        # legal at B==1 until 2026-08 (multi-object tracking crashed on
        # TPU; CPU interpret mode never enforces Mosaic tiling)
        (3, 2, 2, 512, 4096, 64, False),
    ]
    for B, Hq, Hkv, Sq, Skv, D, causal in cases:
        key = jax.random.PRNGKey(0)
        kq, kk, kv, kw = jax.random.split(key, 4)
        q = jax.random.normal(kq, (B, Hq, Sq, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, Hkv, Skv, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, Hkv, Skv, D), jnp.bfloat16)
        w = jax.random.normal(kw, (B, Hq, Sq, D), jnp.bfloat16)
        # per-key masking on the batched non-causal case (memory-attention
        # regime): exercises the kv_bias spec at B > 1
        kv_mask = None
        kv_bias = None
        if not causal and B > 1:
            kv_mask = jax.random.uniform(kw, (B, Skv)) > 0.25
            kv_bias = jnp.where(kv_mask, 0.0,
                                -0.7 * float(jnp.finfo(jnp.float32).max))

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=causal,
                                           kv_bias=kv_bias)
                           .astype(jnp.float32) * w.astype(jnp.float32))

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, causal=causal,
                                               kv_mask=kv_mask)
                           .astype(jnp.float32) * w.astype(jnp.float32))

        t0 = time.time()
        got = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        got = jax.device_get(got)
        want = jax.device_get(
            jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v))
        for g, r, name in zip(got, want, "qkv"):
            err = np.max(np.abs(np.asarray(g, np.float32)
                                - np.asarray(r, np.float32)))
            denom = np.max(np.abs(np.asarray(r, np.float32))) + 1e-6
            rel = err / denom
            assert rel < 5e-2, (name, rel, err)
        print(f"  flash grad ok B={B} Hq={Hq} Hkv={Hkv} Sq={Sq} Skv={Skv} "
              f"D={D} causal={causal} ({time.time()-t0:.1f}s)")


def check_train_step():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.config import (
        MeshConfig,
        SegHeadConfig,
        TrainConfig,
        VideoLlavaConfig,
    )
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.models import llava
    from video_llava_seg_tpu.models import seg_head as seg_head_mod
    from video_llava_seg_tpu.models.sam2.config import sam2_tiny_test_config
    from video_llava_seg_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    base = VideoLlavaConfig.tiny()
    seg = SegHeadConfig(seg_backbone="tiny", image_size=64, max_seg_frames=2,
                        max_objects=2, seg_num_queries=1)
    sam2_cfg = dataclasses.replace(sam2_tiny_test_config(), image_size=64)
    orig_make = seg_head_mod.make_sam2_cfg
    seg_head_mod.make_sam2_cfg = lambda c: sam2_cfg
    try:
        cfg = dataclasses.replace(base, seg=seg, seg_token_idx=7)
        params = llava.init(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(num_train_steps=10, mesh=MeshConfig())
        state, tx = create_train_state(params, tcfg)
        step = make_train_step(cfg, tcfg, tx, donate=False)

        b = 2
        tpi = llava.visual_tokens_per_sample(cfg)
        ids = np.concatenate([
            np.asarray([[1, cfg.seg_token_idx]] * b),
            np.full((b, len(tpi)), IMAGE_TOKEN_INDEX),
            np.asarray([[3, 4]] * b),
        ], axis=1)
        labels = np.where(ids < 0, -100, ids)
        plan = llava.build_splice_plan(ids, tpi, labels)
        s = cfg.vision.image_size
        ss = sam2_cfg.image_size
        batch = {
            "video": jnp.zeros((b, cfg.num_frames, s, s, 3)),
            "text_ids": jnp.asarray(plan.text_ids),
            "gather_idx": jnp.asarray(plan.gather_idx),
            "position_ids": jnp.asarray(plan.position_ids),
            "labels": jnp.asarray(plan.labels),
            "seg_frames": jnp.zeros((b, seg.max_seg_frames, ss, ss, 3)),
            "seg_masks": jnp.zeros(
                (b, seg.max_objects, seg.max_seg_frames, ss, ss), bool),
            "seg_valid": jnp.ones((b, seg.max_objects), bool),
            "seg_frame_valid": jnp.ones((b, seg.max_seg_frames), bool),
            "seg_padding": jnp.zeros((b, 4), jnp.int32),
            "seg_token_pos": jnp.ones((b, seg.max_objects), jnp.int32),
            "has_masks": jnp.ones((b,), bool),
        }
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(jax.device_get(metrics["loss"]))
        assert np.isfinite(loss), f"non-finite loss: {loss}"
        # a second step to confirm the optimizer update applied cleanly
        state, metrics2 = step(state, batch, jax.random.PRNGKey(2))
        loss2 = float(jax.device_get(metrics2["loss"]))
        assert np.isfinite(loss2), f"non-finite loss2: {loss2}"
        print(f"  train step ok on {jax.devices()[0].platform}: "
              f"loss={loss:.4f} -> {loss2:.4f} ({time.time()-t0:.1f}s)")
        # steady-state step rate (async dispatch, one sync)
        t0 = time.time()
        n = 10
        for i in range(n):
            state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(metrics["loss"])
        dt = (time.time() - t0) / n
        print(f"  steady state: {dt*1e3:.1f} ms/step "
              f"({1/dt:.1f} steps/s, tiny cfg, batch {b})")
    finally:
        seg_head_mod.make_sam2_cfg = orig_make


def check_hiera_megakernel():
    """Fused Hiera block megakernel (Mosaic-compiled) vs the XLA oracle,
    incl. a padded (non-window-divisible) map and a q-pool transition —
    the paths CPU interpret mode cannot Mosaic-verify."""
    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.ops import nn
    from video_llava_seg_tpu.ops.hiera_block import (
        hiera_block,
        hiera_block_xla,
    )

    cases = [
        # (h, w, din, dout, heads, ws, ps)   divisible / padded / q-pool
        (64, 64, 144, 144, 2, 8, 1),
        (30, 30, 96, 96, 2, 14, 1),          # tiny-s3-like, padded to 42
        (64, 64, 576, 1152, 16, 8, 2),       # hiera-L stage-4 transition
        (32, 32, 768, 768, 8, 7, 1),         # tiny stage-4: gap-stored @8
        (64, 64, 384, 768, 8, 14, 2),        # tiny s3->s4: pooled 7 @16
        (64, 64, 576, 576, 8, 0, 1),         # hiera-L global: chunked SDPA
    ]
    for h, w, din, dout, heads, ws, ps in cases:
        keys = jax.random.split(jax.random.PRNGKey(din + ws), 5)
        blk = {
            "norm1": nn.layer_norm_init(din, jnp.bfloat16),
            "qkv": nn.dense_init(keys[0], din, dout * 3, dtype=jnp.bfloat16),
            "proj_attn": nn.dense_init(keys[1], dout, dout,
                                       dtype=jnp.bfloat16),
            "norm2": nn.layer_norm_init(dout, jnp.bfloat16),
            "mlp": nn.mlp_init(keys[2], [dout, dout * 4, dout],
                               dtype=jnp.bfloat16),
        }
        if din != dout:
            blk["proj"] = nn.dense_init(keys[3], din, dout,
                                        dtype=jnp.bfloat16)
        x = jax.random.normal(keys[4], (2, h, w, din), jnp.bfloat16)
        qs = (ps, ps) if ps > 1 else None
        got = jax.jit(lambda x, blk: hiera_block(
            blk, x, num_heads=heads, ws=ws, q_stride=qs,
            backend="pallas"))(x, blk)
        want = jax.jit(lambda x, blk: hiera_block_xla(
            blk, x, num_heads=heads, ws=ws, q_stride=qs))(x, blk)
        g = np.asarray(got.astype(jnp.float32))
        wnt = np.asarray(want.astype(jnp.float32))
        rel = np.abs(g - wnt).max() / (np.std(wnt) + 1e-9)
        assert rel < 0.15, (h, w, ws, ps, rel)   # bf16 rounding class
        print(f"  hiera_block ok ({h}x{w} c{din}->{dout} ws{ws} ps{ps}): "
              f"max rel {rel:.4f}")




def check_vit_megakernel():
    """Fused ViT encoder layer (Mosaic-compiled) vs the XLA oracle at the
    CLIP-L serving shape class (577 tokens padded to 584, D=1024, 16
    heads) — interpret mode cannot Mosaic-verify the token-axis chunk
    collapses."""
    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.ops import nn
    from video_llava_seg_tpu.ops.vit_block import (
        _xla_quick_gelu,
        vit_layer,
        vit_layer_xla,
    )

    d, dff, heads, kv, sp, bt = 1024, 4096, 16, 577, 584, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    p = {
        "layer_norm1": nn.layer_norm_init(d, jnp.bfloat16),
        "q_proj": nn.dense_init(ks[0], d, d, dtype=jnp.bfloat16),
        "k_proj": nn.dense_init(ks[1], d, d, dtype=jnp.bfloat16),
        "v_proj": nn.dense_init(ks[2], d, d, dtype=jnp.bfloat16),
        "out_proj": nn.dense_init(ks[3], d, d, dtype=jnp.bfloat16),
        "layer_norm2": nn.layer_norm_init(d, jnp.bfloat16),
        "fc1": nn.dense_init(ks[4], d, dff, dtype=jnp.bfloat16),
        "fc2": nn.dense_init(ks[5], dff, d, dtype=jnp.bfloat16),
    }
    x = jax.random.normal(ks[6], (bt, sp, d), jnp.bfloat16)
    got = jax.jit(lambda x, p: vit_layer(
        p, x, num_heads=heads, eps=1e-5, kv_len=kv,
        backend="pallas"))(x, p)
    want = jax.jit(lambda x, p: vit_layer_xla(
        p, x, num_heads=heads, eps=1e-5, kv_len=kv,
        act=_xla_quick_gelu))(x, p)
    g = np.asarray(got[:, :kv].astype(jnp.float32))
    w = np.asarray(want[:, :kv].astype(jnp.float32))
    rel = np.abs(g - w).max() / (np.std(w) + 1e-9)
    assert rel < 0.15, rel
    print(f"  vit_layer ok ({bt}x{sp}x{d} h{heads}): max rel {rel:.4f}")

    # W8A8 fused variant: in-kernel dynamic act quant + int8 MXU dots —
    # verify the Mosaic int8 dot path against the nn.dense W8A8 oracle
    # running the SAME quantized params
    from video_llava_seg_tpu.ops.quantization import quantize_tree

    pq = quantize_tree(p, bits=8, act_quant=True, min_size=0)
    got_q = jax.jit(lambda x, p: vit_layer(
        p, x, num_heads=heads, eps=1e-5, kv_len=kv,
        backend="pallas"))(x, pq)
    want_q = jax.jit(lambda x, p: vit_layer_xla(
        p, x, num_heads=heads, eps=1e-5, kv_len=kv,
        act=_xla_quick_gelu))(x, pq)
    gq = np.asarray(got_q[:, :kv].astype(jnp.float32))
    wq = np.asarray(want_q[:, :kv].astype(jnp.float32))
    rel_q = np.abs(gq - wq).max() / (np.std(wq) + 1e-9)
    assert rel_q < 0.15, rel_q
    print(f"  vit_layer W8A8 ok: max rel vs int8 oracle {rel_q:.4f}")


def check_w4a8_dense():
    """Packed-int4 dense (ops/int4.py): Mosaic in-VMEM nibble unpack +
    int8 MXU dots vs the XLA unpack oracle — must match bitwise (both
    run the same int32 math) at an LLM mlp shape, incl. rows=1 decode."""
    import jax
    import jax.numpy as jnp

    from video_llava_seg_tpu.ops.int4 import (
        pack_int4,
        unpack_int4,
        w4a8_matmul,
    )
    from video_llava_seg_tpu.ops.quantization import (
        quantize_activations_rowwise,
        quantize_kernel,
    )

    in_dim, out = 4096, 14336
    w = jax.random.normal(jax.random.PRNGKey(0), (in_dim, out),
                          jnp.float32) * 0.02
    q, scale = quantize_kernel(w, bits=4)
    packed = pack_int4(q)
    lo, hi = unpack_int4(packed)
    half = in_dim // 2

    @jax.jit
    def oracle(xq, a_s):
        acc = (jnp.dot(xq[:, :half], lo, preferred_element_type=jnp.int32)
               + jnp.dot(xq[:, half:], hi,
                         preferred_element_type=jnp.int32))
        return acc.astype(jnp.float32) * a_s * scale

    kern = jax.jit(lambda xq, a_s: w4a8_matmul(xq, a_s, packed, scale,
                                               jnp.float32))
    for rows in (1, 256):
        x = jax.random.normal(jax.random.PRNGKey(rows), (rows, in_dim),
                              jnp.float32)
        xq, a_s = quantize_activations_rowwise(x)
        got = np.asarray(kern(xq, a_s))
        want = np.asarray(oracle(xq, a_s))
        assert np.array_equal(got, want), np.abs(got - want).max()
    print(f"  w4a8 dense ok ({in_dim}x{out}): bitwise vs XLA oracle")


if __name__ == "__main__":
    check_flash_grads()
    check_hiera_megakernel()
    check_vit_megakernel()
    check_w4a8_dense()
    check_train_step()
    print("TPU smoke: ALL OK")
