"""Llama-3-shaped decoder LLM, TPU-native.

Functional GQA transformer with RMSNorm, SwiGLU, RoPE(theta=500k), a
preallocated static-shape KV cache, and a `lax.while_loop` greedy decode that
captures post-final-norm hidden states of emitted tokens (so [SEG]-token
extraction — llava/model/language_model/llava_llama.py:184-199 — is a gather
at the end instead of HF's per-step output_hidden_states).

Sharding: parameters follow parallel/mesh.py rules (wq/wk/wv/gate/up sharded
on the output dim over 'model', wo/down on the input dim, embeddings/lm_head
on vocab); activations inherit shardings via pjit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import LlamaConfig
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.attention import attention, attention_reference
from video_llava_seg_tpu.ops.rope import apply_rope_1d, rope_1d_cos_sin


def _norm_init(cfg: LlamaConfig, dtype):
    return (nn.layer_norm_init(cfg.hidden_size, dtype)
            if cfg.norm_type == "layernorm"
            else nn.rms_norm_init(cfg.hidden_size, dtype))


def init_layer(key, cfg: LlamaConfig, dtype=jnp.float32):
    """One decoder block's params (attn + mlp + norms)."""
    d = cfg.hidden_size
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    q_dim = cfg.num_heads * cfg.head_dim
    k = jax.random.split(key, 7)
    mlp = {
        "w_up": nn.dense_init(k[5], d, cfg.intermediate_size,
                              bias=False, dtype=dtype),
        "w_down": nn.dense_init(k[6], cfg.intermediate_size, d,
                                bias=False, dtype=dtype),
    }
    if cfg.mlp_type == "swiglu":
        mlp["w_gate"] = nn.dense_init(k[4], d, cfg.intermediate_size,
                                      bias=False, dtype=dtype)
    return {
        "input_layernorm": _norm_init(cfg, dtype),
        "attn": {
            "wq": nn.dense_init(k[0], d, q_dim, bias=False, dtype=dtype),
            "wk": nn.dense_init(k[1], d, kv_dim, bias=False, dtype=dtype),
            "wv": nn.dense_init(k[2], d, kv_dim, bias=False, dtype=dtype),
            "wo": nn.dense_init(k[3], q_dim, d, bias=False, dtype=dtype),
        },
        "post_attention_layernorm": _norm_init(cfg, dtype),
        "mlp": mlp,
    }


def init(key, cfg: LlamaConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 3)
    d = cfg.hidden_size
    p = {
        "embed_tokens": nn.embedding_init(keys[0], cfg.vocab_size, d, dtype),
        "layers": [init_layer(keys[i + 2], cfg, dtype)
                   for i in range(cfg.num_layers)],
        "norm": _norm_init(cfg, dtype),
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = nn.dense_init(keys[1], d, cfg.vocab_size, bias=False,
                                     dtype=dtype)
    return p


def init_quantized(key, cfg: LlamaConfig, bits: int = 8,
                   dtype=jnp.bfloat16, min_size: int = 1 << 16,
                   act_quant: bool = False, train_mode: bool = False,
                   stacked: bool = False):
    """Initialize directly into quantized form, one jitted layer at a
    time, so peak HBM is the int8 tree plus ONE bf16 layer.

    An 8B-param model is ~16 GB in bf16 — it does not fit a 16 GB v5e —
    but ~8 GB as int8 weights + fp32 per-channel scales (embeddings stay
    bf16). This is what lets the flagship configs run at FULL depth on one
    chip instead of extrapolating from a layer slice (reference serving
    equivalent: --load_8bit, llava/model/builder.py:47-66).

    act_quant=True stores W8A8 kernels ('kernel_qa'): nn.dense then runs
    int8xint8 MXU dots with dynamic per-row activation quantization —
    same HBM footprint, but the dot reads int8 weights directly instead
    of a dequantized bf16 copy."""
    from video_llava_seg_tpu.ops.quantization import quantize_tree

    keys = jax.random.split(key, cfg.num_layers + 3)
    d = cfg.hidden_size

    layer_q = jax.jit(
        lambda k: quantize_tree(init_layer(k, cfg, dtype), bits=bits,
                                min_size=min_size, act_quant=act_quant,
                                train_mode=train_mode))
    if stacked:
        # scan-over-layers layout (stack_layers) built in place: peak HBM
        # is the stacked tree + ONE layer, never 2x the whole LLM
        l0 = jax.block_until_ready(layer_q(keys[2]))
        alloc = jax.jit(lambda l: jax.tree.map(
            lambda x: jnp.zeros((cfg.num_layers,) + x.shape, x.dtype), l))
        write = jax.jit(
            lambda tree, leaf, i: jax.tree.map(
                lambda t, x: jax.lax.dynamic_update_index_in_dim(
                    t, x, i, 0), tree, leaf),
            donate_argnums=0)
        layers = write(alloc(l0), l0, 0)
        for i in range(1, cfg.num_layers):
            layers = write(layers, layer_q(keys[i + 2]), i)
        layers = jax.block_until_ready(layers)
    else:
        layers = [jax.block_until_ready(layer_q(keys[i + 2]))
                  for i in range(cfg.num_layers)]
    p = {
        "embed_tokens": nn.embedding_init(keys[0], cfg.vocab_size, d, dtype),
        "layers": layers,
        "norm": _norm_init(cfg, dtype),
    }
    if not cfg.tie_word_embeddings:
        head_q = jax.jit(lambda k: quantize_tree(
            nn.dense_init(k, d, cfg.vocab_size, bias=False, dtype=dtype),
            bits=bits, min_size=min_size, act_quant=act_quant,
            train_mode=train_mode))
        p["lm_head"] = jax.block_until_ready(head_q(keys[1]))
    return p


def stack_layers(params):
    """Stack the per-layer param list into one [L, ...] pytree so the
    forward/prefill/decode loops run as `lax.scan` over layers.

    Why: the Python-unrolled loop inlines num_layers copies of the block
    into the traced program — at full 32-layer depth the batch>1 serving
    generate's HLO took ~5 min per compile over the tunnel and could crash
    the remote compile helper (HTTP 500, bench config 7). The scanned body
    is traced ONCE: ~32x smaller HLO, proportionally faster compiles,
    identical math (tests/test_llama.py::test_stacked_scan_layers…).

    Perf caveat (measured, bench config 7): when the layer body feeds a
    pallas_call (the W4A8 serving kernel), XLA materializes a COPY of each
    layer's weight slice before the call — decode's weight HBM traffic
    doubles (1.38 -> 1.97 s/clip). Use the scanned layout for XLA-dot
    paths and compile-bound cases; the Pallas W4A8 serving path keeps
    unrolled layers and amortizes compiles through the persistent cache.

    Peak-memory note: stacking copies each leaf; callers holding an ~8 GB
    int8 tree on a 16 GB chip should init directly stacked
    (init_quantized(stacked=True)) instead of converting after the fact.

    Mind: parallel/mesh.py's TP shard rules address the per-layer LIST
    layout — TP-sharded serving keeps unrolled layers."""
    layers = params["layers"]
    if isinstance(layers, dict):
        return params
    p = dict(params)
    p["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return p


def _concat_denses(denses):
    """Concatenate dense param dicts along the OUTPUT axis. Returns None
    when the group cannot be fused exactly (mixed quant kinds, LoRA
    adapters, or biases — none of which the Llama serving trees carry)."""
    kinds = [k for k in ("kernel", "kernel_q", "kernel_qa", "kernel_q4a")
             for d in denses if k in d]
    kind = kinds[0] if kinds else None
    if (kind is None or len(kinds) != len(denses)
            or any(kind not in d for d in denses)
            or any("lora" in d or "bias" in d for d in denses)):
        return None
    out = {kind: jnp.concatenate([d[kind] for d in denses], axis=-1)}
    if kind != "kernel":
        out["kernel_scale"] = jnp.concatenate(
            [d["kernel_scale"] for d in denses], axis=-1)
    return out


def fuse_qkv_gateup(params):
    """Serving-layout transform: concatenate each layer's wq|wk|wv into
    one 'wqkv' dense and (swiglu) w_gate|w_up into 'w_gateup'.

    Exact by construction: per-output-channel weight scales and per-row
    activation scales make every dense's math column-independent, so the
    fused dot is BITWISE identical to the three separate calls
    (tests/test_llama.py::test_fused_qkv_gateup_*). The win is dispatch
    count: 7 -> 4 kernel calls per layer (~96 fewer per decoded token at
    full depth) and ONE dynamic activation quantization per block input
    instead of three (W8A8/W4A8 paths). Measured on chip at full depth
    (W4A8 + int8 KV): decode 9.99 -> 9.77 ms/tok (+2.3%) — decode is
    weight-HBM-bound so in-jit fusion is a small win; the big effect is
    on EAGER serving paths, where each dispatch rides the host tunnel
    (1081 -> 791 ms/tok eager, 27% — see BENCH_NOTES.md).

    Single-chip serving only — TP shard rules (parallel/mesh.py) and the
    LoRA adapter attach points target the unfused names. Works on both
    the per-layer list and the stacked [L, ...] layout (axis=-1 concat).
    The reference's analogue is HF's fused attention QKV packing; here it
    doubles as a dispatch-count optimization for the Pallas W4A8 path."""
    def fuse_layer(layer):
        layer = dict(layer)
        attn = layer["attn"]
        if "wq" in attn:
            fused = _concat_denses([attn["wq"], attn["wk"], attn["wv"]])
            if fused is not None:
                attn = {k: v for k, v in attn.items()
                        if k not in ("wq", "wk", "wv")}
                attn["wqkv"] = fused
                layer["attn"] = attn
        mlp = layer["mlp"]
        if "w_gate" in mlp:
            fused = _concat_denses([mlp["w_gate"], mlp["w_up"]])
            if fused is not None:
                mlp = {k: v for k, v in mlp.items()
                       if k not in ("w_gate", "w_up")}
                mlp["w_gateup"] = fused
                layer["mlp"] = mlp
        return layer

    p = dict(params)
    layers = params["layers"]
    p["layers"] = (fuse_layer(layers) if isinstance(layers, dict)
                   else [fuse_layer(l) for l in layers])
    return p


def _norm(p, cfg: LlamaConfig, x):
    if cfg.norm_type == "layernorm":
        return nn.layer_norm(p, x, cfg.rms_norm_eps)
    return nn.rms_norm(p, x, cfg.rms_norm_eps)


def embed(params, ids):
    return nn.embedding_lookup(params["embed_tokens"], ids)


def unembed(params, cfg: LlamaConfig, h):
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"]["embedding"].astype(h.dtype)
        return jnp.dot(h, w.T, preferred_element_type=jnp.float32)
    head = params["lm_head"]
    if "kernel_q4a" in head:  # W4A8 packed int4 (ops/int4.py)
        from video_llava_seg_tpu.ops.int4 import w4a8_dense

        return w4a8_dense(head, h.astype(jnp.float32))
    if "kernel_qa" in head:  # W8A8 (ops/quantization.py act_quant)
        from video_llava_seg_tpu.ops.quantization import (
            quantize_activations_rowwise,
        )

        hq, a_scale = quantize_activations_rowwise(h)
        y = jnp.dot(hq, head["kernel_qa"],
                    preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * a_scale * head["kernel_scale"]
    if "kernel_q" in head:  # weight-only quantized (ops/quantization.py)
        # output-side per-channel scale (see ops/nn.py dense): keeps the
        # dot's weight operand a fused int8->bf16 convert
        y = jnp.dot(h, head["kernel_q"].astype(h.dtype),
                    preferred_element_type=jnp.float32)
        return y * head["kernel_scale"]
    w = head["kernel"].astype(h.dtype)
    return jnp.dot(h, w, preferred_element_type=jnp.float32)


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, Hkv, max_len, hd]
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32
    # int8-quantized cache (cfg.kv_cache_int8): k/v are int8 and these
    # hold the per-(layer, batch, head, position) f32 scales; None = fp
    k_scale: Optional[jnp.ndarray] = None  # [L, B, Hkv, max_len, 1]
    v_scale: Optional[jnp.ndarray] = None


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16, quantized: Optional[bool] = None
                  ) -> KVCache:
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if quantized is None:
        quantized = cfg.kv_cache_int8
    if quantized:
        sshape = shape[:-1] + (1,)
        return KVCache(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape, jnp.int8),
                       jnp.zeros((), jnp.int32),
                       jnp.ones(sshape, jnp.float32),
                       jnp.ones(sshape, jnp.float32))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((), jnp.int32))


def _quant_kv(x):
    """Symmetric per-(batch, head, position) int8 over head_dim.
    x: [B, H, S, D] -> (int8, f32 [B, H, S, 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.where(amax == 0, 1.0, amax / 127.0)
    return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s


def _attn_block(layer, cfg: LlamaConfig, x, cos, sin, *, causal,
                cache_kv=None, cache_len=None, kv_mask=None,
                kv_start=None, interpret: bool = False):
    """Returns (out, (k, v)) where k/v are this block's new keys/values."""
    b, s, d = x.shape
    if "wqkv" in layer["attn"]:
        # fused serving layout (fuse_qkv_gateup): one dense + slices,
        # bitwise-identical to the three separate dots
        q_dim = cfg.num_heads * cfg.head_dim
        kv_dim = cfg.num_kv_heads * cfg.head_dim
        qkv = nn.dense(layer["attn"]["wqkv"], x)
        q = qkv[..., :q_dim]
        k = qkv[..., q_dim:q_dim + kv_dim]
        v = qkv[..., q_dim + kv_dim:]
    else:
        q = nn.dense(layer["attn"]["wq"], x)
        k = nn.dense(layer["attn"]["wk"], x)
        v = nn.dense(layer["attn"]["wv"], x)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    if cfg.use_rope:
        q = apply_rope_1d(q, cos, sin)
        k = apply_rope_1d(k, cos, sin)

    if cache_kv is None:
        o = attention(q, k.astype(q.dtype), v.astype(q.dtype), causal=causal,
                      kv_mask=kv_mask, window=cfg.sliding_window,
                      alibi=cfg.use_alibi, interpret=interpret)
        new_kv = (k, v)
    else:
        # cache_kv = (k_all [L,B,Hkv,S,D], v_all, k_scale_all, v_scale_all,
        # layer_idx): write ONLY the s new tokens into the stacked cache
        # (never copy/rebuild a whole layer — the per-step jnp.stack of the
        # old design rewrote the full multi-GB cache every decoded token)
        k_all, v_all, ks_all, vs_all, li = cache_kv
        if ks_all is not None:
            # int8 cache: quantize the rotated K and V per position; the
            # scales fold exactly into attention_reference's logits/weights
            k, k_s = _quant_kv(k)
            v, v_s = _quant_kv(v)
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, k_s[None], (li, 0, 0, cache_len, 0))
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, v_s[None], (li, 0, 0, cache_len, 0))
        k_all = jax.lax.dynamic_update_slice(
            k_all, k.astype(k_all.dtype)[None], (li, 0, 0, cache_len, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.astype(v_all.dtype)[None], (li, 0, 0, cache_len, 0))
        ck = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
        valid = cache_len + s
        q_pos = (cache_len + jnp.arange(s)
                 if (cfg.sliding_window is not None or cfg.use_alibi)
                 else None)
        # left-padded ragged batches (batched serving): slots < kv_start[b]
        # hold pad-token K/V — mask them out per row
        dec_mask = (jnp.arange(k_all.shape[3])[None, :] >= kv_start[:, None]
                    if kv_start is not None else None)
        if ks_all is not None:
            cks = jax.lax.dynamic_index_in_dim(ks_all, li, 0,
                                               keepdims=False)[..., 0]
            cvs = jax.lax.dynamic_index_in_dim(vs_all, li, 0,
                                               keepdims=False)[..., 0]
            o = attention_reference(q, ck, cv, kv_valid_len=valid,
                                    kv_mask=dec_mask,
                                    window=cfg.sliding_window,
                                    alibi=cfg.use_alibi, q_positions=q_pos,
                                    k_scale=cks, v_scale=cvs)
        else:
            o = attention_reference(q, ck.astype(q.dtype),
                                    cv.astype(q.dtype),
                                    kv_valid_len=valid, kv_mask=dec_mask,
                                    window=cfg.sliding_window,
                                    alibi=cfg.use_alibi, q_positions=q_pos)
        new_kv = (k_all, v_all, ks_all, vs_all)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, -1)
    return nn.dense(layer["attn"]["wo"], o), new_kv


def _mlp_block(layer, x, cfg: LlamaConfig = None):
    if cfg is not None and cfg.mlp_type == "gelu":
        return nn.dense(layer["mlp"]["w_down"],
                        nn.gelu(nn.dense(layer["mlp"]["w_up"], x)))
    if "w_gateup" in layer["mlp"]:
        gu = nn.dense(layer["mlp"]["w_gateup"], x)
        half = gu.shape[-1] // 2
        g, u = gu[..., :half], gu[..., half:]
    else:
        g = nn.dense(layer["mlp"]["w_gate"], x)
        u = nn.dense(layer["mlp"]["w_up"], x)
    return nn.dense(layer["mlp"]["w_down"], jax.nn.silu(g) * u)


def forward(params, cfg: LlamaConfig, inputs_embeds, position_ids,
            attn_mask=None, interpret: bool = False, remat: bool = False,
            return_logits: bool = True):
    """Full forward (training / prefill without cache).

    inputs_embeds: [B, S, D]; position_ids: [B, S] or [S];
    attn_mask: optional [B, S] bool (right padding can omit it).
    remat: rematerialize each decoder block on the backward pass
    (HF --gradient_checkpointing equivalent, stage3_with_seg.sh:65).
    return_logits=False skips the unembed entirely (training uses the
    chunked fused lm-head+CE in train/losses.py — a full fp32 [S, V]
    logits buffer is ~2.5 GB at the 5k-token budget and its cotangent
    doubles that, which is what OOMed the full-depth train step).

    Returns (logits fp32 [B, S, V] or None, hidden post-norm [B, S, D])."""
    from video_llava_seg_tpu.parallel.mesh import (
        maybe_constrain,
        maybe_constrain_grad,
    )

    x = inputs_embeds
    if position_ids.ndim == 1:
        position_ids = position_ids[None]
    cos, sin = rope_1d_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)
    # rope tables are tiny and batch-1: pin them replicated, or SPMD
    # propagates an 8-way sharding onto their size-1 dim and involuntarily
    # rematerializes the softmax internals in the remat backward (8x1 mesh)
    cos = maybe_constrain(cos)
    sin = maybe_constrain(sin)

    def block(layer, x, cos, sin, attn_mask):
        x = maybe_constrain_grad(x, "data")
        h = _norm(layer["input_layernorm"], cfg, x)
        a, _ = _attn_block(layer, cfg, h, cos, sin, causal=True,
                           kv_mask=attn_mask, interpret=interpret)
        x = x + a
        h = _norm(layer["post_attention_layernorm"], cfg, x)
        return x + _mlp_block(layer, h, cfg)

    if remat:
        block = jax.checkpoint(block)
    layers = params["layers"]
    if isinstance(layers, dict):  # stacked [L, ...] pytree (stack_layers)
        x = jax.lax.scan(
            lambda h, layer: (block(layer, h, cos, sin, attn_mask), None),
            x, layers)[0]
    else:
        for layer in layers:
            x = block(layer, x, cos, sin, attn_mask)
    x = _norm(params["norm"], cfg, x)
    if not return_logits:
        return None, x
    logits = unembed(params, cfg, x)
    return logits, x


def prefill(params, cfg: LlamaConfig, inputs_embeds, position_ids,
            cache: KVCache, kv_mask=None, last_logit_only: bool = False,
            interpret: bool = False):
    """Prefill the KV cache. Returns (logits [B,S,V], hidden [B,S,D], cache).

    kv_mask: optional [B, S] bool — False keys are masked (left-padded
    ragged batches for batched serving).

    last_logit_only: unembed only the final position (logits come back
    [B, 1, V]). Greedy decoding samples solely from logits[:, -1], so the
    full-sequence unembed is pure waste there — at Llama-3-8B scale it is
    2·S·V·D ≈ 5 TFLOP of extra MXU work and a [B, S, 128256] materialized
    logits tensor (2.5 GB bf16 at B=2, S=4870) per prefill."""
    x = inputs_embeds
    if position_ids.ndim == 1:
        position_ids = position_ids[None]
    cos, sin = rope_1d_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)
    s = x.shape[1]
    k_all, v_all = cache.k, cache.v
    ks_all, vs_all = cache.k_scale, cache.v_scale

    def step(carry, layer, li):
        x, k_all, v_all, ks_all, vs_all = carry
        h = _norm(layer["input_layernorm"], cfg, x)
        a, (k, v) = _attn_block(layer, cfg, h, cos, sin, causal=True,
                                kv_mask=kv_mask, interpret=interpret)
        if ks_all is not None:
            # int8 cache: prefill attention ran in bf16 (flash); only the
            # STORED keys/values quantize, per position
            k, k_s = _quant_kv(k)
            v, v_s = _quant_kv(v)
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, k_s[None], (li, 0, 0, 0, 0))
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, v_s[None], (li, 0, 0, 0, 0))
        k_all = jax.lax.dynamic_update_slice(
            k_all, k.astype(k_all.dtype)[None], (li, 0, 0, 0, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.astype(v_all.dtype)[None], (li, 0, 0, 0, 0))
        x = x + a
        h = _norm(layer["post_attention_layernorm"], cfg, x)
        return (x + _mlp_block(layer, h, cfg), k_all, v_all, ks_all, vs_all)

    carry = (x, k_all, v_all, ks_all, vs_all)
    layers = params["layers"]
    if isinstance(layers, dict):  # stacked [L, ...] pytree (stack_layers)
        carry, _ = jax.lax.scan(
            lambda c, inp: (step(c, inp[0], inp[1]), None),
            carry, (layers, jnp.arange(cfg.num_layers)))
    else:
        for li, layer in enumerate(layers):
            carry = step(carry, layer, li)
    x, k_all, v_all, ks_all, vs_all = carry
    x = _norm(params["norm"], cfg, x)
    logits = unembed(params, cfg, x[:, -1:] if last_logit_only else x)
    cache = KVCache(k_all, v_all, jnp.asarray(s, jnp.int32),
                    ks_all, vs_all)
    return logits, x, cache


def decode_step(params, cfg: LlamaConfig, token_embeds, cache: KVCache,
                kv_start=None, interpret: bool = False):
    """One decode step. token_embeds: [B, 1, D].

    kv_start: optional [B] int32 — cache slots below it hold left-pad
    junk and are masked (ragged batched serving; RoPE uses slot indices,
    which is mathematically identical under its relative-position law).

    Returns (logits [B, 1, V], hidden [B, 1, D], cache)."""
    x = token_embeds
    pos = cache.length[None, None]  # [1,1]
    cos, sin = rope_1d_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    k_all, v_all = cache.k, cache.v
    ks_all, vs_all = cache.k_scale, cache.v_scale

    def step(carry, layer, li):
        x, k_all, v_all, ks_all, vs_all = carry
        h = _norm(layer["input_layernorm"], cfg, x)
        a, (k_all, v_all, ks_all, vs_all) = _attn_block(
            layer, cfg, h, cos, sin, causal=False,
            cache_kv=(k_all, v_all, ks_all, vs_all, li),
            cache_len=cache.length, kv_start=kv_start, interpret=interpret)
        x = x + a
        h = _norm(layer["post_attention_layernorm"], cfg, x)
        return (x + _mlp_block(layer, h, cfg), k_all, v_all, ks_all, vs_all)

    carry = (x, k_all, v_all, ks_all, vs_all)
    layers = params["layers"]
    if isinstance(layers, dict):  # stacked [L, ...] pytree (stack_layers)
        carry, _ = jax.lax.scan(
            lambda c, inp: (step(c, inp[0], inp[1]), None),
            carry, (layers, jnp.arange(cfg.num_layers)))
    else:
        for li, layer in enumerate(layers):
            carry = step(carry, layer, li)
    x, k_all, v_all, ks_all, vs_all = carry
    x = _norm(params["norm"], cfg, x)
    logits = unembed(params, cfg, x)
    cache = KVCache(k_all, v_all, cache.length + 1, ks_all, vs_all)
    return logits, x, cache


def _select_token(logits, temperature: float, top_p, key):
    """Next-token choice from [B, V] logits. temperature == 0 (static) is
    argmax; > 0 samples from softmax(logits / T), optionally nucleus-
    filtered: HF TopPLogitsWarper semantics — keep the smallest
    highest-probability set whose cumulative mass reaches top_p (the
    crossing token included; at least one always kept). The reference
    reaches this via HF generate's do_sample gate
    (llava/inference/main.py:124-138)."""
    if not temperature:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    if top_p is not None:
        srt = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # token kept iff the mass STRICTLY before it is still < top_p
        keep = (cum - probs) < top_p
        thresh = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                         keepdims=True)
        scaled = jnp.where(scaled >= thresh, scaled, -jnp.inf)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


def greedy_generate(params, cfg: LlamaConfig, inputs_embeds, prompt_len: int,
                    max_new_tokens: int, eos_token_ids: Tuple[int, ...],
                    stop_sequences: Tuple[Tuple[int, ...], ...] = (),
                    pad_lens=None, temperature: float = 0.0,
                    top_p=None, rng=None, interpret: bool = False):
    """Greedy (or sampled) decode under jit: prefill + while_loop decode.

    temperature / top_p mirror the reference CLI's sampling gate
    (inference/main.py:124-138: do_sample iff temperature > 0, nucleus
    top_p): temperature == 0.0 (the published-pipeline default) is exact
    greedy argmax; > 0.0 samples in-graph via jax.random.categorical with
    `rng` folded per step (required then; deterministic for a fixed key).

    inputs_embeds: [B, S, D]. The whole pipeline is batch-native (the
    reference hard-asserts batch 1 at inference, llava_llama.py:313): rows
    decode together, stop per-row, and decode's weight-HBM stream
    amortizes across the batch.

    pad_lens: optional [B] int32 LEFT-pad counts for ragged batches — row
    b's real prompt occupies positions [pad_lens[b], S). Pad keys are
    masked in prefill and decode; RoPE keeps slot indices as positions,
    which matches unpadded decoding exactly under its relative-position
    law (only position DIFFERENCES enter the scores). Left padding keeps
    every row's last prompt token at S-1, so the first sampled token reads
    from logits[:, -1] for all rows.

    stop_sequences: static tuples of token ids; a row stops once its
    trailing emitted tokens match any sequence — the in-graph equivalent of
    the reference's KeywordsStoppingCriteria (mm_utils.py:215-247), which
    halts HF generate when a stop string is emitted. The matched keyword
    tokens remain in the output (same as the reference; callers trim with
    mm_utils.trim_at_keywords).

    Returns (tokens [B, max_new_tokens] int32 — padded with eos after stop,
    hidden [B, max_new_tokens, D] — post-norm hidden state of each emitted
    token, num_generated scalar)."""
    if temperature and rng is None:
        raise ValueError("temperature > 0 requires an rng key")
    b, s, d = inputs_embeds.shape
    max_len = s + max_new_tokens
    cache = init_kv_cache(cfg, b, max_len, dtype=inputs_embeds.dtype)
    pos = jnp.arange(s)[None]
    kv_mask = (jnp.arange(s)[None, :] >= pad_lens[:, None]
               if pad_lens is not None else None)
    logits, hidden, cache = prefill(params, cfg, inputs_embeds, pos, cache,
                                    kv_mask=kv_mask, last_logit_only=True,
                                    interpret=interpret)
    first_tok = _select_token(
        logits[:, -1], temperature, top_p,
        jax.random.fold_in(rng, 0) if temperature else None)

    eos = jnp.asarray(eos_token_ids, jnp.int32)

    tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32)
    hidden0 = jnp.zeros((b, max_new_tokens, d), inputs_embeds.dtype)

    def cond(state):
        i, tok, done, *_ = state
        return jnp.logical_and(i < max_new_tokens,
                               jnp.logical_not(jnp.all(done)))

    def body(state):
        i, tok, done, tokens, hiddens, cache = state
        # finished rows keep emitting their first eos id (padding)
        pad_id = eos[0] if eos.shape[0] else jnp.int32(0)
        tok = jnp.where(done, pad_id, tok)
        tokens = tokens.at[:, i].set(tok)
        emb = embed(params, tok[:, None]).astype(inputs_embeds.dtype)
        logits, h, cache = decode_step(params, cfg, emb, cache,
                                       kv_start=pad_lens,
                                       interpret=interpret)
        # h is the hidden that PRODUCES token i+1 (reference convention:
        # output_embeds[:, j] pairs with output_ids[:, j] where the embed is
        # the state that emitted the token — llava_llama.py:186-190)
        hiddens = jax.lax.dynamic_update_slice(
            hiddens, h.astype(hiddens.dtype), (0, i + 1, 0))
        nxt = _select_token(
            logits[:, -1], temperature, top_p,
            jax.random.fold_in(rng, i + 1) if temperature else None)
        # per-sample stop: a row is done once IT has emitted an eos — other
        # rows keep decoding (the loop exits when all rows are done)
        done = jnp.logical_or(done, jnp.isin(tok, eos))
        # streaming keyword stop: trailing emitted tokens match a stop seq
        for seq in stop_sequences:
            ln = len(seq)
            if ln == 0 or ln > max_new_tokens:
                continue
            start = jnp.maximum(i - (ln - 1), 0)
            tail = jax.lax.dynamic_slice(tokens, (0, start), (b, ln))
            hit = jnp.all(tail == jnp.asarray(seq, jnp.int32), axis=1)
            done = jnp.logical_or(done, jnp.logical_and(i + 1 >= ln, hit))
        return i + 1, nxt, done, tokens, hiddens, cache

    # hiddens[0] = prefill's last-position hidden (it produced first_tok)
    hidden0 = hidden0.at[:, 0].set(hidden[:, -1].astype(hidden0.dtype))
    # one extra slot absorbs the final dynamic_update_slice at i = max-1
    hidden0 = jnp.pad(hidden0, ((0, 0), (0, 1), (0, 0)))
    state = (jnp.int32(0), first_tok, jnp.zeros((b,), jnp.bool_), tokens0,
             hidden0, cache)
    i, tok, done, tokens, hiddens, cache = jax.lax.while_loop(cond, body,
                                                              state)
    return tokens, hiddens[:, :max_new_tokens], i


def _tile_beams(x, k):
    """Tile a cache array [L, 1, ...] to [L, k, ...] (beam expansion)."""
    return jnp.repeat(x, k, axis=1) if x is not None else None


def _reorder_gen_slots(x, parents, prompt_len: int):
    """Permute the beam axis of a cache array's GENERATED region only.

    x: [L, K, H, max_len, hd(|1)]. The prefix [: prompt_len) is written
    once by the shared prefill and never again, so all beams' prefix rows
    hold identical bytes and reordering them would be a no-op — skipping
    it turns the per-step cache gather from O(prompt+gen) into O(gen)
    HBM traffic (at 5k context that is ~20x less)."""
    if x is None:
        return None
    gen = x[:, :, :, prompt_len:]
    gen = jnp.take(gen, parents, axis=1)
    return jax.lax.dynamic_update_slice_in_dim(x, gen, prompt_len, axis=3)


def beam_generate(params, cfg: LlamaConfig, inputs_embeds, prompt_len: int,
                  max_new_tokens: int, eos_token_ids: Tuple[int, ...],
                  num_beams: int, length_penalty: float = 1.0,
                  stop_sequences: Tuple[Tuple[int, ...], ...] = (),
                  interpret: bool = False):
    """In-graph beam search, batch 1, HF-EXACT semantics (the reference
    routes --num_beams through HF generate, llava/inference/main.py:124-138;
    llava_llama.py:135-204). This mirrors transformers' vectorized
    _beam_search (generation/utils.py) step for step:

    - each step expands max(2, 1 + n_eos) * K candidates over the K x V
      accumulated log-probs, so at least K non-eos continuations survive;
    - candidates that hit a stopping criterion (eos / max-length / keyword
      stop sequences) are offered to a FIXED K-slot finished pool at
      length-penalized score (sum_logprobs / gen_len**penalty), gated by
      HF's top-K rank mask; a merge-topk keeps the best K hypotheses;
    - the live set continues with the best K non-finished candidates
      (finished candidates demoted by the same -1e9 HF uses);
    - the loop ends on HF's early-stop heuristic (the pool is full and the
      best live sum-logprob at current length cannot beat the worst pooled
      score) or when every candidate hits a stopping criterion;
    - the returned hypothesis is pool slot 0 (merge-topk keeps the pool
      score-sorted, HF's num_return_sequences=1 slice).

    early_stopping=False and do_sample=False fixed (the reference CLI's
    configuration). K=1 still reduces to greedy
    (tests/test_llama.py::test_beam_1); exactness vs actual HF generate is
    pinned by tests/test_llama.py::test_beam_matches_hf_generate.

    The per-step cache reorder touches ONLY the generated slots (see
    _reorder_gen_slots); the 5k-token prefix is shared bytes across beams.

    Returns (tokens [1, max_new_tokens], hidden [1, max_new_tokens, D] of
    the winning beam, num_generated scalar) — same contract as
    greedy_generate at batch 1. hidden[j] is the state that produced
    token j, so [SEG]-position extraction works unchanged."""
    b, s, d = inputs_embeds.shape
    assert b == 1, "beam search serves one prompt at a time"
    k = num_beams
    n_eos = len(eos_token_ids)
    kk = max(2, 1 + n_eos) * k              # HF beams_to_keep
    top_mask = jnp.arange(kk) < k           # HF top_num_beam_mask
    neg = jnp.float32(-1e9)                 # HF's demotion constant
    max_len = s + max_new_tokens
    vocab = cfg.vocab_size

    cache = init_kv_cache(cfg, 1, max_len, dtype=inputs_embeds.dtype)
    pos = jnp.arange(s)[None]
    logits, hidden, cache = prefill(params, cfg, inputs_embeds, pos, cache,
                                    last_logit_only=True,
                                    interpret=interpret)
    lp0 = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
    cache = KVCache(_tile_beams(cache.k, k), _tile_beams(cache.v, k),
                    cache.length, _tile_beams(cache.k_scale, k),
                    _tile_beams(cache.v_scale, k))

    eos = jnp.asarray(eos_token_ids, jnp.int32)
    L = max_new_tokens

    run_scores0 = jnp.full((k,), neg).at[0].set(0.0)
    run_tokens0 = jnp.zeros((k, L), jnp.int32)
    hiddens0 = jnp.zeros((k, L + 1, d), inputs_embeds.dtype)
    hiddens0 = hiddens0.at[:, 0].set(
        jnp.broadcast_to(hidden[0, -1], (k, d)).astype(hiddens0.dtype))
    fin_scores0 = jnp.full((k,), neg)
    fin_tokens0 = jnp.zeros((k, L), jnp.int32)
    fin_lens0 = jnp.zeros((k,), jnp.int32)
    is_fin0 = jnp.zeros((k,), bool)
    fin_hidden0 = jnp.zeros_like(hiddens0)
    lp_init = jnp.broadcast_to(lp0[None], (k, lp0.shape[0]))

    def cond(st):
        i, cont = st[0], st[11]
        return jnp.logical_and(i < L, cont)

    def body(st):
        (i, lp, run_scores, run_tokens, hiddens, fin_scores, fin_tokens,
         fin_lens, is_fin, fin_hidden, unsat, cont, cache) = st

        acc = run_scores[:, None] + lp[:, :vocab]          # [K, V]
        t_scores, flat = jax.lax.top_k(acc.reshape(-1), kk)
        parents = (flat // vocab).astype(jnp.int32)
        toks = (flat % vocab).astype(jnp.int32)
        cand_tokens = jnp.take(run_tokens, parents, axis=0)
        cand_tokens = cand_tokens.at[:, i].set(toks)
        cand_hidden = jnp.take(hiddens, parents, axis=0)

        # stopping criteria per candidate: eos, max length, keyword stops
        hits = jnp.isin(toks, eos) if n_eos else jnp.zeros((kk,), bool)
        hits = jnp.logical_or(hits, i + 1 >= L)
        for seq in stop_sequences:
            ln = len(seq)
            if ln == 0 or ln > L:
                continue
            start = jnp.maximum(i - (ln - 1), 0)
            tail = jax.lax.dynamic_slice(cand_tokens, (0, start), (kk, ln))
            hit = jnp.all(tail == jnp.asarray(seq, jnp.int32), axis=1)
            hits = jnp.logical_or(hits,
                                  jnp.logical_and(i + 1 >= ln, hit))

        # live set for the next step: best K non-finished candidates
        run_cand = t_scores + hits.astype(jnp.float32) * neg
        new_run_scores, sel = jax.lax.top_k(run_cand, k)
        sel_parents = jnp.take(parents, sel)
        next_toks = jnp.take(toks, sel)
        new_run_tokens = jnp.take(cand_tokens, sel, axis=0)
        new_hiddens = jnp.take(cand_hidden, sel, axis=0)
        cache_r = KVCache(
            _reorder_gen_slots(cache.k, sel_parents, s),
            _reorder_gen_slots(cache.v, sel_parents, s),
            cache.length,
            _reorder_gen_slots(cache.k_scale, sel_parents, s),
            _reorder_gen_slots(cache.v_scale, sel_parents, s))

        # finished pool: merge-topk of (pool, length-penalized candidates)
        lp_fin = t_scores / (i + 1.0) ** length_penalty
        lp_fin = lp_fin + (~unsat).astype(jnp.float32) * neg
        offered = jnp.logical_and(hits, top_mask)
        lp_fin = lp_fin + (~offered).astype(jnp.float32) * neg
        m_scores = jnp.concatenate([fin_scores, lp_fin])
        new_fin_scores, mi = jax.lax.top_k(m_scores, k)
        new_fin_tokens = jnp.take(
            jnp.concatenate([fin_tokens, cand_tokens], axis=0), mi, axis=0)
        new_fin_lens = jnp.take(
            jnp.concatenate([fin_lens, jnp.full((kk,), i + 1, jnp.int32)]),
            mi)
        new_is_fin = jnp.take(jnp.concatenate([is_fin, offered]), mi)
        new_fin_hidden = jnp.take(
            jnp.concatenate([fin_hidden, cand_hidden], axis=0), mi, axis=0)

        # decode the selected live beams for the next step's log-probs
        emb = embed(params, next_toks[:, None]).astype(inputs_embeds.dtype)
        logits, h, cache_r = decode_step(params, cfg, emb, cache_r,
                                         interpret=interpret)
        new_hiddens = jax.lax.dynamic_update_slice(
            new_hiddens, h.astype(new_hiddens.dtype), (0, i + 1, 0))
        new_lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32))

        # HF early-stop heuristic (early_stopping=False): once the pool is
        # full, stop when the best live sum-logprob at the current length
        # cannot beat the worst pooled score
        best_possible = new_run_scores[0] / (i + 1.0) ** length_penalty
        worst = jnp.where(new_is_fin, jnp.min(new_fin_scores), neg)
        new_unsat = jnp.logical_and(unsat, jnp.any(best_possible > worst))
        new_cont = jnp.logical_and(new_unsat, ~jnp.all(hits))

        return (i + 1, new_lp, new_run_scores, new_run_tokens, new_hiddens,
                new_fin_scores, new_fin_tokens, new_fin_lens, new_is_fin,
                new_fin_hidden, new_unsat, new_cont, cache_r)

    st = (jnp.int32(0), lp_init, run_scores0, run_tokens0, hiddens0,
          fin_scores0, fin_tokens0, fin_lens0, is_fin0, fin_hidden0,
          jnp.bool_(True), jnp.bool_(True), cache)
    st = jax.lax.while_loop(cond, body, st)
    fin_tokens, fin_lens, fin_hidden = st[6], st[7], st[9]
    # pool slot 0 is the best hypothesis (merge-topk keeps it sorted)
    return (fin_tokens[0][None], fin_hidden[0, :L][None], fin_lens[0])
