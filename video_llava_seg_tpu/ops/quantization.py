"""Weight-only quantization for dense kernels.

TPU-native equivalent of the reference's BitsAndBytes 4/8-bit load gates
(llava/model/builder.py:47-66, llava/train/train.py:395-426): symmetric
per-output-channel int8 (or int4-range) quantization of dense kernels,
dequantized to the compute dtype at use.  On TPU the win is HBM: weights
halve (or quarter), which is what matters for memory-bound decode; the MXU
still computes in bf16.

A quantized dense param is {"kernel_q": int8 [in, out],
"kernel_scale": fp32 [out], ("bias": ...)} — nn.dense dispatches on the
presence of "kernel_q"."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_QMAX = {8: 127.0, 4: 7.0}


def quantize_kernel(kernel, bits: int = 8):
    """Symmetric per-output-channel quantization of a [in, out] kernel."""
    qmax = _QMAX[bits]
    kf = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(kf), axis=0) / qmax          # [out]
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(kf / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale


def dequantize_kernel(q, scale, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_tree(params, bits: int = 8,
                  min_size: int = 1 << 16,
                  skip: Tuple[str, ...] = ("embed_tokens",),
                  act_quant: bool = False,
                  train_mode: bool = False):
    """Quantize every dense kernel (2-D 'kernel' leaf) above `min_size`
    elements. Returns a new tree; small kernels / embeddings stay fp.

    act_quant=False (weight-only): kernels stored as 'kernel_q' and
    dequantized to the compute dtype at use — halves weight HBM traffic
    (the decode-serving win). act_quant=True with bits=8 (W8A8): kernels
    stored as 'kernel_qa'; nn.dense then dynamically quantizes
    activations per-row and runs an int8xint8 MXU dot (v5e int8 peak is
    ~2x bf16 — the compute-bound-encode win). act_quant=True with bits=4
    (W4A8): kernels stored nibble-PACKED as 'kernel_q4a' (ops/int4.py) —
    half the int8 path's weight HBM bytes, still int8 MXU dots.

    train_mode (QLoRA frozen-base trees): stores 'kernel_scale' in
    bfloat16, which switches nn.dense's kernel_q branch to an all-bf16
    compute path — the dot's output and its backward cotangent dots stay
    bf16 instead of f32, halving the [S, hidden] temps that dominate the
    full-depth train step's HBM (measured: 20 live f32 [5248,4096]
    buffers under remat). Serving trees keep f32 scales and exact f32
    accumulation (int8 greedy decode matches bf16 tokens exactly)."""
    assert bits in _QMAX, bits
    assert not (train_mode and act_quant), \
        "act-quant rounding has no gradient; train_mode is weight-only"
    key_out = ("kernel_qa" if act_quant and bits == 8
               else "kernel_q4a" if act_quant else "kernel_q")

    def go(tree, path=()):
        if isinstance(tree, dict):
            if ("kernel" in tree and not any(s in path for s in skip)
                    and getattr(tree["kernel"], "ndim", 0) == 2
                    and tree["kernel"].size >= min_size
                    and not (key_out == "kernel_q4a"
                             and tree["kernel"].shape[0] % 2)):
                q, scale = quantize_kernel(tree["kernel"], bits)
                if key_out == "kernel_q4a":
                    from video_llava_seg_tpu.ops.int4 import pack_int4
                    q = pack_int4(q)
                out = {k: v for k, v in tree.items() if k != "kernel"}
                out[key_out] = q
                out["kernel_scale"] = (scale.astype(jnp.bfloat16)
                                       if train_mode else scale)
                return out
            return {k: go(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [go(v, path) for v in tree]
        return tree

    return go(params)


def quantize_activations_rowwise(x):
    """Dynamic symmetric per-row int8 activation quantization.

    Returns (q int8 [..., in], scale fp32 [..., 1]) with x ~ q * scale."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantized_nbytes(params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
