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
                  skip: Tuple[str, ...] = ("embed_tokens",)):
    """Quantize every dense kernel (2-D 'kernel' leaf) above `min_size`
    elements. Returns a new tree; small kernels / embeddings stay fp."""
    assert bits in _QMAX, bits

    def go(tree, path=()):
        if isinstance(tree, dict):
            if ("kernel" in tree and not any(s in path for s in skip)
                    and getattr(tree["kernel"], "ndim", 0) == 2
                    and tree["kernel"].size >= min_size):
                q, scale = quantize_kernel(tree["kernel"], bits)
                out = {k: v for k, v in tree.items() if k != "kernel"}
                out["kernel_q"] = q
                out["kernel_scale"] = scale
                return out
            return {k: go(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [go(v, path) for v in tree]
        return tree

    return go(params)


def quantized_nbytes(params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
