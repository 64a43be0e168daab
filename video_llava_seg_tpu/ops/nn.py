"""Functional NN primitives with explicit parameter pytrees.

All modules in this framework are (init, apply) pairs over plain dicts of
jnp arrays — no Module classes. This keeps parameter pytrees transparent for
sharding rules (parallel/mesh.py), orbax checkpoints, and torch->jax weight
converters.

Conventions:
  - conv layouts are NHWC / HWIO (TPU-native; torch converters transpose)
  - dense kernels are [in, out]
  - compute dtype is the input dtype; params may be fp32 and are cast in
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def lecun_normal(key, shape, in_dim, dtype=jnp.float32):
    std = 1.0 / math.sqrt(max(1, in_dim))
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---------------------------------------------------------------------------
# dense
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, bias: bool = True,
               dtype=jnp.float32):
    kkey, _ = jax.random.split(key)
    p = {"kernel": lecun_normal(kkey, (in_dim, out_dim), in_dim, dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def dense(p, x):
    # Optional LoRA side branch attached to the param dict (QLoRA path:
    # the base kernel stays int8/packed, so the adapter cannot be folded
    # into it — train/lora.py::merge attaches {"a","b","s"} here instead).
    # y = base(x) + ((x @ a) @ b) * s, rank-r factors never materialize a
    # bf16 copy of the base weights.
    lora = p.get("lora")
    if lora is not None:
        base = {k: v for k, v in p.items() if k != "lora"}
        xa = jnp.dot(x, lora["a"].astype(x.dtype))
        delta = jnp.dot(xa, lora["b"].astype(x.dtype))
        return dense(base, x) + delta * lora["s"].astype(x.dtype)
    if "kernel_q4a" in p:
        # W4A8 (ops/int4.py): nibble-packed int4 weights unpacked in-kernel
        # to int8 + dynamic per-row int8 activations — half the int8
        # path's weight HBM bytes (the decode win), int8 MXU dots
        from video_llava_seg_tpu.ops.int4 import w4a8_dense

        return w4a8_dense(p, x)
    if "kernel_qa" in p:
        # W8A8 (ops/quantization.py act_quant): dynamic per-row activation
        # quant + int8xint8 MXU dot (v5e int8 peak ~2x bf16), rescaled by
        # act-row x weight-col scales
        from video_llava_seg_tpu.ops.quantization import (
            quantize_activations_rowwise,
        )

        xq, a_scale = quantize_activations_rowwise(x)
        y = jnp.dot(xq, p["kernel_qa"], preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * a_scale
             * p["kernel_scale"]).astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y
    if "kernel_q" in p:  # weight-only quantized (ops/quantization.py)
        # per-output-channel scale commutes with the contraction, so apply
        # it to the [*, out] OUTPUT instead of the [in, out] kernel: the
        # dot's weight operand is then a pure int8->bf16 convert (fused,
        # int8 HBM reads) rather than a convert*scale that XLA may
        # materialize as a full bf16 weight copy. int8 values are exact in
        # bf16; accumulation in f32.
        scale = p["kernel_scale"]
        if scale.dtype == jnp.bfloat16:
            # train-mode tree (quantize_tree(train_mode=True)): all-bf16
            # compute so the dot output AND its backward cotangent dots
            # stay bf16 — the f32 [S, out] temps were the largest HBM
            # consumers of the full-depth QLoRA step. Serving trees carry
            # f32 scales and take the exact-accumulation branch below.
            y = jnp.dot(x, p["kernel_q"].astype(x.dtype),
                        preferred_element_type=x.dtype)
            y = y * scale.astype(x.dtype)
        else:
            y = jnp.dot(x, p["kernel_q"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
            y = (y * scale).astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y
    kernel = p["kernel"].astype(x.dtype)
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis, stats in fp32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_2d(p, x, eps: float = 1e-6):
    """Channel-wise LayerNorm for NHWC feature maps (sam2 LayerNorm2d parity,
    sam2/modeling/sam2_utils.py:141-153 — stats over channels per pixel)."""
    return layer_norm(p, x, eps)


# ---------------------------------------------------------------------------
# conv
# ---------------------------------------------------------------------------

def conv2d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int],
                bias: bool = True, dtype=jnp.float32, groups: int = 1):
    kh, kw = kernel
    fan_in = in_ch // groups * kh * kw
    p = {"kernel": lecun_normal(key, (kh, kw, in_ch // groups, out_ch),
                                fan_in, dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def conv2d(p, x, stride: Tuple[int, int] = (1, 1),
           padding="SAME", groups: int = 1):
    """NHWC conv. padding: 'SAME' | 'VALID' | [(lo,hi),(lo,hi)]."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose2d_init(key, in_ch: int, out_ch: int,
                          kernel: Tuple[int, int], bias: bool = True,
                          dtype=jnp.float32):
    kh, kw = kernel
    p = {"kernel": lecun_normal(key, (kh, kw, in_ch, out_ch), in_ch * kh * kw,
                                dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def conv_transpose2d(p, x, stride: Tuple[int, int]):
    """NHWC transposed conv with torch-style output size H*stride (for
    kernel == stride, the mask-decoder upscaler case)."""
    y = jax.lax.conv_transpose(
        x, p["kernel"].astype(x.dtype),
        strides=stride,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    kh, kw = p["kernel"].shape[:2]
    sh, sw = stride
    # torch ConvTranspose2d output = (H-1)*s + k; VALID gives the same.
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# embeddings / misc
# ---------------------------------------------------------------------------

def embedding_init(key, num: int, dim: int, dtype=jnp.float32, std=0.02):
    return {"embedding": trunc_normal(key, (num, dim), std, dtype)}


def embedding_lookup(p, ids):
    return jnp.take(p["embedding"], ids, axis=0)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def mlp_init(key, dims: Sequence[int], bias: bool = True, dtype=jnp.float32):
    """Simple MLP: dims = [in, hidden..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [dense_init(k, dims[i], dims[i + 1], bias, dtype)
                       for i, k in enumerate(keys)]}


def mlp_apply(p, x, act=jax.nn.relu, sigmoid_output: bool = False):
    n = len(p["layers"])
    for i, layer in enumerate(p["layers"]):
        x = dense(layer, x)
        if i < n - 1:
            x = act(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x
