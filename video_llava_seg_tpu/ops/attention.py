"""Attention ops: Pallas TPU flash attention + XLA reference.

This replaces the reference's attention shims (flash-attn / xformers monkey
patches at llava/train/llama_flash_attn_monkey_patch.py and the SDPA kernel
picker at sam2/modeling/sam/transformer.py:28-41) with one dispatcher:

  attention(q, k, v, causal=..., backend="auto")

- q: [B, Hq, Sq, D], k/v: [B, Hkv, Skv, D] with Hq % Hkv == 0 (GQA).
- "pallas": blockwise online-softmax flash attention, fp32 statistics,
  never materializes the [Sq, Skv] score matrix (VMEM-resident tiles only).
- "xla": jnp einsum reference (used on CPU and as the numerics oracle).

The Pallas kernel pads Sq/Skv/D to tile multiples internally and masks the
padding, so callers can pass arbitrary shapes (e.g. Hiera's 96-dim heads or
memory attention's ragged KV lengths).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large-negative mask value; avoids exp(-inf - (-inf)) NaNs.
_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------

def alibi_slopes(num_heads: int):
    """Standard ALiBi head slopes (geometric sequence; MPT attention)."""
    import numpy as np

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    n = 2 ** math.floor(math.log2(num_heads))
    slopes = pow2_slopes(n)
    if n < num_heads:
        extra = pow2_slopes(2 * n)[0::2][: num_heads - n]
        slopes += extra
    return np.asarray(slopes, np.float32)


def attention_reference(q, k, v, *, causal: bool = False,
                        scale: Optional[float] = None,
                        kv_valid_len: Optional[int] = None,
                        kv_mask=None, window: Optional[int] = None,
                        alibi: bool = False, q_positions=None):
    """Plain softmax attention. q:[B,Hq,Sq,D] k,v:[B,Hkv,Skv,D] -> [B,Hq,Sq,D].

    kv_mask: optional bool [B, Skv]; False keys are masked out (fixed-slot
    memory banks with invalid slots). window: Mistral-style sliding window
    (keys older than `window` positions are masked). alibi: MPT-style
    additive linear position bias per head."""
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    group = Hq // Hkv
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    # rel = key pos minus query pos; queries default to the sequence end,
    # q_positions ([Sq] absolute key-space positions) overrides (cached
    # decode, where the query sits at cache_len, not Skv-1)
    qi = (q_positions[:, None] if q_positions is not None
          else jnp.arange(Sq)[:, None] + (Skv - Sq))
    ki = jnp.arange(Skv)[None, :]
    rel = ki - qi
    if alibi:
        slopes = jnp.asarray(alibi_slopes(Hq))
        s = s + slopes[None, :, None, None] * rel[None, None].astype(
            jnp.float32)
    if causal:
        s = jnp.where((rel <= 0)[None, None], s, _MASK_VALUE)
    if window is not None:
        s = jnp.where((rel > -window)[None, None], s, _MASK_VALUE)
    if kv_valid_len is not None:
        ki = jnp.arange(Skv)[None, None, None, :]
        s = jnp.where(ki < kv_valid_len, s, _MASK_VALUE)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, _MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref,
                  acc_ref, *,
                  scale: float, causal: bool, q_len: int, kv_len: int,
                  block_q: int, block_k: int, num_kv_blocks: int,
                  q_offset: int):
    """Grid: (B, Hq, num_q_blocks, num_kv_blocks); kv dim is the reduction."""
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Block-level causal skip: run only if this kv block intersects the
    # allowed region for this q block.
    if causal:
        run = (ik * block_k) <= (iq * block_q + block_q - 1 + q_offset)
    else:
        run = True

    @pl.when(run)
    def _run():
        # keep q/k in their native (bf16) dtype so the MXU runs at full
        # rate; accumulate the scores in fp32
        q = q_ref[0, 0]                      # [block_q, D]
        k = k_ref[0, 0]                      # [block_k, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [block_q, block_k]

        # kv padding + optional per-key masking arrive as an additive bias
        s = s + bias_ref[...]
        if causal:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + ik * block_k)
            row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   + iq * block_q + q_offset)
            s = jnp.where(col <= row, s, _MASK_VALUE)

        m_prev = m_ref[...]             # [block_q, LANES]
        l_prev = l_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)              # [block_q,1]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)                        # [bq, LANES]
        p = jnp.exp(s - m_next[:, :1])                          # [bq, bk]
        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape)
        m_ref[...] = m_next
        l_ref[...] = l_next

        acc_ref[...] = acc_ref[...] * alpha[:, :1]
        v = v_ref[0, 0]
        acc_ref[...] += jax.lax.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def _flash_kernel_single(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                         scale: float, causal: bool, block_q: int,
                         q_offset: int, sum_col: int = -1):
    """One-kv-block fast path: plain softmax per q block, no online stats.

    KV padding is handled by an additive bias row [1, skv_p] (0 / -inf),
    precomputed once on host — an add instead of per-element iota+where,
    which matters because this kernel is VPU-bound at short sequence
    lengths (the ViT / SAM2 decoder regime).

    sum_col >= 0: the head dim is padded and v carries a ones-column at
    that index, so the softmax denominator rides the p@v matmul (MXU)
    instead of a VPU row reduction."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[...]
    if causal:
        iq = pl.program_id(2)
        row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
               + iq * block_q + q_offset)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col <= row, s, _MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    v = v_ref[0, 0]
    acc = jax.lax.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    if sum_col >= 0:
        l = acc[:, sum_col:sum_col + 1]
    else:
        l = jnp.sum(p, axis=1, keepdims=True)
    o_ref[0, 0] = (acc * (1.0 / l)).astype(o_ref.dtype)


def _flash_single_block(q, k, v, *, causal, scale, block_q, skv_p, kv_len,
                        q_offset, interpret, kv_bias=None, sum_col=-1):
    """pallas_call wrapper for the single-kv-block path.

    kv_bias: optional [B, Skv-unpadded] additive fp32 bias (e.g. -inf on
    invalid fixed-slot memory tokens); fused with the padding mask."""
    B, Hq, sq_p, d_p = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    num_q_blocks = sq_p // block_q
    pad_bias = jnp.where(jnp.arange(skv_p)[None, :] < kv_len, 0.0,
                         _MASK_VALUE).astype(jnp.float32)
    if kv_bias is not None:
        bias = pad_bias + jnp.pad(kv_bias.astype(jnp.float32),
                                  ((0, 0), (0, skv_p - kv_bias.shape[1])))
        bias_index = lambda b, h, iq: (b, 0)  # noqa: E731
    else:
        bias = pad_bias
        bias_index = lambda b, h, iq: (0, 0)  # noqa: E731
    kernel = functools.partial(
        _flash_kernel_single, scale=scale, causal=causal, block_q=block_q,
        q_offset=q_offset, sum_col=sum_col)
    return pl.pallas_call(
        kernel,
        grid=(B, Hq, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_p), lambda b, h, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, skv_p, d_p),
                         lambda b, h, iq, g=group: (b, h // g, 0, 0)),
            pl.BlockSpec((1, 1, skv_p, d_p),
                         lambda b, h, iq, g=group: (b, h // g, 0, 0)),
            pl.BlockSpec((1, skv_p), bias_index),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d_p),
                               lambda b, h, iq: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, sq_p, d_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, bias)


# Largest KV extent served by the single-block kernel (scores block
# [block_q, 1024] fp32 = 1.25 MB VMEM at block_q=320 — comfortably resident).
_SINGLE_BLOCK_MAX_KV = 1024


def flash_attention(q, k, v, *, causal: bool = False,
                    scale: Optional[float] = None,
                    block_q: int = 256, block_k: int = 512,
                    interpret: bool = False, kv_bias=None):
    """Pallas flash attention. q:[B,Hq,Sq,D] k,v:[B,Hkv,Skv,D] -> [B,Hq,Sq,D].

    Handles GQA via the k/v index map (kv head = q head // group), arbitrary
    Sq/Skv/D via padding + in-kernel masking, self/cross causal offsets
    (causal with Sq != Skv aligns the diagonal to the sequence ends), and an
    optional per-key additive bias kv_bias [B, Skv] (fixed-slot memory banks
    pass -inf on invalid slots).
    """
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    group = Hq // Hkv
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    d_p = _ceil_to(D, _LANES)

    if Skv <= _SINGLE_BLOCK_MAX_KV:
        # short-KV regime (ViT, SAM2 decoder/memory): one kv block per q
        # block, no online-softmax bookkeeping — VPU work ~halves
        skv_p = _ceil_to(Skv, _LANES)
        block_q = min(320 if block_q in (128, 256) else block_q,
                      _ceil_to(Sq, 64))
        sq_p = _ceil_to(Sq, block_q)
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - Sq), (0, d_p - D)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - Skv), (0, d_p - D)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - Skv), (0, d_p - D)))
        # NOTE: riding the softmax denominator on a ones-column of v's
        # padding (sum_col) measured SLOWER end-to-end (the extra pass over
        # v outweighs the saved VPU row reduction); kernel support remains
        # but the fast path keeps the in-kernel sum.
        out = _flash_single_block(qp, kp, vp, causal=causal, scale=scale,
                                  block_q=block_q, skv_p=skv_p, kv_len=Skv,
                                  q_offset=Skv - Sq, interpret=interpret,
                                  kv_bias=kv_bias, sum_col=-1)
        return out[:, :, :Sq, :D]

    block_q = min(block_q, _ceil_to(Sq, _LANES))
    block_k = min(block_k, _ceil_to(Skv, _LANES))
    sq_p = _ceil_to(Sq, block_q)
    skv_p = _ceil_to(Skv, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - Sq), (0, d_p - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - Skv), (0, d_p - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - Skv), (0, d_p - D)))

    num_q_blocks = sq_p // block_q
    num_kv_blocks = skv_p // block_k
    q_offset = Skv - Sq  # aligns causal diagonal for cross lengths

    pad_bias = jnp.where(jnp.arange(skv_p)[None, :] < Skv, 0.0,
                         _MASK_VALUE).astype(jnp.float32)
    if kv_bias is not None:
        bias = pad_bias + jnp.pad(kv_bias.astype(jnp.float32),
                                  ((0, 0), (0, skv_p - Skv)))
        bias_index = lambda b, h, iq, ik: (b, ik)  # noqa: E731
    else:
        bias = pad_bias
        bias_index = lambda b, h, iq, ik: (0, ik)  # noqa: E731

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, q_len=Sq, kv_len=Skv,
        block_q=block_q, block_k=block_k, num_kv_blocks=num_kv_blocks,
        q_offset=q_offset)

    out = pl.pallas_call(
        kernel,
        grid=(B, Hq, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_p),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d_p),
                         lambda b, h, iq, ik, g=group: (b, h // g, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d_p),
                         lambda b, h, iq, ik, g=group: (b, h // g, ik, 0)),
            pl.BlockSpec((1, block_k), bias_index),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d_p),
                               lambda b, h, iq, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, sq_p, d_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # m
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # l
            pltpu.VMEM((block_q, d_p), jnp.float32),     # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias)
    return out[:, :, :Sq, :D]


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def attention(q, k, v, *, causal: bool = False, scale: Optional[float] = None,
              backend: str = "auto", interpret: bool = False, kv_mask=None,
              window: Optional[int] = None, alibi: bool = False):
    """Dispatch to the Pallas kernel on TPU, XLA reference elsewhere."""
    if window is not None or alibi:
        # windowed / alibi variants served by the XLA path
        return attention_reference(q, k, v, causal=causal, scale=scale,
                                   kv_mask=kv_mask, window=window,
                                   alibi=alibi)
    if backend == "auto":
        backend = "pallas" if _on_tpu() else "xla"
    if backend == "pallas":
        kv_bias = None
        if kv_mask is not None:  # bool [B, Skv] -> additive bias
            kv_bias = jnp.where(kv_mask, 0.0, _MASK_VALUE)
        return flash_attention(q, k, v, causal=causal, scale=scale,
                               interpret=interpret, kv_bias=kv_bias)
    if backend == "xla":
        return attention_reference(q, k, v, causal=causal, scale=scale,
                                   kv_mask=kv_mask)
    raise ValueError(f"unknown attention backend: {backend}")
