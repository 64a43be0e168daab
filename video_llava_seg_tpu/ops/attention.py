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
                        alibi: bool = False, q_positions=None,
                        k_scale=None, v_scale=None):
    """Plain softmax attention. q:[B,Hq,Sq,D] k,v:[B,Hkv,Skv,D] -> [B,Hq,Sq,D].

    kv_mask: optional bool [B, Skv]; False keys are masked out (fixed-slot
    memory banks with invalid slots). window: Mistral-style sliding window
    (keys older than `window` positions are masked). alibi: MPT-style
    additive linear position bias per head.

    k_scale/v_scale: optional f32 [B, Hkv, Skv] for int8-quantized K/V
    (kv_cache_int8 serving): the dots read the int8 planes directly (the
    int8->bf16 convert fuses into the MXU operand) and the per-key scales
    fold in EXACTLY — into the logits after the QK dot, and into the
    softmax weights before the PV dot."""
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    group = Hq // Hkv
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)  # pure convert, fused into the dot operand
    if group > 1:
        # GQA without materializing repeated K/V (a 4x KV-cache HBM tax at
        # decode): fold the group into the query-sequence axis — q heads
        # are blocked per kv head, so [B,Hkv,group*Sq,Skv] reshapes
        # exactly to [B,Hq,Sq,Skv]
        qg = q.reshape(B, Hkv, group * Sq, D)
        s = jnp.einsum("bhqd,bhkd->bhqk", qg, k,
                       preferred_element_type=jnp.float32) * scale
        if k_scale is not None:
            s = s * k_scale[:, :, None, :]
        s = s.reshape(B, Hq, Sq, Skv)
    else:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        if k_scale is not None:
            s = s * k_scale[:, :, None, :]
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
    p_dtype = q.dtype if v_scale is not None else v.dtype
    if group > 1:
        pg = p.reshape(B, Hkv, group * Sq, Skv)
        if v_scale is not None:
            pg = pg * v_scale[:, :, None, :]
        out = jnp.einsum("bhqk,bhkd->bhqd", pg.astype(p_dtype),
                         v.astype(p_dtype) if v.dtype != p_dtype else v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, Hq, Sq, D)
    else:
        if v_scale is not None:
            p = p * v_scale[:, :, None, :]
        out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(p_dtype),
                         v.astype(p_dtype) if v.dtype != p_dtype else v,
                         preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *rest,
                  scale: float, causal: bool, q_len: int, kv_len: int,
                  block_q: int, block_k: int, num_kv_blocks: int,
                  q_offset: int, save_lse: bool = False):
    """Grid: (B, Hq, num_q_blocks, num_kv_blocks); kv dim is the reduction."""
    if save_lse:
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
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
        s = s + bias_ref[0]
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
        if save_lse:
            lse_ref[0, 0] = jnp.where(
                l_ref[...] == 0.0, 0.0, m_ref[...] + jnp.log(l_ref[...]))


def _flash_kernel_single(q_ref, k_ref, v_ref, bias_ref, o_ref, *rest,
                         scale: float, causal: bool, block_q: int,
                         q_offset: int, sum_col: int = -1,
                         save_lse: bool = False, hs: int = 1):
    """One-kv-block fast path: plain softmax per q block, no online stats.

    KV padding is handled by an additive bias row [1, skv_p] (0 / -inf),
    precomputed once on host — an add instead of per-element iota+where,
    which matters because this kernel is VPU-bound at short sequence
    lengths (the ViT / SAM2 decoder regime).

    sum_col >= 0: the head dim is padded and v carries a ones-column at
    that index, so the softmax denominator rides the p@v matmul (MXU)
    instead of a VPU row reduction.

    hs > 1: the tile spans `hs` heads and an in-kernel fori_loop walks
    them — the ViT regime dispatched B*Hq*1 tiny grid steps (2048 at
    [128,16,577,64]) whose fixed per-step cost dominated; batching heads
    amortizes it and issues fewer, wider k/v DMAs. fori_loop, not a
    Python loop, so the fp32 score tile's stack is reused per head."""
    # program_id must be read OUTSIDE the fori body (lowering bug)
    iq = pl.program_id(2) if causal else 0

    def one_head(j, carry):
        q = q_ref[0, j]
        k = k_ref[0, j]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0]
        if causal:
            row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   + iq * block_q + q_offset)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col <= row, s, _MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        v = v_ref[0, j]
        acc = jax.lax.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        if sum_col >= 0:
            l = acc[:, sum_col:sum_col + 1]
        else:
            l = jnp.sum(p, axis=1, keepdims=True)
        o_ref[0, j] = (acc * (1.0 / l)).astype(o_ref.dtype)
        if save_lse:
            (lse_ref,) = rest
            lse = jnp.where(l == 0.0, 0.0, m + jnp.log(l))
            lse_ref[0, j] = jnp.broadcast_to(lse, lse_ref.shape[2:])
        return carry

    if hs == 1:
        one_head(0, 0)
    else:
        jax.lax.fori_loop(0, hs, one_head, 0)


def _flash_single_block(q, k, v, *, causal, scale, block_q, skv_p, kv_len,
                        q_offset, interpret, kv_bias=None, sum_col=-1,
                        save_lse=False):
    """pallas_call wrapper for the single-kv-block path.

    kv_bias: optional [B, Skv-unpadded] additive fp32 bias (e.g. -inf on
    invalid fixed-slot memory tokens); fused with the padding mask.
    save_lse=True additionally returns the per-row logsumexp as
    [B, Hq, sq_p, _LANES] fp32 (lane-broadcast, the TPU-friendly layout)."""
    B, Hq, sq_p, d_p = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    num_q_blocks = sq_p // block_q
    # heads per grid step: MHA only (GQA keeps the h//g kv index map),
    # bounded so hs * (q + k + v) tiles stay ~<= 6 MiB
    hs = 1
    if group == 1:
        tile = (block_q * d_p + 2 * skv_p * d_p) * q.dtype.itemsize
        hs = max(1, min(Hq, (6 << 20) // max(1, tile)))
        while Hq % hs:
            hs -= 1
    pad_bias = jnp.where(jnp.arange(skv_p)[None, :] < kv_len, 0.0,
                         _MASK_VALUE).astype(jnp.float32)
    if kv_bias is not None:
        bias = pad_bias + jnp.pad(kv_bias.astype(jnp.float32),
                                  ((0, 0), (0, skv_p - kv_bias.shape[1])))
        bias_index = lambda b, h, iq: (b, 0, 0)  # noqa: E731
    else:
        bias = pad_bias
        bias_index = lambda b, h, iq: (0, 0, 0)  # noqa: E731
    kernel = functools.partial(
        _flash_kernel_single, scale=scale, causal=causal, block_q=block_q,
        q_offset=q_offset, sum_col=sum_col, save_lse=save_lse, hs=hs)
    out_shape = [jax.ShapeDtypeStruct((B, Hq, sq_p, d_p), q.dtype)]
    out_specs = [pl.BlockSpec((1, hs, block_q, d_p),
                              lambda b, h, iq: (b, h, iq, 0))]
    if save_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((B, Hq, sq_p, _LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((1, hs, block_q, _LANES),
                                      lambda b, h, iq: (b, h, iq, 0)))
    res = pl.pallas_call(
        kernel,
        grid=(B, Hq // hs, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, hs, block_q, d_p),
                         lambda b, h, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, hs if group == 1 else 1, skv_p, d_p),
                         lambda b, h, iq, g=group: (b, h // g, 0, 0)),
            pl.BlockSpec((1, hs if group == 1 else 1, skv_p, d_p),
                         lambda b, h, iq, g=group: (b, h // g, 0, 0)),
            # bias rides as [B, 1, skv_p]: a (1, block) spec on a 2-D
            # array is only legal when B == 1 (Mosaic requires the
            # second-to-last block dim to divide 8 or equal the array dim)
            pl.BlockSpec((1, 1, skv_p), bias_index),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 << 20,
        ),
        interpret=interpret,
    )(q, k, v, bias[:, None])
    return res if save_lse else res[0]


# Largest KV extent served by the single-block kernel (scores block
# [block_q, 1024] fp32 = 1.25 MB VMEM at block_q=320 — comfortably resident).
_SINGLE_BLOCK_MAX_KV = 1024


def _fa_core(q, k, v, kv_bias, *, causal: bool, scale: float,
             block_q: int, block_k: int, interpret: bool,
             save_lse: bool = False):
    """Forward flash attention over both regimes (see flash_attention).

    save_lse=True additionally returns per-row logsumexp [B, Hq, Sq] fp32
    (the residual the flash backward needs)."""
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    group = Hq // Hkv

    d_p = _ceil_to(D, _LANES)

    if Skv <= _SINGLE_BLOCK_MAX_KV:
        # short-KV regime (ViT, SAM2 decoder/memory): one kv block per q
        # block, no online-softmax bookkeeping — VPU work ~halves.
        # Measured on v5e (ViT regime [32,16,577,64]): a whole-sequence q
        # block beats q-block=320 by ~20% (fewer grid steps, no kv refetch),
        # and leaving D unpadded (block d == array d satisfies Mosaic)
        # saves the 64->128 pad copies + halves kv DMA.
        skv_p = _ceil_to(Skv, _LANES)
        if block_q in (128, 256):      # caller didn't override: auto-size
            # cap the fp32 scores tile at ~2 MB of VMEM
            cap = max((2 * 1024 * 1024) // (skv_p * 4) // 64 * 64, 64)
            block_q = min(cap, _ceil_to(Sq, 8))
        else:
            block_q = min(block_q, _ceil_to(Sq, 8))
        sq_p = _ceil_to(Sq, block_q)
        d_p = D                        # full-dim block: no lane padding
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - Sq), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - Skv), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - Skv), (0, 0)))
        # NOTE: riding the softmax denominator on a ones-column of v's
        # padding (sum_col) measured SLOWER end-to-end (the extra pass over
        # v outweighs the saved VPU row reduction); kernel support remains
        # but the fast path keeps the in-kernel sum.
        res = _flash_single_block(qp, kp, vp, causal=causal, scale=scale,
                                  block_q=block_q, skv_p=skv_p, kv_len=Skv,
                                  q_offset=Skv - Sq, interpret=interpret,
                                  kv_bias=kv_bias, sum_col=-1,
                                  save_lse=save_lse)
        if save_lse:
            out, lse = res
            return out[:, :, :Sq, :D], lse[:, :, :Sq, 0]
        return res[:, :, :Sq, :D]

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
        bias_index = lambda b, h, iq, ik: (b, 0, ik)  # noqa: E731
    else:
        bias = pad_bias
        bias_index = lambda b, h, iq, ik: (0, 0, ik)  # noqa: E731

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, q_len=Sq, kv_len=Skv,
        block_q=block_q, block_k=block_k, num_kv_blocks=num_kv_blocks,
        q_offset=q_offset, save_lse=save_lse)

    out_shape = [jax.ShapeDtypeStruct((B, Hq, sq_p, d_p), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d_p),
                              lambda b, h, iq, ik: (b, h, iq, 0))]
    if save_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((B, Hq, sq_p, _LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, block_q, _LANES),
                                      lambda b, h, iq, ik: (b, h, iq, 0)))

    res = pl.pallas_call(
        kernel,
        grid=(B, Hq, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_p),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d_p),
                         lambda b, h, iq, ik, g=group: (b, h // g, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d_p),
                         lambda b, h, iq, ik, g=group: (b, h // g, ik, 0)),
            pl.BlockSpec((1, 1, block_k), bias_index),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
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
    )(qp, kp, vp, bias[:, None])
    if save_lse:
        out, lse = res
        return out[:, :, :Sq, :D], lse[:, :, :Sq, 0]
    return res[0][:, :, :Sq, :D]


# ---------------------------------------------------------------------------
# Pallas flash attention (backward)
# ---------------------------------------------------------------------------
#
# Standard recompute-based flash backward (the TPU-native replacement for
# flash-attn's CUDA backward, serving the role of the reference's training
# attention at llava/train/llama_flash_attn_monkey_patch.py:105-115):
#   delta = rowsum(dO * O)                       (computed in-kernel; cheap)
#   p     = exp(q k^T * scale + bias - lse)      (recomputed per block)
#   dV   += p^T dO
#   dp    = dO v^T
#   ds    = p * (dp - delta) * scale
#   dQ   += ds k          dK += ds^T q
# Two kernels: dQ reduces over kv blocks; dK/dV reduce over (group, q
# blocks) so GQA head-group sums happen in-kernel (no [B,Hq,Skv,D] temps).


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref, lse_ref,
                   dq_ref, dq_acc, *, scale: float, causal: bool,
                   block_q: int, block_k: int, num_kv_blocks: int,
                   q_offset: int):
    """Grid: (B, Hq, num_q_blocks, num_kv_blocks); kv is the reduction."""
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    if causal:
        run = (ik * block_k) <= (iq * block_q + block_q - 1 + q_offset)
    else:
        run = True

    @pl.when(run)
    def _run():
        q = q_ref[0, 0]                       # [bq, d]
        k = k_ref[0, 0]                       # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0]
        if causal:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + ik * block_k)
            row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   + iq * block_q + q_offset)
            s = jnp.where(col <= row, s, _MASK_VALUE)
        p = jnp.exp(s - lse_ref[0, 0][:, :1])            # [bq, bk]
        do = do_ref[0, 0]
        v = v_ref[0, 0]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o_ref[0, 0].astype(
            jnp.float32), axis=1, keepdims=True)          # [bq, 1]
        ds = (p * (dp - delta) * scale).astype(k.dtype)
        dq_acc[...] += jax.lax.dot(ds, k,
                                   preferred_element_type=jnp.float32)

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref, lse_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                    causal: bool, block_q: int, block_k: int, group: int,
                    num_q_blocks: int, q_offset: int):
    """Grid: (B, Hkv, num_kv_blocks, group, num_q_blocks); the last two dims
    reduce over the GQA head group and the q blocks."""
    ik = pl.program_id(2)
    g = pl.program_id(3)
    iq = pl.program_id(4)

    @pl.when((g == 0) & (iq == 0))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    if causal:
        run = (ik * block_k) <= (iq * block_q + block_q - 1 + q_offset)
    else:
        run = True

    @pl.when(run)
    def _run():
        q = q_ref[0, 0]                       # [bq, d]
        k = k_ref[0, 0]                       # [bk, d]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0]
        if causal:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + ik * block_k)
            row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   + iq * block_q + q_offset)
            s = jnp.where(col <= row, s, _MASK_VALUE)
        p = jnp.exp(s - lse_ref[0, 0][:, :1])            # [bq, bk]
        do = do_ref[0, 0]
        # dV += p^T dO: contract the q dim
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o_ref[0, 0].astype(
            jnp.float32), axis=1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when((g == group - 1) & (iq == num_q_blocks - 1))
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _fa_bwd_impl(q, k, v, kv_bias, out, lse, dout, *, causal, scale,
                 block_q, block_k, interpret):
    """Run both backward kernels; returns (dq, dk, dv)."""
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    group = Hq // Hkv

    d_p = _ceil_to(D, _LANES)
    block_q = min(block_q, _ceil_to(Sq, _LANES))
    block_k = min(block_k, _ceil_to(Skv, _LANES))
    sq_p = _ceil_to(Sq, block_q)
    skv_p = _ceil_to(Skv, block_k)

    pad_q = ((0, 0), (0, 0), (0, sq_p - Sq), (0, d_p - D))
    pad_kv = ((0, 0), (0, 0), (0, skv_p - Skv), (0, d_p - D))
    qp = jnp.pad(q, pad_q)
    kp = jnp.pad(k, pad_kv)
    vp = jnp.pad(v, pad_kv)
    op = jnp.pad(out, pad_q)
    dop = jnp.pad(dout, pad_q)
    # lane-broadcast the logsumexp back to the kernel layout
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - Sq)))
    lse_p = jnp.broadcast_to(lse_p[..., None], (B, Hq, sq_p, _LANES))

    num_q_blocks = sq_p // block_q
    num_kv_blocks = skv_p // block_k
    q_offset = Skv - Sq

    pad_bias = jnp.where(jnp.arange(skv_p)[None, :] < Skv, 0.0,
                         _MASK_VALUE).astype(jnp.float32)
    if kv_bias is not None:
        bias = pad_bias + jnp.pad(kv_bias.astype(jnp.float32),
                                  ((0, 0), (0, skv_p - Skv)))
        bias_b = 1
    else:
        bias = pad_bias
        bias_b = 0  # broadcast row

    q_spec4 = pl.BlockSpec((1, 1, block_q, d_p),
                           lambda b, h, iq, ik: (b, h, iq, 0))
    kv_spec4 = pl.BlockSpec((1, 1, block_k, d_p),
                            lambda b, h, iq, ik, g=group: (b, h // g, ik, 0))
    lse_spec4 = pl.BlockSpec((1, 1, block_q, _LANES),
                             lambda b, h, iq, ik: (b, h, iq, 0))
    bias_spec4 = pl.BlockSpec(
        (1, 1, block_k), lambda b, h, iq, ik, bb=bias_b: (b * bb, 0, ik))

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, block_q=block_q,
            block_k=block_k, num_kv_blocks=num_kv_blocks, q_offset=q_offset),
        grid=(B, Hq, num_q_blocks, num_kv_blocks),
        in_specs=[q_spec4, kv_spec4, kv_spec4, bias_spec4, q_spec4, q_spec4,
                  lse_spec4],
        out_specs=pl.BlockSpec((1, 1, block_q, d_p),
                               lambda b, h, iq, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, sq_p, d_p), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias[:, None], op, dop, lse_p)

    # dK/dV: grid (B, Hkv, kv blocks, group, q blocks)
    def qhead5(b, hk, ik, g, iq):
        return (b, hk * group + g, iq, 0)

    q_spec5 = pl.BlockSpec((1, 1, block_q, d_p), qhead5)
    lse_spec5 = pl.BlockSpec((1, 1, block_q, _LANES), qhead5)
    kv_spec5 = pl.BlockSpec((1, 1, block_k, d_p),
                            lambda b, hk, ik, g, iq: (b, hk, ik, 0))
    bias_spec5 = pl.BlockSpec(
        (1, 1, block_k),
        lambda b, hk, ik, g, iq, bb=bias_b: (b * bb, 0, ik))

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, block_q=block_q,
            block_k=block_k, group=group, num_q_blocks=num_q_blocks,
            q_offset=q_offset),
        grid=(B, Hkv, num_kv_blocks, group, num_q_blocks),
        in_specs=[q_spec5, kv_spec5, kv_spec5, bias_spec5, q_spec5, q_spec5,
                  lse_spec5],
        out_specs=[kv_spec5, kv_spec5],
        out_shape=[jax.ShapeDtypeStruct((B, Hkv, skv_p, d_p), k.dtype),
                   jax.ShapeDtypeStruct((B, Hkv, skv_p, d_p), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d_p), jnp.float32),
                        pltpu.VMEM((block_k, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias[:, None], op, dop, lse_p)

    return (dq[:, :, :Sq, :D], dk[:, :, :Skv, :D], dv[:, :, :Skv, :D])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fa(static, q, k, v, kv_bias):
    causal, scale, block_q, block_k, interpret = static
    return _fa_core(q, k, v, kv_bias, causal=causal, scale=scale,
                    block_q=block_q, block_k=block_k, interpret=interpret)


def _fa_fwd(static, q, k, v, kv_bias):
    causal, scale, block_q, block_k, interpret = static
    out, lse = _fa_core(q, k, v, kv_bias, causal=causal, scale=scale,
                        block_q=block_q, block_k=block_k,
                        interpret=interpret, save_lse=True)
    return out, (q, k, v, kv_bias, out, lse)


def _fa_bwd(static, res, dout):
    causal, scale, block_q, block_k, interpret = static
    q, k, v, kv_bias, out, lse = res
    dq, dk, dv = _fa_bwd_impl(q, k, v, kv_bias, out, lse, dout,
                              causal=causal, scale=scale, block_q=block_q,
                              block_k=block_k, interpret=interpret)
    # kv_bias is a mask, not a trained quantity: zero cotangent
    dbias = None if kv_bias is None else jnp.zeros_like(kv_bias)
    return dq, dk, dv, dbias


_fa.defvjp(_fa_fwd, _fa_bwd)


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

    Differentiable: `jax.grad` routes through recompute-based Pallas backward
    kernels (dQ and fused dK/dV with in-kernel GQA group reduction) via
    custom_vjp — the training-path equivalent of the reference's flash-attn
    monkey patch (llava/train/llama_flash_attn_monkey_patch.py).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    static = (causal, float(scale), block_q, block_k, interpret)
    return _fa(static, q, k, v, kv_bias)


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
