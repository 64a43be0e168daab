"""Ring attention: context parallelism over a `seq` mesh axis.

BEYOND-PARITY extension (SURVEY §5 "Long-context / sequence parallelism"):
the reference contains no sequence sharding at all — long video is handled
only by token *reduction* (slow/fast pooling into the 6144 budget,
llava/model/llava_arch.py:173-198). This module shards the sequence itself
so longer clips (more slow frames, denser fast tokens) fit: each device
holds S/P tokens, K/V shards rotate around the ring via `ppermute` (one
ICI hop per step) while every device accumulates its queries' attention
online — softmax numerator/denominator merged block-by-block exactly like
flash attention's running stats, so the result is bit-for-bit a softmax
over the full sequence.

Design notes (TPU):
- collectives: `jax.lax.ppermute` inside `shard_map` — compiles to ICI
  neighbor exchange; each of the P-1 hops moves only the K/V shard
  (2 * S/P * Hkv * D * 2 bytes), fully overlappable with the block dot.
- the per-step block math runs as plain XLA einsums in f32 accumulation
  (MXU dots with fused casts); at S/P block sizes the [Sq_loc, Skv_loc]
  score tile is small enough that XLA's fusion is already
  bandwidth-optimal, so no custom kernel is needed here.
- the ring loop is a `lax.scan` (NOT fori_loop) so the whole thing is
  reverse-mode differentiable — ppermute transposes to the inverse
  rotation, making this usable for long-context *training*, not just
  prefill.
- GQA: K/V stay at Hkv heads on the wire (ring traffic is per-KV-head);
  queries fold their group into the row axis only inside the block dot.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def create_seq_mesh(n_devices: Optional[int] = None,
                    axis: str = "seq") -> Mesh:
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(devs, (axis,))


def _block_attn(q, k, v, mask):
    """One ring step's block contribution.

    q: [B, Hq, Sq, D]; k, v: [B, Hkv, Skv, D]; mask: [Sq, Skv] bool
    (True = attend). Returns (o_num [B,Hq,Sq,D] f32, m [B,Hq,Sq] f32,
    l [B,Hq,Sq] f32) — unnormalized numerator, row max, row sum."""
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)
    qg = q.reshape(b, hkv, group * sq, d)
    s = jnp.einsum("bhqd,bhkd->bhqk", qg, k.astype(q.dtype),
                   preferred_element_type=jnp.float32) * scale
    s = s.reshape(b, hq, sq, -1)
    s = jnp.where(mask[None, None], s, _MASK_VALUE)
    m = jnp.max(s, axis=-1)
    # fully-masked rows (this kv block entirely in the future): zero
    # contribution with a safe max
    dead = m <= _MASK_VALUE * 0.5
    m_safe = jnp.where(dead, 0.0, m)
    p = jnp.exp(s - m_safe[..., None])
    p = jnp.where(mask[None, None], p, 0.0)
    l = jnp.sum(p, axis=-1)
    pg = p.reshape(b, hkv, group * sq, -1)
    o = jnp.einsum("bhqk,bhkd->bhqd", pg.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    o = o.reshape(b, hq, sq, d).astype(jnp.float32)
    return o, jnp.where(dead, -jnp.inf, m), l


def ring_attention_local(q, k, v, *, axis_name: str = "seq",
                         causal: bool = True):
    """Full-sequence softmax attention over sequence-sharded q/k/v.

    MUST run inside shard_map over `axis_name`. q: [B, Hq, S_loc, D];
    k, v: [B, Hkv, S_loc, D] — the local shard of a [B, H, S, D] global.
    Returns the local [B, Hq, S_loc, D] output equal to the corresponding
    rows of single-device attention over the full S."""
    p_size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    s_loc = q.shape[2]
    q_pos = idx * s_loc + jnp.arange(s_loc)            # global q rows
    perm = [(i, (i + 1) % p_size) for i in range(p_size)]

    def step(carry, t):
        k_t, v_t, o, m, l = carry
        src = (idx - t) % p_size                       # shard origin
        k_pos = src * s_loc + jnp.arange(s_loc)
        if causal:
            mask = k_pos[None, :] <= q_pos[:, None]
        else:
            mask = jnp.ones((s_loc, s_loc), bool)
        o_b, m_b, l_b = _block_attn(q, k_t, v_t, mask)
        # online merge of (o, m, l) with the block stats
        m_new = jnp.maximum(m, m_b)
        m_cap = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        a = jnp.exp(jnp.where(jnp.isneginf(m), m, m - m_cap))
        b_ = jnp.exp(jnp.where(jnp.isneginf(m_b), m_b, m_b - m_cap))
        o = o * a[..., None] + o_b * b_[..., None]
        l = l * a + l_b * b_
        k_n = jax.lax.ppermute(k_t, axis_name, perm)
        v_n = jax.lax.ppermute(v_t, axis_name, perm)
        return (k_n, v_n, o, m_new, l), None

    b, hq, _, d = q.shape
    o0 = jnp.zeros((b, hq, s_loc, d), jnp.float32)
    m0 = jnp.full((b, hq, s_loc), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, hq, s_loc), jnp.float32)
    (_, _, o, _, l), _ = jax.lax.scan(
        step, (k, v, o0, m0, l0), jnp.arange(p_size))
    return (o / jnp.maximum(l, 1e-38)[..., None]).astype(q.dtype)


def cp_forward(params, cfg, inputs_embeds, position_ids, mesh: Mesh,
               *, axis: str = "seq", return_logits: bool = True):
    """Context-parallel Llama forward (prefill): the sequence axis shards
    over `axis`, attention runs as a ring, everything else is per-token.

    inputs_embeds: [B, S, D] with S divisible by the axis size;
    position_ids: [S] or [B, S] global positions. Params replicate.
    Returns (logits | None, hidden) matching llama.forward on one device.

    This lifts the reference's hard 6144-token ceiling
    (llava_arch.py:371-378 truncation): an 8-way seq axis serves ~8x the
    visual-token budget at the same per-chip activation memory."""
    from video_llava_seg_tpu.models import llama
    from video_llava_seg_tpu.ops import nn
    shard_map = jax.shard_map

    if position_ids.ndim == 1:
        position_ids = position_ids[None]
    n = mesh.shape[axis]
    assert inputs_embeds.shape[1] % n == 0, (inputs_embeds.shape, n)

    def local_fwd(params, x, pos):
        cos, sin = llama.rope_1d_cos_sin(pos, cfg.head_dim, cfg.rope_theta)

        def block(layer, x):
            h = llama._norm(layer["input_layernorm"], cfg, x)
            b, s, _ = h.shape
            q = nn.dense(layer["attn"]["wq"], h)
            k = nn.dense(layer["attn"]["wk"], h)
            v = nn.dense(layer["attn"]["wv"], h)
            q = q.reshape(b, s, cfg.num_heads, cfg.head_dim
                          ).transpose(0, 2, 1, 3)
            k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim
                          ).transpose(0, 2, 1, 3)
            v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim
                          ).transpose(0, 2, 1, 3)
            if cfg.use_rope:
                q = llama.apply_rope_1d(q, cos, sin)
                k = llama.apply_rope_1d(k, cos, sin)
            o = ring_attention_local(q, k, v, axis_name=axis, causal=True)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, -1)
            x = x + nn.dense(layer["attn"]["wo"], o)
            h = llama._norm(layer["post_attention_layernorm"], cfg, x)
            return x + llama._mlp_block(layer, h, cfg)

        layers = params["layers"]
        if isinstance(layers, dict):
            x = jax.lax.scan(lambda h, layer: (block(layer, h), None),
                             x, layers)[0]
        else:
            for layer in layers:
                x = block(layer, x)
        return llama._norm(params["norm"], cfg, x)

    fwd = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis, None), check_vma=False)
    hidden = fwd(params, inputs_embeds, position_ids)
    if not return_logits:
        return None, hidden
    return llama.unembed(params, cfg, hidden), hidden
