"""Ring-attention context parallelism: 8-way seq-sharded prefill must be
numerically equivalent to single-device attention / llama.forward — the
beyond-parity long-context extension (SURVEY §5: the reference has no
sequence parallelism; its budget is capped at 6144 by truncation,
llava_arch.py:371-378)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from video_llava_seg_tpu.config import LlamaConfig
from video_llava_seg_tpu.models import llama
from video_llava_seg_tpu.ops.attention import attention_reference
from video_llava_seg_tpu.parallel.ring_attention import (
    cp_forward,
    create_seq_mesh,
    ring_attention_local,
)

CFG = LlamaConfig.tiny(vocab_size=256)


@pytest.fixture(scope="module")
def seq_mesh():
    return create_seq_mesh(8)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(seq_mesh, causal):
    b, hq, hkv, s, d = 2, 4, 2, 64, 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, hkv, s, d), jnp.float32)
    ref = attention_reference(q, k, v, causal=causal)

    ring = shard_map(
        lambda q, k, v: ring_attention_local(q, k, v, causal=causal),
        mesh=seq_mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False)
    with seq_mesh:
        out = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_uneven_attention_pattern(seq_mesh):
    """Queries near the sequence start see almost nothing (whole kv blocks
    fully masked — the dead-row path); queries at the end see everything."""
    b, hq, hkv, s, d = 1, 2, 1, 32, 8
    key = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(kk, (b, h, s, d))
               for kk, h in zip(jax.random.split(key, 3), (hq, hkv, hkv)))
    ref = attention_reference(q, k, v, causal=True)
    ring = shard_map(
        lambda q, k, v: ring_attention_local(q, k, v, causal=True),
        mesh=seq_mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False)
    with seq_mesh:
        out = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cp_prefill_matches_single_device(seq_mesh):
    s = 64
    params = llama.init(jax.random.PRNGKey(3), CFG)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, s), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)
    pos = jnp.arange(s)
    ref_logits, ref_hidden = llama.forward(params, CFG, embeds, pos)
    with seq_mesh:
        logits, hidden = cp_forward(params, CFG, embeds, pos, seq_mesh)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref_hidden),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=3e-4, rtol=3e-4)
    # token-level agreement (the serving contract)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, -1)), np.asarray(
            jnp.argmax(ref_logits, -1)))


def test_cp_beyond_single_budget(seq_mesh):
    """The point of the extension: a sequence LONGER than the config's
    max_seq_len budget still prefills correctly when sharded 8 ways —
    matches an unsharded forward run at the same length."""
    import dataclasses

    s = 128
    cfg = dataclasses.replace(CFG, max_seq_len=s)
    params = llama.init(jax.random.PRNGKey(5), cfg)
    embeds = llama.embed(
        params, jax.random.randint(jax.random.PRNGKey(6), (1, s), 0,
                                   cfg.vocab_size))
    pos = jnp.arange(s)
    _, ref_hidden = llama.forward(params, cfg, embeds, pos)
    with seq_mesh:
        _, hidden = cp_forward(params, cfg, embeds, pos, seq_mesh,
                               return_logits=False)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref_hidden),
                               atol=2e-4, rtol=2e-4)


def test_cp_backward_matches(seq_mesh):
    """Reverse-mode through the ring (scan + ppermute transpose): grads wrt
    params match the single-device forward's — context parallelism is
    usable for long-context TRAINING, not just prefill."""
    s = 32
    params = llama.init(jax.random.PRNGKey(7), CFG)
    embeds = llama.embed(
        params, jax.random.randint(jax.random.PRNGKey(8), (1, s), 0,
                                   CFG.vocab_size))
    pos = jnp.arange(s)
    tgt = jax.random.randint(jax.random.PRNGKey(9), (1, s), 0,
                             CFG.vocab_size)

    def loss_single(p):
        logits, _ = llama.forward(p, CFG, embeds, pos)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    def loss_cp(p):
        logits, _ = cp_forward(p, CFG, embeds, pos, seq_mesh)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    g_ref = jax.grad(loss_single)(params)
    with seq_mesh:
        g_cp = jax.grad(loss_cp)(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_cp = dict(jax.tree_util.tree_leaves_with_path(g_cp))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_cp[path]), np.asarray(leaf), atol=5e-4,
            rtol=5e-3, err_msg=str(path))
