"""Tensor-parallel serving: greedy decode with TP-sharded LLM weights.

Multi-chip serving design (beyond the reference, which shards inference
only by splitting the dataset across single-GPU processes —
llava/inference/main.py --num_chunks): weights shard megatron-style over
the mesh's 'model' axis (parallel/mesh.py rules: wq/wk/wv/gate/up on the
output dim, wo/down on the input dim, embeddings/lm_head on vocab) and
the batch over 'data'. `greedy_generate`'s prefill + while_loop decode
jits over the mesh unchanged; GSPMD propagates the head-sharding through
the KV cache carried by the while_loop and inserts the TP collectives
(all-reduce after wo/w_down, all-gather at the vocab-sharded unembed).

Validated on the virtual 8-device CPU mesh (4 data x 2 model) against
the single-device path: identical greedy tokens, identical stop step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from video_llava_seg_tpu.config import LlamaConfig
from video_llava_seg_tpu.models import llama
from video_llava_seg_tpu.parallel.mesh import param_shardings, shard_params

CFG = LlamaConfig.tiny(vocab_size=256)


def _gen(params, embeds, max_new_tokens=6, eos=(9999,)):
    return llama.greedy_generate(
        params, CFG, embeds, prompt_len=embeds.shape[1],
        max_new_tokens=max_new_tokens, eos_token_ids=eos)


def test_tp_decode_matches_single_device(mesh8):
    key = jax.random.PRNGKey(7)
    params = llama.init(key, CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 5), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)

    ref_toks, ref_hidden, ref_n = jax.jit(_gen)(params, embeds)

    # sanity: the TP rules actually shard the attention/mlp weights on
    # this mesh (otherwise the test silently degrades to replication)
    specs = param_shardings(params, mesh8, fsdp=False)
    layer0 = jax.tree_util.tree_leaves_with_path(specs)
    model_sharded = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for path, s in layer0 if "model" in str(s.spec)
    ]
    assert any("wq" in p for p in model_sharded), model_sharded
    assert any("wo" in p for p in model_sharded), model_sharded
    assert any("w_down" in p for p in model_sharded), model_sharded

    sharded = shard_params(params, mesh8, fsdp=False)
    emb_sh = jax.device_put(
        embeds, NamedSharding(mesh8, P("data", None, None)))

    with mesh8:
        tp_toks, tp_hidden, tp_n = jax.jit(_gen)(sharded, emb_sh)

    np.testing.assert_array_equal(np.asarray(ref_toks), np.asarray(tp_toks))
    assert int(ref_n) == int(tp_n)
    np.testing.assert_allclose(np.asarray(ref_hidden),
                               np.asarray(tp_hidden), atol=2e-4, rtol=2e-4)


def _quant_params(bits, act_quant, key=11):
    # min_size=1: the tiny model's kernels are below the production
    # min_size threshold; force every dense to quantize so the sharded
    # path exercises kernel_q / kernel_qa / kernel_q4a + kernel_scale
    return llama.init_quantized(jax.random.PRNGKey(key), CFG, bits=bits,
                                act_quant=act_quant, min_size=1,
                                dtype=jnp.float32)


@pytest.mark.parametrize("bits,act_quant", [(8, False), (8, True), (4, True)],
                         ids=["int8-weight-only", "w8a8", "w4a8"])
def test_tp_quantized_decode_token_exact(mesh8, bits, act_quant):
    """The full quantized serving ladder TP-shards token-exactly.

    ops/int4.py:24-27 promises the XLA unpack path (USE_PALLAS_W4A8=False,
    which is what runs on this CPU mesh) is GSPMD-partitionable; this pins
    it: mesh rules fire on the packed/int8 kernel layouts (kernel_q /
    kernel_qa / kernel_q4a shard over 'model', 1-D kernel_scale replicates
    — consistent because the scale commutes past the psum), and greedy
    decode returns identical tokens + stop step vs single device. Integer
    partial sums are exact in int32, so this equality is strict, not
    tolerance-based."""
    params = _quant_params(bits, act_quant)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 5), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)

    ref_toks, ref_hidden, ref_n = jax.jit(_gen)(params, embeds)

    # the TP rules must actually fire on the quantized layouts
    specs = param_shardings(params, mesh8, fsdp=False)
    flat = [
        ("/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                  for k in path), s)
        for path, s in jax.tree_util.tree_leaves_with_path(specs)
    ]
    kname = {(8, False): "kernel_q", (8, True): "kernel_qa",
             (4, True): "kernel_q4a"}[(bits, act_quant)]
    sharded_kernels = [p for p, s in flat
                       if p.endswith(kname) and "model" in str(s.spec)]
    assert any("wq" in p for p in sharded_kernels), flat
    assert any("wo" in p for p in sharded_kernels), flat
    assert any("w_down" in p for p in sharded_kernels), flat
    # per-channel scales stay replicated over 'model' (consistent: GSPMD
    # slices the [out] scale against the sharded out dim where needed)
    for p, s in flat:
        if p.endswith("kernel_scale"):
            assert "model" not in str(s.spec), (p, s)

    sharded = shard_params(params, mesh8, fsdp=False)
    emb_sh = jax.device_put(
        embeds, NamedSharding(mesh8, P("data", None, None)))
    with mesh8:
        tp_toks, tp_hidden, tp_n = jax.jit(_gen)(sharded, emb_sh)

    np.testing.assert_array_equal(np.asarray(ref_toks), np.asarray(tp_toks))
    assert int(ref_n) == int(tp_n)
    np.testing.assert_allclose(np.asarray(ref_hidden),
                               np.asarray(tp_hidden), atol=2e-4, rtol=2e-4)


def test_tp_w4a8_int8kv_decode_token_exact(mesh8):
    """Fastest serving ladder (W4A8 weights + int8 KV cache) under TP:
    the quantized KV cache carried through the decode while_loop shards
    over the mesh with no token drift (bench config 5's serving mode,
    inference/main.py --load_4bit --kv_cache_int8 --model_parallel)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, kv_cache_int8=True)
    params = _quant_params(4, True)
    ids = jax.random.randint(jax.random.PRNGKey(5), (4, 6), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)

    def gen(p, e):
        return llama.greedy_generate(p, cfg, e, prompt_len=e.shape[1],
                                     max_new_tokens=6,
                                     eos_token_ids=(9999,))

    ref_toks, _, ref_n = jax.jit(gen)(params, embeds)
    sharded = shard_params(params, mesh8, fsdp=False)
    emb_sh = jax.device_put(
        embeds, NamedSharding(mesh8, P("data", None, None)))
    with mesh8:
        tp_toks, _, tp_n = jax.jit(gen)(sharded, emb_sh)
    np.testing.assert_array_equal(np.asarray(ref_toks), np.asarray(tp_toks))
    assert int(ref_n) == int(tp_n)


def test_tp_sampling_token_exact(mesh8):
    """temperature/top_p sampling under TP: same rng -> same tokens as the
    single-device path (the gumbel draw depends only on the rng and the
    row index, and the TP logits match bit-for-bit after the psum)."""
    params = _quant_params(8, True)
    ids = jax.random.randint(jax.random.PRNGKey(2), (4, 5), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)
    rng = jax.random.PRNGKey(42)

    def gen(p, e):
        return llama.greedy_generate(p, CFG, e, prompt_len=e.shape[1],
                                     max_new_tokens=6, eos_token_ids=(9999,),
                                     temperature=0.8, top_p=0.9, rng=rng)

    ref_toks, _, ref_n = jax.jit(gen)(params, embeds)
    sharded = shard_params(params, mesh8, fsdp=False)
    emb_sh = jax.device_put(
        embeds, NamedSharding(mesh8, P("data", None, None)))
    with mesh8:
        tp_toks, _, tp_n = jax.jit(gen)(sharded, emb_sh)
    np.testing.assert_array_equal(np.asarray(ref_toks), np.asarray(tp_toks))
    assert int(ref_n) == int(tp_n)


def test_tp_beam_search_token_exact(mesh8):
    """Beam search under TP matches the single-device beams."""
    params = _quant_params(8, False)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 5), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)

    def gen(p, e):
        return llama.beam_generate(p, CFG, e, prompt_len=e.shape[1],
                                   max_new_tokens=6, eos_token_ids=(9999,),
                                   num_beams=3)

    ref = jax.jit(gen)(params, embeds)
    sharded = shard_params(params, mesh8, fsdp=False)
    with mesh8:
        tp = jax.jit(gen)(sharded, jax.device_put(
            embeds, NamedSharding(mesh8, P(None, None, None))))
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(tp[0]))
    assert int(ref[2]) == int(tp[2])


def test_tp_decode_early_stop_parity(mesh8):
    """Per-row eos stop behaves identically under the sharded mesh."""
    key = jax.random.PRNGKey(3)
    params = llama.init(key, CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(2), (4, 4), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)

    free_toks, _, _ = jax.jit(lambda p, e: _gen(p, e, 8))(params, embeds)
    # pick the token the model actually emits at step 2 for row 0 as eos:
    # both paths must then stop that row at the same step
    eos_id = int(np.asarray(free_toks)[0, 2])

    ref_toks, _, ref_n = jax.jit(lambda p, e: _gen(p, e, 8, (eos_id,)))(
        params, embeds)

    sharded = shard_params(params, mesh8, fsdp=False)
    emb_sh = jax.device_put(
        embeds, NamedSharding(mesh8, P("data", None, None)))
    with mesh8:
        tp_toks, _, tp_n = jax.jit(lambda p, e: _gen(p, e, 8, (eos_id,)))(
            sharded, emb_sh)

    np.testing.assert_array_equal(np.asarray(ref_toks), np.asarray(tp_toks))
    assert int(ref_n) == int(tp_n)
