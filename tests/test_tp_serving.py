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
