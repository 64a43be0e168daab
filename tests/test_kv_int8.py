"""int8 KV cache (cfg.kv_cache_int8): per-position quantized K/V with
scales folded exactly into attention — halves decode's cache HBM reads."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import LlamaConfig
from video_llava_seg_tpu.models import llama
from video_llava_seg_tpu.ops.attention import attention_reference

CFG = LlamaConfig.tiny(vocab_size=256)
CFG_Q = dataclasses.replace(CFG, kv_cache_int8=True)


def test_scale_folding_matches_dequantized():
    """attention over (int8 K/V + scales) == attention over the
    dequantized fp K/V: the folding is algebraically exact."""
    key = jax.random.PRNGKey(0)
    b, hq, hkv, sq, skv, d = 2, 4, 2, 1, 9, 32
    q = jax.random.normal(key, (b, hq, sq, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, skv, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, hkv, skv, d))
    kq, ks = llama._quant_kv(k)
    vq, vs = llama._quant_kv(v)

    want = attention_reference(
        q, kq.astype(jnp.float32) * ks, vq.astype(jnp.float32) * vs,
        kv_valid_len=7)
    got = attention_reference(q, kq, vq, kv_valid_len=7,
                              k_scale=ks[..., 0], v_scale=vs[..., 0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_prefill_decode_int8_cache_close_to_fp():
    """Same weights, same inputs: the int8-cache pipeline's logits track
    the fp-cache pipeline within quantization noise, and the cache
    actually stores int8."""
    params = llama.init(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 9), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)

    def run(cfg):
        cache = llama.init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
        logits, _, cache = llama.prefill(params, cfg, embeds[:, :6],
                                         jnp.arange(6), cache)
        outs = [logits[:, -1]]
        for t in range(6, 9):
            emb = llama.embed(params, ids[:, t:t + 1])
            logits, _, cache = llama.decode_step(params, cfg, emb, cache)
            outs.append(logits[:, 0])
        return jnp.stack(outs), cache

    fp_logits, fp_cache = run(CFG)
    q_logits, q_cache = run(CFG_Q)
    assert fp_cache.k_scale is None
    assert q_cache.k.dtype == jnp.int8 and q_cache.k_scale is not None

    denom = float(jnp.std(fp_logits)) + 1e-9
    rel = float(jnp.abs(q_logits - fp_logits).max()) / denom
    assert rel < 0.05, rel
    # greedy argmax agrees step for step on this model
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(q_logits, -1)),
        np.asarray(jnp.argmax(fp_logits, -1)))


def test_greedy_generate_int8_cache():
    params = llama.init(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 4), 0,
                             CFG.vocab_size)
    embeds = llama.embed(params, ids)
    fp_toks, _, fp_n = jax.jit(lambda p, e: llama.greedy_generate(
        p, CFG, e, prompt_len=4, max_new_tokens=6,
        eos_token_ids=(9999,)))(params, embeds)
    q_toks, _, q_n = jax.jit(lambda p, e: llama.greedy_generate(
        p, CFG_Q, e, prompt_len=4, max_new_tokens=6,
        eos_token_ids=(9999,)))(params, embeds)
    assert int(q_n) == int(fp_n)
    np.testing.assert_array_equal(np.asarray(q_toks), np.asarray(fp_toks))
