"""Weight-only quantization tests (reference 4/8-bit gates,
llava/model/builder.py:47-66)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.quantization import (
    quantize_kernel,
    quantize_tree,
    quantized_nbytes,
)


def test_int8_roundtrip_error_small():
    k = jax.random.normal(jax.random.PRNGKey(0), (256, 512)) * 0.02
    q, scale = quantize_kernel(k, 8)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * scale
    err = np.abs(np.asarray(back - k)).max()
    assert err <= float(np.abs(np.asarray(k)).max()) / 127.0 + 1e-7


def test_dense_dispatches_on_quantized_params():
    key = jax.random.PRNGKey(1)
    p = nn.dense_init(key, 128, 256)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128), jnp.float32)
    want = nn.dense(p, x)
    q, scale = quantize_kernel(p["kernel"], 8)
    pq = {"kernel_q": q, "kernel_scale": scale, "bias": p["bias"]}
    got = nn.dense(pq, x)
    rel = np.abs(np.asarray(got - want)).max() / (
        np.abs(np.asarray(want)).max() + 1e-9)
    assert rel < 0.02, rel


def test_quantize_tree_targets_and_memory():
    from video_llava_seg_tpu.config import LlamaConfig
    from video_llava_seg_tpu.models import llama

    cfg = LlamaConfig.tiny()
    params = llama.init(jax.random.PRNGKey(0), cfg)
    before = quantized_nbytes(params)
    qparams = quantize_tree(params, 8, min_size=1024)
    after = quantized_nbytes(qparams)
    assert after < 0.55 * before
    # embeddings untouched
    assert "embedding" in qparams["embed_tokens"]
    # forward still runs and is close
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, cfg.hidden_size))
    pos = jnp.arange(6)
    lf, _ = llama.forward(params, cfg, x, pos)
    lq, _ = llama.forward(qparams, cfg, x, pos)
    pf = jax.nn.softmax(lf, -1)
    pq_ = jax.nn.softmax(lq, -1)
    assert float(jnp.abs(pf - pq_).max()) < 0.15


def test_init_quantized_matches_quantize_after_init():
    """Direct int8 init (one layer at a time, for models whose bf16 form
    exceeds HBM) must equal quantize_tree(init(...)) with the same key."""
    from video_llava_seg_tpu.config import LlamaConfig
    from video_llava_seg_tpu.models import llama

    cfg = LlamaConfig.tiny()
    key = jax.random.PRNGKey(7)
    want = quantize_tree(llama.init(key, cfg, dtype=jnp.bfloat16), 8,
                         min_size=1024)
    got = llama.init_quantized(key, cfg, bits=8, min_size=1024)
    assert "kernel_q" in got["layers"][0]["attn"]["wq"]
    # same tree structure, shapes and dtypes
    assert (jax.tree_util.tree_structure(want)
            == jax.tree_util.tree_structure(got))
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # dequantized values agree up to bf16-ulp init noise (the jitted
    # per-layer init and the eager init differ by libm ulps in
    # truncated_normal's erfinv; bit-exactness is not a property we need)
    wq_w = want["layers"][0]["attn"]["wq"]
    wq_g = got["layers"][0]["attn"]["wq"]
    deq_w = np.asarray(wq_w["kernel_q"], np.float32) * np.asarray(
        wq_w["kernel_scale"])
    deq_g = np.asarray(wq_g["kernel_q"], np.float32) * np.asarray(
        wq_g["kernel_scale"])
    atol = 4.0 * float(np.asarray(wq_w["kernel_scale"]).max())
    np.testing.assert_allclose(deq_w, deq_g, atol=atol)
    # and the quantized tree decodes greedily without error
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.hidden_size),
                          jnp.bfloat16)
    toks, hidden, n = llama.greedy_generate(got, cfg, x, prompt_len=5,
                                            max_new_tokens=4,
                                            eos_token_ids=(999,))
    assert toks.shape == (1, 4) and int(n) <= 4


def test_w8a8_dense_close_to_fp():
    from video_llava_seg_tpu.ops.quantization import (
        quantize_activations_rowwise,
    )

    key = jax.random.PRNGKey(4)
    p = nn.dense_init(key, 256, 512)
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 256), jnp.float32)
    want = nn.dense(p, x)
    q, scale = quantize_kernel(p["kernel"], 8)
    pq = {"kernel_qa": q, "kernel_scale": scale, "bias": p["bias"]}
    got = nn.dense(pq, x)
    rel = np.abs(np.asarray(got - want)).max() / (
        np.abs(np.asarray(want)).max() + 1e-9)
    assert rel < 0.05, rel
    # the int8 dot must consume int8 activations exactly
    xq, a_scale = quantize_activations_rowwise(x)
    assert xq.dtype == jnp.int8 and int(jnp.abs(xq).max()) <= 127


def test_w8a8_tree_dispatch():
    from video_llava_seg_tpu.config import LlamaConfig
    from video_llava_seg_tpu.models import llama

    cfg = LlamaConfig.tiny()
    params = llama.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params, 8, min_size=1024, act_quant=True)
    assert "kernel_qa" in qparams["layers"][0]["attn"]["wq"]
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, cfg.hidden_size))
    lf, _ = llama.forward(params, cfg, x, jnp.arange(6))
    lq, _ = llama.forward(qparams, cfg, x, jnp.arange(6))
    pf = jax.nn.softmax(lf, -1)
    pq_ = jax.nn.softmax(lq, -1)
    assert float(jnp.abs(pf - pq_).max()) < 0.2


def test_int4_range():
    k = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    q, scale = quantize_kernel(k, 4)
    assert int(jnp.abs(q).max()) <= 7
