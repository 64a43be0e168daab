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


def test_int4_range():
    k = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    q, scale = quantize_kernel(k, 4)
    assert int(jnp.abs(q).max()) <= 7
