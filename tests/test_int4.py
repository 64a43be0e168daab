"""W4A8 packed-int4 dense path (ops/int4.py): pack/unpack, Pallas kernel
vs the XLA unpack oracle, nn.dense dispatch, and the int4-serving LLM.

Parity contract: the reference's load_4bit BitsAndBytes gate
(llava/model/builder.py:47-66) — an opt-in lossy serving mode."""

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.int4 import (
    pack_int4,
    unpack_int4,
    w4a8_dense,
    w4a8_matmul,
)
from video_llava_seg_tpu.ops.quantization import (
    quantize_activations_rowwise,
    quantize_kernel,
    quantize_tree,
    quantized_nbytes,
)


def test_pack_unpack_roundtrip():
    q = jax.random.randint(jax.random.PRNGKey(0), (64, 256), -7, 8,
                           jnp.int8)
    packed = pack_int4(q)
    assert packed.shape == (32, 256) and packed.dtype == jnp.int8
    lo, hi = unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(q)[:32])
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(q)[32:])


def test_kernel_matches_xla_unpack_exactly():
    """Pallas (interpret) and the XLA fallback run the same int32 math —
    bitwise-equal f32 outputs, including the rows=1 decode shape."""
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (256, 384)) * 0.1
    q, scale = quantize_kernel(w, bits=4)
    packed = pack_int4(q)
    for rows in (1, 8, 40, 300):  # 300 > 256: padded 256-row prefill tiles
        x = jax.random.normal(jax.random.PRNGKey(rows), (rows, 256),
                              jnp.float32)
        xq, a_s = quantize_activations_rowwise(x)
        got = w4a8_matmul(xq, a_s, packed, scale, jnp.float32,
                          interpret=True)
        lo, hi = unpack_int4(packed)
        acc = (jnp.dot(xq[:, :128], lo, preferred_element_type=jnp.int32)
               + jnp.dot(xq[:, 128:], hi,
                         preferred_element_type=jnp.int32))
        want = acc.astype(jnp.float32) * a_s * scale
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_w4a8_dense_approximates_fp():
    p_fp = nn.dense_init(jax.random.PRNGKey(2), 256, 256)
    p4 = quantize_tree(p_fp, bits=4, act_quant=True, min_size=0)
    assert "kernel_q4a" in p4 and p4["kernel_q4a"].shape == (128, 256)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 256), jnp.float32)
    want = nn.dense(p_fp, x)
    got = nn.dense(p4, x)  # dispatches on kernel_q4a
    rel = float(jnp.abs(got - want).mean() / (jnp.std(want) + 1e-9))
    assert rel < 0.1, rel  # int4 is lossy but must stay in the ballpark


def test_odd_in_dim_stays_fp():
    p = {"kernel": jnp.ones((7, 128), jnp.float32)}
    out = quantize_tree(p, bits=4, act_quant=True, min_size=0)
    assert "kernel" in out and "kernel_q4a" not in out


def test_int4_llava_generate_e2e():
    """Full multimodal generate with a W4A8-quantized LLM (the
    --load_4bit serving path end to end: encode + splice + prefill +
    while-loop decode through the packed dispatch)."""
    import jax as _jax

    from video_llava_seg_tpu.config import VideoLlavaConfig
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.models import llava

    cfg = VideoLlavaConfig.tiny()
    params = llava.init(_jax.random.PRNGKey(6), cfg)
    params = dict(params)
    params["llm"] = quantize_tree(params["llm"], bits=4, act_quant=True,
                                  min_size=0)

    tpi = llava.visual_tokens_per_sample(cfg)
    ids = np.concatenate([
        np.asarray([[1, 2]]),
        np.full((1, len(tpi)), IMAGE_TOKEN_INDEX),
        np.asarray([[3]]),
    ], axis=1)
    video = np.zeros((1, cfg.num_frames, cfg.vision.image_size,
                      cfg.vision.image_size, 3), np.float32)
    toks, hidden, n = llava.generate(params, cfg, ids, video,
                                     max_new_tokens=3,
                                     eos_token_ids=(9999,))
    assert int(n) == 3
    assert bool(jnp.all(jnp.isfinite(hidden)))


def test_int4_llm_decodes_and_halves_weight_bytes():
    from video_llava_seg_tpu.config import LlamaConfig
    from video_llava_seg_tpu.models import llama

    cfg = LlamaConfig.tiny(vocab_size=256)
    p8 = llama.init_quantized(jax.random.PRNGKey(4), cfg, bits=8,
                              act_quant=True, min_size=0)
    p4 = llama.init_quantized(jax.random.PRNGKey(4), cfg, bits=4,
                              act_quant=True, min_size=0)
    n8 = quantized_nbytes(p8["layers"])
    n4 = quantized_nbytes(p4["layers"])
    assert n4 < 0.6 * n8, (n4, n8)

    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 5), 0,
                             cfg.vocab_size)
    embeds = llama.embed(p4, ids)
    toks, hidden, n = llama.greedy_generate(
        p4, cfg, embeds, prompt_len=5, max_new_tokens=4,
        eos_token_ids=(9999,))
    assert toks.shape == (1, 4) and int(n) == 4
    assert bool(jnp.all((toks >= 0) & (toks < cfg.vocab_size)))
    assert bool(jnp.all(jnp.isfinite(hidden)))
