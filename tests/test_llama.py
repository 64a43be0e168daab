"""Llama decoder parity vs transformers LlamaForCausalLM (tiny random)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from video_llava_seg_tpu.config import LlamaConfig  # noqa: E402
from video_llava_seg_tpu.convert.hf_llama import convert_llama  # noqa: E402
from video_llava_seg_tpu.models import llama  # noqa: E402

CFG = LlamaConfig.tiny(vocab_size=256)


@pytest.fixture(scope="module")
def ref_model():
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM
    torch.manual_seed(0)
    hf = HFConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        head_dim=CFG.head_dim, rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta, max_position_embeddings=CFG.max_seq_len,
        attention_bias=False, tie_word_embeddings=False)
    return LlamaForCausalLM(hf).eval()


@pytest.fixture(scope="module")
def params(ref_model):
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    return convert_llama(sd, CFG)


def test_forward_parity(ref_model, params):
    ids = torch.randint(0, CFG.vocab_size, (2, 17))
    with torch.no_grad():
        out = ref_model(ids, output_hidden_states=True)
    embeds = llama.embed(params, jnp.asarray(ids.numpy()))
    logits, hidden = llama.forward(params, CFG, embeds, jnp.arange(17))
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(hidden),
                               out.hidden_states[-1].numpy(),
                               atol=2e-4, rtol=2e-4)


def test_prefill_decode_matches_forward(params):
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (1, 9), 0, CFG.vocab_size)
    embeds = llama.embed(params, ids)
    full_logits, _ = llama.forward(params, CFG, embeds, jnp.arange(9))

    cache = llama.init_kv_cache(CFG, 1, 16, dtype=jnp.float32)
    pre_logits, _, cache = llama.prefill(params, CFG, embeds[:, :6],
                                         jnp.arange(6), cache)
    np.testing.assert_allclose(np.asarray(pre_logits),
                               np.asarray(full_logits[:, :6]), atol=2e-4,
                               rtol=2e-4)
    # decode the remaining tokens one at a time
    for t in range(6, 9):
        emb = llama.embed(params, ids[:, t:t + 1])
        logits, _, cache = llama.decode_step(params, CFG, emb, cache)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full_logits[:, t]), atol=3e-4,
                                   rtol=3e-4)


def test_greedy_generate_matches_hf(ref_model, params):
    ids = torch.randint(0, CFG.vocab_size, (1, 8))
    with torch.no_grad():
        hf_out = ref_model.generate(
            ids, max_new_tokens=6, do_sample=False, num_beams=1,
            pad_token_id=0, eos_token_id=None)
    hf_new = hf_out[0, 8:].numpy()

    embeds = llama.embed(params, jnp.asarray(ids.numpy()))
    tokens, hiddens, n = llama.greedy_generate(
        params, CFG, embeds, prompt_len=8, max_new_tokens=6,
        eos_token_ids=(99999,))
    assert int(n) == 6
    np.testing.assert_array_equal(np.asarray(tokens[0]), hf_new)


def test_generate_hidden_alignment(ref_model, params):
    """hiddens[:, j] must be the state that produced tokens[:, j]."""
    ids = torch.randint(1, CFG.vocab_size, (1, 8))
    embeds = llama.embed(params, jnp.asarray(ids.numpy()))
    tokens, hiddens, n = llama.greedy_generate(
        params, CFG, embeds, prompt_len=8, max_new_tokens=4,
        eos_token_ids=(99999,))
    # re-deriving: argmax(lm_head(hiddens[:, j])) == tokens[:, j]
    logits = llama.unembed(params, CFG, hiddens)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, -1)[0, :int(n)]),
        np.asarray(tokens[0, :int(n)]))


def test_eos_stops_generation(params):
    embeds = llama.embed(params, jnp.asarray([[5, 6, 7]]))
    tokens, hiddens, n = llama.greedy_generate(
        params, CFG, embeds, prompt_len=3, max_new_tokens=8,
        eos_token_ids=tuple(range(CFG.vocab_size)))  # everything is EOS
    assert int(n) == 1  # stops right after the first emitted token
