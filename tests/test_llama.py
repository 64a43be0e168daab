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


def test_batched_generate_per_sample_eos(params):
    """A row hitting EOS must not stop other rows (per-sample done flags);
    its tail pads with the eos id while the others keep decoding."""
    ids = jnp.asarray([[5, 6, 7], [9, 10, 11]])
    embeds = llama.embed(params, ids)
    # no eos: both rows run to the cap — reference per-row tokens
    free, _, n_free = llama.greedy_generate(
        params, CFG, embeds, prompt_len=3, max_new_tokens=6,
        eos_token_ids=(99999,))
    assert int(n_free) == 6
    # make row 0's FIRST emitted token the eos; row 1 must be unaffected
    eos_tok = int(np.asarray(free[0, 0]))
    if eos_tok == int(np.asarray(free[1, 0])):
        eos_tok = int(np.asarray(free[0, 1]))  # pick a later row-0 token
    capped, _, _ = llama.greedy_generate(
        params, CFG, embeds, prompt_len=3, max_new_tokens=6,
        eos_token_ids=(eos_tok,))
    row0 = np.asarray(capped[0])
    stop = int(np.flatnonzero(row0 == eos_tok)[0])
    # after its eos, row 0 emits only padding (the eos id)
    assert (row0[stop:] == eos_tok).all()
    # row 1 decodes exactly as in the unconstrained run up to ITS own eos
    row1_free = np.asarray(free[1])
    row1 = np.asarray(capped[1])
    own_stop = np.flatnonzero(row1_free == eos_tok)
    k = int(own_stop[0]) + 1 if len(own_stop) else 6
    np.testing.assert_array_equal(row1[:k], row1_free[:k])


def test_stop_sequence_halts_decode(params):
    """In-graph KeywordsStoppingCriteria parity (mm_utils.py:215-247): once
    the trailing emitted tokens match a stop sequence, decoding halts early
    instead of burning the full max_new_tokens budget. The keyword tokens
    stay in the output (callers trim, as the reference does)."""
    ids = jnp.asarray([[5, 6, 7]])
    embeds = llama.embed(params, ids)
    free, _, n_free = llama.greedy_generate(
        params, CFG, embeds, prompt_len=3, max_new_tokens=8,
        eos_token_ids=(99999,))
    assert int(n_free) == 8
    row = [int(t) for t in np.asarray(free[0])]

    # single-token stop at position 2
    toks, _, n = llama.greedy_generate(
        params, CFG, embeds, prompt_len=3, max_new_tokens=8,
        eos_token_ids=(99999,), stop_sequences=((row[2],),))
    first = row.index(row[2])
    assert int(n) == first + 1
    np.testing.assert_array_equal(np.asarray(toks)[0, :int(n)],
                                  row[:int(n)])

    # two-token stop covering positions 1-2 (or its earliest occurrence —
    # toy greedy rows can repeat tokens)
    pair = (row[1], row[2])
    toks2, _, n2 = llama.greedy_generate(
        params, CFG, embeds, prompt_len=3, max_new_tokens=8,
        eos_token_ids=(99999,), stop_sequences=(pair,))
    first2 = next(j for j in range(1, 8)
                  if (row[j - 1], row[j]) == pair)
    assert int(n2) == first2 + 1
    np.testing.assert_array_equal(np.asarray(toks2)[0, :int(n2)],
                                  row[:int(n2)])

    # a never-matching sequence must not stop anything
    toks3, _, n3 = llama.greedy_generate(
        params, CFG, embeds, prompt_len=3, max_new_tokens=8,
        eos_token_ids=(99999,), stop_sequences=((123, 124, 125),))
    assert int(n3) == 8
    np.testing.assert_array_equal(np.asarray(toks3), np.asarray(free))


def test_mistral_sliding_window_masks_old_keys():
    """Sliding-window attention (llava_mistral.py wrapper parity): scores
    for keys older than `window` are masked; prefill+decode agrees with the
    uncached forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_llava_seg_tpu.config import LlamaConfig
    from video_llava_seg_tpu.models import llama
    from video_llava_seg_tpu.ops.attention import attention_reference

    # direct mask check
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 2, 8, 16), jnp.float32)
    out_w = attention_reference(q, q, q, causal=True, window=3)
    # brute force
    s = jnp.einsum("bhqd,bhkd->bhqk", q, q) / 4.0
    qi = jnp.arange(8)[:, None]
    ki = jnp.arange(8)[None, :]
    ok = (ki <= qi) & (ki > qi - 3)
    s = jnp.where(ok[None, None], s, -1e30)
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), q)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(want),
                               atol=1e-5)

    cfg = dataclasses.replace(LlamaConfig.tiny(), sliding_window=4)
    params = llama.init(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 10, cfg.hidden_size))
    pos = jnp.arange(10)
    logits_full, _ = llama.forward(params, cfg, x, pos)
    cache = llama.init_kv_cache(cfg, 1, 16, jnp.float32)
    logits_pre, _, cache = llama.prefill(params, cfg, x[:, :9], pos[:9],
                                         cache)
    logits_dec, _, _ = llama.decode_step(params, cfg, x[:, 9:10], cache)
    np.testing.assert_allclose(np.asarray(logits_dec[0, 0]),
                               np.asarray(logits_full[0, 9]), atol=2e-3)


def test_mpt_shape_alibi_layernorm_gelu():
    """MPT-shaped decoder (llava_mpt.py wrapper parity): ALiBi + LayerNorm +
    plain-GELU MLP + tied embeddings; cached decode matches forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_llava_seg_tpu.config import LlamaConfig
    from video_llava_seg_tpu.models import llama
    from video_llava_seg_tpu.ops.attention import alibi_slopes

    sl = alibi_slopes(8)
    assert sl.shape == (8,)
    np.testing.assert_allclose(sl[0], 0.5)
    assert np.all(np.diff(sl) < 0)

    cfg = dataclasses.replace(
        LlamaConfig.tiny(), use_rope=False, use_alibi=True,
        norm_type="layernorm", mlp_type="gelu", tie_word_embeddings=True,
        num_kv_heads=4)
    params = llama.init(jax.random.PRNGKey(1), cfg)
    assert "lm_head" not in params
    assert "w_gate" not in params["layers"][0]["mlp"]
    assert "bias" in params["layers"][0]["input_layernorm"]

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 7, cfg.hidden_size))
    pos = jnp.arange(7)
    logits_full, _ = llama.forward(params, cfg, x, pos)
    cache = llama.init_kv_cache(cfg, 1, 12, jnp.float32)
    _, _, cache = llama.prefill(params, cfg, x[:, :6], pos[:6], cache)
    logits_dec, _, _ = llama.decode_step(params, cfg, x[:, 6:7], cache)
    np.testing.assert_allclose(np.asarray(logits_dec[0, 0]),
                               np.asarray(logits_full[0, 6]), atol=2e-3)


def test_batched_rows_match_single(params):
    """Batched serving foundation (bench config 7): rows of an equal-
    length batch must decode exactly as they do alone — the batch only
    amortizes the weight stream, it must not couple rows."""
    ids = jnp.asarray([[5, 6, 7, 8], [9, 10, 11, 12]])
    batched, _, _ = llama.greedy_generate(
        params, CFG, llama.embed(params, ids), prompt_len=4,
        max_new_tokens=5, eos_token_ids=(99999,))
    for r in range(2):
        solo, _, _ = llama.greedy_generate(
            params, CFG, llama.embed(params, ids[r:r + 1]), prompt_len=4,
            max_new_tokens=5, eos_token_ids=(99999,))
        np.testing.assert_array_equal(np.asarray(batched[r]),
                                      np.asarray(solo[0]))


def test_ragged_left_pad_matches_single(params):
    """Ragged batched serving: left-padded rows (pad_lens) must decode as
    their unpadded single runs. RoPE keeps slot indices as positions —
    valid because only position differences enter the scores — and pad
    keys are masked in both prefill and decode."""
    short = jnp.asarray([[5, 6, 7, 8, 9]])          # len 5
    long = jnp.asarray([[9, 10, 11, 12, 13, 14, 15, 16]])  # len 8
    pad = 8 - 5
    padded_short = jnp.concatenate(
        [jnp.zeros((1, pad), short.dtype), short], axis=1)
    batch = jnp.concatenate([padded_short, long], axis=0)
    toks, hidden, _ = llama.greedy_generate(
        params, CFG, llama.embed(params, batch), prompt_len=8,
        max_new_tokens=4, eos_token_ids=(99999,),
        pad_lens=jnp.asarray([pad, 0], jnp.int32))
    for r, row_ids in enumerate((short, long)):
        solo, solo_h, _ = llama.greedy_generate(
            params, CFG, llama.embed(params, row_ids),
            prompt_len=row_ids.shape[1], max_new_tokens=4,
            eos_token_ids=(99999,))
        np.testing.assert_array_equal(np.asarray(toks[r]),
                                      np.asarray(solo[0]))
        np.testing.assert_allclose(np.asarray(hidden[r]),
                                   np.asarray(solo_h[0]), atol=2e-4,
                                   rtol=2e-4)


def test_stacked_scan_layers_match_list(params):
    """stack_layers: the lax.scan-over-layers layout (32x smaller HLO for
    full-depth serving programs — bench config 7's batch>1 generate
    crashed the remote compile helper with unrolled layers) must match the
    per-layer list layout: forward, prefill+decode (via greedy_generate),
    and the int8-KV decode path."""
    import dataclasses

    stacked = llama.stack_layers(params)
    assert isinstance(stacked["layers"], dict)
    ids = jnp.asarray([[5, 6, 7, 8, 9, 10]])
    embeds = llama.embed(params, ids)
    logits_l, hid_l = llama.forward(params, CFG, embeds, jnp.arange(6))
    logits_s, hid_s = llama.forward(stacked, CFG, embeds, jnp.arange(6))
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_l),
                               atol=1e-5, rtol=1e-5)
    toks_l, hid_l, n_l = llama.greedy_generate(
        params, CFG, embeds, prompt_len=6, max_new_tokens=5,
        eos_token_ids=(99999,))
    toks_s, hid_s, n_s = llama.greedy_generate(
        stacked, CFG, embeds, prompt_len=6, max_new_tokens=5,
        eos_token_ids=(99999,))
    np.testing.assert_array_equal(np.asarray(toks_s), np.asarray(toks_l))
    np.testing.assert_allclose(np.asarray(hid_s), np.asarray(hid_l),
                               atol=1e-4, rtol=1e-4)
    # int8 KV cache through the scanned decode
    cfg8 = dataclasses.replace(CFG, kv_cache_int8=True)
    t8_l, _, _ = llama.greedy_generate(params, cfg8, embeds, prompt_len=6,
                                       max_new_tokens=5,
                                       eos_token_ids=(99999,))
    t8_s, _, _ = llama.greedy_generate(stacked, cfg8, embeds, prompt_len=6,
                                       max_new_tokens=5,
                                       eos_token_ids=(99999,))
    np.testing.assert_array_equal(np.asarray(t8_s), np.asarray(t8_l))


@pytest.mark.parametrize("quant", ["w4a8", "int8", "w8a8", "bf16"])
def test_fused_qkv_gateup_matches_unfused(params, quant):
    """fuse_qkv_gateup: the single-chip serving layout (wqkv / w_gateup
    concat denses — 7 -> 4 dispatches per decoded token) must reproduce
    the unfused tree EXACTLY. Per-output-channel scales and per-row
    activation scales make every dense column-independent; the int8-DOT
    paths (W4A8/W8A8, exact int32 accumulation) are bitwise identical,
    while bf16-compute paths (weight-only int8, bf16) are checked tight
    (XLA may re-block the wider fused dot's f32 accumulation)."""
    import dataclasses

    from video_llava_seg_tpu.ops.quantization import quantize_tree

    if quant == "w4a8":
        base = quantize_tree(params, bits=4, min_size=0, act_quant=True)
    elif quant == "w8a8":
        base = quantize_tree(params, bits=8, min_size=0, act_quant=True)
    elif quant == "int8":
        base = quantize_tree(params, bits=8, min_size=0)
    else:
        base = params
    fused = llama.fuse_qkv_gateup(base)
    attn = fused["layers"][0]["attn"]
    assert "wqkv" in attn and "wq" not in attn
    assert "w_gateup" in fused["layers"][0]["mlp"]

    cfg = dataclasses.replace(CFG, kv_cache_int8=(quant != "bf16"))
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    embeds = llama.embed(base, ids)
    toks_u, hid_u, n_u = llama.greedy_generate(
        base, cfg, embeds, prompt_len=8, max_new_tokens=6,
        eos_token_ids=(99999,))
    toks_f, hid_f, n_f = llama.greedy_generate(
        fused, cfg, embeds, prompt_len=8, max_new_tokens=6,
        eos_token_ids=(99999,))
    np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_u))
    if quant in ("w4a8", "w8a8"):
        np.testing.assert_array_equal(np.asarray(hid_f),
                                      np.asarray(hid_u))
    else:
        np.testing.assert_allclose(np.asarray(hid_f), np.asarray(hid_u),
                                   atol=1e-4, rtol=1e-4)
    # forward (prefill-shaped) path too
    lo_u, _ = llama.forward(base, cfg, embeds, jnp.arange(8))
    lo_f, _ = llama.forward(fused, cfg, embeds, jnp.arange(8))
    np.testing.assert_allclose(np.asarray(lo_f), np.asarray(lo_u),
                               atol=1e-4, rtol=1e-4)


def test_fused_qkv_gateup_stacked_layout(params):
    """Fusion composes with stack_layers (axis=-1 concat on [L, ...])."""
    from video_llava_seg_tpu.ops.quantization import quantize_tree

    base = quantize_tree(params, bits=8, min_size=0)
    fused_then_stacked = llama.stack_layers(llama.fuse_qkv_gateup(base))
    stacked_then_fused = llama.fuse_qkv_gateup(llama.stack_layers(base))
    a = fused_then_stacked["layers"]["attn"]["wqkv"]["kernel_q"]
    b = stacked_then_fused["layers"]["attn"]["wqkv"]["kernel_q"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ids = jnp.asarray([[7, 8, 9, 10]])
    embeds = llama.embed(base, ids)
    t1, _, _ = llama.greedy_generate(fused_then_stacked, CFG, embeds,
                                     prompt_len=4, max_new_tokens=4,
                                     eos_token_ids=(99999,))
    t2, _, _ = llama.greedy_generate(stacked_then_fused, CFG, embeds,
                                     prompt_len=4, max_new_tokens=4,
                                     eos_token_ids=(99999,))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_sampled_generate_top_p_zero_matches_greedy(params):
    """temperature > 0 with a vanishing nucleus keeps ONLY the argmax
    token (HF TopPLogitsWarper keeps at least one), so sampling must
    reproduce greedy decoding token-for-token — an exact end-to-end check
    of the filtering/threshold math in llama._select_token (reference
    sampling gate: inference/main.py:124-138)."""
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    embeds = llama.embed(params, ids)
    greedy, _, _ = llama.greedy_generate(params, CFG, embeds, prompt_len=8,
                                         max_new_tokens=6,
                                         eos_token_ids=(99999,))
    sampled, _, _ = llama.greedy_generate(
        params, CFG, embeds, prompt_len=8, max_new_tokens=6,
        eos_token_ids=(99999,), temperature=0.7, top_p=1e-9,
        rng=jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(sampled), np.asarray(greedy))


def test_sampled_generate_deterministic_per_key_and_varies(params):
    """A fixed rng reproduces the same sampled tokens; sampling at high
    temperature with full nucleus differs across keys (soundness that the
    key is actually folded per step). Also: temperature > 0 without an
    rng raises."""
    ids = jnp.asarray([[7, 8, 9, 10, 11, 12, 13, 14]])
    embeds = llama.embed(params, ids)

    def run(seed):
        t, _, _ = llama.greedy_generate(
            params, CFG, embeds, prompt_len=8, max_new_tokens=12,
            eos_token_ids=(99999,), temperature=5.0, top_p=None,
            rng=jax.random.PRNGKey(seed))
        return np.asarray(t)

    a1, a2 = run(0), run(0)
    np.testing.assert_array_equal(a1, a2)
    outs = [run(s) for s in range(1, 6)]
    assert any(not np.array_equal(a1, o) for o in outs), \
        "high-temperature samples never varied across 5 keys"
    with pytest.raises(ValueError):
        llama.greedy_generate(params, CFG, embeds, prompt_len=8,
                              max_new_tokens=2, eos_token_ids=(99999,),
                              temperature=1.0)


def test_select_token_top_p_nucleus_mass():
    """Unit check of the nucleus filter: with top_p = 0.5 over a known
    distribution, only the smallest head set whose cumulative mass
    reaches 0.5 (crossing token included) can ever be sampled."""
    probs = np.asarray([[0.4, 0.3, 0.2, 0.1]])
    logits = jnp.asarray(np.log(probs))
    seen = set()
    for s in range(200):
        tok = llama._select_token(logits, 1.0, 0.5,
                                  jax.random.PRNGKey(s))
        seen.add(int(np.asarray(tok)[0]))
    # mass before idx0 = 0 < .5 (kept), before idx1 = .4 < .5 (kept,
    # crossing), before idx2 = .7 >= .5 (cut)
    assert seen <= {0, 1}, seen
    assert seen == {0, 1}, "crossing token never sampled in 200 draws"


def test_beam_width_1_matches_greedy(params):
    """num_beams=1 must reduce exactly to greedy decoding (same tokens,
    same captured hidden states) — log_softmax is monotonic in the
    logits, so the single beam follows the argmax path."""
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    embeds = llama.embed(params, ids)
    tg, hg, ng = llama.greedy_generate(params, CFG, embeds, prompt_len=8,
                                       max_new_tokens=6,
                                       eos_token_ids=(99999,))
    tb, hb, nb = llama.beam_generate(params, CFG, embeds, prompt_len=8,
                                     max_new_tokens=6,
                                     eos_token_ids=(99999,), num_beams=1)
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tg))
    np.testing.assert_allclose(np.asarray(hb, np.float32),
                               np.asarray(hg, np.float32),
                               atol=1e-5, rtol=1e-5)
    assert int(nb) == int(ng)


def test_beam_exact_two_step_optimum(params):
    """With beam width = vocab size, a 2-step beam search is EXHAUSTIVE:
    it must return the globally best 2-token continuation, which this
    test computes independently (prefill distribution + one batched
    decode over every possible first token)."""
    v = CFG.vocab_size
    ids = jnp.asarray([[5, 6, 7, 8]])
    embeds = llama.embed(params, ids)

    cache = llama.init_kv_cache(CFG, 1, 6, dtype=embeds.dtype)
    logits, _, cache = llama.prefill(params, CFG, embeds,
                                     jnp.arange(4)[None], cache,
                                     last_logit_only=True)
    logp0 = np.asarray(jax.nn.log_softmax(
        logits[0, -1].astype(jnp.float32)))
    # batch all v candidate first tokens through one decode step
    cache_v = llama.KVCache(
        jnp.repeat(cache.k, v, axis=1), jnp.repeat(cache.v, v, axis=1),
        cache.length,
        None if cache.k_scale is None else jnp.repeat(cache.k_scale, v,
                                                      axis=1),
        None if cache.v_scale is None else jnp.repeat(cache.v_scale, v,
                                                      axis=1))
    emb1 = llama.embed(params, jnp.arange(v, dtype=jnp.int32)[:, None])
    logits1, _, _ = llama.decode_step(params, CFG,
                                      emb1.astype(embeds.dtype), cache_v)
    logp1 = np.asarray(jax.nn.log_softmax(
        logits1[:, -1].astype(jnp.float32)))          # [v, v]
    total = logp0[:, None] + logp1
    flat = int(np.argmax(total))
    expect = (flat // v, flat % v)

    toks, _, _ = llama.beam_generate(params, CFG, embeds, prompt_len=4,
                                     max_new_tokens=2,
                                     eos_token_ids=(99999,), num_beams=v)
    got = tuple(int(x) for x in np.asarray(toks)[0])
    assert got == expect, (got, expect, float(total[expect]),
                           float(total[got]))


def test_beam_score_at_least_greedy(params):
    """A width-4 beam's winning sequence must score (teacher-forced sum
    logprob) at least as high as the greedy sequence."""
    ids = jnp.asarray([[9, 8, 7, 6, 5, 4]])
    embeds = llama.embed(params, ids)

    def seq_score(toks):
        toks = np.asarray(toks)[0]
        full = jnp.concatenate(
            [embeds, llama.embed(params, toks[None])], axis=1)
        logits, _ = llama.forward(params, CFG, full,
                                  jnp.arange(full.shape[1]))
        lp = np.asarray(jax.nn.log_softmax(
            logits[0].astype(jnp.float32)))
        # position s-1+j predicts emitted token j
        return sum(lp[embeds.shape[1] - 1 + j, t]
                   for j, t in enumerate(toks))

    tg, _, _ = llama.greedy_generate(params, CFG, embeds, prompt_len=6,
                                     max_new_tokens=5,
                                     eos_token_ids=(99999,))
    tb, _, _ = llama.beam_generate(params, CFG, embeds, prompt_len=6,
                                   max_new_tokens=5,
                                   eos_token_ids=(99999,), num_beams=4)
    assert seq_score(tb) >= seq_score(tg) - 1e-4


def _hf_tiny_pair(seed=0):
    """Tiny HF LlamaForCausalLM + the converted framework params."""
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    hf = LlamaForCausalLM(HFConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads, head_dim=CFG.head_dim,
        rms_norm_eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        max_position_embeddings=CFG.max_seq_len, attention_bias=False,
        tie_word_embeddings=False)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    return hf, convert_llama(sd, CFG)


@pytest.mark.parametrize("num_beams,with_eos", [(3, False), (3, True),
                                                (4, True)])
def test_beam_matches_hf_generate(num_beams, with_eos):
    """beam_generate mirrors transformers' vectorized _beam_search step
    for step (generation/utils.py) — this pins it against the REAL HF
    generate on the same tiny weights: identical winning token sequence.
    Closes the round-3 divergence where finished beams stayed in the live
    set instead of moving to HF's finished-hypothesis pool."""
    import torch

    hf, params = _hf_tiny_pair(seed=17)
    ids = np.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    max_new = 10

    eos_ids = ()
    if with_eos:
        # pick a token the unconstrained beam emits mid-sequence so the
        # eos path (finished-pool insertion + early-stop heuristic) fires
        with torch.no_grad():
            free = hf.generate(torch.from_numpy(ids), max_new_tokens=max_new,
                               num_beams=num_beams, do_sample=False,
                               early_stopping=False, length_penalty=1.0,
                               pad_token_id=0)
        eos_ids = (int(free[0, ids.shape[1] + 2]),)

    with torch.no_grad():
        out = hf.generate(torch.from_numpy(ids), max_new_tokens=max_new,
                          num_beams=num_beams, do_sample=False,
                          early_stopping=False, length_penalty=1.0,
                          pad_token_id=0,
                          eos_token_id=list(eos_ids) or None)
    want = out[0, ids.shape[1]:].numpy()

    embeds = llama.embed(params, jnp.asarray(ids))
    toks, _, n = llama.beam_generate(
        params, CFG, embeds, prompt_len=ids.shape[1],
        max_new_tokens=max_new, eos_token_ids=eos_ids, num_beams=num_beams)
    got = np.asarray(toks)[0, :int(n)]
    np.testing.assert_array_equal(got, want, err_msg=f"hf={want} got={got}")


def test_beam_hf_parity_longer_hypothesis_displaces(monkeypatch):
    """Regression for the specific round-3 divergence: a finished
    hypothesis must sit in the pool while live beams keep expanding and
    may finish LATER with a better length-penalized score. Run several
    seeds so at least some exercise displacement."""
    import torch

    for seed in (1, 2, 5):
        hf, params = _hf_tiny_pair(seed=seed)
        ids = np.asarray([[7, 7, 2, 9]])
        with torch.no_grad():
            free = hf.generate(torch.from_numpy(ids), max_new_tokens=12,
                               num_beams=4, do_sample=False,
                               early_stopping=False, length_penalty=1.0,
                               pad_token_id=0)
        eos = int(free[0, ids.shape[1] + 1])
        with torch.no_grad():
            out = hf.generate(torch.from_numpy(ids), max_new_tokens=12,
                              num_beams=4, do_sample=False,
                              early_stopping=False, length_penalty=1.0,
                              pad_token_id=0, eos_token_id=eos)
        want = out[0, ids.shape[1]:].numpy()
        embeds = llama.embed(params, jnp.asarray(ids))
        toks, _, n = llama.beam_generate(
            params, CFG, embeds, prompt_len=ids.shape[1],
            max_new_tokens=12, eos_token_ids=(eos,), num_beams=4)
        got = np.asarray(toks)[0, :int(n)]
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"seed {seed}")
