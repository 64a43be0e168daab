"""Multimodal meta-arch: splice plan, slow/fast pooling, e2e generate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import VideoLlavaConfig
from video_llava_seg_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from video_llava_seg_tpu.models import llava

CFG = VideoLlavaConfig.tiny()
# tiny: vision 56/14 -> 16 patches/frame; 4 frames, 2 slow, fast 2x2=4 tokens


@pytest.fixture(scope="module")
def params():
    return llava.init(jax.random.PRNGKey(0), CFG)


def test_visual_token_layout():
    tpi = llava.visual_tokens_per_sample(CFG)
    assert tpi == [16, 16, 4, 4, 4, 4]  # 2 slow x 16 + 4 fast x 4


def test_splice_plan_semantics():
    tpi = [3, 2]
    ids = np.array([[7, IMAGE_TOKEN_INDEX, 8, 9, IMAGE_TOKEN_INDEX, 10]])
    labels = np.array([[7, IGNORE_INDEX, 8, 9, IGNORE_INDEX, 10]])
    plan = llava.build_splice_plan(ids, tpi, labels)
    # final: [7][v0 v1 v2][8][9][v3 v4][10] -> len 9
    assert plan.seq_lens[0] == 9
    np.testing.assert_array_equal(
        plan.is_visual[0], [0, 1, 1, 1, 0, 0, 1, 1, 0])
    # gather indices: text j -> j; visual k -> S + k
    s = ids.shape[1]
    np.testing.assert_array_equal(
        plan.gather_idx[0],
        [0, s + 0, s + 1, s + 2, 2, 3, s + 3, s + 4, 5])
    np.testing.assert_array_equal(
        plan.labels[0],
        [7, IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 8, 9, IGNORE_INDEX,
         IGNORE_INDEX, 10])


def test_splice_plan_truncation_and_padding():
    tpi = [4]
    ids = np.array([[1, IMAGE_TOKEN_INDEX, 2, 3],
                    [4, IMAGE_TOKEN_INDEX, 0, 0]])
    plan = llava.build_splice_plan(ids, tpi, max_length=6)
    assert plan.gather_idx.shape == (2, 6)
    assert plan.seq_lens.tolist() == [6, 6]  # truncated from 7
    assert plan.attn_mask.all()


def test_assemble_embeds_gather(params):
    tpi = [2]
    ids = np.array([[5, IMAGE_TOKEN_INDEX, 6]])
    plan = llava.build_splice_plan(ids, tpi)
    visual = jnp.arange(2 * CFG.llm.hidden_size, dtype=jnp.float32).reshape(
        1, 2, CFG.llm.hidden_size)
    out = llava.assemble_embeds(params, jnp.asarray(plan.text_ids),
                                jnp.asarray(plan.gather_idx), visual)
    assert out.shape == (1, 4, CFG.llm.hidden_size)
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(visual[0, 0]))
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(visual[0, 1]))
    from video_llava_seg_tpu.models import llama
    emb5 = llama.embed(params["llm"], jnp.asarray([[5]]))[0, 0]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(emb5))


def test_slow_fast_pooling_matches_torch(params):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    video = jax.random.normal(jax.random.PRNGKey(1),
                              (1, CFG.num_frames, CFG.vision.image_size,
                               CFG.vision.image_size, 3))
    slow, fast = llava.encode_video(params, CFG, video)
    assert slow.shape == (1, 2, 16, CFG.llm.hidden_size)
    assert fast.shape == (1, 4, 4, CFG.llm.hidden_size)

    # reproduce fast pooling from the projector output in torch
    from video_llava_seg_tpu.models import projector, vit
    feats = vit.apply(params["vision_tower"], CFG.vision, video)
    feats = projector.apply(params["mm_projector"], feats)
    ref = torch.from_numpy(np.asarray(feats, np.float32))
    b, t, n, c = ref.shape
    side = int(np.sqrt(n))
    ref = ref.reshape(b * t, side, side, c).permute(0, 3, 1, 2)
    ref = F.adaptive_avg_pool2d(ref, (2, 2))
    ref = ref.permute(0, 2, 3, 1).reshape(b, t, 4, c)
    np.testing.assert_allclose(np.asarray(fast, np.float32), ref.numpy(),
                               atol=1e-5, rtol=1e-5)
    # slow frame selection: linspace over frames
    np.testing.assert_allclose(np.asarray(slow[0, 0], np.float32),
                               np.asarray(feats[0, 0], np.float32))
    np.testing.assert_allclose(np.asarray(slow[0, 1], np.float32),
                               np.asarray(feats[0, 3], np.float32))


def test_generate_end_to_end(params):
    tpi = llava.visual_tokens_per_sample(CFG)
    n_img = len(tpi)
    ids = np.concatenate([
        np.asarray([[1, 2]]),
        np.full((1, n_img), IMAGE_TOKEN_INDEX),
        np.asarray([[3, 4]]),
    ], axis=1)
    video = np.random.RandomState(0).rand(
        1, CFG.num_frames, CFG.vision.image_size, CFG.vision.image_size,
        3).astype(np.float32)
    tokens, hidden, n = llava.generate(params, CFG, ids, video,
                                       max_new_tokens=5,
                                       eos_token_ids=(99999,))
    assert tokens.shape == (1, 5)
    assert hidden.shape == (1, 5, CFG.llm.hidden_size)
    assert int(n) == 5
    # hidden/token alignment invariant
    from video_llava_seg_tpu.models import llama
    logits = llama.unembed(params["llm"], CFG.llm, hidden)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)[0]),
                                  np.asarray(tokens[0]))


def test_extract_seg_hidden():
    tokens = np.asarray([[3, 99, 5, 99, 7]])
    hidden = np.arange(5 * 4, dtype=np.float32).reshape(1, 5, 4)
    out = llava.extract_seg_hidden(tokens, hidden, seg_token_idx=99,
                                   n_generated=5)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[0], hidden[0, 1])
    np.testing.assert_allclose(out[1], hidden[0, 3])


def test_generate_ragged_left_pad_batch(params):
    """Batch-native serving (bench config 7): two prompts of different
    lengths batched with pad_side='left' must produce the same tokens as
    their individual unpadded runs (the reference cannot do this at all —
    batch 1 is hard-asserted at llava_llama.py:313)."""
    tpi = llava.visual_tokens_per_sample(CFG)
    n_img = len(tpi)
    rng = np.random.RandomState(0)
    video = rng.rand(2, CFG.num_frames, CFG.vision.image_size,
                     CFG.vision.image_size, 3).astype(np.float32)
    row_a = np.concatenate([[[1, 2]], np.full((1, n_img), IMAGE_TOKEN_INDEX),
                            [[3, 4]]], axis=1)              # short
    row_b = np.concatenate([[[5, 6, 7]], np.full((1, n_img),
                                                 IMAGE_TOKEN_INDEX),
                            [[8, 9, 10]]], axis=1)          # longer
    # collator-style ragged batch: right-pad row A's ids to a common S and
    # mark real lengths with input_lens; pad_side='left' then left-aligns
    # each row's spliced content so its last real token sits at L-1
    s = row_b.shape[1]
    ids = np.zeros((2, s), row_b.dtype)
    ids[0, :row_a.shape[1]] = row_a[0]
    ids[1] = row_b[0]
    lens = np.asarray([row_a.shape[1], row_b.shape[1]])
    toks_b, _, _ = llava.generate(params, CFG, ids, video, max_new_tokens=4,
                                  eos_token_ids=(99999,), pad_side="left",
                                  input_lens=lens)
    for r, row in enumerate((row_a, row_b)):
        solo, _, _ = llava.generate(params, CFG, row, video[r:r + 1],
                                    max_new_tokens=4, eos_token_ids=(99999,))
        np.testing.assert_array_equal(np.asarray(toks_b[r]),
                                      np.asarray(solo[0]))


def test_dp_encode_8way_matches_single_device(params, mesh8):
    """Data-parallel vision encode over the 8-device mesh — the executable
    basis for the pod-level north-star argument (BASELINE >=2000 f/s is a
    v5e-8 number: 8 chips x per-chip rate via DP dispatch; BENCH_NOTES
    'Vision encode'). Params replicate, clips shard on 'data'; per-clip
    outputs must match the single-device encode exactly (no cross-sample
    reduction exists in the tower, so sharding cannot change the math)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    b = 8
    video = jax.random.uniform(
        jax.random.PRNGKey(4),
        (b, CFG.num_frames, CFG.vision.image_size, CFG.vision.image_size, 3))

    def enc(p, v):
        slow, fast = llava.encode_video(p, CFG, v)
        return llava.flatten_visual_features(slow, fast)

    ref = jax.jit(enc)(params, video)

    p_repl = jax.device_put(params, NamedSharding(mesh8, P()))
    v_sh = jax.device_put(video,
                          NamedSharding(mesh8, P("data", None, None, None,
                                                 None)))
    with mesh8:
        out = jax.jit(enc)(p_repl, v_sh)
    # the output must actually be data-sharded (one clip per device pair),
    # not silently all-gathered to replication
    assert "data" in str(out.sharding.spec), out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
