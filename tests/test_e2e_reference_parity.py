"""END-TO-END composition oracle vs the reference's ACTUAL llava modules.

Every module already has its own parity test (SAM2 stack, HF CLIP, HF
Llama, preprocessing vs the reference's conversation.py). What no module
test can catch is a *composition* off-by-one — the places where the
reference wires modules together:

- the multimodal splice (llava/model/llava_arch.py:210-426): per-sample
  python loop interleaving text embeds and visual features at
  IMAGE_TOKEN_INDEX sentinels, right-padded with IGNORE labels;
- the [SEG] gather at labels==seg_token_idx shifted by -1 to align labels
  with the hidden states that PRODUCE them
  (llava/model/language_model/llava_llama.py:232-249);
- generate's hidden-state concatenation offset (`inputs_embeds.shape[1]-1`,
  llava_llama.py:184-190) aligning each emitted token with the hidden
  state that emitted it;
- the batch-global mask-loss normalization (mask_loss.py:43-57).

Here the reference's real LlavaLlamaForCausalLM is instantiated at tiny
shape (random weights, CPU, hub-free: tower/projector/seg head attached
manually), its weights converted through the framework's converters, and
the SAME inputs run through both pipelines:

- train path: forward(input_ids, labels, images, seg_*) -> loss_text,
  loss_mask{,_dice,_ce}, mask_ious, num_object_tracks all match;
- splice: prepare_inputs_labels_for_multimodal's embeds/labels match the
  splice-plan + one-gather assembly exactly;
- generate path: greedy token ids are identical and the seg head's
  pred_mask_logits match, including the no-[SEG]-token index-0 fallback
  (llava_llama.py:316-318).

transformers shim: the reference was written against HF ~4.37 where
generate(inputs_embeds=...) returned sequences with a leading dummy bos
(hence its `sequences[:, 1:]`); 4.57 returns generated tokens only. The
test restores the old contract by prepending a dummy token around the
inner GenerationMixin.generate call — reference code runs unmodified.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import load_reference_sam2  # noqa: E402

load_reference_sam2()

from tests.reference_builders import ref_seg_head  # noqa: E402

from video_llava_seg_tpu.config import (  # noqa: E402
    DataConfig,
    LlamaConfig,
    ProjectorConfig,
    SegHeadConfig,
    VideoLlavaConfig,
    VisionTowerConfig,
)
from video_llava_seg_tpu.constants import (  # noqa: E402
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
)
from video_llava_seg_tpu.data.collate import DataCollator  # noqa: E402
from video_llava_seg_tpu.models import llava  # noqa: E402
from video_llava_seg_tpu.models.sam2.config import (  # noqa: E402
    sam2_tiny_test_config,
)

SEG_ID = 500
TINY_SAM2 = sam2_tiny_test_config()

MY_CFG = VideoLlavaConfig(
    llm=LlamaConfig.tiny(vocab_size=512),
    vision=VisionTowerConfig(name="tiny-clip", image_size=112, patch_size=14,
                             hidden_size=64, intermediate_size=128,
                             num_layers=2, num_heads=2),
    projector=ProjectorConfig(mm_hidden_size=64, hidden_size=128),
    seg=SegHeadConfig(seg_backbone="sam2-test-tiny", seg_num_queries=1,
                      image_size=TINY_SAM2.image_size, max_seg_frames=2,
                      max_objects=2),
    num_frames=4, num_slow_frames=2,
    fast_pool_size=4,  # the reference hardcodes 4x4 (llava_arch.py:179)
    seg_token_idx=SEG_ID, tokenizer_model_max_length=512)

N_IMG = len(llava.visual_tokens_per_sample(MY_CFG))  # 2 slow + 4 fast = 6


def _build_ref_model():
    """The reference LlavaLlamaForCausalLM at tiny shape, hub-free.

    Construction mirrors train.py:362-478 + initialize_vision_modules but
    attaches hand-built tiny submodules instead of hub downloads; the
    *wiring* under test (llava_arch.py / llava_llama.py) is untouched."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from llava.model.language_model.llava_llama import (
        LlavaConfig as RefLlavaConfig,
        LlavaLlamaForCausalLM,
    )
    from llava.model.multimodal_encoder.clip_encoder import CLIPVisionTower
    from llava.model.multimodal_projector.builder import (
        build_vision_projector,
    )
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    L = MY_CFG.llm
    cfg = RefLlavaConfig(
        vocab_size=L.vocab_size, hidden_size=L.hidden_size,
        intermediate_size=L.intermediate_size, num_hidden_layers=L.num_layers,
        num_attention_heads=L.num_heads, num_key_value_heads=L.num_kv_heads,
        head_dim=L.head_dim, rms_norm_eps=L.rms_norm_eps,
        rope_theta=L.rope_theta, max_position_embeddings=L.max_seq_len,
        attention_bias=False, tie_word_embeddings=False,
        attn_implementation="eager")
    # no mm_vision_tower / seg_head on the config yet: LlavaMetaModel would
    # otherwise try to build them from the hub (llava_arch.py:48-58)
    model = LlavaLlamaForCausalLM(cfg)

    # vision tower: real CLIPVisionTower around a tiny random CLIPVisionModel
    V = MY_CFG.vision
    tower = CLIPVisionTower.__new__(CLIPVisionTower)
    torch.nn.Module.__init__(tower)
    tower.is_loaded = True
    tower.vision_tower_name = "tiny-clip"
    tower.select_layer = V.select_layer
    tower.select_feature = V.select_feature
    tower.train_vision_tower = False
    tower.image_size = V.image_size
    tower.num_frames = MY_CFG.num_frames
    tower.num_slow_frames = MY_CFG.num_slow_frames
    tower.vision_tower = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=V.hidden_size, intermediate_size=V.intermediate_size,
        num_hidden_layers=V.num_layers, num_attention_heads=V.num_heads,
        image_size=V.image_size, patch_size=V.patch_size))
    tower.vision_tower.requires_grad_(False)
    model.model.vision_tower = tower

    cfg.mm_hidden_size = V.hidden_size
    cfg.mm_projector_type = MY_CFG.projector.projector_type
    cfg.use_mm_proj = True
    cfg.mm_vision_select_layer = V.select_layer
    cfg.mm_vision_select_feature = V.select_feature
    model.model.mm_projector = build_vision_projector(cfg)

    model.model.seg_head = ref_seg_head(MY_CFG.seg, TINY_SAM2,
                                        llm_dim=L.hidden_size)

    cfg.video_mode = True
    cfg.num_frames = MY_CFG.num_frames
    cfg.num_slow_frames = MY_CFG.num_slow_frames
    cfg.tokenizer_model_max_length = MY_CFG.tokenizer_model_max_length
    cfg.tokenizer_padding_side = "right"
    cfg.seg_head = "sam2"
    cfg.seg_token_idx = SEG_ID
    model = model.eval().float()

    # transformers-4.57 shim: the generate loop now feeds cache_position /
    # logits_to_keep into model.forward; the reference's 4.37-era forward
    # signature (llava_llama.py:60-77) predates them. Instance-level
    # wrapper drops the new kwargs — reference logic untouched.
    import functools

    orig_fwd = model.forward

    @functools.wraps(orig_fwd)  # keep the signature generate() inspects
    def fwd(*a, **k):
        k.pop("cache_position", None)
        k.pop("logits_to_keep", None)
        return orig_fwd(*a, **k)

    model.forward = fwd
    return model


def _convert(ref_model):
    from video_llava_seg_tpu.convert.llava_torch import (
        convert_llava_state_dict,
    )

    sd = {k: v.detach().float().numpy()
          for k, v in ref_model.state_dict().items()}
    no_mem = ref_model.model.seg_head.no_mem_embed.detach().numpy()
    return convert_llava_state_dict(sd, MY_CFG, sam2_no_mem_embed=no_mem)


@pytest.fixture(scope="module")
def ref_model():
    return _build_ref_model()


@pytest.fixture(scope="module")
def params(ref_model):
    return _convert(ref_model)


# ---------------------------------------------------------------------------
# shared fixture data: a ragged batch of two caption+seg samples
# ---------------------------------------------------------------------------

def _sample_rows():
    """Two samples of different lengths, one [SEG]-labeled object each
    (N=1 avoids the Hungarian matcher's random point sampling, which is
    rng-scheme-dependent across frameworks; matcher parity is covered by
    tests/test_losses.py)."""
    img = [IMAGE_TOKEN_INDEX] * N_IMG
    row0_ids = [7, 8] + img + [9, 10, 11, 12, 13, SEG_ID, 14]
    row0_lab = ([IGNORE_INDEX] * (2 + N_IMG + 3)
                + [12, 13, SEG_ID, 14])
    row1_ids = [20, 21, 22] + img + [23, 24, SEG_ID]
    row1_lab = [IGNORE_INDEX] * (3 + N_IMG + 1) + [24, SEG_ID]
    return (np.asarray(row0_ids), np.asarray(row0_lab),
            np.asarray(row1_ids), np.asarray(row1_lab))


def _seg_fixture(seed, t, pad):
    """(frames [T,H,W,3] in [0,1], gt [1,T,h',w'] bool, meta) for one video
    with padding pad=(pl,pr,pt,pb) on the seg canvas."""
    rng = np.random.RandomState(seed)
    s = TINY_SAM2.image_size
    pl, pr, pt, pb = pad
    h, w = s - pt - pb, s - pl - pr
    frames = rng.rand(t, s, s, 3).astype(np.float32)
    yy, xx = np.mgrid[:h, :w]
    cy, cx, r = rng.randint(h // 4, 3 * h // 4), rng.randint(
        w // 4, 3 * w // 4), h // 4
    gt = ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r)[None, None]
    gt = np.repeat(gt, t, axis=1)
    meta = {"padding": (pl, pr, pt, pb), "resized_image_size": (h, w),
            "orig_image_size": (h - 7, w - 3)}
    return frames, gt, meta


def _batch_inputs():
    """Ragged on every axis the reference supports raggedness on: prompt
    lengths differ, seg frame counts differ (T=2 vs T=1 — unequal mask
    counts distinguish the reference's batch-global loss normalization from
    a per-sample mean), but the seg canvas padding is shared: the
    reference's mask loss torch.cat's all samples' unpadded masks
    (mask_loss.py:43) so it only supports same-resized-shape batches (its
    stage-3 recipe runs per-device batch 1)."""
    r0i, r0l, r1i, r1l = _sample_rows()
    rng = np.random.RandomState(3)
    video = rng.rand(2, MY_CFG.num_frames, MY_CFG.vision.image_size,
                     MY_CFG.vision.image_size, 3).astype(np.float32)
    f0, g0, m0 = _seg_fixture(11, 2, (0, 0, 8, 8))
    f1, g1, m1 = _seg_fixture(12, 1, (0, 0, 8, 8))
    return (r0i, r0l, r1i, r1l), video, [(f0, g0, m0), (f1, g1, m1)]


def _ref_batch(rows, video, segs):
    """Right-padded torch batch exactly as the reference collator builds it
    (llava/train/data_parsing.py:20-70)."""
    r0i, r0l, r1i, r1l = rows
    s = max(len(r0i), len(r1i))
    ids = np.zeros((2, s), np.int64)
    labels = np.full((2, s), IGNORE_INDEX, np.int64)
    attn = np.zeros((2, s), bool)
    for b, (ri, rl) in enumerate([(r0i, r0l), (r1i, r1l)]):
        ids[b, :len(ri)] = ri
        labels[b, :len(rl)] = rl
        attn[b, :len(ri)] = True
    images = torch.from_numpy(video.transpose(0, 1, 4, 2, 3))
    seg_frames = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f, _, _
                  in segs]
    # gt is [N=1, T, h', w'] bool at the unpadded resized size
    seg_masks = [torch.from_numpy(g) for _, g, _ in segs]
    seg_meta = [m for _, _, m in segs]
    return (torch.from_numpy(ids), torch.from_numpy(attn),
            torch.from_numpy(labels), images, seg_frames, seg_masks,
            seg_meta)


def _my_batch(rows, video, segs):
    r0i, r0l, r1i, r1l = rows
    instances = []
    for b, (ri, rl) in enumerate([(r0i, r0l), (r1i, r1l)]):
        f, g, m = segs[b]
        instances.append({
            "input_ids": ri, "labels": rl, "image": video[b],
            "seg_frames": f, "seg_masks": g,  # [N=1, T, h', w']
            "seg_meta": m,
        })
    coll = DataCollator(MY_CFG, DataConfig(num_frames=MY_CFG.num_frames,
                                           num_slow_frames=
                                           MY_CFG.num_slow_frames,
                                           max_seg_frames=2,
                                           seg_image_size=
                                           TINY_SAM2.image_size),
                        pad_token_id=0, seq_bucket=8)
    return coll(instances)


# ---------------------------------------------------------------------------
# 1. the splice itself: prepare_inputs_labels_for_multimodal vs splice plan
# ---------------------------------------------------------------------------

def test_splice_matches_reference(ref_model, params):
    rows, video, segs = _batch_inputs()
    ids_t, attn_t, labels_t, images_t, _, _, _ = _ref_batch(rows, video,
                                                            segs)
    with torch.no_grad():
        (_, _, ref_attn, _, ref_embeds, ref_labels, _, _) = \
            ref_model.prepare_inputs_labels_for_multimodal(
                ids_t, None, attn_t, None, labels_t, images_t, None, None)

    batch = _my_batch(rows, video, segs)
    slow, fast = llava.encode_video(params, MY_CFG, jnp.asarray(
        batch["video"]))
    visual = llava.flatten_visual_features(slow, fast)
    embeds = llava.assemble_embeds(params, jnp.asarray(batch["text_ids"]),
                                   jnp.asarray(batch["gather_idx"]), visual)

    ref_e = ref_embeds.numpy()
    ref_l = ref_labels.numpy()
    mask = ref_attn.numpy().astype(bool)
    my_e = np.asarray(embeds, np.float32)
    my_l = np.asarray(batch["labels"])
    assert my_e.shape[1] >= ref_e.shape[1]
    for b in range(2):
        n = int(mask[b].sum())
        # spliced embeddings: text rows through embed_tokens, visual rows
        # through tower+projector+slow/fast pooling — one fused gather here
        # vs the reference's python loop (llava_arch.py:327-369)
        np.testing.assert_allclose(my_e[b, :n], ref_e[b, :n], atol=2e-4,
                                   rtol=2e-4)
        np.testing.assert_array_equal(my_l[b, :n], ref_l[b, :n])
        # [SEG] positions in the spliced labels -1 == collator's
        # seg_token_pos (llava_llama.py:232-235 semantics)
        ref_pos = np.flatnonzero(ref_l[b] == SEG_ID) - 1
        np.testing.assert_array_equal(batch["seg_token_pos"][b, :1], ref_pos)


# ---------------------------------------------------------------------------
# 2. train path: full forward -> all loss components
# ---------------------------------------------------------------------------

def test_train_forward_losses_match(ref_model, params):
    from video_llava_seg_tpu.train.train_step import compute_loss

    rows, video, segs = _batch_inputs()
    ids_t, attn_t, labels_t, images_t, sf, sm, smeta = _ref_batch(
        rows, video, segs)
    with torch.no_grad():
        ref_out = ref_model(input_ids=ids_t, attention_mask=attn_t,
                            labels=labels_t, images=images_t,
                            seg_frames=sf, seg_masks=sm, seg_meta=smeta)

    batch = _my_batch(rows, video, segs)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    total, metrics = compute_loss(params, MY_CFG, batch_j,
                                  jax.random.PRNGKey(0))

    assert float(metrics["num_object_tracks"]) == float(
        ref_out["num_object_tracks"])
    np.testing.assert_allclose(float(metrics["loss_text"]),
                               float(ref_out["loss_text"]), rtol=2e-3)
    np.testing.assert_allclose(float(metrics["loss_mask_dice"]),
                               float(ref_out["loss_mask_dice"]), rtol=3e-2)
    np.testing.assert_allclose(float(metrics["loss_mask_ce"]),
                               float(ref_out["loss_mask_ce"]), rtol=3e-2)
    np.testing.assert_allclose(float(metrics["loss_mask"]),
                               float(ref_out["loss_mask"]), rtol=3e-2)
    np.testing.assert_allclose(float(total), float(ref_out["loss"]),
                               rtol=3e-2)
    # mask_ious binarizes (pred > 0) random-weight logits that hover near
    # zero, so e-2-level numeric differences flip pixels — a logging
    # metric, held loosely here; exact parity on controlled inputs is
    # pinned by tests/test_losses.py
    np.testing.assert_allclose(float(metrics["mask_iou_sum"]),
                               float(ref_out["mask_ious"].sum()), atol=0.2)


def test_train_caption_only_dummy_path(ref_model, params):
    """All-caption batch: the zero-multiplied dummy seg pass must yield
    loss == loss_text with zero mask loss on both sides
    (llava_llama.py:251-263)."""
    from video_llava_seg_tpu.train.train_step import compute_loss

    rows, video, segs = _batch_inputs()
    r0i, r0l, _, _ = rows
    # strip the [SEG] label; keep it a plain answer token
    r0l = np.where(r0l == SEG_ID, 14, r0l)
    r0i = np.where(r0i == SEG_ID, 14, r0i)
    f0, _, m0 = segs[0]

    ids_t = torch.from_numpy(r0i[None])
    attn_t = torch.ones_like(ids_t, dtype=torch.bool)
    labels_t = torch.from_numpy(r0l[None])
    images_t = torch.from_numpy(video[:1].transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        ref_out = ref_model(
            input_ids=ids_t, attention_mask=attn_t, labels=labels_t,
            images=images_t,
            seg_frames=[torch.from_numpy(f0.transpose(0, 3, 1, 2))],
            seg_masks=[None], seg_meta=[m0])
    assert float(ref_out["loss_mask"]) == 0.0
    assert float(ref_out["num_object_tracks"]) == 0.0

    inst = {"input_ids": r0i, "labels": r0l, "image": video[0],
            "seg_frames": f0, "seg_masks": None, "seg_meta": m0}
    coll = DataCollator(MY_CFG, DataConfig(max_seg_frames=2), pad_token_id=0,
                        seq_bucket=8)
    batch = coll([inst])
    total, metrics = compute_loss(params, MY_CFG,
                                  {k: jnp.asarray(v)
                                   for k, v in batch.items()},
                                  jax.random.PRNGKey(0))
    assert float(metrics["loss_mask"]) == 0.0
    assert float(metrics["num_object_tracks"]) == 0.0
    np.testing.assert_allclose(float(total), float(ref_out["loss"]),
                               rtol=2e-3)


# ---------------------------------------------------------------------------
# 3. generate path: greedy ids + seg masks
# ---------------------------------------------------------------------------

class _LegacyGenerateShim:
    """Restore the HF~4.37 contract the reference was written against:
    generate(inputs_embeds=...) returning sequences with a leading dummy
    bos (reference slices it off at llava_llama.py:189)."""

    def __enter__(self):
        from transformers.generation.utils import GenerationMixin

        self._orig = GenerationMixin.generate
        orig = self._orig

        def shimmed(self_, *a, **k):
            out = orig(self_, *a, **k)
            out.sequences = torch.cat(
                [torch.zeros_like(out.sequences[:, :1]), out.sequences], 1)
            return out

        GenerationMixin.generate = shimmed
        return self

    def __exit__(self, *exc):
        from transformers.generation.utils import GenerationMixin

        GenerationMixin.generate = self._orig
        return False


def _prompt_row():
    img = [IMAGE_TOKEN_INDEX] * N_IMG
    return np.asarray([7, 8] + img + [9, 10, 11])


def _gen_ref(ref_model, ids, video, seg_frames, seg_meta, max_new):
    """seg_frames None -> caption-only generate (no seg head)."""
    ids_t = torch.from_numpy(ids)
    images_t = torch.from_numpy(video.transpose(0, 1, 4, 2, 3))
    seg_kw = {}
    if seg_frames is not None:
        seg_kw = {"seg_frames": [torch.from_numpy(
            seg_frames.transpose(0, 3, 1, 2))], "seg_meta": [seg_meta]}
    with torch.no_grad(), _LegacyGenerateShim():
        out = ref_model.generate(
            inputs=ids_t, images=images_t,
            # explicit mask: HF 4.57 no longer tolerates the None that
            # prepare_inputs_labels_for_multimodal propagates when the
            # caller omits it (4.37 did)
            attention_mask=torch.ones_like(ids_t, dtype=torch.bool),
            max_new_tokens=max_new, do_sample=False,
            pad_token_id=0, **seg_kw)
    return out


def test_generate_tokens_match_and_ref_fallback_is_broken(ref_model,
                                                          params):
    """Greedy generate is token-identical; and the reference's
    no-[SEG]-token fallback (llava_llama.py:316-318) is shown to CRASH in
    the reference itself — its warn line calls `output_ids[0].item()` on
    the whole generated row (llava_llama.py:317), so the fallback is
    unreachable upstream whenever more than one token was generated. The
    framework implements the *intended* behavior (use the hidden state at
    index 0) with the indexing fixed; here we pin our fallback against an
    explicit position-0 extraction."""
    rows, video, segs = _batch_inputs()
    f0, _, m0 = segs[0]
    ids = _prompt_row()[None]
    max_new = 6

    out = _gen_ref(ref_model, ids, video[:1], None, None, max_new)
    ref_ids = out["sequences"][:, 1:].numpy()  # drop shim bos

    tokens, hidden, n = llava.generate(params, MY_CFG, ids, video[:1],
                                       max_new_tokens=max_new,
                                       eos_token_ids=())
    n = int(n)
    assert n == max_new
    np.testing.assert_array_equal(np.asarray(tokens)[0, :n], ref_ids[0])
    assert SEG_ID not in ref_ids[0]

    # upstream bug, pinned: the reference crashes inside its own fallback
    with pytest.raises(RuntimeError):
        _gen_ref(ref_model, ids, video[:1], f0, m0, max_new)

    # our fallback == explicit extraction of the position-0 hidden state
    outs = llava.forward_seg_head_inference(params, MY_CFG, tokens, hidden,
                                            n, [f0], [m0])
    my_masks = np.asarray(outs[0])
    from video_llava_seg_tpu.models import seg_head as seg_head_mod

    expect = seg_head_mod.forward(
        params["seg_head"], MY_CFG.seg, TINY_SAM2, [jnp.asarray(f0)],
        [jnp.asarray(np.asarray(hidden)[0, :1])], [m0],
        resize_to_original_dims=True)
    np.testing.assert_allclose(my_masks, np.asarray(expect[0]), atol=1e-5)


def test_generate_real_seg_token_extraction_matches(ref_model, params):
    """Exercise the REAL [SEG] extraction in generate on both sides: pick a
    token id the greedy rollout actually emits, re-declare it as the seg
    token (both extractions read it from config at gather time), rerun the
    same deterministic rollout, and compare the resulting masks — this pins
    generate's position arithmetic (output_embeds offset
    inputs_embeds.shape[1]-1, llava_llama.py:186-190) against ours."""
    rows, video, segs = _batch_inputs()
    f0, _, m0 = segs[0]
    ids = _prompt_row()[None]
    max_new = 6

    # discovery rollout without the seg head (the reference's fallback
    # path would crash — see test above)
    out = _gen_ref(ref_model, ids, video[:1], None, None, max_new)
    ref_ids = out["sequences"][0, 1:].numpy()
    # pick the token emitted at step 1 as the "seg token" — appears at
    # least once, possibly more (every occurrence becomes an object)
    seg_tok = int(ref_ids[1])

    old = ref_model.config.seg_token_idx
    ref_model.config.seg_token_idx = seg_tok
    try:
        out2 = _gen_ref(ref_model, ids, video[:1], f0, m0, max_new)
    finally:
        ref_model.config.seg_token_idx = old
    ref_masks = out2["pred_mask_logits"].numpy()     # [N, T, oh, ow]
    n_obj = int((ref_ids == seg_tok).sum())
    assert ref_masks.shape[0] == n_obj >= 1

    my_cfg = dataclasses.replace(MY_CFG, seg_token_idx=seg_tok)
    tokens, hidden, n = llava.generate(params, my_cfg, ids, video[:1],
                                       max_new_tokens=max_new,
                                       eos_token_ids=())
    outs = llava.forward_seg_head_inference(params, my_cfg, tokens, hidden,
                                            int(n), [f0], [m0])
    my_masks = np.asarray(outs[0])
    assert my_masks.shape == ref_masks.shape
    np.testing.assert_allclose(my_masks, ref_masks, atol=3e-2, rtol=3e-2)
    assert np.mean((my_masks > 0) == (ref_masks > 0)) > 0.95
