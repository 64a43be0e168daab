"""End-to-end ViCaS inference CLI smoke (llava/inference/main.py parity):
synthetic dataset fixture + tiny model + fake tokenizer -> run_inference ->
output JSON schema, resume behavior, chunked sharding."""

import dataclasses
import json
import os
import os.path as osp
import re
import types

import numpy as np
import pytest


class FakeTokenizer:
    """Char-hash tokenizer implementing the surface tokenizer_image_token /
    run_inference use: __call__().input_ids, bos/convert/decode."""

    bos_token_id = 1
    pad_token_id = 0
    eos_token_id = 2
    model_max_length = 512

    seg_token_id = 400  # <vid_seg> as an added special token
    # specials tokenize atomically (like the real llama3 tokenizer) so the
    # preprocess label-span arithmetic (+1 per <|eot_id|>) lines up
    _specials = {"<vid_seg>": 400, "<|eot_id|>": 2, "<|begin_of_text|>": 401,
                 "<|start_header_id|>": 402, "<|end_header_id|>": 403}
    _spec_pat = re.compile(
        "(" + "|".join(re.escape(s) for s in ["<vid_seg>", "<|eot_id|>",
                                              "<|begin_of_text|>",
                                              "<|start_header_id|>",
                                              "<|end_header_id|>"]) + ")")

    def __call__(self, text):
        ids = [self.bos_token_id]
        for piece in self._spec_pat.split(text):
            if piece in self._specials:
                ids.append(self._specials[piece])
            else:
                ids += [5 + (ord(c) % 350) for c in piece]
        return types.SimpleNamespace(input_ids=ids)

    def convert_tokens_to_ids(self, tok):
        return self._specials.get(tok, -1)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{int(i)}" for i in ids)


def _write_fixture(root, video_id=7, n_frames=4, hw=(48, 64)):
    """Create ViCaS-layout dirs: videos/, video_frames/, annotations/,
    splits/ under `root` (paths.py layout)."""
    import cv2

    from video_llava_seg_tpu.ops.masks import encode_rle

    h, w = hw
    vicas = osp.join(root, "ViCaS")
    os.makedirs(osp.join(vicas, "videos"))
    frames_dir = osp.join(vicas, "video_frames", f"{video_id:06d}")
    os.makedirs(frames_dir)
    ann_dir = osp.join(vicas, "annotations", "v1.0")
    os.makedirs(ann_dir)
    splits_dir = osp.join(vicas, "splits", "v1.0")
    os.makedirs(splits_dir)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_frames, h, w, 3), dtype=np.uint8)
    vw = cv2.VideoWriter(osp.join(vicas, "videos", "vid7.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 5, (w, h))
    for f in frames:
        vw.write(f[..., ::-1])
    vw.release()

    segmentations = []
    mask = np.zeros((h, w), np.uint8)
    mask[10:30, 10:40] = 1
    rle = encode_rle(mask)
    rle["counts"] = rle["counts"].decode("utf-8")
    for t in range(n_frames):
        name = f"{t:05d}.jpg"
        cv2.imwrite(osp.join(frames_dir, name), frames[t][..., ::-1])
        segmentations.append({"filename": name, "is_gt": True,
                              "track_ids": [1], "mask_rles": [rle]})
    content = {
        "video_id": video_id,
        "filename": "vid7.mp4",
        "caption_raw_en": "a synthetic scene",
        "caption_parsed_en_gpt": "a synthetic scene",
        "object_referrals": [{"prompt": "the bright region",
                              "track_ids": [1]}],
        "segmentations": segmentations,
    }
    with open(osp.join(ann_dir, f"{video_id:06d}.json"), "w") as fh:
        json.dump(content, fh)
    with open(osp.join(splits_dir, "val.json"), "w") as fh:
        json.dump([video_id], fh)
    return vicas


@pytest.fixture()
def vicas_env(tmp_path, monkeypatch):
    monkeypatch.setenv("VIDEONET_DATASETS_DIR", str(tmp_path))
    _write_fixture(str(tmp_path))
    return tmp_path


def _tiny_model():
    import jax

    from video_llava_seg_tpu.config import SegHeadConfig, VideoLlavaConfig
    from video_llava_seg_tpu.models import llava

    cfg = VideoLlavaConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        seg=SegHeadConfig(seg_backbone="tiny", image_size=64,
                          max_seg_frames=4, max_objects=2),
        seg_token_idx=400)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    return params, cfg, FakeTokenizer()


def test_run_inference_end_to_end(vicas_env, tmp_path):
    from video_llava_seg_tpu.inference.main import run_inference

    out_dir = str(tmp_path / "out")
    args = types.SimpleNamespace(
        model_path="unused", gt_dir=None, output_dir=out_dir,
        num_chunks=1, chunk_idx=0, overwrite=False, print_captions=False,
        dataset_version="v1.0", dataset_split="val", skip_seg=False,
        skip_captions=False, max_new_tokens=4, temperature=0.0,
        top_p=None, num_beams=1, conv_template="llava_llama_3",
        seg_pad_mode="topleft")
    run_inference(args, model=_tiny_model())

    out_path = osp.join(out_dir, "000007.json")
    assert osp.exists(out_path)
    with open(out_path) as fh:
        pred = json.load(fh)
    assert pred["video_id"] == 7
    assert isinstance(pred["pred_caption"], str) and pred["pred_caption"]
    assert isinstance(pred["pred_lgvis_masks"], list)
    assert len(pred["pred_lgvis_masks"]) == 1  # one referral
    for frame_entry in pred["pred_lgvis_masks"][0]:
        assert set(frame_entry) == {"filename", "mask_rles"}

    # resume: a second run with the output present processes nothing
    mtime = os.path.getmtime(out_path)
    run_inference(args, model=_tiny_model())
    assert os.path.getmtime(out_path) == mtime


def test_run_inference_tensor_parallel(vicas_env, tmp_path):
    """--model_parallel 2: LLM TP-sharded over the virtual mesh, same
    output schema and caption as the single-device run."""
    from video_llava_seg_tpu.inference.main import run_inference

    base = types.SimpleNamespace(
        model_path="unused", gt_dir=None, output_dir=None,
        num_chunks=1, chunk_idx=0, overwrite=False, print_captions=False,
        dataset_version="v1.0", dataset_split="val", skip_seg=False,
        skip_captions=False, max_new_tokens=4, temperature=0.0,
        top_p=None, num_beams=1, conv_template="llava_llama_3",
        seg_pad_mode="topleft")

    base.output_dir = str(tmp_path / "out_single")
    run_inference(base, model=_tiny_model())
    base.output_dir = str(tmp_path / "out_tp")
    base.model_parallel = 2
    run_inference(base, model=_tiny_model())

    with open(osp.join(tmp_path, "out_single", "000007.json")) as fh:
        single = json.load(fh)
    with open(osp.join(tmp_path, "out_tp", "000007.json")) as fh:
        tp = json.load(fh)
    assert tp["pred_caption"] == single["pred_caption"]
    assert tp["pred_lgvis_masks"] == single["pred_lgvis_masks"]


def test_run_inference_fused_qkv(vicas_env, tmp_path):
    """--fuse_qkv: serving with the concatenated wqkv / w_gateup layout
    produces the same captions and masks as the unfused tree (and is
    rejected when combined with --model_parallel, whose TP shard rules
    target the unfused names)."""
    from video_llava_seg_tpu.inference.main import run_inference

    base = types.SimpleNamespace(
        model_path="unused", gt_dir=None, output_dir=None,
        num_chunks=1, chunk_idx=0, overwrite=False, print_captions=False,
        dataset_version="v1.0", dataset_split="val", skip_seg=False,
        skip_captions=False, max_new_tokens=4, temperature=0.0,
        top_p=None, num_beams=1, conv_template="llava_llama_3",
        seg_pad_mode="topleft")

    base.output_dir = str(tmp_path / "out_single")
    run_inference(base, model=_tiny_model())
    base.output_dir = str(tmp_path / "out_fused")
    base.fuse_qkv = True
    run_inference(base, model=_tiny_model())

    with open(osp.join(tmp_path, "out_single", "000007.json")) as fh:
        single = json.load(fh)
    with open(osp.join(tmp_path, "out_fused", "000007.json")) as fh:
        fused = json.load(fh)
    assert fused["pred_caption"] == single["pred_caption"]
    assert fused["pred_lgvis_masks"] == single["pred_lgvis_masks"]

    base.output_dir = str(tmp_path / "out_bad")
    base.model_parallel = 2
    with pytest.raises(SystemExit):
        run_inference(base, model=_tiny_model())


def test_run_inference_sampling_and_beam_gate(vicas_env, tmp_path):
    """--temperature > 0 routes through the in-graph sampler (reference
    do_sample gate, main.py:124-138) and still writes the full output
    schema; the fixed per-video rng makes a re-run reproducible.
    --num_beams > 1 is rejected with a clear error."""
    from video_llava_seg_tpu.inference.main import run_inference

    args = types.SimpleNamespace(
        model_path="unused", gt_dir=None,
        output_dir=str(tmp_path / "out_sampled"),
        num_chunks=1, chunk_idx=0, overwrite=False, print_captions=False,
        dataset_version="v1.0", dataset_split="val", skip_seg=False,
        skip_captions=False, max_new_tokens=6, temperature=0.9,
        top_p=0.9, num_beams=1, conv_template="llava_llama_3",
        seg_pad_mode="topleft")
    run_inference(args, model=_tiny_model())
    with open(osp.join(args.output_dir, "000007.json")) as fh:
        first = json.load(fh)
    assert isinstance(first["pred_caption"], str)

    args.output_dir = str(tmp_path / "out_sampled2")
    run_inference(args, model=_tiny_model())
    with open(osp.join(args.output_dir, "000007.json")) as fh:
        again = json.load(fh)
    assert again["pred_caption"] == first["pred_caption"]

    # beam sampling (temperature > 0 AND num_beams > 1) is rejected
    args.num_beams = 4
    args.output_dir = str(tmp_path / "out_beam_sample")
    with pytest.raises(SystemExit):
        run_inference(args, model=_tiny_model())

    # beams alone route through llama.beam_generate and produce the
    # full output schema
    args.temperature = 0.0
    args.num_beams = 3
    args.output_dir = str(tmp_path / "out_beams")
    run_inference(args, model=_tiny_model())
    with open(osp.join(args.output_dir, "000007.json")) as fh:
        beams = json.load(fh)
    assert isinstance(beams["pred_caption"], str)
    assert len(beams["pred_lgvis_masks"]) == 1


def test_load_model_orbax_and_quant_gates(tmp_path):
    """load_model restores an orbax checkpoint; --load_8bit gives the LLM
    weight-only int8 kernels, --load_4bit the packed W4A8 kernels; the
    vision tower / seg head stay fp either way (reference BitsAndBytes
    gates wrap only the LM, builder.py:47-66)."""
    import dataclasses

    import jax
    import orbax.checkpoint as ocp

    from video_llava_seg_tpu.config import (
        SegHeadConfig,
        VideoLlavaConfig,
        to_json,
    )
    from video_llava_seg_tpu.inference.main import load_model
    from video_llava_seg_tpu.models import llava

    cfg = VideoLlavaConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        seg=SegHeadConfig(seg_backbone="tiny", image_size=64,
                          max_seg_frames=4, max_objects=2),
        seg_token_idx=400)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    # StandardCheckpointer is async: without the wait, load_model below can
    # race an uncommitted checkpoint (flaky under full-suite load) and the
    # pending commit then dies at interpreter shutdown
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((ckpt / "state").resolve(), {"params": params})
    ckptr.wait_until_finished()
    with open(ckpt / "config.json", "w") as fh:
        fh.write(to_json(cfg))

    def leaf_keys(tree):
        return {
            k for p, _ in jax.tree_util.tree_leaves_with_path(tree)
            for k in [str(getattr(p[-1], "key", ""))]
        }

    p8, cfg8, _ = load_model(str(ckpt), load_bits=8)
    assert cfg8.llm.hidden_size == cfg.llm.hidden_size
    assert "kernel_q" in leaf_keys(p8["llm"])
    assert "kernel_q" not in leaf_keys(p8["vision_tower"])

    p4, _, _ = load_model(str(ckpt), load_bits=4)
    assert "kernel_q4a" in leaf_keys(p4["llm"])
    assert "kernel_q4a" not in leaf_keys(p4["seg_head"])


def test_chunked_sharding_excludes_other_chunks(vicas_env, tmp_path):
    from video_llava_seg_tpu.inference.main import get_video_list
    from video_llava_seg_tpu.paths import Paths

    gt_dir = str(Paths.vicas_annotations_dir("v1.0"))
    out = str(tmp_path / "out2")
    os.makedirs(out, exist_ok=True)
    # one video, two chunks: chunk 0 gets it, chunk 1 gets nothing
    lst0 = get_video_list(gt_dir, "v1.0", "val", out, False, 0, 2)
    assert len(lst0) == 1
    lst1 = get_video_list(gt_dir, "v1.0", "val", out, False, 1, 2)
    assert lst1 == []


def test_run_inference_batched_queries(vicas_env, tmp_path):
    """--batch_queries 2: a video's caption + referral queries serve in one
    ragged left-padded generate (vision encode shared across rows) and must
    produce the same output JSON as the sequential batch-1 run — the
    reference cannot do this at all (batch-1 assert, llava_llama.py:313)."""
    from video_llava_seg_tpu.inference.main import run_inference

    base = dict(
        model_path="unused", gt_dir=None, output_dir=None,
        num_chunks=1, chunk_idx=0, overwrite=False, print_captions=False,
        dataset_version="v1.0", dataset_split="val", skip_seg=False,
        skip_captions=False, max_new_tokens=4, temperature=0.0,
        top_p=None, num_beams=1, conv_template="llava_llama_3",
        seg_pad_mode="topleft")

    seq = types.SimpleNamespace(**base)
    seq.output_dir = str(tmp_path / "out_seq")
    run_inference(seq, model=_tiny_model())
    bat = types.SimpleNamespace(**base)
    bat.output_dir = str(tmp_path / "out_bat")
    bat.batch_queries = 2
    run_inference(bat, model=_tiny_model())

    with open(osp.join(tmp_path, "out_seq", "000007.json")) as fh:
        a = json.load(fh)
    with open(osp.join(tmp_path, "out_bat", "000007.json")) as fh:
        b = json.load(fh)
    assert b["pred_caption"] == a["pred_caption"]
    assert b["pred_lgvis_masks"] == a["pred_lgvis_masks"]


def test_batch2_fence_pads_to_green_batch(vicas_env, tmp_path, monkeypatch):
    """A 2-row serving group reproducibly crashes the TPU worker (bisected in
    BENCH_NOTES.md). The fence pads batch 2 -> 3 with ONE duplicate row
    before dispatch (the round-4 bisection matrix proved batch 3 green —
    cheaper than the round-4 fence's pad-to-4); the real rows' outputs must
    be token-exact vs the sequential batch-1 run (this is the same
    output-equality contract as test_run_inference_batched_queries, plus an
    assertion that generate actually sees the padded batch)."""
    from video_llava_seg_tpu.inference import main as inf_main
    from video_llava_seg_tpu.models import llava

    seen_batches = []
    real_generate = llava.generate

    def spy_generate(params, cfg, input_ids, video, **kw):
        seen_batches.append(int(np.asarray(input_ids).shape[0]))
        return real_generate(params, cfg, input_ids, video, **kw)

    monkeypatch.setattr(inf_main.llava, "generate", spy_generate)

    base = dict(
        model_path="unused", gt_dir=None, output_dir=None,
        num_chunks=1, chunk_idx=0, overwrite=False, print_captions=False,
        dataset_version="v1.0", dataset_split="val", skip_seg=False,
        skip_captions=False, max_new_tokens=4, temperature=0.0,
        top_p=None, num_beams=1, conv_template="llava_llama_3",
        seg_pad_mode="topleft")

    seq = types.SimpleNamespace(**base)
    seq.output_dir = str(tmp_path / "out_seq")
    inf_main.run_inference(seq, model=_tiny_model())
    assert seen_batches and all(b == 1 for b in seen_batches)

    seen_batches.clear()
    bat = types.SimpleNamespace(**base)
    bat.output_dir = str(tmp_path / "out_bat")
    bat.batch_queries = 2
    inf_main.run_inference(bat, model=_tiny_model())
    # fixture has 1 caption + 1 referral -> one group of 2, padded to 3
    assert seen_batches == [3]

    with open(osp.join(tmp_path, "out_seq", "000007.json")) as fh:
        a = json.load(fh)
    with open(osp.join(tmp_path, "out_bat", "000007.json")) as fh:
        b = json.load(fh)
    assert b["pred_caption"] == a["pred_caption"]
    assert b["pred_lgvis_masks"] == a["pred_lgvis_masks"]
