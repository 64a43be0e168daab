"""ViCaS inference CLI — parity with llava/inference/main.py.

Same flags (-i/-o, --num_chunks/--chunk_idx for embarrassingly-parallel
sharding over processes, --dataset_split, --skip_seg/--skip_captions,
--overwrite, greedy decode budget), same resume-via-output-JSON behavior,
same output schema {video_id, pred_caption, pred_lgvis_masks: [[{filename,
mask_rles}]]}.

Model loading accepts either a framework orbax checkpoint (config.json +
state/) or a reference torch checkpoint directory (converted on the fly)."""

from __future__ import annotations

import argparse
import json
import math
import os
import os.path as osp
from glob import glob
from typing import Optional

import numpy as np

from video_llava_seg_tpu import conversation as conversation_lib
from video_llava_seg_tpu.config import VideoLlavaConfig
from video_llava_seg_tpu.constants import (
    DEFAULT_IMAGE_TOKEN,
    SLOW_FAST_SEPARATOR_TOKEN,
)
from video_llava_seg_tpu.data import video_io
from video_llava_seg_tpu.inference.utils import (
    mask_tensor_to_rle,
    preprocess_seg_inputs,
)
from video_llava_seg_tpu.inference.video_fetcher import VideoAndFrameFetcher
from video_llava_seg_tpu.mm_utils import tokenizer_image_token
from video_llava_seg_tpu.models import llava
from video_llava_seg_tpu.paths import Paths

CAPTION_PROMPT = ("\nDescribe what is happening in the video in detail. "
                  "Talk about the events, the main objects/actors and also "
                  "briefly describe the background scene.")


def split_list(lst, n):
    chunk = math.ceil(len(lst) / n)
    return [lst[i:i + chunk] for i in range(0, len(lst), chunk)]


def get_chunk(lst, n, k):
    chunks = split_list(lst, n)
    # fewer chunks than processes (len(lst) < n): trailing chunks are empty
    return chunks[k] if k < len(chunks) else []


def get_video_list(gt_dir, version, split, output_dir, overwrite, chunk_idx,
                   num_chunks):
    with open(Paths.vicas_split_json(split, version)) as fh:
        split_ids = json.load(fh)
    split_ids = set(get_chunk(sorted(split_ids), num_chunks, chunk_idx))
    completed = {int(osp.split(f)[-1].replace(".json", ""))
                 for f in glob(osp.join(output_dir, "*.json"))}
    ret = []
    for f in sorted(glob(osp.join(gt_dir, "*.json"))):
        vid = int(osp.split(f)[-1].replace(".json", ""))
        if vid not in split_ids:
            continue
        split_ids.remove(vid)
        if vid in completed and not overwrite:
            continue
        ret.append(f)
    if split_ids:
        raise FileNotFoundError(
            f"No JSON file found for videos: {sorted(split_ids)}")
    return ret


def load_model(model_path: str, cfg: Optional[VideoLlavaConfig] = None,
               load_bits: Optional[int] = None):
    """Load (params, cfg, tokenizer) from an orbax or torch checkpoint dir.

    load_pretrained_model parity (llava/model/builder.py:34-200): LoRA
    adapters found in the checkpoint are merged into the base weights
    (peft merge_and_unload equivalent); load_bits ∈ {8, 4} applies
    weight-only quantization (the TPU stand-in for BitsAndBytes,
    builder.py:47-66)."""
    import jax

    from transformers import AutoTokenizer

    cfg_path = osp.join(model_path, "config.json")
    if cfg is None and osp.exists(cfg_path):
        with open(cfg_path) as fh:
            raw = json.load(fh)
        if "llm" in raw:  # our config tree
            from video_llava_seg_tpu.config import (
                DTypePolicy, LlamaConfig, ProjectorConfig, SegHeadConfig,
                VisionTowerConfig,
            )
            cfg = VideoLlavaConfig(
                llm=LlamaConfig(**raw["llm"]),
                vision=VisionTowerConfig(**raw["vision"]),
                projector=ProjectorConfig(**raw["projector"]),
                seg=SegHeadConfig(**raw["seg"]) if raw.get("seg") else None,
                **{k: v for k, v in raw.items()
                   if k not in ("llm", "vision", "projector", "seg",
                                "dtype")})
    cfg = cfg or VideoLlavaConfig()

    try:
        tokenizer = AutoTokenizer.from_pretrained(model_path)
    except Exception:
        tokenizer = None

    if osp.isdir(osp.join(model_path, "state")):
        import orbax.checkpoint as ocp

        params = llava.init(jax.random.PRNGKey(0), cfg)
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(osp.abspath(osp.join(model_path, "state")),
                                 {"params": params})
        params = restored["params"]
    else:
        from video_llava_seg_tpu.convert.llava_torch import (
            load_llava_weights,
        )
        params = load_llava_weights(model_path, cfg)
    if isinstance(params, dict) and "lora" in params:
        from video_llava_seg_tpu.train import lora as lora_mod

        adapters = params.pop("lora")
        params = lora_mod.merge_into(params, adapters)
    if load_bits is not None:
        from video_llava_seg_tpu.ops.quantization import quantize_tree

        # 8-bit: weight-only int8 (decode reads halve; bf16 greedy tokens
        # reproduced exactly on chip). 4-bit: the packed W4A8 path
        # (ops/int4.py) — weight reads halve again and prefill rides the
        # int8 MXU, at the reference load_4bit's accuracy class. Only the
        # LLM quantizes: vision/seg are latency-bound on activations, and
        # the reference's BitsAndBytes gates also wrap only the LM.
        params = dict(params)
        params["llm"] = quantize_tree(params["llm"], load_bits,
                                      act_quant=load_bits == 4)
    return params, cfg, tokenizer


def build_prompt(cfg: VideoLlavaConfig, qs: str, conv_template_name: str,
                 use_sf_separator: bool = False) -> str:
    """Video token layout + conversation wrap (main.py:92-117 parity)."""
    if cfg.num_slow_frames == cfg.num_frames:
        vid_tokens = DEFAULT_IMAGE_TOKEN * cfg.num_frames
    else:
        sep = SLOW_FAST_SEPARATOR_TOKEN if use_sf_separator else ""
        vid_tokens = (DEFAULT_IMAGE_TOKEN * cfg.num_slow_frames + sep
                      + DEFAULT_IMAGE_TOKEN * cfg.num_frames)
    conv = conversation_lib.conv_templates[conv_template_name].copy()
    conv.append_message(conv.roles[0], vid_tokens + qs)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def keyword_stop_sequences(tokenizer, conv_template_name: str):
    """Tokenized stop-string sequences for the template, for the in-graph
    streaming stop (reference KeywordsStoppingCriteria, mm_utils.py:215-247:
    generation halts once the stop string's token ids are emitted)."""
    conv = conversation_lib.conv_templates[conv_template_name]
    stop_str = (conv.sep2 if conv.sep_style
                == conversation_lib.SeparatorStyle.TWO else conv.sep)
    if not stop_str:
        return ()
    ids = list(tokenizer(stop_str).input_ids)
    bos = getattr(tokenizer, "bos_token_id", None)
    if bos is not None and ids and ids[0] == bos:
        ids = ids[1:]
    return (tuple(ids),) if ids else ()


def get_model_output(params, cfg: VideoLlavaConfig, tokenizer, video_bytes,
                     qs: str, conv_template_name: str, max_new_tokens: int,
                     seg_frames=None, seg_meta=None,
                     eos_token_ids=(), stop_sequences=(),
                     temperature: float = 0.0, top_p=None, rng=None,
                     num_beams: int = 1):
    prompt = build_prompt(cfg, qs, conv_template_name)
    frames = video_io.load_video_uniform(video_bytes, cfg.num_frames)
    from video_llava_seg_tpu.data.vicas import (
        clip_preprocess_frames,
        expand2square_batch,
        CLIP_IMAGE_MEAN,
    )
    fill = tuple(int(x * 255) for x in CLIP_IMAGE_MEAN)
    video = clip_preprocess_frames(expand2square_batch(frames, fill),
                                   cfg.vision.image_size)[None]
    input_ids = np.asarray(tokenizer_image_token(prompt, tokenizer))[None]

    tokens, hidden, n = llava.generate(params, cfg, input_ids, video,
                                       max_new_tokens=max_new_tokens,
                                       eos_token_ids=tuple(eos_token_ids),
                                       stop_sequences=tuple(stop_sequences),
                                       temperature=temperature, top_p=top_p,
                                       rng=rng, num_beams=num_beams)
    n = int(n)
    out_ids = np.asarray(tokens)[0, :n]
    text = tokenizer.decode(out_ids, skip_special_tokens=True).strip()

    pred_mask_logits = None
    if seg_frames is not None:
        outs = llava.forward_seg_head_inference(
            params, cfg, tokens, hidden, n, [seg_frames], [seg_meta])
        if outs is not None:
            pred_mask_logits = np.asarray(outs[0])
    return text, pred_mask_logits


# Batch sizes that fault the TPU worker -> nearest verified-green batch.
# Batch 2 is the single bisected faulting size (BENCH_NOTES.md "Batch-2
# serving fault"); 1, 3, 4 and 8 are verified clean on chip (the round-4
# bisection matrix proved batch 3 SURVIVES). Pad to 3 — one dummy row,
# not two: the cheapest green plan for a 2-query group.
_FAULTING_BATCH_PAD = {2: 3}


def _green_batch(n: int) -> int:
    """Map a requested serving batch to one known not to fault the worker."""
    return _FAULTING_BATCH_PAD.get(n, n)


def get_model_output_batched(params, cfg: VideoLlavaConfig, tokenizer,
                             video_bytes, queries, conv_template_name: str,
                             max_new_tokens: int, seg_frames=None,
                             seg_meta=None, eos_token_ids=(),
                             stop_sequences=(), temperature: float = 0.0,
                             top_p=None, rng=None):
    """Serve several queries about ONE video in a single batched dispatch
    (--batch_queries): the video decodes and encodes once (its visual
    tokens broadcast across rows), ragged prompts left-pad, rows stop
    per-row, and the decode weight stream amortizes across the batch. The
    reference runs these queries strictly sequentially — its generate
    hard-asserts batch 1 (llava_llama.py:313) and re-runs the vision tower
    per query (main.py:260-283).

    queries: list of (qs, wants_seg). Returns list of (text, mask_logits)."""
    from video_llava_seg_tpu.data.vicas import (
        clip_preprocess_frames,
        expand2square_batch,
        CLIP_IMAGE_MEAN,
    )

    frames = video_io.load_video_uniform(video_bytes, cfg.num_frames)
    fill = tuple(int(x * 255) for x in CLIP_IMAGE_MEAN)
    video = clip_preprocess_frames(expand2square_batch(frames, fill),
                                   cfg.vision.image_size)[None]
    rows = [np.asarray(tokenizer_image_token(
        build_prompt(cfg, qs, conv_template_name), tokenizer))
        for qs, _ in queries]
    n_real = len(rows)
    pad_to = _green_batch(n_real)
    if pad_to != n_real:
        # batch-2 fence: exactly batch 2 reproducibly crashes the TPU worker
        # when the vision-encode executable is resident (BENCH_NOTES.md
        # "Batch-2 serving fault" — infra-level, every component green solo;
        # batches 1/3/4/8 run the identical structure and pass). Rows are
        # independent under left-pad attention, so padding with duplicates of
        # the last row is token-exact for the real rows; the dummies are
        # sliced off below.
        print(f"[batch fence] padding batch {n_real} -> {pad_to} "
              "(see BENCH_NOTES.md: batch-2 serving fault)")
        rows = rows + [rows[-1]] * (pad_to - n_real)
    lens = np.asarray([len(r) for r in rows])
    ids = np.zeros((len(rows), int(lens.max())), rows[0].dtype)
    for r, row in enumerate(rows):
        ids[r, :len(row)] = row
    tokens, hidden, n = llava.generate(
        params, cfg, ids, video, max_new_tokens=max_new_tokens,
        eos_token_ids=tuple(eos_token_ids),
        stop_sequences=tuple(stop_sequences), pad_side="left",
        input_lens=lens, temperature=temperature, top_p=top_p, rng=rng)
    n = int(n)
    outs = []
    for r, (qs, wants_seg) in enumerate(queries):
        out_ids = np.asarray(tokens)[r, :n]
        text = tokenizer.decode(out_ids, skip_special_tokens=True).strip()
        logits = None
        if wants_seg and seg_frames is not None:
            o = llava.forward_seg_head_inference(
                params, cfg, tokens[r:r + 1], hidden[r:r + 1], n,
                [seg_frames], [seg_meta])
            if o is not None:
                logits = np.asarray(o[0])
        outs.append((text, logits))
    return outs


def run_inference(args, model=None):
    """ViCaS inference loop (main.py:146-312 parity).

    model: optional preloaded (params, cfg, tokenizer) triple — used by
    tests and by callers that already hold the model in memory."""
    import jax

    nb = int(getattr(args, "num_beams", 1) or 1)
    if nb > 1 and float(getattr(args, "temperature", 0.0) or 0.0) > 0.0:
        raise SystemExit("--num_beams > 1 with --temperature > 0 (beam "
                         "sampling) is not supported; pick one")
    if nb > 1 and int(getattr(args, "batch_queries", 1) or 1) > 1:
        raise SystemExit("--num_beams > 1 serves one prompt at a time; "
                         "drop --batch_queries")
    if model is not None:
        params, cfg, tokenizer = model
    else:
        params, cfg, tokenizer = load_model(
            args.model_path,
            load_bits=8 if getattr(args, "load_8bit", False)
            else 4 if getattr(args, "load_4bit", False) else None)

    # --model_parallel N: tensor-parallel serving over N chips. LLM weights
    # shard megatron-style (parallel/mesh.py rules); vision + seg head stay
    # replicated. Eager dispatch follows the data, so no mesh context is
    # needed — GSPMD inserts the TP collectives inside greedy_generate
    # (token-exact vs single-device: tests/test_tp_serving.py).
    if getattr(args, "kv_cache_int8", False):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, kv_cache_int8=True))

    mp = int(getattr(args, "model_parallel", 1) or 1)
    if getattr(args, "fuse_qkv", False):
        if mp > 1:
            raise SystemExit("--fuse_qkv is single-chip serving only: the "
                             "TP shard rules target the unfused wq/wk/wv "
                             "names (parallel/mesh.py)")
        from video_llava_seg_tpu.models.llama import fuse_qkv_gateup

        params = dict(params)
        params["llm"] = fuse_qkv_gateup(params["llm"])
    if mp > 1:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from video_llava_seg_tpu.config import MeshConfig
        from video_llava_seg_tpu.ops import int4 as int4_mod
        from video_llava_seg_tpu.parallel.mesh import (
            create_mesh,
            shard_params,
        )

        # TP-sharded W4A8: a pallas_call is opaque to GSPMD (it would force
        # an all-gather of the packed weights); the XLA unpack path runs the
        # identical int32 math and partitions megatron-style
        # (ops/int4.py:24-27, token-exact: tests/test_tp_serving.py)
        int4_mod.USE_PALLAS_W4A8 = False
        mesh = create_mesh(MeshConfig(data_parallel=1, model_parallel=mp),
                           devices=jax.devices()[:mp])
        replicated = NamedSharding(mesh, PartitionSpec())
        params = {
            k: (shard_params(v, mesh) if k == "llm"
                else jax.device_put(v, replicated))
            for k, v in params.items()
        }
    fetcher = VideoAndFrameFetcher(args)
    gt_dir = args.gt_dir or str(Paths.vicas_annotations_dir(
        args.dataset_version))
    output_dir = args.output_dir or osp.join(
        args.model_path,
        f"inference/ViCaS/pred_{args.dataset_version}_{args.dataset_split}")
    os.makedirs(output_dir, exist_ok=True)
    print(f"Output directory: {output_dir}")

    gt_json_list = get_video_list(gt_dir, args.dataset_version,
                                  args.dataset_split, output_dir,
                                  args.overwrite, args.chunk_idx,
                                  args.num_chunks)
    if not gt_json_list:
        print("No videos to process")
        return

    eos_ids = []
    for tok in ("<|eot_id|>", "<|end_of_text|>", "</s>"):
        try:
            tid = tokenizer.convert_tokens_to_ids(tok)
            if tid is not None and tid >= 0:
                eos_ids.append(tid)
        except Exception:
            pass

    conv_template_name = args.conv_template
    try:
        stop_seqs = keyword_stop_sequences(tokenizer, conv_template_name)
    except Exception:
        stop_seqs = ()
    for json_path in gt_json_list:
        with open(json_path) as fh:
            content = json.load(fh)
        video_id = content["video_id"]
        output_path = osp.join(output_dir, f"{video_id:06d}.json")
        if osp.exists(output_path) and not args.overwrite:
            continue

        video_bytes = fetcher.get_video(content["filename"])
        raw_frames, seg_meta = fetcher.get_frames(content, gt_only=True)
        seg_frames, seg_meta = preprocess_seg_inputs(
            raw_frames, seg_meta, tgt_size=cfg.seg.image_size
            if cfg.seg else 1024, normalize=False,
            pad_mode=args.seg_pad_mode)

        pred = {"video_id": video_id,
                "pred_lgvis_masks": [[] for _ in
                                     content["object_referrals"]],
                "pred_caption": None}
        sub_indices = ([] if args.skip_captions else [-1]) + (
            [] if args.skip_seg
            else list(range(len(content["object_referrals"]))))

        def absorb(idx, text, logits):
            if idx == -1:
                pred["pred_caption"] = text
                if args.print_captions:
                    print(f"Video {video_id}\nPred Caption: {text}\n"
                          f"GT Caption: {content['caption_parsed_en_gpt']}"
                          "\n----------")
            elif logits is not None:
                masks = logits > 0.0
                rles = mask_tensor_to_rle(masks)
                for t in range(masks.shape[1]):
                    pred["pred_lgvis_masks"][idx].append({
                        "filename": seg_meta["filenames"][t],
                        "mask_rles": [x[t] for x in rles],
                    })

        def query_of(idx):
            if idx == -1:
                return CAPTION_PROMPT, False
            ref = content["object_referrals"][idx]
            return (f"\n{ref['prompt']} Please output the segmentation "
                    "mask."), True

        # sampling gate mirrors the reference CLI (main.py:124-138):
        # do_sample iff temperature > 0; the rng is fixed per video so a
        # resumed run reproduces the same sampled captions
        temp = float(getattr(args, "temperature", 0.0) or 0.0)
        sample_kwargs = {}
        if temp > 0.0:
            import jax

            sample_kwargs = {
                "temperature": temp,
                "top_p": getattr(args, "top_p", None),
                "rng": jax.random.PRNGKey(video_id),
            }
        elif nb > 1:
            # in-graph beam search (llama.beam_generate); HF default
            # length_penalty 1.0
            sample_kwargs = {"num_beams": nb}
        bq = max(1, int(getattr(args, "batch_queries", 1) or 1))
        if bq > 1:
            # batched serving: group this video's queries into one ragged
            # left-padded generate per bq rows (video encodes once/group)
            for g in range(0, len(sub_indices), bq):
                group = sub_indices[g:g + bq]
                outs = get_model_output_batched(
                    params, cfg, tokenizer, video_bytes,
                    [query_of(i) for i in group], conv_template_name,
                    args.max_new_tokens, seg_frames=seg_frames,
                    seg_meta=seg_meta, eos_token_ids=eos_ids,
                    stop_sequences=stop_seqs, **sample_kwargs)
                for idx, (text, logits) in zip(group, outs):
                    absorb(idx, text, logits)
        else:
            for idx in sub_indices:
                qs, wants_seg = query_of(idx)
                kwargs = ({"seg_frames": seg_frames, "seg_meta": seg_meta}
                          if wants_seg else {})
                text, logits = get_model_output(
                    params, cfg, tokenizer, video_bytes, qs,
                    conv_template_name, args.max_new_tokens,
                    eos_token_ids=eos_ids, stop_sequences=stop_seqs,
                    **kwargs, **sample_kwargs)
                absorb(idx, text, logits)
        with open(output_path, "w") as fh:
            json.dump(pred, fh)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-i", required=True)
    p.add_argument("--gt_dir", required=False)
    p.add_argument("--output_dir", "-o", required=False)
    p.add_argument("--num_chunks", type=int, default=1)
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--print_captions", action="store_true")
    p.add_argument("--dataset_version", default="v1.0")
    p.add_argument("--dataset_split", default="val")
    p.add_argument("--skip_seg", action="store_true")
    p.add_argument("--skip_captions", action="store_true")
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--conv_template", default="llava_llama_3")
    p.add_argument("--seg_pad_mode", default="topleft")
    p.add_argument("--load_8bit", action="store_true")
    p.add_argument("--load_4bit", action="store_true")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="shard the LLM over N chips (tensor parallel)")
    p.add_argument("--fuse_qkv", action="store_true",
                   help="single-chip serving layout: concat wq|wk|wv and "
                        "w_gate|w_up per layer (fuse_qkv_gateup) — fewer "
                        "dispatches + one activation quant per block; "
                        "token-exact vs the unfused tree")
    p.add_argument("--kv_cache_int8", action="store_true",
                   help="int8 KV cache (halves decode cache HBM reads)")
    p.add_argument("--batch_queries", type=int, default=1,
                   help="batch N of a video's queries through one ragged "
                        "left-padded generate (vision encode shared; the "
                        "reference serves strictly batch-1)")
    return p.parse_args()


if __name__ == "__main__":
    run_inference(parse_args())
