"""Training entry point — TPU-native equivalent of llava/train/train.py.

Orchestrates: config parsing, tokenizer + special-token init (capturing
seg_token_idx, train.py:556-560), model init / cross-stage weight restore
(train.py:596-604), freeze policy, data module, mesh sharding, and the train
loop with checkpoint resume. A --synthetic flag swaps the dataset for random
batches so the full pipeline can be exercised without ViCaS on disk."""

from __future__ import annotations

import argparse
import dataclasses
import json
import os.path as osp
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.config import (
    DataConfig,
    MeshConfig,
    TrainConfig,
    VideoLlavaConfig,
    to_json,
)
from video_llava_seg_tpu.constants import (
    IMAGE_TOKEN_INDEX,
    SLOW_FAST_SEPARATOR_TOKEN,
    VIDEO_SEG_TOKEN,
)
from video_llava_seg_tpu.models import llava
from video_llava_seg_tpu.parallel.mesh import create_mesh, shard_params
from video_llava_seg_tpu.train.train_step import (
    create_train_state,
    make_train_step,
)
from video_llava_seg_tpu.train.trainer import train_loop


def initialize_vision_tokenizer(tokenizer, cfg: VideoLlavaConfig,
                                with_seg: bool = True):
    """Add special tokens and capture their ids
    (llava_arch.py:428-506 + train.py:556-560 parity).

    Returns an updated cfg with seg/sf-separator token ids."""
    added = []
    if cfg.num_slow_frames != cfg.num_frames:
        added.append(SLOW_FAST_SEPARATOR_TOKEN)
    if with_seg and cfg.seg is not None:
        added.append(VIDEO_SEG_TOKEN)
    if added:
        tokenizer.add_tokens(added, special_tokens=True)
    updates = {}
    if cfg.num_slow_frames != cfg.num_frames:
        updates["sf_separator_token_idx"] = tokenizer.convert_tokens_to_ids(
            SLOW_FAST_SEPARATOR_TOKEN)
    if with_seg and cfg.seg is not None:
        updates["seg_token_idx"] = tokenizer.convert_tokens_to_ids(
            VIDEO_SEG_TOKEN)
    return dataclasses.replace(cfg, **updates)


#: config fields that must agree across training stages (hard error), and
#: fields that only warn — llava/train/misc.py:123-147 parity.
_CONSISTENCY_ASSERT = ("vision.name", "vision.image_size",
                       "projector.projector_type",
                       "projector.mm_hidden_size", "llm.hidden_size",
                       "num_frames", "num_slow_frames")
_CONSISTENCY_WARN = ("seg_token_idx", "tokenizer_model_max_length")


def _cfg_get(cfg, dotted: str):
    obj = cfg
    for part in dotted.split("."):
        obj = getattr(obj, part, None)
        if obj is None:
            return None
    return obj


def verify_config_consistency(cfg: VideoLlavaConfig, restore_dir: str):
    """Assert/warn that the restored stage's persisted config matches the
    current one (misc.py:123-147). No-op if no config.json is found."""
    path = None
    for cand in (osp.join(restore_dir, "config.json"),):
        if osp.exists(cand):
            path = cand
    if path is None:
        return
    with open(path) as fh:
        raw = json.load(fh)
    if "llm" not in raw:   # torch/HF config, keys don't map 1:1
        return

    def raw_get(dotted):
        obj = raw
        for part in dotted.split("."):
            if not isinstance(obj, dict) or part not in obj:
                return None
            obj = obj[part]
        return obj

    for key in _CONSISTENCY_ASSERT:
        want, got = raw_get(key), _cfg_get(cfg, key)
        if want is not None and got is not None and want != got:
            raise ValueError(
                f"config mismatch vs restored stage: {key}: "
                f"checkpoint={want} current={got}")
    for key in _CONSISTENCY_WARN:
        want, got = raw_get(key), _cfg_get(cfg, key)
        if want is not None and got is not None and want != got:
            print(f"WARN: config field {key} differs from restored stage: "
                  f"checkpoint={want} current={got}")


def synthetic_batches(cfg: VideoLlavaConfig, batch_size: int,
                      seed: int = 0) -> Iterator[Dict]:
    """Random batches with the exact collator schema (smoke testing)."""
    rng = np.random.RandomState(seed)
    tpi = llava.visual_tokens_per_sample(cfg)
    while True:
        ids = np.concatenate([
            rng.randint(5, 100, (batch_size, 4)),
            np.full((batch_size, len(tpi)), IMAGE_TOKEN_INDEX),
            rng.randint(5, 100, (batch_size, 8)),
        ], axis=1)
        labels = np.where(ids == IMAGE_TOKEN_INDEX, -100, ids)
        if cfg.seg is not None and cfg.seg_token_idx > 0:
            labels[:, -2] = cfg.seg_token_idx
            ids[:, -2] = cfg.seg_token_idx
        plan = llava.build_splice_plan(ids, tpi, labels)
        s = cfg.vision.image_size
        batch = {
            "video": rng.rand(batch_size, cfg.num_frames, s, s,
                              3).astype(np.float32),
            "text_ids": plan.text_ids,
            "gather_idx": plan.gather_idx,
            "position_ids": plan.position_ids,
            "labels": plan.labels,
        }
        if cfg.seg is not None:
            from video_llava_seg_tpu.models import seg_head as shm

            ss = shm.make_sam2_cfg(cfg.seg).image_size
            t_cap, n_cap = cfg.seg.max_seg_frames, cfg.seg.max_objects
            batch.update({
                "seg_frames": rng.rand(batch_size, t_cap, ss, ss,
                                       3).astype(np.float32),
                "seg_masks": rng.rand(batch_size, n_cap, t_cap, ss,
                                      ss) > 0.7,
                "seg_valid": np.ones((batch_size, n_cap), bool),
                "seg_frame_valid": np.ones((batch_size, t_cap), bool),
                "seg_padding": np.zeros((batch_size, 4), np.int32),
                "seg_token_pos": np.full((batch_size, n_cap),
                                         plan.seq_lens[0] - 3, np.int32),
                "has_masks": np.ones((batch_size,), bool),
            })
        yield batch


def train(cfg: VideoLlavaConfig, tcfg: TrainConfig,
          data_args: Optional[DataConfig] = None,
          tokenizer=None, restore_weights: Optional[str] = None,
          synthetic: bool = False):
    mesh = create_mesh(tcfg.mesh)
    print(f"mesh: {mesh}")

    params = llava.init(jax.random.PRNGKey(tcfg.seed), cfg)
    if restore_weights:
        from video_llava_seg_tpu.convert.llava_torch import (
            load_llava_weights,
        )
        verify_config_consistency(cfg, restore_weights)
        params = load_llava_weights(restore_weights, cfg, params)
    if tcfg.bits:
        # k-bit training (reference --bits 4/8 + prepare_model_for_kbit_
        # training, train.py:395-426): quantize the LLM to weight-only
        # int8 — the 8B base drops 16 -> ~8 GB, which is what fits a
        # QLoRA-style stage-3 fine-tune on one 16 GB v5e. Quantized (int)
        # leaves are never trainable (train/optimizer.py::trainable_mask);
        # the LLM must therefore be frozen or LoRA-adapted.
        if not (tcfg.freeze_llm or tcfg.lora_enable):
            raise ValueError("bits requires freeze_llm or lora_enable "
                             "(the quantized base cannot take grads)")
        if tcfg.bits != 8:
            raise ValueError("training supports weight-only int8 only "
                             "(int4/W8A8 activation rounding has zero "
                             "gradient; those paths are serving-only)")
        from video_llava_seg_tpu.ops.quantization import quantize_tree

        params["llm"] = jax.jit(
            lambda t: quantize_tree(t, bits=tcfg.bits,
                                    train_mode=True))(params["llm"])
    if tcfg.lora_enable:
        from video_llava_seg_tpu.train import lora as lora_mod

        params["lora"] = lora_mod.init_lora(
            jax.random.PRNGKey(tcfg.seed + 1), params, tcfg.lora_rank,
            lora_mod.target_names(tcfg.lora_qv_proj_only))

    with mesh:
        params = shard_params(params, mesh, fsdp=tcfg.mesh.fsdp)
        state, tx = create_train_state(params, tcfg)
        from video_llava_seg_tpu.train.train_step import (
            canonical_state_shardings,
        )
        step_fn = make_train_step(
            cfg, tcfg, tx,
            state_shardings=canonical_state_shardings(state))

        if synthetic:
            data_iter = synthetic_batches(cfg, tcfg.per_device_batch_size
                                          * mesh.shape[tcfg.mesh.data_axis])
        else:
            from video_llava_seg_tpu.data.collate import (
                make_supervised_data_module,
            )
            module = make_supervised_data_module(tokenizer, cfg, data_args)
            dataset = module["train_dataset"]
            collator = module["data_collator"]
            bsz = (tcfg.per_device_batch_size
                   * mesh.shape[tcfg.mesh.data_axis])

            def gen():
                from video_llava_seg_tpu.data.sampler import (
                    LengthGroupedSampler,
                )
                lengths = getattr(dataset, "modality_lengths", None)
                if callable(lengths):
                    lengths = lengths()
                if lengths is not None:
                    # modality/length-grouped batches (llava_trainer.py:
                    # 55-78 sampler selection with group_by_modality_length)
                    sampler = LengthGroupedSampler(
                        tcfg.per_device_batch_size,
                        mesh.shape[tcfg.mesh.data_axis], list(lengths),
                        seed=tcfg.seed, group_by_modality=True)
                    while True:
                        buf = []
                        for k in sampler:
                            buf.append(k)
                            if len(buf) == bsz:
                                yield collator([dataset[int(i)]
                                                for i in buf])
                                buf = []
                else:
                    rng = np.random.RandomState(tcfg.seed)
                    order = rng.permutation(len(dataset))
                    i = 0
                    while True:
                        idx = [order[(i + j) % len(dataset)]
                               for j in range(bsz)]
                        i += bsz
                        yield collator([dataset[int(k)] for k in idx])

            from video_llava_seg_tpu.data.prefetch import (
                prefetch_to_device,
            )
            data_iter = prefetch_to_device(gen(), size=2)

        state = train_loop(state, step_fn, data_iter, tcfg, to_json(cfg))
        if tcfg.save_projector_only:
            from video_llava_seg_tpu.train.trainer import save_projector_only

            save_projector_only(tcfg.output_dir, state.params)
    return state


#: Stage presets mirroring the reference launch scripts
#: (scripts/train/llama3/stage{1,2,3}*.sh): dataset, freezes, LRs.
STAGE_PRESETS = {
    # stage1_pretrain.sh: projector-only warmup on caption data, lr 1e-3
    "stage1": dict(dataset="captions", freeze_llm=True,
                   freeze_vision_tower=True, lrs=dict(projector=1e-3),
                   with_seg=False, save_projector_only=True),
    # stage2_finetune.sh: full LLM+tower+projector finetune on captions
    "stage2": dict(dataset="captions", lrs=dict(llm=2e-5, vision_tower=2e-6,
                                                projector=2e-5),
                   with_seg=False),
    # stage3_with_seg.sh: + SAM2 seg head on ViCaS LG-VIS
    "stage3": dict(dataset="vicas", lrs=dict(llm=2e-5, vision_tower=2e-6,
                                             projector=2e-5,
                                             seg_encoder=2e-6,
                                             seg_decoder=2e-5),
                   with_seg=True),
}

#: LLM family presets (L9 parity: the reference ships BOTH a llama3 and a
#: vicuna script family — scripts/train/{llama3,vicuna}/stage{1,2,3}*.sh).
_LLM_FAMILIES = {
    "llama3_8b": dict(tokenizer="meta-llama/Meta-Llama-3-8B-Instruct",
                      conv_template="llava_llama_3", model_max_length=6144),
    # vicuna/stage*.sh: lmsys/vicuna-7b-v1.5, --version v1, budget 5824
    "vicuna_7b": dict(tokenizer="lmsys/vicuna-7b-v1.5",
                      conv_template="v1", model_max_length=5824),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(STAGE_PRESETS), default=None,
                    help="training stage preset (reference scripts parity)")
    ap.add_argument("--output_dir", default="output")
    ap.add_argument("--num_train_steps", type=int, default=1000)
    ap.add_argument("--per_device_batch_size", type=int, default=1)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=4)
    ap.add_argument("--model_parallel", type=int, default=1)
    ap.add_argument("--fsdp", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--restore_weights", default=None)
    ap.add_argument("--save_steps", type=int, default=2000)
    ap.add_argument("--bits", type=int, default=None, choices=(8,),
                    help="k-bit training: weight-only int8 LLM base "
                         "(QLoRA with --lora_enable; reference --bits)")
    ap.add_argument("--lora_enable", action="store_true")
    ap.add_argument("--lora_rank", type=int, default=64)
    ap.add_argument("--lora_alpha", type=float, default=16.0)
    ap.add_argument("--learning_rate", type=float, default=None,
                    help="override the LLM/projector peak LR")
    ap.add_argument("--vision_tower_lr", type=float, default=None)
    ap.add_argument("--tokenizer", default=None,
                    help="HF tokenizer id; defaults per --llm family")
    ap.add_argument("--llm", default="llama3_8b",
                    choices=("llama3_8b", "vicuna_7b"),
                    help="LLM family preset (reference llama3/ and vicuna/ "
                         "script families)")
    ap.add_argument("--conv_template", default=None,
                    help="supervised-preprocess template; defaults per "
                         "--llm (llava_llama_3 / v1)")
    ap.add_argument("--model_max_length", type=int, default=None,
                    help="token budget override (reference: 6144 llama3, "
                         "5824 vicuna)")
    args = ap.parse_args()

    from video_llava_seg_tpu.config import OptimGroupLRs

    preset = STAGE_PRESETS.get(args.stage, {})
    with_seg = preset.get("with_seg", True)
    cfg = (VideoLlavaConfig.tiny() if args.tiny else VideoLlavaConfig())
    # LLM family preset (L9 parity: scripts/train/{llama3,vicuna}/):
    # vicuna = Llama-2 arch + v1 conversation template + 5824 budget
    fam = _LLM_FAMILIES[args.llm]
    if not args.tiny and args.llm != "llama3_8b":
        from video_llava_seg_tpu.config import LlamaConfig

        cfg = dataclasses.replace(
            cfg, llm=getattr(LlamaConfig, args.llm)(),
            tokenizer_model_max_length=fam["model_max_length"])
    conv_template = args.conv_template or fam["conv_template"]
    if args.model_max_length is not None and not args.tiny:
        cfg = dataclasses.replace(
            cfg, tokenizer_model_max_length=args.model_max_length,
            llm=dataclasses.replace(cfg.llm,
                                    max_seq_len=args.model_max_length))
    if not with_seg and cfg.seg is not None:
        cfg = dataclasses.replace(cfg, seg=None)

    lr_over = dict(preset.get("lrs", {}))
    if args.learning_rate is not None:
        lr_over.update(llm=args.learning_rate, projector=args.learning_rate,
                       seg_decoder=args.learning_rate,
                       lora=args.learning_rate)
    if args.vision_tower_lr is not None:
        lr_over.update(vision_tower=args.vision_tower_lr,
                       seg_encoder=args.vision_tower_lr)
    tcfg = TrainConfig(
        output_dir=args.output_dir, num_train_steps=args.num_train_steps,
        per_device_batch_size=args.per_device_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        save_steps=args.save_steps,
        freeze_llm=preset.get("freeze_llm", False),
        freeze_vision_tower=preset.get("freeze_vision_tower", False),
        save_projector_only=preset.get("save_projector_only", False),
        bits=args.bits,
        lora_enable=args.lora_enable, lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        lrs=OptimGroupLRs(**lr_over),
        mesh=MeshConfig(model_parallel=args.model_parallel,
                        fsdp=args.fsdp))
    data_args = DataConfig(
        dataset=args.dataset or preset.get("dataset", "vicas"),
        conv_template=conv_template)
    tokenizer = None
    if not args.synthetic:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(
            args.tokenizer or fam["tokenizer"])
        cfg = initialize_vision_tokenizer(tokenizer, cfg,
                                          with_seg=with_seg)
    train(cfg, tcfg, data_args, tokenizer,
          restore_weights=args.restore_weights, synthetic=args.synthetic)


if __name__ == "__main__":
    main()
