"""Golden-activation parity against a REAL reference checkpoint.

CI proves module parity with random weights (tests/ instantiate the
actual reference torch modules); this harness closes the remaining
accuracy leg the moment a real artifact is available (no checkpoints ship
in this environment): it loads the SAME torch weights into (a) the
reference-architecture torch modules and (b) our params via the
converters, runs identical inputs through both, and reports per-module
max relative error.

Usage (flagship Llama-3-8B + CLIP-L-336 layout, the published model):
  python scripts/golden_parity.py --torch_dir /path/to/ckpt \
      [--modules llm,vision,projector] [--seq 16] [--tol 2e-2] [--tiny-cfg]

Reference load contracts: llava/train/misc.py:49-121 (key layout, vocab
pad-by-mean), llava/model/builder.py:34-200.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _rel(got, want):
    denom = float(np.std(want)) + 1e-9
    return float(np.abs(np.asarray(got) - np.asarray(want)).max()) / denom


def check_llm(sd, cfg, seq: int) -> float:
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    import jax.numpy as jnp

    from video_llava_seg_tpu.convert.llava_torch import convert_llava_state_dict
    from video_llava_seg_tpu.models import llama

    llm_sd = {k: v for k, v in sd.items()
              if k.startswith(("model.layers", "model.embed_tokens",
                               "model.norm", "lm_head"))}
    vocab = llm_sd["model.embed_tokens.weight"].shape[0]
    lc = cfg.llm
    hf = HFConfig(
        vocab_size=vocab, hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_layers, num_attention_heads=lc.num_heads,
        num_key_value_heads=lc.num_kv_heads, head_dim=lc.head_dim,
        rms_norm_eps=lc.rms_norm_eps, rope_theta=lc.rope_theta,
        max_position_embeddings=lc.max_seq_len, attention_bias=False,
        tie_word_embeddings=lc.tie_word_embeddings)
    ref = LlamaForCausalLM(hf).eval()
    ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in llm_sd.items()},
        strict=True)

    params = convert_llava_state_dict(llm_sd, cfg)["llm"]
    ids = np.random.default_rng(0).integers(0, vocab, (1, seq))
    with torch.no_grad():
        want = ref(torch.from_numpy(ids)).logits.numpy()
    embeds = llama.embed(params, jnp.asarray(ids))
    logits, _ = llama.forward(params, lc, embeds, jnp.arange(seq))
    return _rel(np.asarray(logits)[..., :vocab], want)


def check_vision(sd, cfg) -> float:
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    import jax.numpy as jnp

    from video_llava_seg_tpu.convert.llava_torch import convert_llava_state_dict
    from video_llava_seg_tpu.models import vit

    vc = cfg.vision
    hf = CLIPVisionConfig(
        hidden_size=vc.hidden_size, intermediate_size=vc.intermediate_size,
        num_hidden_layers=vc.num_layers, num_attention_heads=vc.num_heads,
        image_size=vc.image_size, patch_size=vc.patch_size,
        hidden_act="quick_gelu")
    ref = CLIPVisionModel(hf).eval()
    prefix = "model.vision_tower.vision_tower."
    vt_sd = {k[len(prefix):]: torch.from_numpy(np.asarray(v))
             for k, v in sd.items() if k.startswith(prefix)}
    ref.load_state_dict(vt_sd, strict=True)

    params = convert_llava_state_dict(sd, cfg)["vision_tower"]
    x = np.random.default_rng(1).normal(
        size=(2, 3, vc.image_size, vc.image_size)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(x), output_hidden_states=True)
    want = out.hidden_states[vc.select_layer][:, 1:].numpy()
    got = vit.apply(params, vc, jnp.asarray(x.transpose(0, 2, 3, 1)))
    return _rel(got, want)


def check_projector(sd, cfg) -> float:
    import torch

    import jax.numpy as jnp

    from video_llava_seg_tpu.convert.llava_torch import convert_llava_state_dict
    from video_llava_seg_tpu.models import projector as proj_mod

    keys = sorted(k for k in sd if k.startswith("model.mm_projector.")
                  and k.endswith(".weight"))
    if not keys:
        raise KeyError("no mm_projector weights in checkpoint")
    params = convert_llava_state_dict(sd, cfg)["mm_projector"]
    x = np.random.default_rng(2).normal(
        size=(3, cfg.projector.mm_hidden_size)).astype(np.float32)

    t = torch.from_numpy(x)
    with torch.no_grad():
        for i, k in enumerate(keys):
            w = torch.from_numpy(np.asarray(sd[k]))
            b = torch.from_numpy(np.asarray(sd[k[:-len("weight")] + "bias"]))
            if i > 0:
                t = torch.nn.functional.gelu(t)
            t = t @ w.T + b
    got = proj_mod.apply(params, jnp.asarray(x))
    return _rel(got, t.numpy())


CHECKS = {"llm": lambda sd, cfg, seq: check_llm(sd, cfg, seq),
          "vision": lambda sd, cfg, seq: check_vision(sd, cfg),
          "projector": lambda sd, cfg, seq: check_projector(sd, cfg)}


def run(torch_dir: str, modules, seq: int, tol: float, cfg=None) -> int:
    from video_llava_seg_tpu.config import VideoLlavaConfig
    from video_llava_seg_tpu.convert.llava_torch import load_torch_shards

    cfg = cfg or VideoLlavaConfig()
    sd = load_torch_shards(torch_dir)
    status = 0
    for m in modules:
        try:
            rel = CHECKS[m](sd, cfg, seq)
        except Exception as e:
            print(f"{m:10s} ERROR  {type(e).__name__}: {e}")
            status = 2
            continue
        ok = rel < tol
        print(f"{m:10s} {'OK  ' if ok else 'FAIL'}  max_rel={rel:.2e}"
              f" (tol {tol:g})")
        status = status or (0 if ok else 1)
    return status


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_dir", required=True)
    ap.add_argument("--modules", default="llm,vision,projector")
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--tol", type=float, default=2e-2)
    ap.add_argument("--tiny-cfg", action="store_true",
                    help="VideoLlavaConfig.tiny() instead of the flagship"
                         " layout (self-test fixtures)")
    args = ap.parse_args()
    cfg = None
    if args.tiny_cfg:
        from video_llava_seg_tpu.config import VideoLlavaConfig

        cfg = VideoLlavaConfig.tiny()
    sys.exit(run(args.torch_dir, args.modules.split(","), args.seq,
                 args.tol, cfg))


if __name__ == "__main__":
    main()
