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
    want = np.asarray(want)
    # std is the scale for tensor outputs; single-element outputs (e.g.
    # object_score_logits [1,1]) have std 0 — fall back to their magnitude
    denom = float(np.std(want)) or float(np.abs(want).max()) or 1.0
    return float(np.abs(np.asarray(got) - want).max()) / denom


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


def _ref_builders():
    """Import the cfg-parameterized reference torch module builders
    (tests/reference_builders.py) with the reference import shims."""
    import os.path as osp
    import sys as _sys

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    if repo not in _sys.path:
        _sys.path.insert(0, repo)
    from tests.reference_loader import load_reference_sam2

    load_reference_sam2()
    from tests import reference_builders

    return reference_builders


def check_seg(sd, cfg, sam2_ckpt=None):
    """Seg head (the novel component): per-module parity of the encoder
    features, the mask logits, and proj_token vs the reference torch
    SegmentationHeadSAM2 loaded with the SAME checkpoint weights
    (/root/reference/llava/model/seg_head/sam2.py:11-182). Returns the max
    rel across the three probes; prints the decomposition."""
    import torch

    import jax.numpy as jnp

    from video_llava_seg_tpu.models import seg_head as jhead

    rb = _ref_builders()
    if cfg.seg is None:
        raise ValueError("config has no seg head")
    sam2_cfg = jhead.make_sam2_cfg(cfg.seg)

    seg_sd = {k[len("model.seg_head."):]: np.asarray(v)
              for k, v in sd.items() if k.startswith("model.seg_head.")}
    if not seg_sd:
        raise KeyError("no model.seg_head.* weights in checkpoint")

    no_mem = seg_sd.get("no_mem_embed")
    if no_mem is None:
        if sam2_ckpt is None:
            raise KeyError(
                "checkpoint has no seg_head.no_mem_embed (the reference "
                "never serializes it) — pass --sam2_ckpt with the SAM2 "
                "backbone checkpoint")
        ck = torch.load(sam2_ckpt, map_location="cpu", weights_only=True)
        no_mem = ck.get("model", ck)["no_mem_embed"].float().numpy()

    ref = rb.ref_seg_head(cfg.seg, sam2_cfg, cfg.llm.hidden_size)
    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in seg_sd.items()
           if k != "no_mem_embed"}
    for buf in ("image_mean", "image_std"):  # constants, may be absent
        tsd.setdefault(buf, dict(ref.state_dict())[buf])
    ref.load_state_dict(tsd, strict=True)
    nm = torch.from_numpy(np.asarray(no_mem, np.float32))
    ref.no_mem_embed = (nm.permute(0, 2, 1)[:, :, :, None]
                        if nm.ndim == 3 else nm)

    params = jhead.convert_torch(seg_sd, cfg.seg, sam2_cfg,
                                 no_mem_embed=no_mem)

    s = sam2_cfg.image_size
    rng = np.random.default_rng(3)
    frames = rng.random((2, 3, s, s), np.float32)
    tokens = rng.normal(size=(2, cfg.llm.hidden_size)).astype(np.float32)
    meta = {"padding": (0, 0, 0, 0), "resized_image_size": (s, s),
            "orig_image_size": (s // 2, s // 2)}

    # (a) encoder features (Hiera + FPN + conv_s0/s1 + no_mem_embed)
    with torch.no_grad():
        want_feats, want_high = ref.encode_video_frames(
            torch.from_numpy(frames))
    got_feats, got_high = jhead.encode_video_frames(
        params, sam2_cfg, jnp.asarray(frames.transpose(0, 2, 3, 1)))
    rel_enc = _rel(np.asarray(got_feats),
                   want_feats.numpy().transpose(0, 2, 3, 1))

    # (b) proj_token
    with torch.no_grad():
        want_proj = ref.proj_token(torch.from_numpy(tokens)).numpy()
    got_proj = np.asarray(jnp.dot(jnp.asarray(tokens),
                                  params["proj_token"]["kernel"])
                          + params["proj_token"]["bias"])
    rel_proj = _rel(got_proj, want_proj)

    # (c) end-to-end mask logits (prompt encoder + mask decoder +
    # postprocess — the product surface)
    with torch.no_grad():
        want_masks = ref(video_frames=[torch.from_numpy(frames)],
                         seg_tokens=[torch.from_numpy(tokens)],
                         seg_meta=[meta], resize_to_original_dims=True)[0]
    got_masks = jhead.forward(
        params, cfg.seg, sam2_cfg,
        [jnp.asarray(frames.transpose(0, 2, 3, 1))],
        [jnp.asarray(tokens)], [meta], resize_to_original_dims=True)[0]
    rel_masks = _rel(np.asarray(got_masks), want_masks.numpy())

    print(f"  seg: encoder={rel_enc:.2e} proj_token={rel_proj:.2e} "
          f"masks={rel_masks:.2e}")
    return max(rel_enc, rel_proj, rel_masks)


def check_sam2(sam2_ckpt, variant, image_size: int = 1024, cfg_override=None):
    """Standalone SAM2 stack: load the torch checkpoint into the reference
    modules with strict=True (the build_sam.py:141-151 contract) AND through
    convert_sam2_torch; compare backbone features, SAM-head outputs, memory
    encoder, and memory attention. Returns max rel; prints decomposition."""
    import torch

    import jax.numpy as jnp

    from video_llava_seg_tpu.convert.sam2_torch import convert_sam2_base
    from video_llava_seg_tpu.models.sam2 import base as jbase
    from video_llava_seg_tpu.models.sam2 import memory as jmem
    from video_llava_seg_tpu.models.sam2.config import sam2_config

    rb = _ref_builders()
    cfg = cfg_override or sam2_config(variant, image_size=image_size)

    ck = torch.load(sam2_ckpt, map_location="cpu", weights_only=True)
    tsd = {k: v.float() for k, v in ck.get("model", ck).items()}

    ref = rb.ref_sam2_base(cfg)
    ref.load_state_dict(tsd, strict=True)  # missing/unexpected keys -> error
    ref = ref.eval()

    params = convert_sam2_base({k: v.numpy() for k, v in tsd.items()}, cfg)

    s = cfg.image_size
    rng = np.random.default_rng(4)
    img = rng.normal(size=(1, 3, s, s)).astype(np.float32)
    with torch.no_grad():
        bo = ref.forward_image(torch.from_numpy(img))
        _, vfeats, vpos, sizes = ref._prepare_backbone_features(bo)
        pts = torch.tensor([[[0.4 * s, 0.5 * s]]])
        lbl = torch.tensor([[1]], dtype=torch.int32)
        e = cfg.image_embedding_size
        pix = vfeats[-1].permute(1, 2, 0).view(1, -1, e, e)
        high_res = [
            x.permute(1, 2, 0).view(x.size(1), x.size(2), *sz)
            for x, sz in zip(vfeats[:-1], sizes[:-1])
        ]
        want_heads = ref._forward_sam_heads(
            backbone_features=pix,
            point_inputs={"point_coords": pts, "point_labels": lbl},
            high_res_features=high_res, multimask_output=True)

    jbo = jbase.forward_image(params, cfg,
                              jnp.asarray(img.transpose(0, 2, 3, 1)))
    jfeats, jpos, jsizes = jbase.prepare_backbone_features(cfg, jbo)
    rel_bb = max(
        _rel(np.asarray(jf),
             rf.permute(1, 0, 2).reshape(1, *sz, -1).numpy())
        for jf, rf, sz in zip(jfeats, vfeats, sizes))

    jheads = jbase.forward_sam_heads(
        params, cfg, jfeats[-1],
        point_coords=jnp.asarray(pts.numpy()),
        point_labels=jnp.asarray(lbl.numpy()),
        high_res_features=jfeats[:-1], multimask_output=True)
    rel_heads = max(
        _rel(np.asarray(j), r.detach().numpy())
        for j, r in zip(jheads, want_heads))

    # memory encoder on the predicted mask
    with torch.no_grad():
        want_mem = ref.memory_encoder(pix, want_heads[4],
                                      skip_mask_sigmoid=False)
    got_mem, _ = jmem.memory_encoder_apply(
        params["memory_encoder"], cfg,
        jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(want_heads[4].numpy().transpose(0, 2, 3, 1)),
        skip_mask_sigmoid=False)
    rel_mem = _rel(np.asarray(got_mem),
                   want_mem["vision_features"].numpy().transpose(0, 2, 3, 1))

    # memory attention over one stored memory + object pointers
    n = e * e
    n_ptr = 4
    mem = rng.normal(size=(n + n_ptr, 1, cfg.mem_dim)).astype(np.float32)
    mem_pos = rng.normal(size=(n + n_ptr, 1, cfg.mem_dim)).astype(np.float32)
    cur = rng.normal(size=(n, 1, cfg.hidden_dim)).astype(np.float32)
    cur_pos = rng.normal(size=(n, 1, cfg.hidden_dim)).astype(np.float32)
    with torch.no_grad():
        want_ma = ref.memory_attention(
            curr=torch.from_numpy(cur), memory=torch.from_numpy(mem),
            curr_pos=torch.from_numpy(cur_pos),
            memory_pos=torch.from_numpy(mem_pos),
            num_obj_ptr_tokens=n_ptr)
    got_ma = jmem.memory_attention_apply(
        params["memory_attention"], cfg,
        jnp.asarray(cur.transpose(1, 0, 2)),
        jnp.asarray(mem.transpose(1, 0, 2)),
        jnp.asarray(cur_pos.transpose(1, 0, 2)),
        jnp.asarray(mem_pos.transpose(1, 0, 2)),
        num_obj_ptr_tokens=n_ptr)
    rel_ma = _rel(np.asarray(got_ma)[0], want_ma.numpy()[:, 0])

    print(f"  sam2: backbone={rel_bb:.2e} heads={rel_heads:.2e} "
          f"mem_enc={rel_mem:.2e} mem_attn={rel_ma:.2e}")
    return max(rel_bb, rel_heads, rel_mem, rel_ma)


CHECKS = {"llm": lambda sd, cfg, a: check_llm(sd, cfg, a.seq),
          "vision": lambda sd, cfg, a: check_vision(sd, cfg),
          "projector": lambda sd, cfg, a: check_projector(sd, cfg),
          "seg": lambda sd, cfg, a: check_seg(sd, cfg, a.sam2_ckpt)}


def run(torch_dir, modules, tol: float, cfg=None, args=None) -> int:
    from video_llava_seg_tpu.config import VideoLlavaConfig
    from video_llava_seg_tpu.convert.llava_torch import load_torch_shards

    cfg = cfg or VideoLlavaConfig()
    args = args or argparse.Namespace(seq=16, sam2_ckpt=None,
                                      sam2_variant="small",
                                      sam2_image_size=1024)
    sd = load_torch_shards(torch_dir) if torch_dir else {}
    status = 0
    for m in modules:
        try:
            if m == "sam2":
                if not args.sam2_ckpt:
                    raise ValueError("--sam2_ckpt required for the sam2 leg")
                rel = check_sam2(args.sam2_ckpt, args.sam2_variant,
                                 args.sam2_image_size,
                                 getattr(args, "sam2_cfg_override", None))
            else:
                rel = CHECKS[m](sd, cfg, args)
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
    ap.add_argument("--torch_dir", default=None,
                    help="LLaVA checkpoint dir (required for all legs "
                         "except a standalone --modules sam2 run)")
    ap.add_argument("--modules", default="llm,vision,projector,seg")
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--tol", type=float, default=2e-2)
    ap.add_argument("--sam2_ckpt", default=None,
                    help="SAM2 backbone .pt checkpoint: enables the sam2 "
                         "leg and supplies no_mem_embed for the seg leg")
    ap.add_argument("--sam2_variant", default="small",
                    help="tiny|small|base_plus|large (or any alias)")
    ap.add_argument("--sam2_image_size", type=int, default=1024)
    ap.add_argument("--tiny-cfg", action="store_true",
                    help="VideoLlavaConfig.tiny() instead of the flagship"
                         " layout (self-test fixtures)")
    args = ap.parse_args()
    cfg = None
    if args.tiny_cfg:
        from video_llava_seg_tpu.config import VideoLlavaConfig

        cfg = VideoLlavaConfig.tiny()
    modules = args.modules.split(",")
    if args.torch_dir is None and any(m != "sam2" for m in modules):
        ap.error("--torch_dir is required unless --modules sam2")
    sys.exit(run(args.torch_dir, modules, args.tol, cfg, args))


if __name__ == "__main__":
    main()
