"""Self-test for scripts/golden_parity.py: build a tiny fake reference
checkpoint (real reference key layout, random weights) and verify every
module check reports parity. With a real artifact the same harness runs
unchanged — this is the accuracy leg's dress rehearsal.

Covers every converted module family: llm, vision, projector, seg head,
and the standalone SAM2 stack — plus negative controls proving the
harness catches planted converter bugs (it doesn't just compare a state
dict with itself)."""

import dataclasses
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/scripts")

from video_llava_seg_tpu.config import (  # noqa: E402
    SegHeadConfig,
    VideoLlavaConfig,
)
from video_llava_seg_tpu.models.sam2.config import (  # noqa: E402
    sam2_tiny_test_config,
)

CFG = VideoLlavaConfig.tiny()
SEG_CFG = dataclasses.replace(
    CFG, seg=SegHeadConfig(seg_backbone="tiny", seg_num_queries=2,
                           image_size=128))
TINY_SAM2 = sam2_tiny_test_config()


def _args(**kw):
    import argparse

    base = dict(seq=12, sam2_ckpt=None, sam2_variant="tiny",
                sam2_image_size=128, sam2_cfg_override=None)
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def fake_ckpt(tmp_path_factory):
    from transformers import (
        CLIPVisionConfig,
        CLIPVisionModel,
        LlamaConfig as HFConfig,
        LlamaForCausalLM,
    )

    torch.manual_seed(0)
    lc = CFG.llm
    llama_ref = LlamaForCausalLM(HFConfig(
        vocab_size=lc.vocab_size, hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_layers, num_attention_heads=lc.num_heads,
        num_key_value_heads=lc.num_kv_heads, head_dim=lc.head_dim,
        rms_norm_eps=lc.rms_norm_eps, rope_theta=lc.rope_theta,
        max_position_embeddings=lc.max_seq_len, attention_bias=False,
        tie_word_embeddings=False)).eval()
    vc = CFG.vision
    clip_ref = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=vc.hidden_size, intermediate_size=vc.intermediate_size,
        num_hidden_layers=vc.num_layers, num_attention_heads=vc.num_heads,
        image_size=vc.image_size, patch_size=vc.patch_size,
        hidden_act="quick_gelu")).eval()

    sd = dict(llama_ref.state_dict())
    sd.update({
        "model.vision_tower.vision_tower." + k: v
        for k, v in clip_ref.state_dict().items()
    })
    pc = CFG.projector
    sd["model.mm_projector.0.weight"] = torch.randn(
        pc.hidden_size, pc.mm_hidden_size) * 0.05
    sd["model.mm_projector.0.bias"] = torch.randn(pc.hidden_size) * 0.01
    sd["model.mm_projector.2.weight"] = torch.randn(
        pc.hidden_size, pc.hidden_size) * 0.05
    sd["model.mm_projector.2.bias"] = torch.randn(pc.hidden_size) * 0.01

    # seg head: real reference module state dict under model.seg_head.* —
    # WITHOUT no_mem_embed, exactly as a saved LLaVA checkpoint lacks it
    # (non-persistent attribute, llava/model/seg_head/sam2.py:24)
    from tests.reference_loader import load_reference_sam2

    load_reference_sam2()
    from tests.reference_builders import ref_sam2_base, ref_seg_head

    head = ref_seg_head(SEG_CFG.seg, TINY_SAM2, CFG.llm.hidden_size)
    sd.update({"model.seg_head." + k: v
               for k, v in head.state_dict().items()})

    d = tmp_path_factory.mktemp("fake_ref_ckpt")
    torch.save({k: v.float() for k, v in sd.items()},
               str(d / "pytorch_model.bin"))

    # standalone SAM2 backbone checkpoint ({'model': sd}, the
    # build_sam.py:141-151 layout) — supplies no_mem_embed for the seg leg
    # and the full stack for the sam2 leg. Built with the SAME seed as the
    # head so no_mem_embed matches what the head was wired with.
    sam2 = ref_sam2_base(TINY_SAM2)
    sam2_path = str(d / "sam2_backbone.pt")
    torch.save({"model": {k: v.float()
                          for k, v in sam2.state_dict().items()}}, sam2_path)
    return str(d), sam2_path


def test_golden_parity_all_modules_pass(fake_ckpt, capsys):
    import golden_parity

    ckpt_dir, _ = fake_ckpt
    status = golden_parity.run(ckpt_dir, ["llm", "vision", "projector"],
                               tol=2e-2, cfg=CFG, args=_args())
    out = capsys.readouterr().out
    assert status == 0, out
    assert out.count("OK") == 3, out


def test_golden_parity_seg_and_sam2_pass(fake_ckpt, capsys, monkeypatch):
    """The seg-head and SAM2 legs cover the remaining converted module
    families: Hiera/FPN features, proj_token, end-to-end mask logits, SAM
    heads, memory encoder, memory attention."""
    import golden_parity

    from video_llava_seg_tpu.models import seg_head as seg_mod

    monkeypatch.setattr(seg_mod, "make_sam2_cfg", lambda c: TINY_SAM2)
    ckpt_dir, sam2_ckpt = fake_ckpt
    status = golden_parity.run(
        ckpt_dir, ["seg", "sam2"], tol=2e-2, cfg=SEG_CFG,
        args=_args(sam2_ckpt=sam2_ckpt, sam2_cfg_override=TINY_SAM2))
    out = capsys.readouterr().out
    assert status == 0, out
    assert out.count("OK") == 2, out
    # per-module decomposition printed for diagnosis
    for probe in ("encoder=", "proj_token=", "masks=", "backbone=",
                  "heads=", "mem_enc=", "mem_attn="):
        assert probe in out, (probe, out)


def test_golden_parity_seg_requires_sam2_ckpt(fake_ckpt, capsys, monkeypatch):
    """Without --sam2_ckpt the seg leg must ERROR loudly about the
    non-serialized no_mem_embed rather than silently substituting."""
    import golden_parity

    from video_llava_seg_tpu.models import seg_head as seg_mod

    monkeypatch.setattr(seg_mod, "make_sam2_cfg", lambda c: TINY_SAM2)
    ckpt_dir, _ = fake_ckpt
    status = golden_parity.run(ckpt_dir, ["seg"], tol=2e-2, cfg=SEG_CFG,
                               args=_args(sam2_ckpt=None))
    out = capsys.readouterr().out
    assert status == 2 and "no_mem_embed" in out, out


def test_golden_parity_flags_converter_bug(fake_ckpt, capsys, monkeypatch):
    """Negative control: perturb OUR side only (a simulated converter
    bug) — the harness must FAIL that module, proving it can actually
    distinguish and not just compare a state dict with itself."""
    import golden_parity

    from video_llava_seg_tpu.models import projector as proj_mod

    real_apply = proj_mod.apply
    monkeypatch.setattr(proj_mod, "apply",
                        lambda params, x: real_apply(params, x) + 1.0)
    ckpt_dir, _ = fake_ckpt
    status = golden_parity.run(ckpt_dir, ["projector"], tol=2e-2, cfg=CFG,
                               args=_args(seq=8))
    out = capsys.readouterr().out
    assert status == 1 and "FAIL" in out, out


def test_golden_parity_flags_seg_transpose_bug(fake_ckpt, capsys,
                                               monkeypatch):
    """Planted TRANSPOSE bug in the seg-head converter (the classic silent
    corruption random-weight CI can't catch with real stats): transpose
    proj_token's kernel — the seg leg must FAIL."""
    import golden_parity

    from video_llava_seg_tpu.models import seg_head as seg_mod

    monkeypatch.setattr(seg_mod, "make_sam2_cfg", lambda c: TINY_SAM2)
    real_convert = seg_mod.convert_torch

    def bugged(sd, cfg, sam2_cfg, prefix="", no_mem_embed=None):
        p = real_convert(sd, cfg, sam2_cfg, prefix, no_mem_embed)
        k = p["proj_token"]["kernel"]
        assert k.shape[0] == k.shape[1], "fixture must make this square"
        p["proj_token"]["kernel"] = k.T
        return p

    monkeypatch.setattr(seg_mod, "convert_torch", bugged)
    ckpt_dir, sam2_ckpt = fake_ckpt
    status = golden_parity.run(ckpt_dir, ["seg"], tol=2e-2, cfg=SEG_CFG,
                               args=_args(sam2_ckpt=sam2_ckpt))
    out = capsys.readouterr().out
    assert status == 1 and "FAIL" in out, out


def test_golden_parity_flags_sam2_bug(fake_ckpt, capsys, monkeypatch):
    """Planted bug in the SAM2 memory-attention converter — the sam2 leg
    must FAIL (and the decomposition must localize it to mem_attn)."""
    import golden_parity

    from video_llava_seg_tpu.convert import sam2_torch

    real = sam2_torch.convert_memory_attention

    def bugged(sd, cfg, prefix="memory_attention."):
        p = real(sd, cfg, prefix)
        import jax

        return jax.tree.map(lambda x: x * 1.5, p)

    monkeypatch.setattr(sam2_torch, "convert_memory_attention", bugged)
    # convert_sam2_base imported the name at module level? it calls via
    # module attribute inside convert_sam2_base — patch both paths
    monkeypatch.setattr(
        "video_llava_seg_tpu.convert.sam2_torch.convert_memory_attention",
        bugged)
    ckpt_dir, sam2_ckpt = fake_ckpt
    status = golden_parity.run(
        None, ["sam2"], tol=2e-2, cfg=SEG_CFG,
        args=_args(sam2_ckpt=sam2_ckpt, sam2_cfg_override=TINY_SAM2))
    out = capsys.readouterr().out
    assert status == 1 and "FAIL" in out, out
