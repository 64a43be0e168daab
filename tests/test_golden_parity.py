"""Self-test for scripts/golden_parity.py: build a tiny fake reference
checkpoint (real reference key layout, random weights) and verify every
module check reports parity. With a real artifact the same harness runs
unchanged — this is the accuracy leg's dress rehearsal."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/scripts")

from video_llava_seg_tpu.config import VideoLlavaConfig  # noqa: E402

CFG = VideoLlavaConfig.tiny()


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

    d = tmp_path_factory.mktemp("fake_ref_ckpt")
    torch.save({k: v.float() for k, v in sd.items()},
               str(d / "pytorch_model.bin"))
    return str(d)


def test_golden_parity_all_modules_pass(fake_ckpt, capsys):
    import golden_parity

    status = golden_parity.run(fake_ckpt, ["llm", "vision", "projector"],
                               seq=12, tol=2e-2, cfg=CFG)
    out = capsys.readouterr().out
    assert status == 0, out
    assert out.count("OK") == 3, out


def test_golden_parity_flags_converter_bug(fake_ckpt, capsys, monkeypatch):
    """Negative control: perturb OUR side only (a simulated converter
    bug) — the harness must FAIL that module, proving it can actually
    distinguish and not just compare a state dict with itself."""
    import golden_parity

    from video_llava_seg_tpu.models import projector as proj_mod

    real_apply = proj_mod.apply
    monkeypatch.setattr(proj_mod, "apply",
                        lambda params, x: real_apply(params, x) + 1.0)
    status = golden_parity.run(fake_ckpt, ["projector"], seq=8, tol=2e-2,
                               cfg=CFG)
    out = capsys.readouterr().out
    assert status == 1 and "FAIL" in out, out
