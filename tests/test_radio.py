"""RADIO tower conversion + numeric parity vs a timm-style torch oracle.

The actual nvidia/RADIO weights load via HF remote code (unavailable
offline), so the oracle here is a faithful torch reimplementation of the
RADIO trunk architecture the converter targets: ViTPatchGenerator front end
(Linear patch embedder over (c,h,w)-flattened patches, abs pos embed on
patches only, cls token prepended after the pos add), timm pre-norm blocks
with fused qkv, final LayerNorm, input conditioner, spatial features with
cls/register tokens dropped (radio_encoder.py:69-90 uses exactly these
spatial features)."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from video_llava_seg_tpu.config import VisionTowerConfig  # noqa: E402
from video_llava_seg_tpu.convert.radio import convert_radio  # noqa: E402
from video_llava_seg_tpu.models import vit  # noqa: E402

CFG = VisionTowerConfig(
    name="radio-test", image_size=64, patch_size=16, hidden_size=48,
    intermediate_size=96, num_layers=3, num_heads=4, select_layer=-1,
    select_feature="patch", use_cls_token=False, is_radio=True,
    num_register_tokens=1, final_norm=True, layernorm_eps=1e-6)


class _TimmBlock(torch.nn.Module):
    def __init__(self, d, heads, inter):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(d, eps=1e-6)
        self.qkv = torch.nn.Linear(d, 3 * d)
        self.proj = torch.nn.Linear(d, d)
        self.norm2 = torch.nn.LayerNorm(d, eps=1e-6)
        self.fc1 = torch.nn.Linear(d, inter)
        self.fc2 = torch.nn.Linear(inter, d)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, n, d)
        x = x + self.proj(o)
        h = self.norm2(x)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))


class _RadioShaped(torch.nn.Module):
    def __init__(self, cfg: VisionTowerConfig, src_patch=None, src_grid=None):
        super().__init__()
        p = src_patch or cfg.patch_size
        g = src_grid or cfg.num_patches_per_side
        d = cfg.hidden_size
        self.patch = cfg.patch_size
        self.embedder = torch.nn.Linear(3 * p * p, d)
        self.pos_embed = torch.nn.Parameter(torch.randn(1, g * g, d) * 0.02)
        self.cls_token = torch.nn.Parameter(
            torch.randn(1, cfg.num_register_tokens, d) * 0.02)
        self.blocks = torch.nn.ModuleList(
            [_TimmBlock(d, cfg.num_heads, cfg.intermediate_size)
             for _ in range(cfg.num_layers)])
        self.norm = torch.nn.LayerNorm(d, eps=1e-6)
        self.register_buffer("norm_mean",
                             torch.tensor([0.48, 0.46, 0.41]))
        self.register_buffer("norm_std", torch.tensor([0.27, 0.26, 0.28]))

    def forward(self, x):  # x: [B, 3, H, W] in [0, 1]
        x = (x - self.norm_mean[None, :, None, None]) / \
            self.norm_std[None, :, None, None]
        b, c, hh, ww = x.shape
        p = self.patch
        # (c, p, p)-flattened patches — the ViTPatchLinear input order
        x = x.reshape(b, c, hh // p, p, ww // p, p)
        x = x.permute(0, 2, 4, 1, 3, 5).reshape(b, -1, c * p * p)
        x = self.embedder(x)
        x = x + self.pos_embed
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, self.cls_token.shape[1]:]

    def radio_state_dict(self):
        """State dict with the radio_model.* key layout."""
        sd = {}
        pg = "radio_model.model.patch_generator."
        sd[pg + "embedder.weight"] = self.embedder.weight.detach().numpy()
        sd[pg + "embedder.bias"] = self.embedder.bias.detach().numpy()
        sd[pg + "pos_embed"] = self.pos_embed.detach().numpy()
        sd[pg + "cls_token.token"] = self.cls_token.detach().numpy()
        for i, blk in enumerate(self.blocks):
            base = f"radio_model.model.blocks.{i}."
            for name, mod in (("norm1", blk.norm1), ("attn.qkv", blk.qkv),
                              ("attn.proj", blk.proj), ("norm2", blk.norm2),
                              ("mlp.fc1", blk.fc1), ("mlp.fc2", blk.fc2)):
                sd[base + name + ".weight"] = mod.weight.detach().numpy()
                sd[base + name + ".bias"] = mod.bias.detach().numpy()
        sd["radio_model.model.norm.weight"] = self.norm.weight.detach().numpy()
        sd["radio_model.model.norm.bias"] = self.norm.bias.detach().numpy()
        sd["radio_model.input_conditioner.norm_mean"] = \
            self.norm_mean.numpy()
        sd["radio_model.input_conditioner.norm_std"] = self.norm_std.numpy()
        return sd


def test_radio_parity():
    torch.manual_seed(0)
    ref = _RadioShaped(CFG).eval()
    params = convert_radio(ref.radio_state_dict(), CFG)
    x = torch.rand(2, 3, CFG.image_size, CFG.image_size)
    with torch.no_grad():
        want = ref(x).numpy()
    got = vit.apply(params, CFG, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == (2, CFG.num_patches, CFG.hidden_size)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_radio_patch_and_pos_interpolation():
    """Checkpoint with different patch size / grid loads via the bicubic
    adaptations (misc.py:19-46 load-time monkey patches)."""
    torch.manual_seed(1)
    ref = _RadioShaped(CFG, src_patch=8, src_grid=6)
    params = convert_radio(ref.radio_state_dict(), CFG)
    assert params["patch_embedding"]["kernel"].shape == (
        CFG.patch_size, CFG.patch_size, 3, CFG.hidden_size)
    assert params["position_embedding"].shape == (CFG.num_patches,
                                                  CFG.hidden_size)
    got = vit.apply(params, CFG,
                    jnp.zeros((1, CFG.image_size, CFG.image_size, 3)))
    assert got.shape == (1, CFG.num_patches, CFG.hidden_size)
    assert np.isfinite(np.asarray(got)).all()


def test_radio_full_checkpoint_path():
    """convert_llava_state_dict routes model.vision_tower...radio_model.*
    keys through the RADIO converter."""
    from video_llava_seg_tpu.config import (
        ProjectorConfig,
        VideoLlavaConfig,
    )
    from video_llava_seg_tpu.convert.llava_torch import (
        convert_llava_state_dict,
    )

    torch.manual_seed(2)
    ref = _RadioShaped(CFG).eval()
    sd = {"model.vision_tower.vision_tower." + k: v
          for k, v in ref.radio_state_dict().items()}
    base = VideoLlavaConfig.tiny()
    cfg = dataclasses.replace(
        base, vision=CFG,
        projector=ProjectorConfig(mm_hidden_size=CFG.hidden_size,
                                  hidden_size=base.projector.hidden_size))
    out = convert_llava_state_dict(sd, cfg)
    assert "vision_tower" in out
    assert len(out["vision_tower"]["layers"]) == CFG.num_layers


def test_radio_variant_table():
    cfg = VisionTowerConfig.radio("nvidia/RADIO")
    assert cfg.hidden_size == 1280 and cfg.num_layers == 32
    assert cfg.num_patches == (384 // 16) ** 2 == 576  # 576 slow tokens
    assert VisionTowerConfig.radio("nvidia/RADIO-L").hidden_size == 1024
    assert VisionTowerConfig.radio("nvidia/RADIO-B").hidden_size == 768
    with pytest.raises(ValueError):
        VisionTowerConfig.radio("nvidia/E-RADIO")
