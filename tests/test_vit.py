"""ViT tower parity vs transformers CLIPVisionModel."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from video_llava_seg_tpu.config import ProjectorConfig, VisionTowerConfig  # noqa: E402
from video_llava_seg_tpu.convert.hf_clip import convert_clip_vision  # noqa: E402
from video_llava_seg_tpu.models import projector as jproj  # noqa: E402
from video_llava_seg_tpu.models import vit  # noqa: E402

CFG = VisionTowerConfig(
    name="tiny-clip", image_size=56, patch_size=14, hidden_size=64,
    intermediate_size=128, num_layers=4, num_heads=4, select_layer=-2)


@pytest.fixture(scope="module")
def ref_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    torch.manual_seed(0)
    c = CLIPVisionConfig(
        hidden_size=CFG.hidden_size, intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
        image_size=CFG.image_size, patch_size=CFG.patch_size,
        hidden_act="quick_gelu")
    return CLIPVisionModel(c).eval()


def test_clip_tower_parity(ref_clip):
    sd = {k: v.numpy() for k, v in ref_clip.state_dict().items()}
    params = convert_clip_vision(sd, CFG.num_layers)
    x = torch.randn(2, 3, CFG.image_size, CFG.image_size)
    with torch.no_grad():
        out = ref_clip(x, output_hidden_states=True)
    ref_feat = out.hidden_states[CFG.select_layer][:, 1:]  # drop CLS
    feat = vit.apply(params, CFG, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_video_batch_shape(ref_clip):
    sd = {k: v.numpy() for k, v in ref_clip.state_dict().items()}
    params = convert_clip_vision(sd, CFG.num_layers)
    vid = jnp.zeros((2, 3, CFG.image_size, CFG.image_size, 3))
    feat = vit.apply(params, CFG, vid)
    assert feat.shape == (2, 3, CFG.num_patches, CFG.hidden_size)


def test_position_embedding_resize(ref_clip):
    sd = {k: v.numpy() for k, v in ref_clip.state_dict().items()}
    params = convert_clip_vision(sd, CFG.num_layers)
    big = VisionTowerConfig(**{**CFG.__dict__, "image_size": 112})
    params2 = vit.resize_position_embedding(params, big, CFG.image_size)
    n = big.num_patches + 1
    assert params2["position_embedding"].shape == (n, CFG.hidden_size)
    # compare against the reference's own resize math
    import torch.nn.functional as F
    pe = torch.from_numpy(np.asarray(params["position_embedding"]))
    cls_e, spatial = pe[:1], pe[1:]
    g = CFG.num_patches_per_side
    sp = spatial.reshape(g, g, -1).permute(2, 0, 1)[None]
    sp = F.interpolate(sp, (8, 8), mode="bicubic", align_corners=True)
    sp = sp[0].permute(1, 2, 0).reshape(64, -1)
    ref_pe = torch.cat([cls_e, sp], 0).numpy()
    np.testing.assert_allclose(np.asarray(params2["position_embedding"]),
                               ref_pe, atol=2e-5, rtol=2e-5)


def test_radio_shaped_tower():
    import jax
    cfg = VisionTowerConfig(
        name="radio-tiny", image_size=64, patch_size=16, hidden_size=32,
        intermediate_size=64, num_layers=2, num_heads=2, select_layer=-1,
        use_cls_token=False, is_radio=True, select_feature="patch")
    params = vit.init(jax.random.PRNGKey(0), cfg)
    feat = vit.apply(params, cfg, jnp.zeros((1, 64, 64, 3)))
    assert feat.shape == (1, 16, 32)


def test_projector_parity():
    import jax
    cfg = ProjectorConfig(projector_type="mlp2x_gelu", mm_hidden_size=32,
                          hidden_size=48)
    # build a torch-style state dict
    torch.manual_seed(1)
    l0 = torch.nn.Linear(32, 48)
    l1 = torch.nn.Linear(48, 48)
    sd = {"0.weight": l0.weight.detach().numpy(),
          "0.bias": l0.bias.detach().numpy(),
          "2.weight": l1.weight.detach().numpy(),
          "2.bias": l1.bias.detach().numpy()}
    params = jproj.convert_torch(sd, cfg)
    x = torch.randn(2, 5, 32)
    ref = l1(torch.nn.functional.gelu(l0(x))).detach().numpy()
    out = jproj.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_s2_multiscale_forward():
    """S2 wrapper (clip_encoder.py:142-197): channel concat over scales,
    base-grid token count, single-scale path == plain tower."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_llava_seg_tpu.config import VisionTowerConfig
    from video_llava_seg_tpu.models import vit

    cfg = VisionTowerConfig(name="tiny", image_size=28, patch_size=7,
                            hidden_size=32, intermediate_size=64,
                            num_layers=2, num_heads=4, select_layer=-1,
                            s2_scales=(28, 56))
    params = vit.init(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    out = vit.apply_s2(params, cfg, imgs)
    g0 = 28 // 7
    assert out.shape == (2, g0 * g0, 32 * 2)
    assert cfg.effective_hidden_size == 64

    # scale-0 channels must equal the plain tower on the resized input
    cfg1 = dataclasses.replace(cfg, s2_scales=())
    from video_llava_seg_tpu.ops.resize import interpolate
    small = interpolate(imgs, (28, 28), "bicubic")
    want = vit.apply(params, cfg1, small)
    np.testing.assert_allclose(np.asarray(out[..., :32]), np.asarray(want),
                               atol=1e-5)

    # video batch shape survives
    vid = imgs.reshape(1, 2, 56, 56, 3)
    out_v = vit.apply_s2(params, cfg, vid)
    np.testing.assert_allclose(np.asarray(out_v[0]), np.asarray(out),
                               atol=1e-6)
