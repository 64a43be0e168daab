"""Fused ViT encoder-layer megakernel (ops/vit_block.py) parity vs the
XLA oracle and the unfused tower path, incl. the custom-vjp backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.vit_block import (
    _xla_quick_gelu,
    vit_layer,
    vit_layer_supported,
    vit_layer_xla,
)


def make_layer(key, d, dff):
    ks = jax.random.split(key, 6)
    p = {
        "layer_norm1": nn.layer_norm_init(d),
        "q_proj": nn.dense_init(ks[0], d, d),
        "k_proj": nn.dense_init(ks[1], d, d),
        "v_proj": nn.dense_init(ks[2], d, d),
        "out_proj": nn.dense_init(ks[3], d, d),
        "layer_norm2": nn.layer_norm_init(d),
        "fc1": nn.dense_init(ks[4], d, dff),
        "fc2": nn.dense_init(ks[5], dff, d),
    }
    p["layer_norm1"]["scale"] = p["layer_norm1"]["scale"] * 1.2
    p["layer_norm2"]["bias"] = p["layer_norm2"]["bias"] + 0.05
    return p


@pytest.mark.parametrize("bt,sp,kv,d,heads,act", [
    (2, 40, 37, 128, 2, "quick_gelu"),    # CLIP-like, padded kv
    (4, 16, 16, 256, 4, "quick_gelu"),    # no padding, multi-frame step
    (1, 24, 21, 128, 1, "gelu"),          # RADIO-like activation
])
def test_kernel_matches_oracle(bt, sp, kv, d, heads, act):
    p = make_layer(jax.random.PRNGKey(0), d, d * 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (bt, sp, d), jnp.float32)
    act_f = _xla_quick_gelu if act == "quick_gelu" else nn.gelu
    want = vit_layer_xla(p, x, num_heads=heads, eps=1e-5, kv_len=kv,
                         act=act_f)
    got = vit_layer(p, x, num_heads=heads, eps=1e-5, kv_len=kv, act=act,
                    backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_pad_tokens_do_not_leak():
    """Real-token outputs must be identical whether the pad region holds
    zeros or garbage (pad keys masked; everything else token-local)."""
    d, heads, kv, sp = 128, 2, 21, 24
    p = make_layer(jax.random.PRNGKey(2), d, d * 4)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, sp, d))
    garbage = x.at[:, kv:].set(
        100.0 * jax.random.normal(jax.random.PRNGKey(4), (2, sp - kv, d)))
    a = vit_layer(p, x, num_heads=heads, eps=1e-5, kv_len=kv,
                  backend="pallas", interpret=True)
    b = vit_layer(p, garbage, num_heads=heads, eps=1e-5, kv_len=kv,
                  backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(a[:, :kv]), np.asarray(b[:, :kv]),
                               atol=1e-5, rtol=1e-5)


def test_backward_matches_oracle_grad():
    d, heads, kv, sp = 128, 2, 37, 40
    p = make_layer(jax.random.PRNGKey(5), d, d * 4)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, sp, d))

    def loss_k(x, p):
        y = vit_layer(p, x, num_heads=heads, eps=1e-5, kv_len=kv,
                      backend="pallas", interpret=True)
        return jnp.sum(y[:, :kv] ** 2)

    def loss_o(x, p):
        y = vit_layer_xla(p, x, num_heads=heads, eps=1e-5, kv_len=kv,
                          act=_xla_quick_gelu)
        return jnp.sum(y[:, :kv] ** 2)

    gx_k, gp_k = jax.grad(loss_k, argnums=(0, 1))(x, p)
    gx_o, gp_o = jax.grad(loss_o, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_o),
                               atol=1e-4, rtol=1e-4)
    for lk, lo in zip(jax.tree_util.tree_leaves(gp_k),
                      jax.tree_util.tree_leaves(gp_o)):
        np.testing.assert_allclose(np.asarray(lk), np.asarray(lo),
                                   atol=1e-4, rtol=1e-4)


def test_supported_gate():
    assert vit_layer_supported(584, 1024, 16)
    assert not vit_layer_supported(577, 1024, 16)   # unpadded tokens
    assert not vit_layer_supported(584, 1000, 8)    # lane-unaligned dim


def test_int8_w8a8_kernel_matches_oracle():
    """Fused W8A8 layer (in-kernel dynamic act quant + int8 dots) vs the
    XLA oracle running the same quantized params through nn.dense."""
    from video_llava_seg_tpu.ops.quantization import quantize_tree

    d, heads, kv, sp = 128, 2, 37, 40
    p = quantize_tree(make_layer(jax.random.PRNGKey(9), d, d * 4),
                      bits=8, act_quant=True, min_size=0)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, sp, d), jnp.float32)
    want = vit_layer_xla(p, x, num_heads=heads, eps=1e-5, kv_len=kv,
                         act=_xla_quick_gelu)
    got = vit_layer(p, x, num_heads=heads, eps=1e-5, kv_len=kv,
                    act="quick_gelu", backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_int8_weight_only_routes_to_xla():
    """Weight-only layers have no fused path: backend='pallas' must give
    the nn.dense weight-only result, not crash on the missing 'kernel'."""
    from video_llava_seg_tpu.ops.quantization import quantize_tree

    d, heads, sp = 128, 2, 24
    p = quantize_tree(make_layer(jax.random.PRNGKey(11), d, d * 4),
                      bits=8, act_quant=False, min_size=0)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, sp, d), jnp.float32)
    want = vit_layer_xla(p, x, num_heads=heads, eps=1e-5, kv_len=sp,
                         act=_xla_quick_gelu)
    got = vit_layer(p, x, num_heads=heads, eps=1e-5, kv_len=sp,
                    act="quick_gelu", backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_int8_pad_tokens_do_not_leak():
    from video_llava_seg_tpu.ops.quantization import quantize_tree

    d, heads, kv, sp = 128, 2, 21, 24
    p = quantize_tree(make_layer(jax.random.PRNGKey(13), d, d * 4),
                      bits=8, act_quant=True, min_size=0)
    x = jax.random.normal(jax.random.PRNGKey(14), (2, sp, d))
    garbage = x.at[:, kv:].set(
        100.0 * jax.random.normal(jax.random.PRNGKey(15), (2, sp - kv, d)))
    a = vit_layer(p, x, num_heads=heads, eps=1e-5, kv_len=kv,
                  backend="pallas", interpret=True)
    b = vit_layer(p, garbage, num_heads=heads, eps=1e-5, kv_len=kv,
                  backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(a[:, :kv]), np.asarray(b[:, :kv]),
                               atol=1e-5, rtol=1e-5)


def test_int8_tower_fused_matches_unfused():
    """vit.apply with a W8A8-quantized tower: fused int8 megakernel path
    (interpret) vs the per-op nn.dense composition."""
    from video_llava_seg_tpu.config import VisionTowerConfig
    from video_llava_seg_tpu.models import vit
    from video_llava_seg_tpu.ops.quantization import quantize_tree

    cfg = VisionTowerConfig(name="clip-vit-large-336", image_size=56,
                            patch_size=14, hidden_size=128, num_layers=3,
                            num_heads=2, intermediate_size=512,
                            select_layer=-2)
    params = quantize_tree(vit.init(jax.random.PRNGKey(16), cfg),
                           bits=8, act_quant=True, min_size=0)
    imgs = jax.random.normal(jax.random.PRNGKey(17), (2, 56, 56, 3))

    prev = vit.USE_FUSED_VIT_BLOCK
    try:
        vit.USE_FUSED_VIT_BLOCK = False
        plain = vit.apply(params, cfg, imgs)
        vit.USE_FUSED_VIT_BLOCK = True
        fused = vit.apply(params, cfg, imgs, interpret=True)
    finally:
        vit.USE_FUSED_VIT_BLOCK = prev
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=2e-4, rtol=2e-4)


def test_tower_fused_matches_unfused():
    """vit.apply end to end: fused megakernel path (interpret) vs the
    per-op composition, CLS + select_layer handling intact."""
    from video_llava_seg_tpu.config import VisionTowerConfig
    from video_llava_seg_tpu.models import vit

    cfg = VisionTowerConfig(name="clip-vit-large-336", image_size=56,
                            patch_size=14, hidden_size=128, num_layers=3,
                            num_heads=2, intermediate_size=512,
                            select_layer=-2)
    params = vit.init(jax.random.PRNGKey(7), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(8), (2, 56, 56, 3))

    prev = vit.USE_FUSED_VIT_BLOCK
    try:
        vit.USE_FUSED_VIT_BLOCK = False
        plain = vit.apply(params, cfg, imgs)
        vit.USE_FUSED_VIT_BLOCK = True
        fused = vit.apply(params, cfg, imgs, interpret=True)
    finally:
        vit.USE_FUSED_VIT_BLOCK = prev
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=2e-4, rtol=2e-4)
