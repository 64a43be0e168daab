"""Fused Hiera block megakernel (ops/hiera_block.py) parity vs the XLA
oracle and the legacy per-op composition, including the custom-vjp
backward and the hiera.apply wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.hiera_block import (
    hiera_block,
    hiera_block_supported,
    hiera_block_xla,
)


def make_block(key, din, dout, hidden_mul=4, with_proj=False):
    ks = jax.random.split(key, 4)
    blk = {
        "norm1": nn.layer_norm_init(din),
        "qkv": nn.dense_init(ks[0], din, dout * 3),
        "proj_attn": nn.dense_init(ks[1], dout, dout),
        "norm2": nn.layer_norm_init(dout),
        "mlp": nn.mlp_init(ks[2], [dout, dout * hidden_mul, dout]),
    }
    # non-trivial norm affine so LN parity is actually exercised
    blk["norm1"]["scale"] = blk["norm1"]["scale"] * 1.3
    blk["norm2"]["bias"] = blk["norm2"]["bias"] + 0.1
    if with_proj:
        blk["proj"] = nn.dense_init(ks[3], din, dout)
    return blk


@pytest.mark.parametrize("shape,heads,ws,ps,proj", [
    ((2, 16, 16, 64), 2, 8, 1, False),      # regular windowed block
    ((1, 16, 24, 96), 2, 4, 1, False),      # hd 48, non-square map
    ((2, 16, 16, 64), 2, 8, 2, True),       # q-pool + dim-change shortcut
    ((1, 32, 32, 48), 1, 8, 2, True),       # q-pool, single head, hd 96
])
def test_kernel_matches_oracle(shape, heads, ws, ps, proj):
    b, h, w, din = shape
    dout = din * 2 if proj else din
    blk = make_block(jax.random.PRNGKey(0), din, dout, with_proj=proj)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    q_stride = (ps, ps) if ps > 1 else None
    want = hiera_block_xla(blk, x, num_heads=heads, ws=ws,
                           q_stride=q_stride, eps=1e-6)
    got = hiera_block(blk, x, num_heads=heads, ws=ws, q_stride=q_stride,
                      eps=1e-6, backend="pallas", interpret=True)
    assert got.shape == (b, h // ps, w // ps, dout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_oracle_matches_legacy_apply():
    """The XLA oracle must equal the legacy partition-based block inside
    hiera.apply (all fusion flags off)."""
    from video_llava_seg_tpu.models.sam2 import hiera
    from video_llava_seg_tpu.models.sam2.config import HieraConfig

    cfg = HieraConfig(embed_dim=32, num_heads=2, stages=(1, 1, 1, 1),
                      global_att_blocks=(),
                      window_pos_embed_bkg_spatial_size=(7, 7),
                      window_spec=(8, 4, 4, 4))
    params = hiera.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))

    prev = (hiera.USE_FUSED_BLOCK, hiera.USE_FUSED_WINDOW_ATTN)
    try:
        hiera.USE_FUSED_BLOCK = False
        hiera.USE_FUSED_WINDOW_ATTN = False
        legacy = hiera.apply(params, cfg, x)
        hiera.USE_FUSED_BLOCK = True    # CPU: routes to the XLA oracle
        fused = hiera.apply(params, cfg, x)
    finally:
        hiera.USE_FUSED_BLOCK, hiera.USE_FUSED_WINDOW_ATTN = prev
    for a, b in zip(fused, legacy):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shape,heads,ws,ps,proj", [
    ((1, 8, 8, 32), 2, 4, 2, True),        # even windows + q-pool
    ((1, 14, 14, 32), 2, 7, 1, False),     # gap-stored odd window
    ((1, 8, 8, 32), 2, 0, 1, False),       # global attention
])
def test_backward_matches_oracle_grad(shape, heads, ws, ps, proj):
    din = shape[-1]
    dout = din * 2 if proj else din
    blk = make_block(jax.random.PRNGKey(2), din, dout, with_proj=proj)
    x = jax.random.normal(jax.random.PRNGKey(3), shape)
    q_stride = (ps, ps) if ps > 1 else None

    def loss_k(x, blk):
        y = hiera_block(blk, x, num_heads=heads, ws=ws, q_stride=q_stride,
                        eps=1e-6, backend="pallas", interpret=True)
        return jnp.sum(y * y)

    def loss_o(x, blk):
        y = hiera_block_xla(blk, x, num_heads=heads, ws=ws,
                            q_stride=q_stride, eps=1e-6)
        return jnp.sum(y * y)

    gx_k, gb_k = jax.grad(loss_k, argnums=(0, 1))(x, blk)
    gx_o, gb_o = jax.grad(loss_o, argnums=(0, 1))(x, blk)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_o),
                               atol=1e-4, rtol=1e-4)
    for lk, lo in zip(jax.tree_util.tree_leaves(gb_k),
                      jax.tree_util.tree_leaves(gb_o)):
        np.testing.assert_allclose(np.asarray(lk), np.asarray(lo),
                                   atol=1e-4, rtol=1e-4)


def test_supported_gate():
    assert hiera_block_supported(64, 64, 8, 1)
    assert hiera_block_supported(64, 64, 14, 1)       # padded in-kernel
    assert hiera_block_supported(70, 70, 14, 1)       # ws14-divisible map
    assert hiera_block_supported(64, 64, 7, 1)        # odd: gap-stored @8
    assert hiera_block_supported(64, 64, 14, 2)       # pooled side 7 @16
    assert not hiera_block_supported(64, 64, 7, 2)    # pool !| window
    assert hiera_block_supported(64, 64, 0, 1)        # global: q-chunked
    assert not hiera_block_supported(64, 48, 0, 1)    # global non-square
    assert not hiera_block_supported(64, 64, 0, 2)    # global + q-pool


def test_every_variant_block_fused_at_1024():
    """All four SAM2 Hiera variants: every block (windowed, padded, odd
    window, q-pool transition, global) must be megakernel-eligible at the
    1024^2 serving size — no XLA fallbacks left in the trunk."""
    from video_llava_seg_tpu.models.sam2.config import _HIERA_VARIANTS
    from video_llava_seg_tpu.models.sam2.hiera import _block_dims

    for variant, cfg in _HIERA_VARIANTS.items():
        h = w = 1024 // cfg.patch_stride
        for i, (din, dout, heads, ws, has_pool) in enumerate(
                _block_dims(cfg)):
            ps = cfg.q_stride[0] if has_pool else 1
            assert hiera_block_supported(h, w, ws, ps), (variant, i, ws, ps)
            h, w = h // ps, w // ps


def test_mlp_chunking_paths():
    """Force multi-chunk MLP (rows split) and verify parity."""
    from video_llava_seg_tpu.ops import hiera_block as hb

    blk = make_block(jax.random.PRNGKey(4), 32, 32, hidden_mul=4)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 32))
    want = hiera_block_xla(blk, x, num_heads=1, ws=4, q_stride=None,
                           eps=1e-6)
    orig = hb._row_chunks
    try:
        hb._row_chunks = lambda rows, wp, width, ps=1, budget=0: (
            4 if rows % 4 == 0 else 1)
        got = hiera_block(blk, x, num_heads=1, ws=4, eps=1e-6,
                          backend="pallas", interpret=True)
    finally:
        hb._row_chunks = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("shape,heads,ws,ps,proj", [
    ((1, 18, 10, 32), 2, 4, 1, False),     # pad 18x10 -> 20x12
    ((2, 12, 12, 32), 1, 8, 2, True),      # pad 12x12 -> 16x16 + q-pool
    ((1, 30, 30, 48), 2, 14, 1, False),    # ws14 pad 30 -> 42 (tiny s3)
    ((1, 14, 14, 32), 2, 7, 1, False),     # odd ws7: gap-stored @8
    ((2, 16, 16, 32), 2, 7, 1, False),     # ws7 + map pad 16 -> 21
    ((1, 28, 28, 32), 2, 14, 2, True),     # pooled side 7: gap @16
    ((1, 32, 32, 32), 1, 14, 2, True),     # same + map pad 32 -> 42
])
def test_kernel_padded_maps(shape, heads, ws, ps, proj):
    """Non-window-divisible maps: in-kernel post-norm masking must equal
    the oracle's post-norm zero padding (hieradet window_partition)."""
    b, h, w, din = shape
    dout = din * 2 if proj else din
    blk = make_block(jax.random.PRNGKey(6), din, dout, with_proj=proj)
    x = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
    q_stride = (ps, ps) if ps > 1 else None
    want = hiera_block_xla(blk, x, num_heads=heads, ws=ws,
                           q_stride=q_stride, eps=1e-6)
    got = hiera_block(blk, x, num_heads=heads, ws=ws, q_stride=q_stride,
                      eps=1e-6, backend="pallas", interpret=True)
    assert got.shape == (b, h // ps, w // ps, dout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("shape,heads", [
    ((1, 16, 16, 32), 2),                  # global block, multi-chunk SDPA
    ((2, 8, 8, 64), 4),
])
def test_kernel_global_attention(shape, heads):
    """ws=0 (hieradet global_att_blocks): q-chunked full-map SDPA."""
    b, h, w, din = shape
    blk = make_block(jax.random.PRNGKey(10), din, din)
    x = jax.random.normal(jax.random.PRNGKey(11), shape, jnp.float32)
    want = hiera_block_xla(blk, x, num_heads=heads, ws=0, q_stride=None,
                           eps=1e-6)
    got = hiera_block(blk, x, num_heads=heads, ws=0, q_stride=None,
                      eps=1e-6, backend="pallas", interpret=True)
    assert got.shape == shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_global_oracle_matches_legacy_apply():
    """Oracle ws=0 semantics vs the legacy whole-map attention inside
    hiera.apply on a config WITH global blocks."""
    from video_llava_seg_tpu.models.sam2 import hiera
    from video_llava_seg_tpu.models.sam2.config import HieraConfig

    cfg = HieraConfig(embed_dim=32, num_heads=2, stages=(1, 1, 2, 1),
                      global_att_blocks=(3,),
                      window_pos_embed_bkg_spatial_size=(7, 7),
                      window_spec=(8, 4, 4, 4))
    params = hiera.init(jax.random.PRNGKey(12), cfg)
    x = jax.random.normal(jax.random.PRNGKey(13), (1, 128, 128, 3))

    prev = (hiera.USE_FUSED_BLOCK, hiera.USE_FUSED_WINDOW_ATTN)
    try:
        hiera.USE_FUSED_BLOCK = False
        hiera.USE_FUSED_WINDOW_ATTN = False
        legacy = hiera.apply(params, cfg, x)
        hiera.USE_FUSED_BLOCK = True
        fused = hiera.apply(params, cfg, x, interpret=True)
    finally:
        hiera.USE_FUSED_BLOCK, hiera.USE_FUSED_WINDOW_ATTN = prev
    for a, b in zip(fused, legacy):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_padded_oracle_matches_legacy_apply():
    """Oracle padding semantics vs the legacy partition path on a config
    whose maps are NOT window-divisible (ws=14 at 36x36 etc.)."""
    from video_llava_seg_tpu.models.sam2 import hiera
    from video_llava_seg_tpu.models.sam2.config import HieraConfig

    cfg = HieraConfig(embed_dim=32, num_heads=2, stages=(1, 1, 2, 1),
                      global_att_blocks=(),
                      window_pos_embed_bkg_spatial_size=(7, 7),
                      window_spec=(8, 4, 14, 4))
    params = hiera.init(jax.random.PRNGKey(8), cfg)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 288, 288, 3))

    prev = (hiera.USE_FUSED_BLOCK, hiera.USE_FUSED_WINDOW_ATTN)
    try:
        hiera.USE_FUSED_BLOCK = False
        hiera.USE_FUSED_WINDOW_ATTN = False
        legacy = hiera.apply(params, cfg, x)
        hiera.USE_FUSED_BLOCK = True
        fused = hiera.apply(params, cfg, x)
    finally:
        hiera.USE_FUSED_BLOCK, hiera.USE_FUSED_WINDOW_ATTN = prev
    for a, b in zip(fused, legacy):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
