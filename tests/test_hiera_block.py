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


def test_backward_matches_oracle_grad():
    din, dout, heads, ws, ps = 32, 64, 2, 4, 2
    blk = make_block(jax.random.PRNGKey(2), din, dout, with_proj=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, din))

    def loss_k(x, blk):
        y = hiera_block(blk, x, num_heads=heads, ws=ws, q_stride=(ps, ps),
                        eps=1e-6, backend="pallas", interpret=True)
        return jnp.sum(y * y)

    def loss_o(x, blk):
        y = hiera_block_xla(blk, x, num_heads=heads, ws=ws,
                            q_stride=(ps, ps), eps=1e-6)
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
    assert not hiera_block_supported(64, 64, 14, 1)   # needs padding: LN
    assert hiera_block_supported(70, 70, 14, 1)       # ws14-divisible map
    assert not hiera_block_supported(64, 64, 7, 1)    # odd window
    assert not hiera_block_supported(64, 64, 0, 1)    # global block
    assert not hiera_block_supported(64, 64, 14, 2)   # odd pooled side


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
