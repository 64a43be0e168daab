"""Fused window-attention kernel parity (ops/window_attention.py) vs the
plain-XLA oracle, including the custom-vjp backward and the Hiera wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llava_seg_tpu.ops.window_attention import (
    window_attention,
    window_attention_xla,
)


@pytest.mark.parametrize("shape,heads,ws,r", [
    ((2, 16, 16, 3 * 96), 1, 8, None),    # stage-1-like: hd 96, 1 head
    ((1, 16, 24, 3 * 192), 2, 4, None),   # stage-2-like: hd 96, 2 heads
    ((1, 32, 32, 3 * 96), 1, 8, 2),       # explicit multi-row blocks
    ((2, 14, 14, 3 * 64), 2, 7, 1),       # odd window side
])
def test_pallas_matches_xla(shape, heads, ws, r):
    qkv = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    want = window_attention(qkv, num_heads=heads, ws=ws, backend="xla")
    got = window_attention(qkv, num_heads=heads, ws=ws, backend="pallas",
                           rows_per_block=r, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_xla_path_matches_partition_reference():
    """The XLA oracle itself must equal explicit partition->SDPA->
    unpartition (hieradet.py semantics via hiera.window_partition)."""
    from video_llava_seg_tpu.models.sam2.hiera import (
        window_partition,
        window_unpartition,
    )

    b, h, w, heads, hd, ws = 2, 16, 16, 2, 32, 4
    c = heads * hd
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3 * c),
                            jnp.float32)
    got = window_attention(qkv, num_heads=heads, ws=ws, backend="xla")

    xw, pad_hw = window_partition(qkv, ws)            # [B*nW, ws, ws, 3C]
    n = xw.shape[0]
    t = xw.reshape(n, ws * ws, 3, heads, hd)
    q, k, v = (t[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum("whid,whjd->whij", q, k) / np.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("whij,whjd->whid", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(n, ws, ws, c)
    want = window_unpartition(o, ws, pad_hw, (h, w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_backward_matches_xla_grad():
    qkv = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 3 * 64),
                            jnp.float32)

    def loss_pallas(t):
        o = window_attention(t, num_heads=2, ws=4, backend="pallas",
                             interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(t):
        o = window_attention(t, num_heads=2, ws=4, backend="xla")
        return jnp.sum(o * jnp.cos(o))

    g_p = jax.grad(loss_pallas)(qkv)
    g_x = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=1e-4, rtol=1e-4)


def test_bf16_tolerance():
    qkv = (jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3 * 96))
           .astype(jnp.bfloat16))
    want = window_attention(qkv, num_heads=1, ws=8, backend="xla")
    got = window_attention(qkv, num_heads=1, ws=8, backend="pallas",
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("shape,heads,ws,r", [
    ((2, 16, 16, 3 * 96), 1, 8, None),    # stage-1-like q-pool
    ((1, 16, 24, 3 * 192), 2, 4, None),   # stage-2-like q-pool
    ((1, 28, 14, 3 * 64), 2, 14, 1),      # even-but-odd-half window (14)
])
def test_pallas_q_pool_matches_xla(shape, heads, ws, r):
    qkv = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    want = window_attention(qkv, num_heads=heads, ws=ws, q_pool=(2, 2),
                            backend="xla")
    got = window_attention(qkv, num_heads=heads, ws=ws, q_pool=(2, 2),
                           backend="pallas", rows_per_block=r,
                           interpret=True)
    assert want.shape == (shape[0], shape[1] // 2, shape[2] // 2,
                          shape[3] // 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_xla_q_pool_matches_partition_reference():
    """Pooled-oracle semantics == explicit partition -> per-window q
    max-pool -> SDPA -> unpartition at ws/2 (hieradet.py q_pool path)."""
    from video_llava_seg_tpu.models.sam2.hiera import (
        window_partition,
        window_unpartition,
    )

    b, h, w, heads, hd, ws = 2, 16, 16, 2, 32, 4
    c = heads * hd
    qkv = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, 3 * c),
                            jnp.float32)
    got = window_attention(qkv, num_heads=heads, ws=ws, q_pool=(2, 2),
                           backend="xla")

    xw, pad_hw = window_partition(qkv, ws)            # [B*nW, ws, ws, 3C]
    n = xw.shape[0]
    t = xw.reshape(n, ws, ws, 3, heads, hd)
    q = t[:, :, :, 0]                                  # [n, ws, ws, H, hd]
    k = t[:, :, :, 1].reshape(n, ws * ws, heads, hd).transpose(0, 2, 1, 3)
    v = t[:, :, :, 2].reshape(n, ws * ws, heads, hd).transpose(0, 2, 1, 3)
    # per-window 2x2 max pool of q (hieradet MultiScaleAttention.q_pool)
    q = q.reshape(n, ws // 2, 2, ws // 2, 2, heads, hd)
    q = jnp.max(jnp.max(q, axis=4), axis=2)
    q = q.reshape(n, (ws // 2) ** 2, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("whid,whjd->whij", q, k) / np.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("whij,whjd->whid", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(n, ws // 2, ws // 2, c)
    want = window_unpartition(o, ws // 2, (pad_hw[0] // 2, pad_hw[1] // 2),
                              (h // 2, w // 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_q_pool_backward_matches_xla_grad():
    qkv = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 3 * 64),
                            jnp.float32)

    def loss(t, backend, interpret=False):
        o = window_attention(t, num_heads=2, ws=4, q_pool=(2, 2),
                             backend=backend, interpret=interpret)
        return jnp.sum(o * jnp.cos(o))

    g_p = jax.grad(lambda t: loss(t, "pallas", True))(qkv)
    g_x = jax.grad(lambda t: loss(t, "xla"))(qkv)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=1e-4, rtol=1e-4)


def test_hiera_fused_equals_legacy_path():
    """hiera.apply fused gate (q-pool blocks + non-divisible maps now
    included) must match the legacy partition path bit-for-tolerance.
    Config exercises: q_pool stage transitions, a window size that does
    NOT divide the stage map (forcing the zero-pad + crop path), and a
    global-attention block."""
    from video_llava_seg_tpu.models.sam2 import hiera
    from video_llava_seg_tpu.models.sam2.config import HieraConfig

    cfg = HieraConfig(embed_dim=32, num_heads=1, stages=(1, 2, 2, 1),
                      global_att_blocks=(4,),
                      window_pos_embed_bkg_spatial_size=(7, 7),
                      window_spec=(8, 4, 14, 7))
    params = hiera.init(jax.random.PRNGKey(0), cfg)
    # 56x56 post-stem map -> stage 3 at 14x14? no: q_pool halves twice ->
    # 14 and 7 maps; ws=14 divides 14, ws=7 divides 7 — so widen input to
    # 72 to force non-divisible maps (72 -> 36 -> 18 (ws 14 pad) -> 9
    # (ws 7 pad))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 288, 288, 3))

    prev = hiera.USE_FUSED_WINDOW_ATTN
    try:
        hiera.USE_FUSED_WINDOW_ATTN = True
        outs_fused = hiera.apply(params, cfg, x)
        hiera.USE_FUSED_WINDOW_ATTN = False
        outs_legacy = hiera.apply(params, cfg, x)
    finally:
        hiera.USE_FUSED_WINDOW_ATTN = prev
    assert len(outs_fused) == len(outs_legacy)
    for of, ol in zip(outs_fused, outs_legacy):
        np.testing.assert_allclose(np.asarray(of), np.asarray(ol),
                                   atol=2e-4, rtol=2e-4)


def test_hiera_fused_gate():
    """hiera.apply must produce identical results whether the fused gate
    takes the window_attention path (divisible maps) or the legacy
    partition path — checked by comparing against a config whose input
    forces the fallback via padding."""
    from video_llava_seg_tpu.models.sam2 import hiera
    from video_llava_seg_tpu.models.sam2.config import HieraConfig

    cfg = HieraConfig(embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
                      global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(7, 7),
                      window_spec=(4, 4, 4, 4))
    key = jax.random.PRNGKey(0)
    params = hiera.init(key, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    outs = hiera.apply(params, cfg, x)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


@pytest.mark.parametrize("shape,heads,ws,r,cw,ps", [
    # column-split tiles (cw < n_wc): parity must hold across column seams
    ((1, 16, 32, 3 * 128), 2, 8, 1, 2, 1),
    ((2, 16, 32, 3 * 128), 2, 8, 2, 2, 2),   # q-pool + column-split tiles
])
def test_pallas_column_tiling_matches_xla(shape, heads, ws, r, cw, ps):
    from video_llava_seg_tpu.ops.window_attention import window_attention

    qkv = jax.random.normal(jax.random.PRNGKey(6), shape, jnp.float32)
    kw = dict(num_heads=heads, ws=ws)
    if ps > 1:
        kw["q_pool"] = (ps, ps)
    want = window_attention(qkv, backend="xla", **kw)
    got = window_attention(qkv, backend="pallas", rows_per_block=r,
                           cols_per_block=cw, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_tile_picker_respects_vmem_budget():
    """The hiera-large stage-4-transition shape (heads=16, hd=72, C=1152)
    blew Mosaic's 16 MiB scoped-vmem limit with full-width tiles; the
    picker must now column-split it under budget, and must return None
    (-> XLA fallback) when even a 1x1-window tile cannot fit."""
    from video_llava_seg_tpu.ops.window_attention import (
        _pick_tiles,
        _vmem_estimate,
        _VMEM_BUDGET,
    )

    t = _pick_tiles(8, 8, ws=8, c3=3 * 1152, c=1152, heads=16, hd=72,
                    ps=2, itemsize=2)
    assert t is not None
    r, cw = t
    assert cw < 8   # full width (the OOM config) must not be chosen
    assert _vmem_estimate(r, cw, ws=8, c3=3 * 1152, c=1152, heads=16,
                          hd=72, ps=2, itemsize=2) <= _VMEM_BUDGET
    # a pathological config no tile can fit: huge window, huge C
    assert _pick_tiles(1, 1, ws=64, c3=3 * 4096, c=4096, heads=32, hd=128,
                       ps=1, itemsize=2) is None
