"""Flash-attention kernel numerics vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llava_seg_tpu.ops.attention import (
    attention_reference,
    flash_attention,
)


def _rand_qkv(key, B, Hq, Hkv, Sq, Skv, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Hq, Sq, D), dtype)
    k = jax.random.normal(kk, (B, Hkv, Skv, D), dtype)
    v = jax.random.normal(kv, (B, Hkv, Skv, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "B,Hq,Hkv,Sq,Skv,D",
    [
        (1, 2, 2, 128, 128, 64),     # plain self-attn
        (2, 4, 2, 256, 256, 32),     # GQA
        (1, 2, 2, 100, 100, 96),     # unaligned seq + head dim (Hiera-like)
        (1, 1, 1, 64, 320, 128),     # cross-attn, ragged kv (memory attn)
        (2, 16, 16, 577, 577, 64),   # ViT regime: heads batch per grid step
    ],
)
def test_flash_matches_reference(rng, causal, B, Hq, Hkv, Sq, Skv, D):
    q, k, v = _rand_qkv(rng, B, Hq, Hkv, Sq, Skv, D)
    ref = attention_reference(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16(rng):
    q, k, v = _rand_qkv(rng, 1, 2, 2, 128, 128, 64, jnp.bfloat16)
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_causal_first_token_ignores_future(rng):
    q, k, v = _rand_qkv(rng, 1, 1, 1, 128, 128, 32)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    # token 0 may only attend to kv 0 -> output equals v[0]
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                               np.asarray(v[0, 0, 0]), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "B,Hq,Hkv,Sq,Skv,D",
    [
        (1, 2, 2, 128, 128, 64),     # plain self-attn (single-block regime)
        (2, 4, 2, 256, 256, 32),     # GQA
        (1, 2, 2, 100, 100, 96),     # unaligned seq + head dim
        (1, 1, 1, 64, 320, 128),     # cross-attn, ragged kv
        (1, 2, 1, 200, 1500, 64),    # multi-kv-block regime + GQA
    ],
)
def test_flash_grad_matches_reference(rng, causal, B, Hq, Hkv, Sq, Skv, D):
    """custom_vjp backward kernels vs differentiated XLA reference."""
    q, k, v = _rand_qkv(rng, B, Hq, Hkv, Sq, Skv, D)
    w = jax.random.normal(jax.random.fold_in(rng, 7), (B, Hq, Sq, D))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal,
                                       interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=causal) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name} mismatch")


def test_flash_grad_kv_bias(rng):
    """Gradients flow correctly through masked (fixed-slot) attention."""
    q, k, v = _rand_qkv(rng, 2, 4, 4, 100, 300, 64)
    mask = jax.random.bernoulli(jax.random.fold_in(rng, 3), 0.7, (2, 300))
    mask = mask.at[:, 0].set(True)
    bias = jnp.where(mask, 0.0, -0.7 * float(jnp.finfo(jnp.float32).max))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_bias=bias,
                                       interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, kv_mask=mask) ** 2)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name} mismatch")
    # masked-out keys receive zero gradient
    dk = np.asarray(got[1])
    np.testing.assert_allclose(
        dk[~np.asarray(mask)[:, None, :].repeat(4, 1)], 0.0, atol=1e-6)


def test_flash_grad_bf16(rng):
    q, k, v = _rand_qkv(rng, 1, 2, 2, 128, 128, 64, jnp.bfloat16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       interpret=True).astype(jnp.float32))

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True).astype(
            jnp.float32))

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=f"d{name} mismatch")


def test_flash_kv_mask_matches_reference():
    """kv_mask via additive bias in the Pallas kernel (fixed-slot memory
    banks): both single- and multi-block paths."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_llava_seg_tpu.ops.attention import (
        attention_reference,
        flash_attention,
    )

    key = jax.random.PRNGKey(0)
    for skv in (300, 2000):   # single-block and multi-block regimes
        q = jax.random.normal(key, (2, 4, 100, 64), jnp.float32)
        k = jax.random.normal(jax.random.fold_in(key, 1),
                              (2, 4, skv, 64), jnp.float32)
        v = jax.random.normal(jax.random.fold_in(key, 2),
                              (2, 4, skv, 64), jnp.float32)
        mask = jax.random.bernoulli(jax.random.fold_in(key, 3),
                                    0.7, (2, skv))
        mask = mask.at[:, 0].set(True)  # avoid fully-masked rows
        bias = jnp.where(mask, 0.0, -0.7 * float(jnp.finfo(jnp.float32).max))
        got = flash_attention(q, k, v, kv_bias=bias, interpret=True)
        want = attention_reference(q, k, v, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
