"""Loss parity vs the reference MaskLoss / text CE."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from video_llava_seg_tpu.constants import IGNORE_INDEX  # noqa: E402
from video_llava_seg_tpu.train import losses  # noqa: E402


def _ref_mask_loss():
    from tests.reference_loader import load_reference_sam2
    load_reference_sam2()
    import sys
    sys.path.insert(0, "/root/reference")
    from llava.model.seg_head.mask_loss import MaskLoss
    return MaskLoss()


def test_dice_and_ce_parity():
    ref = _ref_mask_loss()
    rng = np.random.RandomState(0)
    pred = rng.randn(2, 3, 32, 32).astype(np.float32) * 3
    gt = rng.rand(2, 3, 32, 32) > 0.5
    with torch.no_grad():
        out = ref(pred_masks=[torch.from_numpy(pred[:1])],
                  gt_masks=[torch.from_numpy(gt[:1])],
                  dummy_forward_pass=False)
    j = losses.mask_loss(jnp.asarray(pred[:1]), jnp.asarray(gt[:1]),
                         align=False)
    np.testing.assert_allclose(float(j["loss_mask_dice"]),
                               out["loss_mask_dice"].item(), rtol=1e-4)
    np.testing.assert_allclose(float(j["loss_mask_ce"]),
                               out["loss_mask_ce"].item(), rtol=1e-4)
    np.testing.assert_allclose(float(j["loss_mask"]),
                               out["loss_mask"].item(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j["mask_ious"]),
                               out["mask_ious"].numpy(), rtol=1e-4)


def test_hungarian_alignment_matches_reference():
    ref = _ref_mask_loss()
    rng = np.random.RandomState(1)
    # well-separated masks so the optimal assignment is unambiguous
    gt = np.zeros((3, 2, 32, 32), bool)
    gt[0, :, 2:10, 2:10] = True
    gt[1, :, 12:20, 12:20] = True
    gt[2, :, 22:30, 22:30] = True
    pred = np.full((3, 2, 32, 32), -8.0, np.float32)
    perm = [2, 0, 1]
    for i, p in enumerate(perm):
        pred[i][gt[p]] = 8.0
    pred += rng.randn(*pred.shape).astype(np.float32) * 0.1
    with torch.no_grad():
        out = ref(pred_masks=[torch.from_numpy(pred)],
                  gt_masks=[torch.from_numpy(gt)], dummy_forward_pass=False)
    j = losses.mask_loss(jnp.asarray(pred), jnp.asarray(gt),
                         key=jax.random.PRNGKey(0))
    # after matching, both should find near-perfect alignment: low dice loss
    np.testing.assert_allclose(float(j["loss_mask_dice"]),
                               out["loss_mask_dice"].item(), atol=2e-3)
    assert float(jnp.min(j["mask_ious"])) > 0.9


def test_dummy_path_zero():
    pred = jnp.asarray(np.random.randn(1, 2, 16, 16), jnp.float32)
    gt = jnp.zeros((1, 2, 16, 16), bool)
    out = losses.mask_loss(pred, gt, dummy=True, align=False)
    assert float(out["loss_mask"]) == 0.0
    # gradient still flows (zero-multiplied), keeping graphs identical
    g = jax.grad(lambda p: losses.mask_loss(p, gt, dummy=True,
                                            align=False)["loss_mask"])(pred)
    assert np.all(np.asarray(g) == 0)


def test_text_ce_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 7, 11).astype(np.float32)
    labels = rng.randint(0, 11, (2, 7))
    labels[0, :3] = IGNORE_INDEX
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits[:, :-1]).reshape(-1, 11),
        torch.from_numpy(labels[:, 1:]).reshape(-1),
        ignore_index=IGNORE_INDEX)
    j, _ = losses.text_ce_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(j), ref.item(), rtol=1e-5)


def test_text_ce_fused_matches_full():
    """Chunked fused lm-head CE == text_ce_loss(unembed(hidden)) in value
    AND gradients (incl. non-chunk-divisible token counts)."""
    from video_llava_seg_tpu.config import LlamaConfig
    from video_llava_seg_tpu.models import llama

    rng = np.random.RandomState(0)
    b, s, d, v = 2, 13, 16, 29
    cfg = LlamaConfig(hidden_size=d, vocab_size=v, num_layers=1,
                      num_heads=2, num_kv_heads=2, intermediate_size=32)
    kernel = rng.randn(d, v).astype(np.float32) * 0.2
    params = {"lm_head": {"kernel": jnp.asarray(kernel)}}
    hidden = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    labels = rng.randint(0, v, (b, s))
    labels[0, :4] = IGNORE_INDEX
    labels = jnp.asarray(labels)

    def full(h, p):
        return losses.text_ce_loss(llama.unembed(p, cfg, h), labels)[0]

    def fused(h, p):
        return losses.text_ce_loss_fused(p, cfg, h, labels, chunk=8)[0]

    lf, gf = jax.value_and_grad(full, argnums=(0, 1))(hidden, params)
    lc, gc = jax.value_and_grad(fused, argnums=(0, 1))(hidden, params)
    np.testing.assert_allclose(float(lc), float(lf), rtol=1e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(gf),
                     jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=1e-5)
    # counts agree too
    n_full = losses.text_ce_loss(llama.unembed(params, cfg, hidden),
                                 labels)[1]
    n_fused = losses.text_ce_loss_fused(params, cfg, hidden, labels,
                                        chunk=8)[1]
    assert int(n_full) == int(n_fused)


def test_pixel_mask_restricts_loss():
    pred = jnp.ones((1, 1, 8, 8)) * 5.0
    gt = jnp.ones((1, 1, 8, 8), bool)
    region = jnp.zeros((8, 8), bool).at[:4].set(True)
    full = losses.mask_loss(pred, gt, align=False)
    masked = losses.mask_loss(pred, gt, align=False, pixel_mask=region)
    # perfect prediction either way -> both near zero dice
    assert float(masked["loss_mask_dice"]) < 0.01
    # now make the lower half wrong; masked loss should ignore it
    pred2 = pred.at[:, :, 4:].set(-5.0)
    masked2 = losses.mask_loss(pred2, gt, align=False, pixel_mask=region)
    np.testing.assert_allclose(float(masked2["loss_mask_ce"]),
                               float(masked["loss_mask_ce"]), rtol=1e-5)
