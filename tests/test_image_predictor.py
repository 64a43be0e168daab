"""End-to-end SAM2ImagePredictor parity vs the reference predictor."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import load_reference_sam2  # noqa: E402

load_reference_sam2()

from tests.test_sam2_memory_parity import TINY, _ref_sam2_base  # noqa: E402

from video_llava_seg_tpu.convert.sam2_torch import convert_sam2_base  # noqa: E402
from video_llava_seg_tpu.models.sam2.image_predictor import (  # noqa: E402
    SAM2ImagePredictor,
)


@pytest.fixture(scope="module")
def predictors():
    from sam2.sam2_image_predictor import SAM2ImagePredictor as RefPredictor
    ref_model = _ref_sam2_base()
    ref = RefPredictor(ref_model)
    s = TINY.image_embedding_size
    ref._bb_feat_sizes = [(4 * s, 4 * s), (2 * s, 2 * s), (s, s)]
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    mine = SAM2ImagePredictor(convert_sam2_base(sd, TINY), TINY)
    return ref, mine


def _rand_image(seed=0, h=200, w=300):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def _mask_iou(a, b):
    a, b = a.astype(bool), b.astype(bool)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return 1.0 if union == 0 else inter / union


@pytest.mark.parametrize("prompt", ["point", "box", "point_multimask"])
def test_predict_parity(predictors, prompt):
    ref, mine = predictors
    img = _rand_image()
    ref.set_image(img)
    mine.set_image(img)
    kwargs = {}
    if prompt == "point":
        kwargs = dict(point_coords=np.array([[150.0, 100.0]]),
                      point_labels=np.array([1]), multimask_output=False)
    elif prompt == "box":
        kwargs = dict(box=np.array([50.0, 40.0, 250.0, 160.0]),
                      multimask_output=False)
    else:
        kwargs = dict(point_coords=np.array([[150.0, 100.0]]),
                      point_labels=np.array([1]), multimask_output=True)

    r_masks, r_iou, r_low = ref.predict(**kwargs)
    m_masks, m_iou, m_low = mine.predict(**kwargs)
    assert m_masks.shape == r_masks.shape
    assert m_low.shape == r_low.shape
    np.testing.assert_allclose(m_iou, r_iou, atol=2e-2)
    for i in range(r_masks.shape[0]):
        iou = _mask_iou(m_masks[i], r_masks[i])
        assert iou > 0.98, f"mask {i} IoU {iou}"
    np.testing.assert_allclose(m_low, r_low, atol=0.3)


def test_predict_batch(predictors):
    _, mine = predictors
    imgs = [_rand_image(1), _rand_image(2, h=160, w=240)]
    mine.set_image_batch(imgs)
    masks, ious, lows = mine.predict_batch(
        point_coords_batch=[np.array([[100.0, 80.0]]),
                            np.array([[120.0, 60.0]])],
        point_labels_batch=[np.array([1]), np.array([1])],
        multimask_output=True)
    assert len(masks) == 2
    assert masks[0].shape == (3, 200, 300)
    assert masks[1].shape == (3, 160, 240)


def test_predict_requires_image(predictors):
    _, mine = predictors
    mine.reset_predictor()
    with pytest.raises(RuntimeError):
        mine.predict(point_coords=np.array([[1.0, 1.0]]),
                     point_labels=np.array([1]))
