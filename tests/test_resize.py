"""Interpolation parity vs torch.nn.functional.interpolate."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from video_llava_seg_tpu.ops.resize import interpolate_nchw, interpolate_hw  # noqa: E402


@pytest.mark.parametrize("mode,antialias", [
    ("bilinear", False), ("bicubic", False), ("nearest", False),
    ("bilinear", True),
])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 7), (64, 64)),     # pos-embed upsample (Hiera _get_pos_embed)
    ((32, 32), (64, 64)),   # FPN top-down x2
    ((64, 64), (13, 17)),   # downsample, ragged
    ((256, 256), (480, 640)),  # mask postprocess to orig res
])
def test_matches_torch(mode, antialias, in_hw, out_hw):
    if mode == "nearest" and antialias:
        pytest.skip("n/a")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    kwargs = {}
    if mode != "nearest":
        kwargs = dict(align_corners=False, antialias=antialias)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode=mode,
                        **kwargs).numpy()
    out = np.asarray(interpolate_nchw(jnp.asarray(x), out_hw, mode, antialias))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_hw_layout():
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    out = interpolate_hw(jnp.asarray(x), (8, 8), "bilinear")
    ref = F.interpolate(torch.from_numpy(x)[None], size=(8, 8),
                        mode="bilinear", align_corners=False)[0].numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
