"""Native C++ host runtime (native/libvls_native.so) parity tests.

Checks the union-find connected components against the JAX label-propagation
op (both must implement the CUDA kernel's contract from
sam2/csrc/connected_components.cu:213-289) and the threaded resize against
the torch-parity JAX resize oracle."""

import numpy as np
import pytest

from video_llava_seg_tpu.ops import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def _random_mask(rng, n, h, w, p=0.4):
    return (rng.random((n, h, w)) < p).astype(np.uint8)


def test_cc_matches_jax_op():
    import jax.numpy as jnp

    from video_llava_seg_tpu.ops.connected_components import (
        connected_components,
    )

    rng = np.random.default_rng(0)
    m = _random_mask(rng, 3, 48, 64)
    lab_n, area_n = native.connected_components_host(m)
    lab_j, area_j = connected_components(jnp.asarray(m), max_iters=512)
    np.testing.assert_array_equal(lab_n, np.asarray(lab_j))
    np.testing.assert_array_equal(area_n, np.asarray(area_j))


def test_cc_diagonal_connectivity_and_areas():
    # two blobs touching only diagonally must merge (8-connectivity)
    m = np.zeros((1, 6, 6), np.uint8)
    m[0, 0:2, 0:2] = 1
    m[0, 2:4, 2:4] = 1   # touches (1,1) diagonally
    m[0, 5, 5] = 1       # isolated pixel
    lab, area = native.connected_components_host(m)
    assert lab[0, 0, 0] == lab[0, 3, 3] != 0
    assert lab[0, 5, 5] not in (0, lab[0, 0, 0])
    assert area[0, 0, 0] == 8
    assert area[0, 5, 5] == 1
    assert (lab[0][m[0] == 0] == 0).all()


def test_cc_multithreaded_batch():
    rng = np.random.default_rng(1)
    m = _random_mask(rng, 16, 33, 47)
    l1, a1 = native.connected_components_host(m, num_threads=1)
    l8, a8 = native.connected_components_host(m, num_threads=8)
    np.testing.assert_array_equal(l1, l8)
    np.testing.assert_array_equal(a1, a8)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("shape,out", [((2, 3, 37, 53), (74, 106)),
                                       ((1, 1, 64, 64), (31, 17))])
def test_resize_matches_jax_oracle(mode, shape, out):
    import jax.numpy as jnp

    from video_llava_seg_tpu.ops.resize import interpolate_nchw

    rng = np.random.default_rng(2)
    x = rng.random(shape, dtype=np.float32)
    got = native.resize_f32_host(x, out, mode)
    want = np.asarray(interpolate_nchw(jnp.asarray(x), out, mode))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_u8_resize_normalize():
    import jax.numpy as jnp

    from video_llava_seg_tpu.ops.resize import interpolate_nchw

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (4, 30, 40, 3), dtype=np.uint8)
    mean = np.asarray([0.48, 0.45, 0.40], np.float32)
    std = np.asarray([0.26, 0.26, 0.27], np.float32)
    got = native.resize_frames_u8_host(frames, (60, 80), mean, std)
    x = frames.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    want = np.asarray(interpolate_nchw(jnp.asarray(x), (60, 80), "bilinear"))
    want = (want - mean[None, :, None, None]) / std[None, :, None, None]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_host_dispatcher_mask_path():
    from video_llava_seg_tpu.ops.resize import resize_host

    rng = np.random.default_rng(4)
    m = rng.random((5, 21, 35)).astype(np.float32)
    out = resize_host(m, (42, 70), "nearest")
    assert out.shape == (5, 42, 70)
