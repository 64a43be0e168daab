"""Unit tests: connected components, RLE codec, axial RoPE parity vs torch."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_llava_seg_tpu.ops.connected_components import (
    connected_components,
    fill_holes_and_sprinkles,
)
from video_llava_seg_tpu.ops.masks import (
    decode_rle,
    encode_rle,
    mask_to_box,
    rle_area,
)


class TestConnectedComponents:
    def test_two_blobs(self):
        m = np.zeros((1, 16, 16), bool)
        m[0, 1:4, 1:4] = True
        m[0, 10:14, 10:13] = True
        labels, areas = connected_components(jnp.asarray(m))
        labels, areas = np.asarray(labels), np.asarray(areas)
        assert labels[0, 0, 0] == 0 and areas[0, 0, 0] == 0
        l1, l2 = labels[0, 2, 2], labels[0, 11, 11]
        assert l1 > 0 and l2 > 0 and l1 != l2
        assert np.all(labels[0, 1:4, 1:4] == l1)
        assert areas[0, 2, 2] == 9
        assert areas[0, 11, 11] == 12

    def test_diagonal_is_connected(self):
        # 8-connectivity: a diagonal line is one component
        m = np.zeros((1, 8, 8), bool)
        for i in range(8):
            m[0, i, i] = True
        labels, areas = connected_components(jnp.asarray(m))
        assert len(np.unique(np.asarray(labels)[np.asarray(m)])) == 1
        assert np.asarray(areas)[0, 4, 4] == 8

    def test_spiral_converges(self):
        # worst-case geodesic: a spiral path
        import scipy.ndimage  # noqa: F401  (just ensure available)
        m = np.zeros((1, 32, 32), bool)
        # boustrophedon snake: one long connected path
        for r in range(0, 32, 2):
            m[0, r, :] = True
            if r + 1 < 32:
                m[0, r + 1, -1 if (r // 2) % 2 == 0 else 0] = True
        labels, areas = connected_components(jnp.asarray(m))
        assert len(np.unique(np.asarray(labels)[np.asarray(m)])) == 1

    def test_matches_scipy_random(self):
        from scipy import ndimage
        rng = np.random.RandomState(3)
        m = rng.rand(2, 40, 40) > 0.6
        labels, areas = connected_components(jnp.asarray(m))
        labels = np.asarray(labels)
        for b in range(2):
            ref_lbl, n = ndimage.label(m[b], structure=np.ones((3, 3)))
            # same partition: bijection between label sets
            ours = labels[b]
            for comp in range(1, n + 1):
                sel = ref_lbl == comp
                assert len(np.unique(ours[sel])) == 1
            assert len(np.unique(ours[m[b]])) == n

    def test_hole_fill(self):
        m = np.full((1, 10, 10), 5.0, np.float32)
        m[0, 4:6, 4:6] = -5.0   # small hole
        out = np.asarray(fill_holes_and_sprinkles(
            jnp.asarray(m), mask_threshold=0.0, max_hole_area=8))
        assert np.all(out > 0)

    def test_sprinkle_removal(self):
        m = np.full((1, 10, 10), -5.0, np.float32)
        m[0, 2, 2] = 5.0        # lone positive pixel
        m[0, 5:9, 5:9] = 5.0    # big blob stays
        out = np.asarray(fill_holes_and_sprinkles(
            jnp.asarray(m), mask_threshold=0.0, max_sprinkle_area=2))
        assert out[0, 2, 2] < 0
        assert np.all(out[0, 5:9, 5:9] > 0)


class TestRLE:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        rng = np.random.RandomState(seed)
        m = (rng.rand(37, 53) > 0.5).astype(np.uint8)
        rle = encode_rle(m)
        m2 = decode_rle(rle)
        np.testing.assert_array_equal(m, m2)
        assert rle_area(rle) == m.sum()

    def test_empty_and_full(self):
        for m in [np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8)]:
            np.testing.assert_array_equal(decode_rle(encode_rle(m)), m)

    def test_known_encoding(self):
        # column-major: [[0,1],[0,1]] -> counts [2, 2] (two 0s then two 1s)
        m = np.array([[0, 1], [0, 1]], np.uint8)
        from video_llava_seg_tpu.ops.masks import rle_counts_from_mask
        np.testing.assert_array_equal(rle_counts_from_mask(m), [2, 2])

    def test_box(self):
        m = np.zeros((10, 10), np.uint8)
        assert mask_to_box(m) is None
        m[2:5, 3:8] = 1
        assert mask_to_box(m) == (3, 2, 7, 4)


class TestAxialRope:
    def test_matches_reference_torch(self):
        torch = pytest.importorskip("torch")
        import math

        def compute_axial_cis(dim, end_x, end_y, theta=10000.0):
            freqs = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
            t = torch.arange(end_x * end_y, dtype=torch.float32)
            t_x, t_y = (t % end_x).float(), torch.div(t, end_x, rounding_mode="floor").float()
            fx, fy = torch.outer(t_x, freqs), torch.outer(t_y, freqs)
            return torch.cat([torch.polar(torch.ones_like(fx), fx),
                              torch.polar(torch.ones_like(fy), fy)], dim=-1)

        def apply_ref(xq, xk, freqs_cis, repeat_freqs_k=False):
            xq_ = torch.view_as_complex(xq.float().reshape(*xq.shape[:-1], -1, 2))
            xk_ = torch.view_as_complex(xk.float().reshape(*xk.shape[:-1], -1, 2))
            fc = freqs_cis.view(1, 1, *freqs_cis.shape)
            xq_out = torch.view_as_real(xq_ * fc).flatten(3)
            if repeat_freqs_k:
                r = xk_.shape[-2] // xq_.shape[-2]
                fc = fc.unsqueeze(2).expand(-1, -1, r, -1, -1).flatten(2, 3)
            xk_out = torch.view_as_real(xk_ * fc).flatten(3)
            return xq_out, xk_out

        from video_llava_seg_tpu.ops.rope import apply_axial_rope

        rng = np.random.RandomState(0)
        d, ex, ey = 32, 4, 4
        q = rng.randn(1, 2, ex * ey, d).astype(np.float32)
        k = rng.randn(1, 2, 3 * ex * ey + 2, d).astype(np.float32)

        fc = compute_axial_cis(d, ex, ey)
        rq, rk_rope = apply_ref(torch.from_numpy(q),
                                torch.from_numpy(k[:, :, :3 * ex * ey]),
                                fc, repeat_freqs_k=True)
        oq, ok = apply_axial_rope(jnp.asarray(q), jnp.asarray(k), ex, ey,
                                  repeat_freqs_k=True, num_k_exclude=2)
        np.testing.assert_allclose(np.asarray(oq), rq.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ok)[:, :, :3 * ex * ey],
                                   rk_rope.numpy(), atol=1e-5)
        # excluded obj-ptr tokens untouched
        np.testing.assert_array_equal(np.asarray(ok)[:, :, 3 * ex * ey:],
                                      k[:, :, 3 * ex * ey:])
