"""SAM2VideoPredictor parity vs the reference (random weights, jpg frames)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import load_reference_sam2  # noqa: E402

load_reference_sam2()

from tests.test_sam2_memory_parity import TINY  # noqa: E402

from video_llava_seg_tpu.convert.sam2_torch import convert_sam2_base  # noqa: E402
from video_llava_seg_tpu.models.sam2.video_predictor import (  # noqa: E402
    SAM2VideoPredictor,
)

NUM_FRAMES = 6


def _make_video(tmpdir, size=128):
    """Synthetic video: bright square moving on a gradient background."""
    from PIL import Image
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 40, (size, size, 3), np.uint8)
    for t in range(NUM_FRAMES):
        img = noise.copy()
        x = 20 + 8 * t
        img[40:80, x:x + 40] = 220
        Image.fromarray(img).save(os.path.join(tmpdir, f"{t}.jpg"),
                                  quality=95)
    return tmpdir


def _ref_video_predictor():
    from sam2.sam2_video_predictor import SAM2VideoPredictor as RefVP
    from tests.test_sam2_memory_parity import (_ref_memory_attention,
                                               _ref_memory_encoder,
                                               _ref_sam2_base)
    # build with the same submodules as the base parity test
    ref_base = _ref_sam2_base()
    vp = RefVP.__new__(RefVP)
    torch.nn.Module.__init__(vp)
    vp.__dict__.update(ref_base.__dict__)
    vp.fill_hole_area = 0
    vp.non_overlap_masks = False
    vp.clear_non_cond_mem_around_input = False
    vp.clear_non_cond_mem_for_multi_obj = False
    vp.add_all_frames_to_correct_as_cond = False
    return vp.eval()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vid")
    return str(_make_video(str(d)))


@pytest.fixture(scope="module")
def predictors():
    ref = _ref_video_predictor()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    mine = SAM2VideoPredictor(convert_sam2_base(sd, TINY), TINY)
    return ref, mine


def test_propagate_parity_single_object(predictors, video_dir):
    ref, mine = predictors
    # reference loader needs cuda-free device arg
    ref_state = ref.init_state(video_dir, offload_video_to_cpu=False)
    my_state = mine.init_state(video_dir)
    assert my_state["num_frames"] == NUM_FRAMES
    assert my_state["video_height"] == 128

    pts = np.array([[40.0, 60.0]], np.float32)
    lbl = np.array([1], np.int32)
    with torch.no_grad():
        _, _, r_masks0 = ref.add_new_points_or_box(
            ref_state, 0, 1, points=pts, labels=lbl)
    _, _, m_masks0 = mine.add_new_points_or_box(
        my_state, 0, 1, points=pts, labels=lbl)
    np.testing.assert_allclose(np.asarray(m_masks0),
                               r_masks0.detach().numpy(), atol=0.08,
                               rtol=0.05)

    ref_outs = {}
    with torch.no_grad():
        for fidx, oids, masks in ref.propagate_in_video(ref_state):
            ref_outs[fidx] = masks.detach().numpy()
    my_outs = {}
    for fidx, oids, masks in mine.propagate_in_video(my_state):
        my_outs[fidx] = np.asarray(masks)

    assert set(my_outs) == set(ref_outs)
    for fidx in ref_outs:
        r = ref_outs[fidx]
        m = my_outs[fidx]
        assert m.shape == r.shape
        # binary agreement (random weights make logits noisy; sign agreement
        # over >97% of pixels is the meaningful bar)
        agree = np.mean((m > 0) == (r > 0))
        assert agree > 0.97, f"frame {fidx}: agreement {agree}"


def test_propagate_multi_object(predictors, video_dir):
    _, mine = predictors
    state = mine.init_state(video_dir)
    mine.add_new_points_or_box(state, 0, 1,
                               points=np.array([[40.0, 60.0]]),
                               labels=np.array([1]))
    mine.add_new_points_or_box(state, 0, 2,
                               points=np.array([[100.0, 100.0]]),
                               labels=np.array([1]))
    outs = list(mine.propagate_in_video(state))
    assert len(outs) == NUM_FRAMES
    fidx, obj_ids, masks = outs[0]
    assert obj_ids == [1, 2]
    assert masks.shape == (2, 1, 128, 128)


def test_add_mask_and_reverse(predictors, video_dir):
    _, mine = predictors
    state = mine.init_state(video_dir)
    mask = np.zeros((128, 128), bool)
    mask[40:80, 44:84] = True
    fidx, oids, m = mine.add_new_mask(state, 3, 7, mask)
    assert m.shape == (1, 1, 128, 128)
    outs = list(mine.propagate_in_video(state, start_frame_idx=3,
                                        reverse=True))
    assert [o[0] for o in outs] == [3, 2, 1, 0]


def test_remove_object_and_reset(predictors, video_dir):
    _, mine = predictors
    state = mine.init_state(video_dir)
    mine.add_new_points_or_box(state, 0, 1, points=np.array([[40.0, 60.0]]),
                               labels=np.array([1]))
    mine.add_new_points_or_box(state, 0, 2, points=np.array([[90.0, 90.0]]),
                               labels=np.array([1]))
    obj_ids, _ = mine.remove_object(state, 2)
    assert obj_ids == [1]
    mine.reset_state(state)
    assert state["obj_ids"] == []


def test_async_loading_frames_matches_sync():
    """AsyncFrameLoader (misc.py:92-168 parity) yields identical frames and
    propagation results to the sync path."""
    import numpy as np

    from video_llava_seg_tpu.data.video_io import (
        AsyncFrameLoader,
        load_video_frames,
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 24, 32, 3), dtype=np.uint8)
    sync, h, w = load_video_frames(frames, 16)
    loader = AsyncFrameLoader(frames, 16)
    assert len(loader) == 5 and loader.shape == (5, 16, 16, 3)
    assert (loader.video_height, loader.video_width) == (h, w)
    for i in range(5):
        np.testing.assert_allclose(loader[i], np.asarray(sync)[i],
                                   atol=1e-6)


def test_scan_path_matches_per_frame(predictors, video_dir):
    """The whole-clip lax.scan tracking path must reproduce the per-frame
    path's outputs (same slot contents, different packing — attention is
    masked identically)."""
    _, mine = predictors

    for reverse, start in ((False, None), (True, 3)):
        scan = _run_propagation(mine, video_dir, True, reverse, start)
        loop = _run_propagation(mine, video_dir, False, reverse, start)
        assert set(scan) == set(loop)
        for f in scan:
            np.testing.assert_allclose(scan[f], loop[f], atol=2e-2,
                                       rtol=1e-3, err_msg=f"frame {f}")


def _run_propagation(pred, video_dir, use_scan, reverse=False, start=None):
    state = pred.init_state(video_dir)
    sf = 0 if start is None else start
    pred.add_new_points_or_box(state, sf, 1,
                               points=np.array([[40.0, 60.0]]),
                               labels=np.array([1]))
    prev = pred.use_scan_propagation
    pred.use_scan_propagation = use_scan
    try:
        return {f: np.asarray(m) for f, _ids, m in
                pred.propagate_in_video(state, start_frame_idx=start,
                                        reverse=reverse)}
    finally:
        pred.use_scan_propagation = prev


def test_scan_chunk_boundary_parity(predictors, video_dir):
    """Multi-chunk scan continuation: with scan_chunk < clip length the ring
    carry crosses _scan_jit calls and scan_start masking spans chunk
    boundaries — must still match the per-frame path exactly."""
    _, mine = predictors
    prev_chunk = mine.scan_chunk
    try:
        mine.scan_chunk = 3  # 6-frame clip -> 2 scan chunks
        scan = _run_propagation(mine, video_dir, True)
        loop = _run_propagation(mine, video_dir, False)
    finally:
        mine.scan_chunk = prev_chunk
    assert set(scan) == set(loop) == set(range(NUM_FRAMES))
    for f in scan:
        np.testing.assert_allclose(scan[f], loop[f], atol=2e-2,
                                   rtol=1e-3, err_msg=f"frame {f}")


def test_scan_stride_gt1_parity(predictors, video_dir):
    """memory_temporal_stride_for_eval > 1 exercises the strided slot
    arithmetic in both the scan and per-frame memory-bank selection."""
    import dataclasses

    _, mine = predictors
    cfg2 = dataclasses.replace(TINY, memory_temporal_stride_for_eval=2)
    pred2 = SAM2VideoPredictor(mine.params, cfg2)
    pred2.scan_chunk = 3  # also cross a chunk boundary under stride 2
    scan = _run_propagation(pred2, video_dir, True)
    loop = _run_propagation(pred2, video_dir, False)
    assert set(scan) == set(loop) == set(range(NUM_FRAMES))
    for f in scan:
        np.testing.assert_allclose(scan[f], loop[f], atol=2e-2,
                                   rtol=1e-3, err_msg=f"frame {f}")


def test_scan_covers_interaction(predictors, video_dir):
    """The interactive VOS workflow — propagate, correct mid-video,
    re-propagate — must run on the scan path (gaps at cond frames,
    rings seeded from the first pass) and match the per-frame path."""
    _, mine = predictors

    def run(use_scan):
        prev = mine.use_scan_propagation
        mine.use_scan_propagation = use_scan
        try:
            state = mine.init_state(video_dir)
            mine.add_new_points_or_box(state, 0, 1,
                                       points=np.array([[40.0, 60.0]]),
                                       labels=np.array([1]))
            list(mine.propagate_in_video(state))           # first pass
            # correction on frame 3 -> cond frame inside the range
            mine.add_new_points_or_box(state, 3, 1,
                                       points=np.array([[44.0, 62.0]]),
                                       labels=np.array([1]))
            outs = list(mine.propagate_in_video(state))    # re-propagate
        finally:
            mine.use_scan_propagation = prev
        assert [o[0] for o in outs] == list(range(NUM_FRAMES))
        return {f: np.asarray(m) for f, _ids, m in outs}

    scan = run(True)
    loop = run(False)
    for f in range(NUM_FRAMES):
        np.testing.assert_allclose(scan[f], loop[f], atol=2e-2, rtol=1e-3,
                                   err_msg=f"frame {f}")


def test_scan_covers_cond_overflow(predictors, video_dir):
    """Cond frames beyond max_cond_frames_in_attn: the reference selects
    the temporally closest subset PER FRAME (sam2_utils.py:19-61) and
    attends unselected cond frames as non-cond memories/pointers
    (sam2_base.py:564-567, 617-619). The scan path precomputes the
    per-frame selection host-side and gathers it in-graph — long
    multi-prompt sessions must no longer fall back to per-frame dispatch,
    and must match the per-frame path."""
    import dataclasses

    _, mine = predictors
    cfg2 = dataclasses.replace(TINY, max_cond_frames_in_attn=2)
    pred2 = SAM2VideoPredictor(mine.params, cfg2)

    def run(use_scan):
        pred2.use_scan_propagation = use_scan
        state = pred2.init_state(video_dir)
        # three prompted frames -> 3 cond frames > limit 2
        for f, pt in ((0, (40.0, 60.0)), (2, (42.0, 61.0)),
                      (4, (44.0, 62.0))):
            pred2.add_new_points_or_box(state, f, 1,
                                        points=np.array([pt]),
                                        labels=np.array([1]))
        scan_used = []
        orig = pred2._scan_eligible

        def spy(*a, **k):
            r = orig(*a, **k)
            scan_used.append(r)
            return r

        pred2._scan_eligible = spy
        try:
            outs = list(pred2.propagate_in_video(state))
        finally:
            pred2._scan_eligible = orig
        if use_scan:
            assert any(scan_used), "scan path should cover cond overflow"
        return {f: np.asarray(m) for f, _ids, m in outs}

    scan = run(True)
    loop = run(False)
    assert set(scan) == set(loop)
    for f in sorted(scan):
        np.testing.assert_allclose(scan[f], loop[f], atol=2e-2, rtol=1e-3,
                                   err_msg=f"frame {f}")


def test_scan_covers_memory_clearing(predictors, video_dir):
    """clear_non_cond_mem_around_input: each cond frame the loop crosses
    pops a window of non-cond memories AT CROSSING TIME (reference
    :708-712, :1155+) — entries stored before the crossing vanish, frames
    tracked after it keep theirs. The scan path must reproduce both the
    masks and the final session-dict state, not fall back to per-frame
    dispatch."""
    import dataclasses

    _, mine = predictors
    # small window (stride*num_maskmem = 2) so the mid-clip crossing
    # clears a PARTIAL window — the all-cleared case would not catch an
    # over-eager mask
    cfg2 = dataclasses.replace(TINY, num_maskmem=2)
    pred2 = SAM2VideoPredictor(mine.params, cfg2)
    pred2.clear_non_cond_mem_around_input = True
    # corrections must become COND frames: with is_cond=False the
    # reference's own preflight pops the correction's just-consolidated
    # non-cond output (sam2_video_predictor.py:623-632 + :1155+) and its
    # propagation loop then KeyErrors — the demo pairs clearing with
    # add_all_frames_to_correct_as_cond, and so does this test
    pred2.add_all_frames_to_correct_as_cond = True

    def run(use_scan):
        pred2.use_scan_propagation = use_scan
        state = pred2.init_state(video_dir)
        pred2.add_new_points_or_box(state, 0, 1,
                                    points=np.array([[40.0, 60.0]]),
                                    labels=np.array([1]))
        list(pred2.propagate_in_video(state))          # first pass
        # correction mid-clip: add-time clearing pops around frame 3,
        # and the re-propagation CROSSES cond 3 between frames 2 and 4
        pred2.add_new_points_or_box(state, 3, 1,
                                    points=np.array([[44.0, 62.0]]),
                                    labels=np.array([1]))
        scan_used = []
        orig = pred2._scan_eligible

        def spy(*a, **k):
            r = orig(*a, **k)
            scan_used.append(r)
            return r

        pred2._scan_eligible = spy
        try:
            outs = {f: np.asarray(m) for f, _ids, m in
                    pred2.propagate_in_video(state)}
            # reverse leg: crossings happen on descending frame order
            outs_r = {f: np.asarray(m) for f, _ids, m in
                      pred2.propagate_in_video(state, start_frame_idx=3,
                                               reverse=True)}
        finally:
            pred2._scan_eligible = orig
        if use_scan:
            assert any(scan_used), "scan path should cover memory clearing"
        dict_keys = sorted(state["output_dict"]["non_cond_frame_outputs"])
        obj_keys = sorted(
            state["output_dict_per_obj"][0]["non_cond_frame_outputs"])
        outs.update({f"r{f}": m for f, m in outs_r.items()})
        return outs, dict_keys, obj_keys

    scan, scan_keys, scan_obj = run(True)
    loop, loop_keys, loop_obj = run(False)
    # the crossing at frame 3 must actually have cleared something
    assert loop_keys != sorted(set(range(NUM_FRAMES)) - {0, 3})
    assert scan_keys == loop_keys
    assert scan_obj == loop_obj
    assert set(scan) == set(loop)
    for f in sorted(scan, key=str):
        np.testing.assert_allclose(scan[f], loop[f], atol=2e-2, rtol=1e-3,
                                   err_msg=f"frame {f}")


def test_scan_covers_uncached_features(predictors, video_dir):
    """precompute_chunk=0 (the bounded-memory mode for long videos) must
    still scan: missing features are batch-encoded per chunk WITHOUT
    being retained, so host memory stays bounded while propagation keeps
    its one-dispatch-per-chunk shape."""
    _, mine = predictors

    def run(use_scan):
        prev = mine.use_scan_propagation
        mine.use_scan_propagation = use_scan
        try:
            state = mine.init_state(video_dir)
            mine.add_new_points_or_box(state, 0, 1,
                                       points=np.array([[40.0, 60.0]]),
                                       labels=np.array([1]))
            scan_used = []
            orig = mine._scan_eligible

            def spy(*a, **k):
                r = orig(*a, **k)
                scan_used.append(r)
                return r

            mine._scan_eligible = spy
            try:
                outs = {f: np.asarray(m) for f, _ids, m in
                        mine.propagate_in_video(state, precompute_chunk=0)}
            finally:
                mine._scan_eligible = orig
        finally:
            mine.use_scan_propagation = prev
        if use_scan:
            assert any(scan_used), "scan should cover uncached features"
            # ephemeral encode must NOT have filled the cache
            assert len(state["cached_features"]) <= 1
        return outs

    scan = run(True)
    loop = run(False)
    assert set(scan) == set(loop) == set(range(NUM_FRAMES))
    for f in sorted(scan):
        np.testing.assert_allclose(scan[f], loop[f], atol=2e-2, rtol=1e-3,
                                   err_msg=f"frame {f}")


def test_scan_covers_restart_from_middle(predictors, video_dir):
    """Re-propagation from an explicit mid-clip start must attend the
    FIRST pass's stale non-cond memories behind the start (reference
    dict-lookup semantics) — exercises ring/availability seeding."""
    _, mine = predictors

    def run(use_scan):
        prev = mine.use_scan_propagation
        mine.use_scan_propagation = use_scan
        try:
            state = mine.init_state(video_dir)
            mine.add_new_points_or_box(state, 0, 1,
                                       points=np.array([[40.0, 60.0]]),
                                       labels=np.array([1]))
            list(mine.propagate_in_video(state))
            mine.add_new_points_or_box(state, 3, 1,
                                       points=np.array([[44.0, 62.0]]),
                                       labels=np.array([1]))
            outs = list(mine.propagate_in_video(state, start_frame_idx=3))
        finally:
            mine.use_scan_propagation = prev
        return {f: np.asarray(m) for f, _ids, m in outs}

    scan = run(True)
    loop = run(False)
    assert set(scan) == set(loop)
    for f in scan:
        np.testing.assert_allclose(scan[f], loop[f], atol=2e-2, rtol=1e-3,
                                   err_msg=f"frame {f}")


def test_predictor_jits_take_params_as_arguments(predictors):
    """Weights must be jit ARGUMENTS, not closure constants: closed-over
    params get baked into the HLO as literals (hiera-large's ~600 MB blew
    the remote-compile request limit and pinned a weight copy per
    executable)."""
    import inspect

    from video_llava_seg_tpu.models.sam2.image_predictor import (
        SAM2ImagePredictor,
    )

    for fn in (SAM2VideoPredictor._encode_impl,
               SAM2VideoPredictor._track_impl,
               SAM2VideoPredictor._mask_as_output_impl,
               SAM2VideoPredictor._encode_mem_impl,
               SAM2VideoPredictor._scan_track_impl,
               SAM2ImagePredictor._encode_impl,
               SAM2ImagePredictor._decode_impl):
        args = inspect.signature(fn).parameters
        assert list(args)[1] == "params", fn.__qualname__
        src = inspect.getsource(fn)
        assert "self.params" not in src, fn.__qualname__
