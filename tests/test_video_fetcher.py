"""VideoAndFrameFetcher over the synthetic fixture
(llava/inference/video_fetcher.py parity)."""

import json
import os.path as osp
import types

import numpy as np
import pytest

from tests.test_inference_cli import _write_fixture


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("VIDEONET_DATASETS_DIR", str(tmp_path))
    return _write_fixture(str(tmp_path))


def test_get_video_and_frames(env):
    from video_llava_seg_tpu.inference.video_fetcher import (
        VideoAndFrameFetcher,
    )

    with open(osp.join(env, "annotations", "v1.0", "000007.json")) as fh:
        content = json.load(fh)
    f = VideoAndFrameFetcher(types.SimpleNamespace())
    video_bytes = f.get_video("vid7.mp4")
    assert len(video_bytes) > 0

    frames, meta = f.get_frames(content)
    assert frames.shape == (4, 48, 64, 3) and frames.dtype == np.uint8
    assert meta["video_id"] == 7
    assert meta["filenames"] == [f"{t:05d}.jpg" for t in range(4)]
    np.testing.assert_allclose(meta["timestamps"],
                               np.arange(4) / 3.0, atol=1e-6)

    # max_seg_frames subsampling keeps endpoints (linspace semantics)
    sub, meta2 = f.get_frames(content, max_seg_frames=2)
    assert sub.shape[0] == 2
    assert meta2["filenames"] == ["00000.jpg", "00003.jpg"]
