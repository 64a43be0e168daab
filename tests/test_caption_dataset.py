"""Caption pretrain dataset over a synthetic WebVid-style fixture
(llava/train/video_datasets.py parity)."""

import json
import os
import os.path as osp

import numpy as np
import pytest

from tests.test_inference_cli import FakeTokenizer


@pytest.fixture()
def webvid_env(tmp_path, monkeypatch):
    import cv2

    monkeypatch.setenv("VIDEONET_DATASETS_DIR", str(tmp_path))
    shard = tmp_path / "WebVid10M" / "shard000"
    os.makedirs(shard)
    rng = np.random.default_rng(0)
    for vid in (11, 12):
        frames = rng.integers(0, 255, (6, 32, 40, 3), dtype=np.uint8)
        vw = cv2.VideoWriter(str(shard / f"{vid}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 5, (40, 32))
        for f in frames:
            vw.write(f[..., ::-1])
        vw.release()
        with open(shard / f"{vid}.json", "w") as fh:
            json.dump({"videoid": vid, "caption": f"clip number {vid}"}, fh)
    return tmp_path


def test_caption_dataset_items_and_collation(webvid_env):
    from video_llava_seg_tpu.config import DataConfig, VideoLlavaConfig
    from video_llava_seg_tpu.data.caption_datasets import VideoCaptionDataset
    from video_llava_seg_tpu.data.collate import DataCollator

    data_args = DataConfig(dataset="captions", num_frames=4,
                           num_slow_frames=2)
    ds = VideoCaptionDataset(FakeTokenizer(), data_args,
                             vision_image_size=56)
    assert len(ds) == 2
    item = ds[0]
    assert item["image"].shape == (4, 56, 56, 3)
    assert "seg_frames" not in item
    # NOTE: with the char-hash FakeTokenizer the template masking hits the
    # reference's mismatch guard and masks everything; just check alignment
    assert len(item["labels"]) == len(item["input_ids"])

    cfg = VideoLlavaConfig.tiny()
    batch = DataCollator(cfg, data_args)([ds[0], ds[1]])
    assert batch["video"].shape == (2, 4, 56, 56, 3)
    assert "seg_frames" not in batch


def test_panda_json_variant():
    from video_llava_seg_tpu.data.caption_datasets import VideoCaptionDataset

    cap, vid, score = VideoCaptionDataset.parse_json(
        {"video_id": 9, "caption": "x", "matching_score": 0.5})
    assert (cap, vid, score) == ("x", 9, 0.5)
    cap, vid, score = VideoCaptionDataset.parse_json(
        {"videoid": 3, "caption": "y"})
    assert (cap, vid, score) == ("y", 3, 1.0)
    with pytest.raises(ValueError):
        VideoCaptionDataset.parse_json({"caption": "z"})
