"""ViCaS dataset + collator + train step over the synthetic fixture
(llava/train/vicas_dataset.py + data_parsing.py parity)."""

import dataclasses
import json
import os.path as osp
import types

import numpy as np
import pytest

from tests.test_inference_cli import FakeTokenizer, _write_fixture


@pytest.fixture()
def vicas_train_env(tmp_path, monkeypatch):
    monkeypatch.setenv("VIDEONET_DATASETS_DIR", str(tmp_path))
    vicas = _write_fixture(str(tmp_path))
    # add the training-only fields + train split
    ann = osp.join(vicas, "annotations", "v1.0", "000007.json")
    with open(ann) as fh:
        content = json.load(fh)
    content["reworded_en_captions"] = ["a reworded caption"]
    with open(ann, "w") as fh:
        json.dump(content, fh)
    with open(osp.join(vicas, "splits", "v1.0", "train.json"), "w") as fh:
        json.dump([7], fh)
    return tmp_path


def _data_args():
    from video_llava_seg_tpu.config import DataConfig

    return DataConfig(vicas_version="v1.0", num_frames=4, num_slow_frames=2,
                      max_seg_frames=4, seg_image_size=64,
                      pad_mode="topleft")


def test_dataset_samples_and_items(vicas_train_env):
    from video_llava_seg_tpu.data.vicas import ViCaSDataset

    ds = ViCaSDataset(FakeTokenizer(), _data_args(), vision_image_size=56)
    # 1 raw + 1 reworded caption, referrals padded to caption count
    kinds = [s[1] for s in ds.samples]
    assert kinds.count("caption") == 2
    assert kinds.count("mask") == 2
    item_cap = ds[0]
    assert item_cap["image"].shape == (4, 56, 56, 3)
    assert "input_ids" in item_cap and "labels" in item_cap
    item_mask = ds[[i for i, s in enumerate(ds.samples)
                    if s[1] == "mask"][0]]
    assert item_mask["seg_frames"].shape[1:] == (64, 64, 3)
    assert item_mask["seg_masks"].any()


def test_collator_and_train_step(vicas_train_env):
    import jax

    from video_llava_seg_tpu.config import (
        SegHeadConfig,
        TrainConfig,
        VideoLlavaConfig,
    )
    from video_llava_seg_tpu.data.collate import make_supervised_data_module
    from video_llava_seg_tpu.data.vicas import ViCaSDataset
    from video_llava_seg_tpu.models import llava
    from video_llava_seg_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = VideoLlavaConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        seg=SegHeadConfig(seg_backbone="tiny", image_size=64,
                          max_seg_frames=4, max_objects=2),
        seg_token_idx=400)
    module = make_supervised_data_module(FakeTokenizer(), cfg, _data_args())
    ds, collator = module["train_dataset"], module["data_collator"]
    assert isinstance(ds, ViCaSDataset)

    mask_idx = [i for i, s in enumerate(ds.samples) if s[1] == "mask"][0]
    batch = collator([ds[0], ds[mask_idx]])
    assert batch["video"].shape[0] == 2
    assert batch["seg_frames"].shape == (2, 4, 64, 64, 3)
    assert batch["has_masks"].tolist() == [False, True]

    params = llava.init(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(num_train_steps=4, gradient_accumulation_steps=1,
                       gradient_checkpointing=False)
    state, tx = create_train_state(params, tcfg)
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_object_tracks"]) >= 1
