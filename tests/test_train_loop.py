"""Training-loop behavior: loss decreases; checkpoint-resume is bitwise
equivalent to an uninterrupted run (the crash-resilience protocol of
train/trainer.py, mirroring llava/train/train.py:585-634 auto-resume)."""

import dataclasses
import itertools
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llava_seg_tpu.config import (
    OptimGroupLRs,
    TrainConfig,
    VideoLlavaConfig,
)
from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
from video_llava_seg_tpu.models import llava
from video_llava_seg_tpu.train.train_step import (
    create_train_state,
    make_train_step,
)
from video_llava_seg_tpu.train.trainer import latest_checkpoint, train_loop


def _tiny_setup(output_dir, num_steps):
    cfg = VideoLlavaConfig.tiny()
    tcfg = TrainConfig(
        num_train_steps=num_steps, save_steps=3, logging_steps=1,
        gradient_accumulation_steps=1, gradient_checkpointing=False,
        output_dir=output_dir, lrs=OptimGroupLRs(llm=1e-3, projector=1e-3,
                                            vision_tower=1e-3))
    params = llava.init(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, tcfg)
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)

    tpi = llava.visual_tokens_per_sample(cfg)
    b = 2
    ids = np.concatenate([
        np.asarray([[1, 9, 8]] * b),
        np.full((b, len(tpi)), IMAGE_TOKEN_INDEX),
        np.asarray([[3, 4, 5, 6]] * b),
    ], axis=1)
    labels = np.where(ids < 0, -100, ids)
    plan = llava.build_splice_plan(ids, tpi, labels)
    s = cfg.vision.image_size
    video = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7),
                          (b, cfg.num_frames, s, s, 3)))
    batch = {
        "video": jnp.asarray(video),
        "text_ids": jnp.asarray(plan.text_ids),
        "gather_idx": jnp.asarray(plan.gather_idx),
        "position_ids": jnp.asarray(plan.position_ids),
        "labels": jnp.asarray(plan.labels),
    }
    return cfg, tcfg, state, step_fn, batch


def test_loss_decreases_and_resume_bitwise(tmp_path):
    n = 6
    # --- run A: uninterrupted n steps
    dir_a = str(tmp_path / "a")
    cfg, tcfg, state, step_fn, batch = _tiny_setup(dir_a, n)
    final_a = train_loop(state, step_fn, itertools.repeat(batch), tcfg,
                         cfg_json="{}")

    # loss trend from the jsonl log
    with open(f"{dir_a}/train_log.jsonl") as fh:
        rows = [json.loads(line) for line in fh]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses[-1] < losses[0], losses

    # --- run B: identical config, but "crash" right after the step-3
    # checkpoint (the data iterator dies), then restart and auto-resume
    dir_b = str(tmp_path / "b")
    cfg, tcfg_b, state_b, step_fn_b, _ = _tiny_setup(dir_b, n)

    class Crash(Exception):
        pass

    def dying_iter(k):
        for _ in range(k):
            yield batch
        raise Crash

    with pytest.raises(Crash):
        train_loop(state_b, step_fn_b, dying_iter(3), tcfg_b, cfg_json="{}")
    assert latest_checkpoint(dir_b) is not None

    # fresh state (as a restarted process would build) — restore fills it
    _, _, fresh, step_fn_b2, _ = _tiny_setup(dir_b, n)
    final_b = train_loop(fresh, step_fn_b2, itertools.repeat(batch),
                         tcfg_b, cfg_json="{}")

    assert int(final_a.step) == int(final_b.step) == n
    mismatches = jax.tree_util.tree_map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        final_a.params, final_b.params)
    assert all(jax.tree_util.tree_leaves(mismatches)), \
        "resumed params differ from uninterrupted run"
    opt_equal = jax.tree_util.tree_map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        final_a.opt_state, final_b.opt_state)
    assert all(jax.tree_util.tree_leaves(opt_equal)), \
        "resumed optimizer state differs from uninterrupted run"


def test_incomplete_checkpoint_cleanup(tmp_path):
    """checkpoint-* dirs without the sentinel are GC'd on loop start
    (train.py:585-595 parity)."""
    import os
    import os.path as osp

    from video_llava_seg_tpu.train.trainer import (
        cleanup_incomplete_checkpoints,
    )

    out = str(tmp_path)
    os.makedirs(osp.join(out, "checkpoint-5"))
    with open(osp.join(out, "checkpoint-5", "junk"), "w") as fh:
        fh.write("partial")
    os.makedirs(osp.join(out, "checkpoint-3"))
    with open(osp.join(out, "checkpoint-3", "checkpoint_saved.flag"),
              "w") as fh:
        fh.write("saved")
    cleanup_incomplete_checkpoints(out)
    assert not osp.exists(osp.join(out, "checkpoint-5"))
    assert osp.exists(osp.join(out, "checkpoint-3"))
    assert latest_checkpoint(out).endswith("checkpoint-3")
