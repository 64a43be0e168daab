"""Multi-step FSDP training evidence at small-but-REAL dims.

The tiny-config loop test (test_train_loop.py) proves the mechanics; this
one proves multi-step *stability* of the full sharded train step at dims
where sharding actually matters: a 4-layer 1024-hidden LLM (FSDP+TP over
the 4x2 mesh, gradient checkpointing on) driving the REAL SAM2 Hiera-tiny
seg head (stages (1,2,7,2), the same trunk the reference's
facebook/sam2.1-hiera-tiny checkpoint uses — sam2/configs/sam2.1/
sam2.1_hiera_t.yaml) at a 128-pixel canvas:

- 20 full-graph steps on one batch, loss must trend down (overfit);
- bitwise checkpoint-resume mid-run at the same dims (the fold_in rng law,
  trainer.py:207-211).

The deployment-scale HBM arithmetic for full-param stage 3 (8B x
param+grad+Adam at 8-way FSDP) lives in BENCH_NOTES.md "Full-param stage-3
HBM plan"; this test is the executable leg of that claim.
"""

import dataclasses
import itertools
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import (
    LlamaConfig,
    MeshConfig,
    OptimGroupLRs,
    ProjectorConfig,
    SegHeadConfig,
    TrainConfig,
    VideoLlavaConfig,
    VisionTowerConfig,
)
from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
from video_llava_seg_tpu.models import llava
from video_llava_seg_tpu.parallel.mesh import create_mesh, shard_params
from video_llava_seg_tpu.train.train_step import (
    create_train_state,
    make_train_step,
)
from video_llava_seg_tpu.train.trainer import (
    latest_checkpoint,
    restore_checkpoint,
    train_loop,
)

SEG_ID = 2000

CFG = VideoLlavaConfig(
    llm=LlamaConfig(vocab_size=2048, hidden_size=1024,
                    intermediate_size=2048, num_layers=4, num_heads=8,
                    num_kv_heads=4, head_dim=128, max_seq_len=512),
    vision=VisionTowerConfig(name="probe-vit", image_size=56, patch_size=14,
                             hidden_size=64, intermediate_size=128,
                             num_layers=2, num_heads=2),
    projector=ProjectorConfig(mm_hidden_size=64, hidden_size=1024),
    # REAL Hiera-tiny trunk (models/sam2/config.py _HIERA_VARIANTS['tiny'])
    seg=SegHeadConfig(seg_backbone="tiny", image_size=128, max_seg_frames=1,
                      max_objects=2),
    num_frames=4, num_slow_frames=2, fast_pool_size=2,
    seg_token_idx=SEG_ID, tokenizer_model_max_length=512)


def _fixed_batch(b=4):
    tpi = llava.visual_tokens_per_sample(CFG)
    ids = np.concatenate([
        np.asarray([[1, 5]] * b),
        np.full((b, len(tpi)), IMAGE_TOKEN_INDEX),
        np.asarray([[3, 4, 9, SEG_ID]] * b),
    ], axis=1)
    labels = np.where(ids < 0, -100, ids)
    labels[:, :-2] = -100  # train on the answer tail only
    plan = llava.build_splice_plan(ids, tpi, labels)
    rng = np.random.RandomState(0)
    s = CFG.vision.image_size
    ss = CFG.seg.image_size
    seg_pos = np.flatnonzero(plan.labels[0] == SEG_ID) - 1
    return {
        "video": jnp.asarray(rng.rand(b, CFG.num_frames, s, s, 3),
                             jnp.float32),
        "text_ids": jnp.asarray(plan.text_ids),
        "gather_idx": jnp.asarray(plan.gather_idx),
        "position_ids": jnp.asarray(plan.position_ids),
        "labels": jnp.asarray(plan.labels),
        "seg_frames": jnp.asarray(rng.rand(b, 1, ss, ss, 3), jnp.float32),
        "seg_masks": jnp.asarray(rng.rand(b, 2, 1, ss, ss) > 0.7),
        "seg_valid": jnp.ones((b, 2), bool),
        "seg_frame_valid": jnp.ones((b, 1), bool),
        "seg_padding": jnp.zeros((b, 4), jnp.int32),
        "seg_token_pos": jnp.asarray(
            np.tile(seg_pos[None, :1], (b, 2)), jnp.int32),
        "has_masks": jnp.ones((b,), bool),
    }


def _setup(mesh, output_dir, num_steps, save_steps, limit):
    tcfg = TrainConfig(
        num_train_steps=num_steps, save_steps=save_steps,
        save_total_limit=limit, logging_steps=1,
        gradient_accumulation_steps=1, gradient_checkpointing=True,
        output_dir=output_dir,
        mesh=MeshConfig(data_parallel=4, model_parallel=2, fsdp=True),
        lrs=OptimGroupLRs(llm=1e-4, projector=1e-4, vision_tower=1e-5,
                          seg_encoder=1e-5, seg_decoder=1e-4))
    from video_llava_seg_tpu.train.train_step import (
        canonical_state_shardings,
    )

    params = llava.init(jax.random.PRNGKey(0), CFG)
    params = shard_params(params, mesh, fsdp=True)
    state, tx = create_train_state(params, tcfg)
    step_fn = make_train_step(CFG, tcfg, tx, donate=False,
                              state_shardings=
                              canonical_state_shardings(state))
    return tcfg, state, step_fn


@pytest.mark.slow
def test_fsdp_20step_stability_and_sharding(tmp_path, mesh8):
    batch = _fixed_batch()
    with mesh8:
        tcfg, state, step_fn = _setup(mesh8, str(tmp_path / "run"), 20,
                                      save_steps=50, limit=1)
        # parameters must actually be sharded, not replicated: every LLM
        # projection carries a mesh axis
        specs = [str(x.sharding.spec) for x in
                 jax.tree_util.tree_leaves(state.params["llm"])
                 if hasattr(x, "sharding") and x.ndim >= 2]
        assert any("model" in s or "data" in s for s in specs), specs[:5]

        final = train_loop(state, step_fn, itertools.repeat(batch), tcfg,
                           cfg_json="{}")
    with open(f"{tcfg.output_dir}/train_log.jsonl") as fh:
        rows = [json.loads(line) for line in fh]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert len(losses) == 20
    assert all(np.isfinite(losses))
    # monotone-ish: strictly better by thirds, and end << start
    first, mid, last = (np.mean(losses[:5]), np.mean(losses[8:13]),
                        np.mean(losses[-5:]))
    assert last < mid < first, (first, mid, last)
    assert last < 0.5 * first, (first, last)
    assert int(final.step) == 20


@pytest.mark.slow
def test_fsdp_resume_bitwise_at_real_dims(tmp_path, mesh8):
    """Crash after the step-3 checkpoint, auto-resume, run to 6; the
    resumed run's params/opt state must be BITWISE equal to the
    uninterrupted run's — under full FSDP sharding.

    This pins restore_checkpoint's scalar re-pinning: a restored state's
    scalars must come back mesh-REPLICATED like a mid-run state's, or the
    first resumed step runs a differently-specialized jit variant whose
    GSPMD schedule drifts at the ULP level (caught by this test before
    the fix)."""
    batch = _fixed_batch()

    class Crash(Exception):
        pass

    def dying_iter(k):
        for _ in range(k):
            yield batch
        raise Crash

    with mesh8:
        # run A: uninterrupted 6 steps, keep every checkpoint
        tcfg_a, state_a, step_a = _setup(mesh8, str(tmp_path / "a"), 6,
                                         save_steps=3, limit=9)
        final_a = train_loop(state_a, step_a, itertools.repeat(batch),
                             tcfg_a, cfg_json="{}")

        # run B: crash after step 3's checkpoint, restart, auto-resume
        tcfg_b, state_b, step_b = _setup(mesh8, str(tmp_path / "b"), 6,
                                         save_steps=3, limit=9)
        with pytest.raises(Crash):
            train_loop(state_b, step_b, dying_iter(3), tcfg_b, cfg_json="{}")
        assert latest_checkpoint(str(tmp_path / "b")) is not None
        tcfg_b2, fresh, step_b2 = _setup(mesh8, str(tmp_path / "b"), 6,
                                         save_steps=3, limit=9)
        final_b = train_loop(fresh, step_b2, itertools.repeat(batch),
                             tcfg_b2, cfg_json="{}")

    assert int(final_a.step) == int(final_b.step) == 6
    eq = jax.tree_util.tree_map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        final_a.params, final_b.params)
    assert all(jax.tree_util.tree_leaves(eq)), \
        "resumed FSDP params differ from uninterrupted run"
    opt_eq = jax.tree_util.tree_map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        final_a.opt_state, final_b.opt_state)
    assert all(jax.tree_util.tree_leaves(opt_eq)), \
        "resumed FSDP optimizer state differs from uninterrupted run"
