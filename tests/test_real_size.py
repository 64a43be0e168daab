"""Published-size config validation (no tiny-config hiding).

Instantiates the REAL model shapes — Llama-3-8B + CLIP-L-336 tower +
sam2.1-hiera-small seg head @1024², 32 frames, 6144 context (the stage-3
config of scripts/train/llama3/stage3_with_seg.sh:37-64) — abstractly:

  - jax.eval_shape of the full param tree (no 32 GB materialization)
  - TP/FSDP sharding specs on the 4x2 mesh with divisibility asserts
  - full train-step graph TRACE at real shapes via jit.lower (catches
    shape/rank bugs through vision tower, 32-layer LLM, seg head, losses)

Compute-level validation at real sizes runs on the actual chip via
scripts/tpu_smoke.py and bench.py --all (5120-token prefill on the 8B layer
shape, Hiera-S @1024²)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llava_seg_tpu.config import (
    MeshConfig,
    TrainConfig,
    VideoLlavaConfig,
)
from video_llava_seg_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from video_llava_seg_tpu.models import llava
from video_llava_seg_tpu.parallel.mesh import create_mesh, param_shardings


@pytest.fixture(scope="module")
def real_cfg():
    # defaults ARE the published stage-3 shapes; pin seg_token_idx like
    # initialize_vision_tokenizer does
    return dataclasses.replace(VideoLlavaConfig(), seg_token_idx=128256 - 1)


@pytest.fixture(scope="module")
def param_struct(real_cfg):
    return jax.eval_shape(
        lambda k: llava.init(k, real_cfg), jax.random.PRNGKey(0))


def test_real_size_param_count(param_struct):
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(param_struct))
    # 8B LLM + 0.3B tower + projector + SAM2-small head
    assert 8.0e9 < n < 9.2e9, f"{n:,} params"


def test_real_size_shardings_divisible(mesh8, param_struct):
    shardings = param_shardings(param_struct, mesh8, fsdp=True)

    def check(path, leaf, sh):
        spec = sh.spec
        for dim, axes in enumerate(spec):
            if axes is None:
                continue
            axes = (axes,) if isinstance(axes, str) else axes
            size = int(np.prod([mesh8.shape[a] for a in axes]))
            assert leaf.shape[dim] % size == 0, (path, leaf.shape, spec)

    jax.tree_util.tree_map_with_path(
        lambda p, l, s: check(p, l, s), param_struct, shardings)

    # the big matmuls must actually be tensor-parallel over 'model'
    flat = {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                     for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]}
    wq = [v for k, v in flat.items() if "llm" in k and "wq" in k]
    assert wq and all("model" in jax.tree_util.tree_leaves(s) or
                      any(a == "model" for a in s if a) for s in wq), wq[:2]


@pytest.mark.slow
def test_real_size_train_step_traces(real_cfg, mesh8, param_struct):
    """Trace (not compile) the full train step at published shapes."""
    from video_llava_seg_tpu.train.optimizer import build_optimizer
    from video_llava_seg_tpu.train.train_step import (
        TrainState,
        make_train_step,
    )

    tcfg = TrainConfig(num_train_steps=10, mesh=MeshConfig(model_parallel=2))
    tx = build_optimizer(tcfg, param_struct)
    opt_struct = jax.eval_shape(tx.init, param_struct)
    state_struct = TrainState(
        jax.ShapeDtypeStruct((), jnp.int32), param_struct, opt_struct)

    b = 4
    cfg = real_cfg
    tpi = llava.visual_tokens_per_sample(cfg)  # 8*576 + 32*16 = 5120
    assert sum(tpi) == 5120
    seq = cfg.tokenizer_model_max_length       # 6144
    s = cfg.vision.image_size
    ss = 1024
    seg = cfg.seg
    f32, i32 = jnp.float32, jnp.int32
    batch_struct = {
        "video": jax.ShapeDtypeStruct((b, cfg.num_frames, s, s, 3), f32),
        "text_ids": jax.ShapeDtypeStruct((b, seq), i32),
        "gather_idx": jax.ShapeDtypeStruct((b, seq), i32),
        "position_ids": jax.ShapeDtypeStruct((b, seq), i32),
        "labels": jax.ShapeDtypeStruct((b, seq), i32),
        "seg_frames": jax.ShapeDtypeStruct(
            (b, seg.max_seg_frames, ss, ss, 3), f32),
        "seg_masks": jax.ShapeDtypeStruct(
            (b, seg.max_objects, seg.max_seg_frames, ss, ss), jnp.bool_),
        "seg_valid": jax.ShapeDtypeStruct((b, seg.max_objects), jnp.bool_),
        "seg_frame_valid": jax.ShapeDtypeStruct(
            (b, seg.max_seg_frames), jnp.bool_),
        "seg_padding": jax.ShapeDtypeStruct((b, 4), i32),
        "seg_token_pos": jax.ShapeDtypeStruct((b, seg.max_objects), i32),
        "has_masks": jax.ShapeDtypeStruct((b,), jnp.bool_),
    }
    rng_struct = jax.ShapeDtypeStruct((2,), jnp.uint32)

    with mesh8:
        step = make_train_step(cfg, tcfg, tx, donate=False)
        lowered = step.lower(state_struct, batch_struct, rng_struct)
    assert lowered is not None  # trace succeeded at real shapes


def test_splice_plan_real_budget(real_cfg):
    """5120 visual tokens + prompt fit the 6144 context with the published
    layout (llava_arch.py:371-378 truncation only beyond the budget)."""
    cfg = real_cfg
    tpi = llava.visual_tokens_per_sample(cfg)
    prompt = np.concatenate([
        np.arange(1, 41)[None],                 # 40 text tokens
        np.full((1, len(tpi)), IMAGE_TOKEN_INDEX),
        np.arange(50, 90)[None],
    ], axis=1)
    labels = np.where(prompt < 0, IGNORE_INDEX, prompt)
    plan = llava.build_splice_plan(prompt, tpi, labels,
                                   max_length=cfg.tokenizer_model_max_length)
    # spliced length = text + expanded visual tokens, within the budget
    assert int(plan.seq_lens[0]) == 40 + 5120 + 40
    assert plan.gather_idx.shape[1] <= cfg.tokenizer_model_max_length
