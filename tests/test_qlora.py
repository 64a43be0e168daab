"""QLoRA-equivalent k-bit training: LoRA adapters over a weight-only int8
LLM base (reference: llava/train/train.py:395-426 — BitsAndBytes bits=4/8 +
prepare_model_for_kbit_training + peft LoRA).

TPU-native design under test: the int8 base kernel never materializes a
bf16 copy — ops/nn.py::dense applies the adapter as a rank-r side branch
((x@a)@b)*s attached to the quantized param dict by train/lora.py::merge —
and train_step takes grads with allow_int, zeroing frozen/int cotangents so
XLA dead-codes the frozen base's weight-grad einsums."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.config import TrainConfig, VideoLlavaConfig
from video_llava_seg_tpu.models import llava
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.quantization import quantize_tree
from video_llava_seg_tpu.train import lora


def _tiny_quantized():
    cfg = VideoLlavaConfig.tiny()
    params = llava.init(jax.random.PRNGKey(0), cfg)
    # tiny kernels are below the serving min_size gate; quantize everything
    params["llm"] = quantize_tree(params["llm"], bits=8, min_size=0)
    return cfg, params


def test_dense_lora_side_branch_matches_explicit():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kernel = jax.random.normal(k1, (32, 48), jnp.float32)
    p = quantize_tree({"kernel": kernel}, bits=8, min_size=0)
    a = jax.random.normal(k2, (32, 4), jnp.float32) * 0.1
    b = jax.random.normal(k3, (4, 48), jnp.float32) * 0.1
    s = jnp.asarray(16.0 / 4, jnp.float32)
    x = jax.random.normal(k4, (5, 32), jnp.float32)

    got = nn.dense({**p, "lora": {"a": a, "b": b, "s": s}}, x)
    want = nn.dense(p, x) + (x @ a @ b) * s
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_init_lora_matches_quantized_kernels_and_merge_attaches():
    cfg, params = _tiny_quantized()
    node = params["llm"]["layers"][0]["attn"]["wq"]
    assert "kernel_q" in node and "kernel" not in node

    lp = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    ad = lp["llm"]["layers"][0]["attn"]["wq"]["kernel_q"]
    assert set(ad) == {"a", "b"}
    # dims come from the quantized kernel: [in, r] @ [r, out]
    assert ad["a"].shape == (node["kernel_q"].shape[0], 4)
    assert ad["b"].shape == (4, node["kernel_q"].shape[1])

    merged = lora.merge(params, lp, alpha=16.0)
    mnode = merged["llm"]["layers"][0]["attn"]["wq"]
    assert set(mnode["lora"]) == {"a", "b", "s"}
    assert float(mnode["lora"]["s"]) == 16.0 / 4
    # base leaves untouched (still int8 + scale)
    np.testing.assert_array_equal(np.asarray(mnode["kernel_q"]),
                                  np.asarray(node["kernel_q"]))
    # b zero-init -> adapter is identity at start
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (3, node["kernel_q"].shape[0]), jnp.float32)
    np.testing.assert_allclose(np.asarray(nn.dense(mnode, x)),
                               np.asarray(nn.dense(node, x)),
                               rtol=1e-6, atol=1e-6)


def test_trainable_mask_excludes_int_and_frozen():
    from video_llava_seg_tpu.train.optimizer import trainable_mask

    cfg, params = _tiny_quantized()
    tcfg = TrainConfig(lora_enable=True, lora_rank=4, bits=8)
    params["lora"] = lora.init_lora(jax.random.PRNGKey(1), params, 4)
    mask = trainable_mask(tcfg, params)
    # every llm leaf (int8 kernels, scales, norms) is frozen under LoRA
    assert not any(jax.tree_util.tree_leaves(mask["llm"]))
    # adapters train
    assert all(jax.tree_util.tree_leaves(mask["lora"]))
    # other components train by default
    assert all(jax.tree_util.tree_leaves(mask["mm_projector"]))


def test_qlora_train_step_updates_adapters_only():
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg, params = _tiny_quantized()
    tcfg = TrainConfig(lora_enable=True, lora_rank=4, bits=8,
                       num_train_steps=10, warmup_ratio=0.0,
                       gradient_checkpointing=False,
                       gradient_accumulation_steps=1)
    params["lora"] = lora.init_lora(jax.random.PRNGKey(1), params, 4)
    state, tx = create_train_state(params, tcfg)
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)

    tpi = llava.visual_tokens_per_sample(cfg)
    ids = np.concatenate([
        np.asarray([[1, 2]]), np.full((1, len(tpi)), IMAGE_TOKEN_INDEX),
        np.asarray([[3, 4]])], axis=1)
    plan = llava.build_splice_plan(ids, tpi, labels=ids)
    batch = {
        "video": jnp.zeros((1, cfg.num_frames, cfg.vision.image_size,
                            cfg.vision.image_size, 3), jnp.float32),
        "text_ids": jnp.asarray(plan.text_ids),
        "gather_idx": jnp.asarray(plan.gather_idx),
        "position_ids": jnp.asarray(plan.position_ids),
        "labels": jnp.asarray(plan.labels),
    }
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    new_state, metrics = step_fn(new_state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))

    q_old = state.params["llm"]["layers"][0]["attn"]["wq"]
    q_new = new_state.params["llm"]["layers"][0]["attn"]["wq"]
    np.testing.assert_array_equal(np.asarray(q_old["kernel_q"]),
                                  np.asarray(q_new["kernel_q"]))
    np.testing.assert_array_equal(np.asarray(q_old["kernel_scale"]),
                                  np.asarray(q_new["kernel_scale"]))
    assert q_new["kernel_q"].dtype == jnp.int8

    b_old = np.asarray(
        state.params["lora"]["llm"]["layers"][0]["attn"]["wq"]["kernel_q"]["b"])
    b_new = np.asarray(
        new_state.params["lora"]["llm"]["layers"][0]["attn"]["wq"]["kernel_q"]["b"])
    assert np.abs(b_new - b_old).max() > 0


def test_train_cli_bits_validation():
    from video_llava_seg_tpu.train.train import train

    cfg = VideoLlavaConfig.tiny()
    tcfg = TrainConfig(bits=8)  # no freeze_llm, no lora -> invalid
    try:
        train(cfg, dataclasses.replace(tcfg, num_train_steps=1),
              synthetic=True)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "bits" in str(e)


def test_qlora_resume_bitwise(tmp_path):
    """Checkpoint-resume with a quantized base is bitwise-equivalent to an
    uninterrupted run (int8 kernels + bf16 scales survive the orbax
    round-trip; adapters + trainable components restore exactly)."""
    import itertools

    import pytest

    from video_llava_seg_tpu.config import OptimGroupLRs
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )
    from video_llava_seg_tpu.train.trainer import (
        latest_checkpoint,
        train_loop,
    )

    def setup(output_dir, n):
        cfg = VideoLlavaConfig.tiny()
        from video_llava_seg_tpu.ops.quantization import quantize_tree

        params = llava.init(jax.random.PRNGKey(0), cfg)
        params["llm"] = quantize_tree(params["llm"], bits=8, min_size=0,
                                      train_mode=True)
        tcfg = TrainConfig(
            num_train_steps=n, save_steps=3, logging_steps=1,
            bits=8, lora_enable=True, lora_rank=4, warmup_ratio=0.0,
            gradient_accumulation_steps=1, gradient_checkpointing=False,
            output_dir=output_dir,
            lrs=OptimGroupLRs(projector=1e-3, lora=1e-3))
        params["lora"] = lora.init_lora(jax.random.PRNGKey(1), params, 4)
        state, tx = create_train_state(params, tcfg)
        step_fn = make_train_step(cfg, tcfg, tx, donate=False)
        tpi = llava.visual_tokens_per_sample(cfg)
        ids = np.concatenate([
            np.asarray([[1, 2]]), np.full((1, len(tpi)), IMAGE_TOKEN_INDEX),
            np.asarray([[3, 4]])], axis=1)
        plan = llava.build_splice_plan(ids, tpi, labels=ids)
        batch = {
            "video": jnp.zeros((1, cfg.num_frames, cfg.vision.image_size,
                                cfg.vision.image_size, 3), jnp.float32),
            "text_ids": jnp.asarray(plan.text_ids),
            "gather_idx": jnp.asarray(plan.gather_idx),
            "position_ids": jnp.asarray(plan.position_ids),
            "labels": jnp.asarray(plan.labels),
        }
        return tcfg, state, step_fn, batch

    n = 5
    tcfg_a, state_a, step_a, batch = setup(str(tmp_path / "a"), n)
    final_a = train_loop(state_a, step_a, itertools.repeat(batch), tcfg_a,
                         cfg_json="{}")

    tcfg_b, state_b, step_b, _ = setup(str(tmp_path / "b"), n)

    class Crash(Exception):
        pass

    def dying_iter(k):
        for _ in range(k):
            yield batch
        raise Crash

    with pytest.raises(Crash):
        train_loop(state_b, step_b, dying_iter(3), tcfg_b, cfg_json="{}")
    assert latest_checkpoint(str(tmp_path / "b")) is not None
    tcfg_b2, fresh, step_b2, _ = setup(str(tmp_path / "b"), n)
    final_b = train_loop(fresh, step_b2, itertools.repeat(batch), tcfg_b2,
                         cfg_json="{}")

    assert int(final_a.step) == int(final_b.step) == n
    same = jax.tree_util.tree_map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        final_a.params, final_b.params)
    assert all(jax.tree_util.tree_leaves(same))
    # quantized base still int8 after the round-trip
    assert final_b.params["llm"]["layers"][0]["attn"]["wq"][
        "kernel_q"].dtype == jnp.int8


def test_qlora_multichip_step():
    """QLoRA composes with the (data, model) mesh: quantized int8 base +
    adapters shard under the TP/FSDP rules and a train step runs on the
    virtual 8-device mesh with finite loss and frozen base."""
    from video_llava_seg_tpu.config import MeshConfig
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.parallel.mesh import create_mesh, shard_params
    from video_llava_seg_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg, params = _tiny_quantized()
    tcfg = TrainConfig(lora_enable=True, lora_rank=4, bits=8,
                       num_train_steps=10, warmup_ratio=0.0,
                       gradient_checkpointing=True,
                       gradient_accumulation_steps=1,
                       mesh=MeshConfig(model_parallel=2))
    params["lora"] = lora.init_lora(jax.random.PRNGKey(1), params, 4)
    mesh = create_mesh(tcfg.mesh)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with mesh:
        params = shard_params(params, mesh, fsdp=False)
        state, tx = create_train_state(params, tcfg)
        step_fn = make_train_step(cfg, tcfg, tx, donate=False)

        tpi = llava.visual_tokens_per_sample(cfg)
        b = 4   # divisible over data axis
        ids = np.concatenate([
            np.asarray([[1, 2]] * b),
            np.full((b, len(tpi)), IMAGE_TOKEN_INDEX),
            np.asarray([[3, 4]] * b)], axis=1)
        plan = llava.build_splice_plan(ids, tpi, labels=ids)
        batch = {
            "video": jnp.zeros((b, cfg.num_frames, cfg.vision.image_size,
                                cfg.vision.image_size, 3), jnp.float32),
            "text_ids": jnp.asarray(plan.text_ids),
            "gather_idx": jnp.asarray(plan.gather_idx),
            "position_ids": jnp.asarray(plan.position_ids),
            "labels": jnp.asarray(plan.labels),
        }
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        np.testing.assert_array_equal(
            np.asarray(state.params["llm"]["layers"][0]["attn"]["wq"][
                "kernel_q"]),
            np.asarray(new_state.params["llm"]["layers"][0]["attn"]["wq"][
                "kernel_q"]))
