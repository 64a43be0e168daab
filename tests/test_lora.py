"""LoRA adapter tests (reference: peft path at llava/train/train.py:410-426,
merge-at-load in llava/model/builder.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.config import TrainConfig, VideoLlavaConfig
from video_llava_seg_tpu.models import llava
from video_llava_seg_tpu.train import lora


def _tiny():
    cfg = VideoLlavaConfig.tiny()
    params = llava.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_init_targets_llm_projections_only():
    _, params = _tiny()
    lp = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    assert set(lp) == {"llm"}
    layer0 = lp["llm"]["layers"][0]
    assert set(layer0) == {"attn"} or "mlp" in layer0
    flat = jax.tree_util.tree_leaves(lp)
    assert all(x.ndim == 2 for x in flat)
    # qv-only variant (find_all_linear_names(qv_proj_only), train.py:126-128)
    lp_qv = lora.init_lora(jax.random.PRNGKey(1), params, rank=4,
                           targets=lora.target_names(qv_proj_only=True))
    n_qv = len(jax.tree_util.tree_leaves(lp_qv))
    assert n_qv < len(flat)


def test_zero_init_is_identity():
    cfg, params = _tiny()
    lp = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = lora.merge(params, lp)
    k0 = params["llm"]["layers"][0]["attn"]["wq"]["kernel"]
    k1 = merged["llm"]["layers"][0]["attn"]["wq"]["kernel"]
    np.testing.assert_allclose(np.asarray(k0), np.asarray(k1), atol=1e-7)


def test_merge_math_and_merge_into():
    _, params = _tiny()
    lp = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    # randomize b so the delta is nonzero
    lp = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(2),
                                               x.shape), lp)
    merged = lora.merge(params, lp, alpha=16.0)
    node = lp["llm"]["layers"][0]["attn"]["wq"]["kernel"]
    want = (params["llm"]["layers"][0]["attn"]["wq"]["kernel"]
            + (node["a"] @ node["b"]) * (16.0 / 4))
    got = merged["llm"]["layers"][0]["attn"]["wq"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    baked = lora.merge_into(params, lp, alpha=16.0)
    got2 = baked["llm"]["layers"][0]["attn"]["wq"]["kernel"]
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=1e-6)
    # non-target leaves untouched
    np.testing.assert_array_equal(
        np.asarray(merged["llm"]["embed_tokens"]["embedding"]),
        np.asarray(params["llm"]["embed_tokens"]["embedding"]))


def test_train_step_updates_only_adapters_and_unfrozen():
    from video_llava_seg_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg, params = _tiny()
    tcfg = TrainConfig(lora_enable=True, lora_rank=4, num_train_steps=10,
                       gradient_checkpointing=False,
                       gradient_accumulation_steps=1)
    params["lora"] = lora.init_lora(jax.random.PRNGKey(1), params, 4)
    state, tx = create_train_state(params, tcfg)
    step_fn = make_train_step(cfg, tcfg, tx, donate=False)

    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX

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
    # two steps: warmup lr is 0 at count=0, nonzero from count=1
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    new_state, metrics = step_fn(new_state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))

    old_q = np.asarray(
        state.params["llm"]["layers"][0]["attn"]["wq"]["kernel"])
    new_q = np.asarray(
        new_state.params["llm"]["layers"][0]["attn"]["wq"]["kernel"])
    np.testing.assert_array_equal(old_q, new_q)  # base LLM frozen

    old_b = np.asarray(
        state.params["lora"]["llm"]["layers"][0]["attn"]["wq"]["kernel"]["b"])
    new_b = np.asarray(
        new_state.params["lora"]["llm"]["layers"][0]["attn"]["wq"]["kernel"]["b"])
    assert np.abs(new_b - old_b).max() > 0  # adapters trained


def test_gradient_accumulation_and_remat():
    """grad-accum via optax.MultiSteps (params change only every k-th
    micro-step) and remat path compiles."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_llava_seg_tpu.config import TrainConfig, VideoLlavaConfig
    from video_llava_seg_tpu.constants import IMAGE_TOKEN_INDEX
    from video_llava_seg_tpu.models import llava
    from video_llava_seg_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = VideoLlavaConfig.tiny()
    params = llava.init(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(num_train_steps=10, gradient_accumulation_steps=2,
                       gradient_checkpointing=True, warmup_ratio=0.0)
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
    w0 = np.asarray(state.params["llm"]["layers"][0]["attn"]["wq"]["kernel"])
    s1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    w1 = np.asarray(s1.params["llm"]["layers"][0]["attn"]["wq"]["kernel"])
    np.testing.assert_array_equal(w0, w1)  # micro-step 1: no update yet
    # run through two full accumulation windows (first real update is at
    # warmup count 0 where lr = 0)
    s = s1
    for i in range(2, 5):
        s, _ = step_fn(s, batch, jax.random.PRNGKey(i))
    w4 = np.asarray(s.params["llm"]["layers"][0]["attn"]["wq"]["kernel"])
    assert np.abs(w4 - w0).max() > 0       # update applied after window 2
