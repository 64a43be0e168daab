"""Misc utils tests (llava/utils.py + train consistency parity)."""

import dataclasses
import json
import logging
import os

import numpy as np
import pytest


def test_tree_to_moves_and_casts():
    import jax.numpy as jnp

    from video_llava_seg_tpu.utils import tree_to

    tree = {"a": np.ones((2, 2)), "b": [np.zeros((3,)), "keep"],
            "c": ("x", np.full((1,), 7.0))}
    out = tree_to(tree, dtype=jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"][0].dtype == jnp.bfloat16
    assert out["b"][1] == "keep"
    assert out["c"][1].dtype == jnp.bfloat16
    with pytest.raises(ValueError):
        tree_to({"bad": object()}, raise_error_if_unknown=True)


def test_build_logger_writes_file(tmp_path, monkeypatch):
    import video_llava_seg_tpu.utils as U

    monkeypatch.setattr(U, "LOGDIR", str(tmp_path))
    monkeypatch.setattr(U, "_handler", None)
    logger = U.build_logger("test_logger", "test.log",
                            redirect_streams=False)
    logger.info("hello from the tpu build")
    for h in logging.getLogger().handlers + logger.handlers:
        h.flush()
    files = os.listdir(tmp_path)
    assert any(f.startswith("test.log") for f in files)
    content = open(os.path.join(tmp_path, sorted(files)[0])).read()
    assert "hello from the tpu build" in content


def test_verify_config_consistency(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from video_llava_seg_tpu.config import VideoLlavaConfig, to_json
    from video_llava_seg_tpu.train.train import verify_config_consistency

    cfg = VideoLlavaConfig.tiny()
    (tmp_path / "config.json").write_text(to_json(cfg))
    verify_config_consistency(cfg, str(tmp_path))  # match: no raise

    bad = dataclasses.replace(cfg, num_slow_frames=cfg.num_frames - 1)
    with pytest.raises(ValueError, match="num_slow_frames"):
        verify_config_consistency(bad, str(tmp_path))

    # HF-style config (no 'llm' key): silently skipped
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "llama"}))
    verify_config_consistency(bad, str(tmp_path))
