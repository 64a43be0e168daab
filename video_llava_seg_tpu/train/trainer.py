"""Training orchestration: loop, checkpointing, logging, crash resilience.

TPU-native equivalent of llava/train/{llava_trainer,train}.py:
- orbax checkpoints with a completion-marker protocol mirroring the
  reference's `checkpoint_saved.flag` sentinel (llava_trainer.py:367-381) and
  startup garbage collection of incomplete checkpoints (train.py:585-605)
- metric accumulation weighted by num_object_tracks with cross-host
  reduction at log steps (llava_trainer.py:459-532)
- rolling-window ETA estimation (train.py:233-275)
- save_total_limit pruning and a final `training_complete.flag`
  (train.py:652-665)
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import time
from collections import defaultdict, deque
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from video_llava_seg_tpu.config import TrainConfig, to_json
from video_llava_seg_tpu.parallel.collectives import (
    is_main_process,
    print_once,
    reduce_dict,
)

CHECKPOINT_FLAG = "checkpoint_saved.flag"
COMPLETE_FLAG = "training_complete.flag"


def cleanup_incomplete_checkpoints(output_dir: str) -> None:
    """Delete checkpoint-* dirs missing the saved sentinel (train.py:585-595)."""
    if not osp.isdir(output_dir):
        return
    for name in os.listdir(output_dir):
        path = osp.join(output_dir, name)
        if (name.startswith("checkpoint-") and osp.isdir(path)
                and not osp.exists(osp.join(path, CHECKPOINT_FLAG))):
            print_once(f"Removing incomplete checkpoint: {path}")
            shutil.rmtree(path, ignore_errors=True)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    if not osp.isdir(output_dir):
        return None
    ckpts = [d for d in os.listdir(output_dir)
             if d.startswith("checkpoint-")
             and osp.exists(osp.join(output_dir, d, CHECKPOINT_FLAG))]
    if not ckpts:
        return None
    ckpts.sort(key=lambda d: int(d.split("-")[-1]))
    return osp.join(output_dir, ckpts[-1])


def save_checkpoint(output_dir: str, step: int, state, cfg_json: str,
                    save_total_limit: int = 1) -> str:
    """Orbax save + sentinel + limit pruning."""
    import orbax.checkpoint as ocp

    path = osp.join(output_dir, f"checkpoint-{step}")
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(osp.join(path, "state")),
               {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}, force=True)
    ckptr.wait_until_finished()
    if is_main_process():
        with open(osp.join(path, "config.json"), "w") as fh:
            fh.write(cfg_json)
        with open(osp.join(path, CHECKPOINT_FLAG), "w") as fh:
            fh.write("saved")
    # prune older complete checkpoints beyond the limit
    ckpts = sorted((d for d in os.listdir(output_dir)
                    if d.startswith("checkpoint-")),
                   key=lambda d: int(d.split("-")[-1]))
    for old in ckpts[:-save_total_limit]:
        shutil.rmtree(osp.join(output_dir, old), ignore_errors=True)
    return path


def save_projector_only(output_dir: str, params) -> str:
    """Stage-1 artifact: persist just the mm projector, the counterpart of
    the reference's mm_projector.bin (train.py:144-171 —
    safe_save_model_for_hf_trainer with tune_mm_mlp_adapter). Restored by
    convert/llava_torch.load_llava_weights or orbax directly."""
    import orbax.checkpoint as ocp

    path = osp.join(output_dir, "mm_projector")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(path), {"mm_projector": params["mm_projector"]},
               force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state):
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding

    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step}
    restored = ckptr.restore(osp.abspath(osp.join(path, "state")), target)

    # orbax restores every leaf COMMITTED to its device(s). Mesh-sharded
    # leaves keep their NamedSharding, but scalars (step, optax counts)
    # come back committed to device 0, and a jit call mixing arrays
    # committed to 1 device with arrays committed to the 8-device mesh
    # raises "incompatible devices". Worse, merely UNcommitting them makes
    # the first resumed step run the jit variant specialized for
    # fresh-state inputs, whose GSPMD schedule can differ at the ULP level
    # from the mid-run variant — breaking bitwise resume. A mid-run
    # state's scalars are mesh-REPLICATED (NamedSharding(mesh, P())), so
    # restore them exactly that way; without a mesh (single-device runs)
    # fall back to uncommitted, which is what a fresh state holds.
    from jax.sharding import PartitionSpec

    mesh = next((leaf.sharding.mesh
                 for leaf in jax.tree_util.tree_leaves(target)
                 if hasattr(leaf, "sharding")
                 and isinstance(leaf.sharding, NamedSharding)), None)
    replicated = (NamedSharding(mesh, PartitionSpec())
                  if mesh is not None else None)

    def repin(tgt, res):
        if hasattr(tgt, "sharding") and isinstance(tgt.sharding,
                                                   NamedSharding):
            return res
        host = jax.device_get(res)
        if replicated is not None:
            return jax.device_put(host, replicated)
        return jnp.asarray(host)

    restored = jax.tree_util.tree_map(repin, target, restored)
    return state._replace(step=restored["step"], params=restored["params"],
                          opt_state=restored["opt_state"])


class ETAEstimator:
    """Rolling-window step timing (train.py:233-275 parity)."""

    def __init__(self, total_steps: int, window: int = 5000):
        self.total_steps = total_steps
        self.times = deque(maxlen=window)
        self._last = None

    def tick(self, step: int) -> Dict[str, float]:
        now = time.time()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now
        if not self.times:
            return {}
        avg = float(np.mean(self.times))
        return {"step_time": avg,
                "eta_hours": avg * (self.total_steps - step) / 3600.0}


class MetricLogger:
    """Accumulate per-step metrics; reduce across hosts at log steps,
    weighting mask metrics by num_object_tracks (llava_trainer.py:459-532)."""

    def __init__(self, log_path: Optional[str] = None, tcfg=None):
        self.cache = defaultdict(list)
        self.log_path = log_path
        self.wandb = None
        if (tcfg is not None and tcfg.report_to == "wandb"
                and is_main_process()):
            try:  # wandb on global rank 0 only (train.py:607-620)
                import wandb

                wandb.init(project=tcfg.wandb_project, name=tcfg.run_name,
                           config=json.loads(to_json(tcfg)))
                self.wandb = wandb
            except Exception as exc:
                print_once(f"wandb unavailable ({exc}); logging to jsonl")

    def update(self, metrics: Dict[str, Any]) -> None:
        for k, v in metrics.items():
            self.cache[k].append(float(np.asarray(jax.device_get(v)).sum()
                                       if hasattr(v, "shape") else v))

    def flush(self, step: int, extra: Optional[Dict] = None) -> Dict:
        out: Dict[str, float] = {}
        weights = self.cache.pop("num_object_tracks", None)
        for k, vals in self.cache.items():
            if k in ("loss_mask", "loss_mask_ce", "loss_mask_dice",
                     "mask_iou_sum") and weights is not None:
                w = np.asarray(weights)
                tot = w.sum()
                out[k] = float(np.sum(np.asarray(vals))) / tot if tot > 0 else 0.0
            else:
                out[k] = float(np.mean(vals))
        if weights is not None:
            out["num_object_tracks"] = float(np.sum(weights))
        out = reduce_dict(out)
        out["step"] = step
        if extra:
            out.update(extra)
        self.cache.clear()
        if self.log_path and is_main_process():
            with open(self.log_path, "a") as fh:
                fh.write(json.dumps(out) + "\n")
        if self.wandb is not None:
            self.wandb.log(out, step=step)
        print_once(" | ".join(
            f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in out.items()))
        return out


def train_loop(state, step_fn, data_iter: Iterable, tcfg: TrainConfig,
               cfg_json: str, rng=None):
    """Generic loop: resume -> steps -> periodic checkpoint -> final flag."""
    rng = rng if rng is not None else jax.random.PRNGKey(tcfg.seed)
    cleanup_incomplete_checkpoints(tcfg.output_dir)
    resume = latest_checkpoint(tcfg.output_dir)
    if resume is not None:
        print_once(f"Resuming from {resume}")
        state = restore_checkpoint(resume, state)
    os.makedirs(tcfg.output_dir, exist_ok=True)
    logger = MetricLogger(osp.join(tcfg.output_dir, "train_log.jsonl"), tcfg)
    eta = ETAEstimator(tcfg.num_train_steps)

    start = int(jax.device_get(state.step))
    tracing = False
    for step in range(start, tcfg.num_train_steps):
        if tcfg.trace_dir and step == tcfg.profile_start:
            jax.profiler.start_trace(tcfg.trace_dir)
            tracing = True
        batch = next(data_iter)
        # per-step key by fold_in (not sequential splits): a resumed run
        # sees the same key at step k as the uninterrupted one, making
        # checkpoint-resume bitwise equivalent
        sub = jax.random.fold_in(rng, step)
        state, metrics = step_fn(state, batch, sub)
        if tracing and step + 1 >= tcfg.profile_start + tcfg.profile_steps:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
            tracing = False
        logger.update(metrics)
        if (step + 1) % tcfg.logging_steps == 0:
            logger.flush(step + 1, extra=eta.tick(step + 1))
        if (step + 1) % tcfg.save_steps == 0:
            save_checkpoint(tcfg.output_dir, step + 1, state, cfg_json,
                            tcfg.save_total_limit)
    save_checkpoint(tcfg.output_dir, tcfg.num_train_steps, state, cfg_json,
                    tcfg.save_total_limit)
    if is_main_process():
        with open(osp.join(tcfg.output_dir, COMPLETE_FLAG), "w") as fh:
            fh.write("complete")
    return state
