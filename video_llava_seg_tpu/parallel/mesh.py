"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DeepSpeed distribution
(llava/distributed_utils.py, scripts/deepspeed_configs/zero2.json): one
`jax.sharding.Mesh` with ('data','model') axes; DP/FSDP rides the data axis,
tensor parallelism rides the model axis over ICI, and XLA inserts collectives
from sharding annotations.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_llava_seg_tpu.config import MeshConfig


def create_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a ('data','model') mesh over the available devices.

    data_parallel=-1 consumes all devices not claimed by model_parallel.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    if n % mp != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"data_parallel({dp}) * model_parallel({mp}) != {n}")
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def with_sharding(x, mesh: Mesh, *spec):
    """Annotate an in-graph value with a named sharding constraint."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def maybe_constrain_grad(x, *spec):
    """Like maybe_constrain, but ALSO pins the cotangent's sharding on the
    backward pass. A plain with_sharding_constraint only fixes the primal;
    SPMD can still pick a hostile sharding for the cotangent of an adjacent
    reshape and fall back to an involuntary full rematerialization
    (spmd_partitioner.cc warning seen in the 4x2 train-step dryrun on the
    seg-head reshape's transpose(jvp))."""
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def f(y, s):
        return maybe_constrain(y, *s)

    def f_fwd(y, s):
        return maybe_constrain(y, *s), None

    def f_bwd(s, _, g):
        return (maybe_constrain(g, *s),)

    f.defvjp(f_fwd, f_bwd)
    return f(x, spec)


def maybe_constrain(x, *spec):
    """Sharding constraint against the AMBIENT mesh (the `with mesh:`
    context), or a no-op when tracing without one (single-chip jit, CPU
    tests). Lets model code annotate activations without threading the mesh
    through every call."""
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
        if m.empty or not all(s is None or s in m.axis_names
                              for s in spec):
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(m, P(*spec)))
    except Exception:
        return x


# ---------------------------------------------------------------------------
# Parameter partitioning rules
# ---------------------------------------------------------------------------

def _partition_spec_for(path: str, shape: Sequence[int], mesh: Mesh,
                        fsdp: bool) -> P:
    """Heuristic TP/FSDP spec from a parameter's path and shape.

    Tensor-parallel rules (megatron-style) for the LLM:
      - attention qkv / mlp up+gate:   shard output dim over 'model'
      - attention out / mlp down:      shard input dim over 'model'
      - embeddings / lm_head:          shard vocab dim over 'model'
    Everything else is replicated over 'model'. With fsdp=True the largest
    remaining dim additionally shards over 'data' (ZeRO-3 equivalent).
    """
    model_ax = mesh.axis_names[-1]
    data_ax = mesh.axis_names[0]
    mp = mesh.shape[model_ax]
    ndim = len(shape)
    spec: list = [None] * ndim

    def divisible(dim_idx: int, size: int) -> bool:
        return 0 <= dim_idx < ndim and shape[dim_idx] % size == 0

    if mp > 1 and ndim >= 2:
        parts = path.split("/")
        col_markers = ("wq", "wk", "wv", "w_gate", "w_up", "q_proj", "k_proj",
                       "v_proj", "gate_proj", "up_proj")
        row_markers = ("wo", "w_down", "o_proj", "down_proj")
        # exact component match: "patch_embedding" must NOT hit the vocab
        # rule (sharding a conv kernel's height over 'model' gave SPMD an
        # involuntary full remat on its weight grad in the 4x2 dryrun)
        vocab_markers = ("embed_tokens", "lm_head", "embedding")
        if any(m in path for m in col_markers) and divisible(ndim - 1, mp):
            spec[ndim - 1] = model_ax
        elif any(m in path for m in row_markers) and divisible(ndim - 2, mp):
            spec[ndim - 2] = model_ax
        elif (ndim == 2 and any(m in parts for m in vocab_markers)
                and divisible(0, mp)):
            spec[0] = model_ax

    if fsdp:
        dp = mesh.shape[data_ax]
        size = 1
        for s in shape:
            size *= s
        # Conv kernels and other small >2-D tensors stay replicated: their
        # ZeRO saving is negligible, and sharding them makes the conv
        # weight-grad's cotangent reshard pathological (SPMD involuntary
        # full remat on the patch-embed wgrad, seen in the 4x2 dryrun).
        if dp > 1 and (ndim <= 2 or size >= (1 << 22)):
            # shard the largest still-unsharded dim over data
            order = sorted(range(ndim), key=lambda i: -shape[i])
            for i in order:
                if spec[i] is None and shape[i] % dp == 0 and shape[i] >= dp:
                    spec[i] = data_ax
                    break
    return P(*spec)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """PyTree of NamedShardings matching `params` (for pjit in/out shardings)."""
    def f(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        spec = _partition_spec_for(_path_str(path), leaf.shape, mesh, fsdp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """Place a host param pytree onto the mesh with TP/FSDP shardings."""
    shardings = param_shardings(params, mesh, fsdp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
