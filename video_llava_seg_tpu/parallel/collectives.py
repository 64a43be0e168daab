"""Multi-host helpers — the TPU equivalents of llava/distributed_utils.py.

rank gating        -> jax.process_index() == 0
barrier            -> multihost sync via a tiny psum (or no-op single-host)
pickle all_gather  -> multihost_utils.process_allgather
reduce_dict/reduce -> jnp psum across the mesh inside jitted code, or
                      host-side process_allgather + mean outside it
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def print_once(*args, **kwargs) -> None:
    """Print on the main process only (distributed_utils.py:56-58 parity)."""
    if is_main_process():
        print(*args, **kwargs)


def synchronize() -> None:
    """Cross-host barrier (distributed_utils.py:61-73 parity)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("vls_sync")


def all_gather_objects(obj):
    """Gather an arbitrary picklable object from every host (76-116 parity)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))


def reduce_dict(d: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Mean/sum a dict of scalars across hosts (119-145 parity).

    Host-side utility for logging; inside jit use jax.lax.psum instead.
    """
    if jax.process_count() == 1:
        return dict(d)
    keys = sorted(d.keys())
    vec = np.asarray([float(d[k]) for k in keys], dtype=np.float64)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(vec, tiled=False)
    total = np.sum(np.asarray(gathered), axis=0)
    if average:
        total = total / jax.process_count()
    return {k: float(v) for k, v in zip(keys, total)}


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> bool:
    """Multi-host bring-up — the torchrun/c10d-rendezvous equivalent
    (scripts/train/llama3/stage3_with_seg.sh:18-22 `--rdzv_backend c10d`).

    On TPU pods jax.distributed.initialize() autodetects everything from
    the environment; explicit args cover DCN/manual setups. Returns True
    if a multi-process runtime was initialized (False for single-process,
    including when already initialized)."""
    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            jax.distributed.initialize()
        return jax.process_count() > 1
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        return False
