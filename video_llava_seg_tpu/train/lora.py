"""LoRA adapters as a parallel parameter tree over dense kernels.

Capability parity with the reference's peft-based LoRA path
(llava/train/train.py:410-426: LoraConfig(r=64, alpha=16, dropout=0.05,
target = every LLM nn.Linear except lm_head and the multimodal modules,
found by find_all_linear_names at train.py:125-141) and the merge-at-load
in llava/model/builder.py (peft merge_and_unload)).

TPU-native design: no module wrappers.  LoRA params live in a parallel tree
mirroring the matched kernel paths, each leaf {"a": [in, r], "b": [r, out]}
(b zero-init so the adapter starts as identity).  A jitted `merge` produces
effective params = base + (alpha/r) * a @ b with the base stop-gradiented,
so one unchanged forward function serves both full fine-tune and LoRA —
grads flow only into the adapter leaves, and XLA fuses the rank-r update
into the parameter load.  `merge_into` bakes adapters into the base tree for
checkpoint export / inference (builder.py's merge_and_unload equivalent)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# LLM projections eligible for LoRA (reference targets every Linear in the
# LLM: q/k/v/o + gate/up/down, excluding lm_head — train.py:139-140 — and
# all multimodal modules — train.py:131). Names map to this framework's
# llama params: wq/wk/wv/wo = q/k/v/o_proj, w_gate/w_up/w_down = mlp.
_DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
_QV_ONLY_TARGETS = ("wq", "wv")


def target_names(qv_proj_only: bool = False) -> Tuple[str, ...]:
    """find_all_linear_names parity (train.py:125-141)."""
    return _QV_ONLY_TARGETS if qv_proj_only else _DEFAULT_TARGETS


# Quantized kernel leaves (ops/quantization.py, ops/int4.py). Adapters over
# a quantized base = the reference's QLoRA path (train.py:395-426:
# BitsAndBytes bits=4/8 + prepare_model_for_kbit_training + LoRA).
_QKEYS = ("kernel_q", "kernel_qa", "kernel_q4a")


def _kernel_dims(key: str, leaf) -> Tuple[int, int]:
    """(in_dim, out_dim) of a dense kernel leaf, packed formats included."""
    if key == "kernel_q4a":                  # nibble-packed [in/2, out]
        return 2 * leaf.shape[0], leaf.shape[1]
    return leaf.shape[0], leaf.shape[1]


def _walk(tree: Any, fn, path: Tuple[str, ...] = ()):  # dict/list recursion
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            r = _walk(v, fn, path + (str(k),))
            if r is not None:
                out[k] = r
        return out or None
    if isinstance(tree, (list, tuple)):
        out = [_walk(v, fn, path + (str(i),)) for i, v in enumerate(tree)]
        return list(out) if any(r is not None for r in out) else None
    return fn(path, tree)


def init_lora(rng, params: Dict, rank: int = 64,
              targets: Optional[Tuple[str, ...]] = None,
              subtree: str = "llm", dtype=jnp.float32) -> Dict:
    """Build the adapter tree for every matched `{target}/kernel` leaf under
    `subtree`. a ~ N(0, 1/rank) (peft kaiming-ish), b = 0 (identity start)."""
    targets = targets or _DEFAULT_TARGETS
    counter = [0]

    def make(path, leaf):
        if (len(path) < 3 or path[0] != subtree
                or path[-1] not in ("kernel",) + _QKEYS
                or path[-2] not in targets or leaf.ndim != 2):
            return None
        counter[0] += 1
        key = jax.random.fold_in(rng, counter[0])
        in_dim, out_dim = _kernel_dims(path[-1], leaf)
        a = (jax.random.normal(key, (in_dim, rank), dtype)
             / jnp.sqrt(jnp.asarray(rank, dtype)))
        return {"a": a, "b": jnp.zeros((rank, out_dim), dtype)}

    out = _walk(params, make)
    if out is None:
        raise ValueError(f"no LoRA targets matched under '{subtree}'")
    return out


def merge(params: Dict, lora_params: Optional[Dict], alpha: float = 16.0,
          rank: Optional[int] = None, stop_base_gradient: bool = True):
    """Effective params: base + (alpha/r) * a @ b on matched leaves.

    With stop_base_gradient (training), grads flow only to a/b; pass False
    only if co-training base and adapter."""
    if lora_params is None:
        return params

    def is_adapter(x):
        return isinstance(x, dict) and set(x) == {"a", "b"}

    def go(base, lora):
        if lora is None:
            return base
        if is_adapter(lora):
            kernel = base  # adapter sits AT the kernel leaf
            if stop_base_gradient:
                kernel = jax.lax.stop_gradient(kernel)
            r = rank if rank is not None else lora["a"].shape[1]
            delta = (lora["a"] @ lora["b"]) * (alpha / r)
            return kernel + delta.astype(kernel.dtype)
        if isinstance(base, dict):
            qkeys = [k for k in _QKEYS
                     if k in base and isinstance(lora, dict)
                     and is_adapter(lora.get(k))]
            if qkeys:
                # quantized base (QLoRA): the int8/packed kernel cannot
                # absorb the delta — attach the adapter to the param dict;
                # ops/nn.py::dense adds ((x@a)@b)*s as a side branch so no
                # bf16 copy of the base weights ever materializes
                (k,) = qkeys
                ad = lora[k]
                r = rank if rank is not None else ad["a"].shape[1]
                out = dict(base)
                if stop_base_gradient:
                    out["kernel_scale"] = jax.lax.stop_gradient(
                        out["kernel_scale"])
                out["lora"] = {"a": ad["a"], "b": ad["b"],
                               "s": jnp.asarray(alpha / r, jnp.float32)}
                return out
            return {k: (go(v, lora.get(k)) if isinstance(lora, dict) else v)
                    for k, v in base.items()}
        if isinstance(base, (list, tuple)):
            return [go(v, lora[i] if lora is not None and lora[i] is not None
                       else None)
                    for i, v in enumerate(base)]
        return base

    return go(params, lora_params)


def merge_into(params: Dict, lora_params: Optional[Dict],
               alpha: float = 16.0) -> Dict:
    """Permanently bake adapters into the base tree (merge_and_unload
    equivalent, for checkpoint export and inference).

    Quantized base kernels (QLoRA) cannot absorb the delta into int8;
    those adapters are attached to the param dict instead ({"lora": ...}),
    which ops/nn.py::dense applies — the exported tree is self-contained
    either way."""
    return merge(params, lora_params, alpha, stop_base_gradient=False)
