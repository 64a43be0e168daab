"""Stress harness for the fused W8A8 ViT megakernel TPU-worker fault.

The fused int8 kernel (ops/vit_block.py::_vit_kernel_i8) intermittently
crashes the TPU worker at the CLIP-L serving shape [128, 584, 1024] —
~3/5 runs — while its structurally identical bf16 twin is stable
(BENCH_NOTES 'W8A8'). This script runs the full W8A8 tower forward N
times with the fused kernel FORCED ON so kernel variants can be A/B'd
for stability. Each run is a fresh dispatch with a different salt so
the executable can't be skipped.

Usage:  python scripts/i8_vit_stress.py [N_RUNS] [--semantics arbitrary]
Exit code 0 = all runs survived. A worker crash kills the process —
the caller counts survivals across invocations.
"""

import sys
import time

import jax
import jax.numpy as jnp

# process-unique salt base: the axon relay caches byte-identical
# (program, inputs) executions across processes; a cached dispatch skips
# execution entirely and would fake a "survival" (BENCH_NOTES "Relay
# result cache")
_NONCE = (time.time_ns() % 999983) * 1e-9

from video_llava_seg_tpu.config import VisionTowerConfig
from video_llava_seg_tpu.models import vit
from video_llava_seg_tpu.ops import vit_block
from video_llava_seg_tpu.ops.quantization import quantize_tree


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if "--semantics" in sys.argv:
        sem = sys.argv[sys.argv.index("--semantics") + 1]
        vit_block.FORCE_DIMENSION_SEMANTICS = sem  # type: ignore[attr-defined]
    vit_block.FUSED_I8_ON_TPU = True

    cfg = VisionTowerConfig(name="clip-vit-large-336")
    params = quantize_tree(
        vit.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
        bits=8, act_quant=True)

    @jax.jit
    def encode(params, video, salt):
        feats = vit.apply(params, cfg, video + salt)
        return jnp.sum(feats.astype(jnp.float32))

    video = jax.random.normal(
        jax.random.PRNGKey(1),
        (4, 32, cfg.image_size, cfg.image_size, 3), jnp.bfloat16)
    for i in range(n_runs):
        s = float(encode(params, video, jnp.bfloat16(_NONCE + i * 1e-3)))
        print(f"run {i}: ok (sum={s:.1f})", flush=True)
    print("ALL OK")


if __name__ == "__main__":
    main()
