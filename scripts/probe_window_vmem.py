"""Calibrate the fused-window-attention VMEM estimator against Mosaic.

AOT-compiles the kernel (no execution) for the Hiera block shapes that
sit near the 16 MiB scoped-vmem limit and prints, per (shape, tile),
whether Mosaic accepts it plus what `_vmem_estimate` predicts. Run on
the real chip (compiles go through the tunnel's TpuAotCompiler, which
enforces the same scoped-vmem limit as execution).

Usage: python scripts/probe_window_vmem.py
"""

import sys

sys.path.insert(0, "/root/repo")

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.ops.window_attention import (
    _vmem_estimate,
    _wa,
)

# (name, H, W, C, heads, ws, ps, [(r, cw) tiles to probe])
CASES = [
    ("hieraT-s3 ws14 c384 h4", 70, 70, 384, 4, 14, 1, [(1, 5)]),
    ("hieraBp-s3 ws14 c448 h8", 70, 70, 448, 8, 14, 1, [(1, 5)]),
    ("hieraL-s4tr ws8 ps2 c1152 h16", 64, 64, 1152, 16, 8, 2,
     [(1, 8), (1, 4), (1, 2)]),
    ("hieraL-s3 ws16 c576 h8", 64, 64, 576, 8, 16, 1,
     [(1, 4), (1, 2), (1, 1)]),
    ("hieraL-s2tr ws4 ps2 c576 h8 128px", 128, 128, 576, 8, 4, 2,
     [(1, 32), (2, 16), (4, 8)]),
    ("hieraT-s4 ws?? global fallback n/a", 0, 0, 0, 0, 0, 0, []),
]


def probe(h, w, c, heads, ws, ps, r, cw):
    hd = c // heads
    qkv = jax.ShapeDtypeStruct((1, h, w, 3 * c), jnp.bfloat16)
    static = (heads, ws, 1.0 / hd ** 0.5, ps, r, cw, False)
    try:
        jax.jit(lambda t: _wa(static, t)).lower(qkv).compile()
        return "OK"
    except Exception as e:  # noqa: BLE001 — report any compile failure
        msg = str(e)
        if "vmem" in msg.lower():
            for tok in msg.split():
                if tok.endswith("M") and tok[0].isdigit():
                    return f"VMEM-OOM {tok}"
            return "VMEM-OOM"
        return f"FAIL {type(e).__name__}: {msg[:120]}"


def main():
    print("devices:", jax.devices())
    for name, h, w, c, heads, ws, ps, tiles in CASES:
        for r, cw in tiles:
            est = _vmem_estimate(r, cw, ws=ws, c3=3 * c, c=c, heads=heads,
                                 hd=c // heads, ps=ps, itemsize=2)
            res = probe(h, w, c, heads, ws, ps, r, cw)
            print(f"{name:36s} r={r} cw={cw:2d} "
                  f"est={est / 2**20:6.2f}MiB -> {res}", flush=True)


if __name__ == "__main__":
    main()
