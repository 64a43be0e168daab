"""W4A8 decode-dense microbench: effective HBM bandwidth per serving shape.

Decode is weight-HBM-bound (BENCH_NOTES "fused QKV/gate-up serving layout"),
so each dense's figure of merit is packed-bytes / kernel-time vs the ~819
GB/s v5e spec. Timers follow the hardened discipline: process-unique nonce
salts (relay result cache) and a value-pull barrier on the last output
(block_until_ready lies over the tunnel). Run solo on the idle chip.

Usage: python scripts/w4a8_decode_probe.py [--iters 50] [--to_cap 1024]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.ops import int4

_NONCE = int(time.time_ns() % 999983)

# Llama-3-8B fused serving shapes at batch 1 (rows=8 after pad):
# wqkv 4096->6144, wo 4096->4096, w_gateup 4096->28672, w_down 14336->4096
SHAPES = [
    ("wqkv", 4096, 6144),
    ("wo", 4096, 4096),
    ("w_gateup", 4096, 28672),
    ("w_down", 14336, 4096),
]


def probe(name, in_dim, out, iters, rows=8, to_cap=1024):
    """Per-call time via in-graph repetition: one dispatch scans the dense
    over `iters` distinct activation slices, so tunnel RTT and dispatch
    overhead amortize inside the program; a two-point (iters, 2*iters)
    subtraction cancels what remains. Weights live in HBM and re-stream
    every scan step — exactly decode's access pattern."""
    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.integers(-120, 120, (in_dim // 2, out), np.int8))
    w_scale = jnp.asarray(rng.random(out, np.float32) * 0.01)
    a_scale = jnp.asarray(rng.random((rows, 1), np.float32) * 0.01 + 0.01)
    # nonce-salted distinct activations per scan step (relay cache)
    xs = jnp.asarray(
        (rng.integers(-127, 127, (2 * iters, rows, in_dim)) + _NONCE)
        .astype(np.int8))

    def run(n):
        def body(carry, xq):
            y = int4.w4a8_matmul(xq, a_scale, packed, w_scale, jnp.bfloat16,
                                 to_cap=to_cap)
            return carry + y[0, 0].astype(jnp.float32), None

        fn = jax.jit(lambda xs_n: jax.lax.scan(
            body, jnp.float32(0), xs_n)[0])
        sliced = xs[:n]
        float(fn(sliced))  # compile + warmup (value pull)
        t0 = time.time()
        v = fn(sliced)
        float(v)  # value pull = barrier
        return time.time() - t0

    t1, t2 = run(iters), run(2 * iters)
    dt = (t2 - t1) / iters
    gbytes = packed.size / 1e9
    print(f"{name:10s} [{in_dim:6d}->{out:6d}] {dt * 1e6:8.1f} us/call  "
          f"{gbytes / dt:7.1f} GB/s  ({gbytes * 1e3:6.1f} MB packed)")
    return dt, gbytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--to_cap", type=int, default=1024,
                    help="w4a8_matmul out-tile cap (weight-stream DMA "
                         "granularity) to ablate")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}  nonce={_NONCE}  to_cap={args.to_cap}")
    tot_t, tot_b = 0.0, 0.0
    for name, in_dim, out in SHAPES:
        dt, gb = probe(name, in_dim, out, args.iters, rows=args.rows,
                       to_cap=args.to_cap)
        tot_t += dt
        tot_b += gb
    # per-layer aggregate -> implied 32-layer decode weight-stream time
    print(f"layer aggregate: {tot_t * 1e3:.3f} ms  {tot_b / tot_t:.1f} GB/s "
          f"-> 32L weight stream {tot_t * 32 * 1e3:.2f} ms/tok")


if __name__ == "__main__":
    main()
