"""W4A8 decode-dense microbench: effective HBM bandwidth per serving shape.

Decode is weight-HBM-bound (BENCH_NOTES "fused QKV/gate-up serving layout"),
so the figure of merit is packed-bytes / kernel-time vs the ~819 GB/s v5e
spec. Measures the four Llama-3-8B serving denses CHAINED as one decode
layer per scan step (the decision variable for the tile cap is the layer
aggregate; per-dense two-point readings at 30-350 us/call sit below this
tunnel's run-to-run variance and came back unphysical — BENCH_NOTES r5).

Timer discipline:
- in-graph lax.scan repetition (tunnel RTT + dispatch cost amortize);
- two-point (t(2n) - t(n)) / n cancels the residual constant;
- the timed call of each length takes a DIFFERENT salt input than its
  warmup call: the relay caches byte-identical executions and would
  otherwise return the timed rerun from cache in one RTT.

Usage: python scripts/w4a8_decode_probe.py [--iters 1500] [--rows 8]
       [--to_cap 1024]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--to_cap", type=int, default=1024,
                    help="w4a8_matmul out-tile cap (weight-stream DMA "
                         "granularity) to ablate")
    args = ap.parse_args()
    rows = args.rows

    print(f"devices: {jax.devices()}  nonce={_NONCE}  to_cap={args.to_cap}",
          flush=True)
    rng = np.random.default_rng(_NONCE % (2**32))
    weights = []
    gbytes = 0.0
    for name, in_dim, out in SHAPES:
        packed = jnp.asarray(
            rng.integers(-120, 120, (in_dim // 2, out), np.int8))
        w_scale = jnp.asarray(rng.random(out, np.float32) * 0.01)
        weights.append((in_dim, out, packed, w_scale))
        gbytes += packed.size / 1e9
    a_scale = jnp.asarray(rng.random((rows, 1), np.float32) * 0.01 + 0.01)
    # small activation pools, indexed modulo per step (intra-call byte
    # reuse is fine — the relay cache keys on the CALL's full input set,
    # and the per-call salt differs)
    pools = {in_dim: jnp.asarray(rng.integers(
        -127, 127, (64, rows, in_dim)).astype(np.int8))
        for in_dim in {s[1] for s in SHAPES}}

    def layer_step(salt, i):
        tot = jnp.float32(0)
        for in_dim, out, packed, w_scale in weights:
            xq = pools[in_dim][i % 64]
            y = int4.w4a8_matmul(xq, a_scale * (1.0 + salt * 1e-9), packed,
                                 w_scale, jnp.bfloat16, to_cap=args.to_cap)
            tot = tot + y[0, 0].astype(jnp.float32)
        return tot

    def run(n, salt):
        def body(c, i):
            return c + layer_step(c * 1e-20 + salt, i), None

        fn = jax.jit(lambda s0: jax.lax.scan(
            body, s0, jnp.arange(n))[0])
        float(fn(jnp.float32(salt)))            # compile + warmup
        t0 = time.time()
        v = fn(jnp.float32(salt + 0.5))         # fresh bytes: no cache
        float(v)                                # value pull = barrier
        return time.time() - t0

    n = args.iters
    t1, t2 = run(n, _NONCE * 1e-9), run(2 * n, _NONCE * 1e-9 + 7.0)
    dt = (t2 - t1) / n
    print(f"layer aggregate: {dt * 1e3:.3f} ms/step  "
          f"{gbytes / dt:7.1f} GB/s effective  "
          f"({gbytes * 1e3:.1f} MB packed/layer)  "
          f"-> 32L weight stream {dt * 32 * 1e3:.2f} ms/tok  "
          f"[t({n})={t1:.3f}s t({2*n})={t2:.3f}s]")


if __name__ == "__main__":
    main()
