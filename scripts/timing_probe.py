"""Decisive probe for the tunnel timing artifact (round 4).

Two rival explanations for physically impossible amortized timings
(0.2-0.3 ms/dispatch for a ~23 ms fused ViT layer):

  (a) jax.block_until_ready returns EARLY for these outputs on the axon
      tunnel -> the timed loop never awaited the work;
  (b) the relay returns cached/bogus results without executing.

Discriminators, all on one jitted fused-layer program at [128,584,1024]:

  1. dispatch N salted iters, time block_until_ready        (t_block)
  2. then float()-pull EVERY output, time that              (t_pull)
     - if t_pull >> t_block: barrier broken (a)
  3. check the pulled sums are pairwise DISTINCT: identical values for
     distinct salts = result reuse (b)
  4. single-dispatch latency with float() barrier, 3x       (t_one)
  5. re-dispatch the SAME salt values again with float() barrier
     (t_repeat) - much faster than t_pull/N = result cache across
     identical dispatches (b) even with a working barrier

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/timing_probe.py
"""

import time

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import VisionTowerConfig
from video_llava_seg_tpu.models import vit
from video_llava_seg_tpu.ops import vit_block

_NONCE = (time.time_ns() % 999983) * 1e-9


def main():
    cfg = VisionTowerConfig(name="clip-vit-large-336")
    layer = vit.init(jax.random.PRNGKey(0), cfg,
                     dtype=jnp.bfloat16)["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 584, 1024),
                          jnp.bfloat16)
    kw = dict(num_heads=cfg.num_heads, eps=1e-5, kv_len=577,
              act="quick_gelu")

    @jax.jit
    def run(p, x, salt):
        w = vit_block._flat_weights(p)
        return jnp.sum(vit_block._vit_layer_pallas(
            x + salt, w, interpret=False, **kw).astype(jnp.float32))

    # warmup/compile
    v = run(layer, x, jnp.bfloat16(_NONCE))
    print("warm value:", float(v), flush=True)

    n = 20
    salts = [jnp.bfloat16(_NONCE + 1e-3 * i) for i in range(1, n + 1)]
    t0 = time.time()
    outs = [run(layer, x, s) for s in salts]
    t_dispatch = time.time() - t0
    jax.block_until_ready(outs)
    t_block = time.time() - t0
    vals = [float(o) for o in outs]
    t_pull = time.time() - t0
    print(f"dispatch {n}: {t_dispatch*1e3:.1f} ms | +block_until_ready: "
          f"{t_block*1e3:.1f} ms | +float-pull-all: {t_pull*1e3:.1f} ms "
          f"({t_pull/n*1e3:.2f} ms/iter)", flush=True)
    uniq = len(set(vals))
    print(f"distinct values: {uniq}/{n} "
          f"(first 4: {[round(v, 1) for v in vals[:4]]})", flush=True)

    for k in range(3):
        s = jnp.bfloat16(_NONCE + 0.5 + 1e-3 * k)
        t0 = time.time()
        float(run(layer, x, s))
        print(f"single dispatch+pull: {(time.time()-t0)*1e3:.1f} ms",
              flush=True)

    # repeat the SAME salts: result-cache probe under a working barrier
    t0 = time.time()
    vals2 = [float(run(layer, x, s)) for s in salts]
    t_rep = time.time() - t0
    print(f"repeat same salts, per-iter pull: {t_rep*1e3:.1f} ms "
          f"({t_rep/n*1e3:.2f} ms/iter), values match: {vals2 == vals}",
          flush=True)


if __name__ == "__main__":
    main()
