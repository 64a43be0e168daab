"""In-context speed sweep for the fused W8A8 ViT megakernel.

BENCH_NOTES "fused i8 ViT kernel retried SOLO": the kernel ran ~30x
slower than its structurally identical bf16 twin at [128, 584, 1024],
with the row-chunked in-kernel quant as the suspected culprit. This
sweeps the per-chunk f32 budget (rows per quant tile) and A/Bs kernel
variants IN-JIT (eager tunnel timings are garbage — BENCH_NOTES
"Microbench caveat"):

  python scripts/i8_vit_speed.py              # bf16 vs i8 at budgets

Each timing: one jitted layer, 10 async dispatches, one sync.
"""

import sys
import time

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.config import VisionTowerConfig
from video_llava_seg_tpu.models import vit
from video_llava_seg_tpu.ops import vit_block
from video_llava_seg_tpu.ops.quantization import quantize_tree


# process-unique salt base (defense in depth against any result reuse)
_NONCE = (time.time_ns() % 999983) * 1e-9


def time_layer(fn, params, x, iters=40):
    # float() pulls are the ONLY trustworthy barrier on this tunnel:
    # jax.block_until_ready intermittently returns EARLY (measured 9 ms
    # for 40 dispatches of a 23.6 ms kernel — a fake 8 PF/s; BENCH_NOTES
    # "Tunnel barrier"). Pull the LAST output's value: the device queue
    # is in-order, so its arrival implies every prior dispatch finished.
    float(fn(params, x, jnp.bfloat16(_NONCE)))   # warm + real sync
    t0 = time.time()
    outs = [fn(params, x, jnp.bfloat16(_NONCE + 1e-3 * i))
            for i in range(1, iters + 1)]
    float(outs[-1])
    return (time.time() - t0) / iters * 1e3


def main():
    cfg = VisionTowerConfig(name="clip-vit-large-336")
    layer_fp = vit.init(jax.random.PRNGKey(0), cfg,
                        dtype=jnp.bfloat16)["layers"][0]
    layer_i8 = quantize_tree(layer_fp, bits=8, act_quant=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 584, 1024),
                          jnp.bfloat16)
    kw = dict(num_heads=cfg.num_heads, eps=1e-5, kv_len=577,
              act="quick_gelu")

    @jax.jit
    def run_fp(p, x, salt):
        w = vit_block._flat_weights(p)
        return jnp.sum(vit_block._vit_layer_pallas(
            x + salt, w, interpret=False, **kw).astype(jnp.float32))

    ms = time_layer(run_fp, layer_fp, x)
    print(f"bf16 megakernel: {ms:.2f} ms/layer", flush=True)

    for budget_mb in [float(a) for a in sys.argv[1:]] or [2, 0.25, 8, 32]:
        vit_block.I8_ROW_BUDGET = int(budget_mb * (1 << 20))

        @jax.jit
        def run_i8(p, x, salt):
            w = vit_block._flat_weights_i8(p)
            return jnp.sum(vit_block._vit_layer_pallas_i8(
                x + salt, w, interpret=False, **kw).astype(jnp.float32))

        try:
            ms = time_layer(run_i8, layer_i8, x)
            print(f"i8 megakernel budget={budget_mb} MiB: {ms:.2f} ms/layer",
                  flush=True)
        except Exception as e:
            print(f"i8 budget={budget_mb}: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            break


if __name__ == "__main__":
    main()
