"""W4A8 dense: packed-int4 weights, int8 activations, int8 MXU dots.

TPU-native realization of the reference's 4-bit serving mode (BitsAndBytes
``load_4bit`` gates, llava/model/builder.py:47-66): weights quantize to
symmetric per-output-channel int4 and PACK two values per byte, so decode
— which is weight-HBM-bound — reads half the bytes of the int8 path
(~4 GB for an 8B LLM vs ~8 GB int8 / ~16 GB bf16). Activations quantize
dynamically per row to int8 (same scheme as the W8A8 path), and the MXU
computes int8 x int8 -> int32: prefill keeps the int8 compute-rate win on
top of decode's bandwidth win.

Packing layout ("halves" scheme): byte row i of the packed [in/2, out]
tensor holds W[i] in its low nibble and W[i + in/2] in its high nibble.
Unpacking is then two sign-extends with NO interleave — the low-nibble
plane IS rows [0, in/2) and the high-nibble plane IS rows [in/2, in) — so
the kernel runs two contiguous [rows, in/2] @ [in/2, out] int8 dots and
adds the int32 accumulators.

Forward-only (inference): int4 round-to-nearest has no useful gradient.
Numerics vs bf16 are lossier than int8 — this is an OPT-IN serving mode,
mirroring the reference's load_4bit, with the delta reported by bench.

The fused kernel is the SINGLE-CHIP serving path. For TP-sharded serving
set USE_PALLAS_W4A8 = False: the XLA unpack fallback runs the identical
int32 math and GSPMD can partition it, while a pallas_call cannot be
auto-partitioned across a mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# single-chip fused kernel on TPU; False = XLA unpack path (same int32
# math bitwise — see tests/test_int4.py), needed for TP-sharded serving
USE_PALLAS_W4A8 = True


def pack_int4(q):
    """Pack int8 values in [-7, 7] (shape [in, out], in even) into int8
    bytes [in/2, out]: low nibble = q[i], high nibble = q[i + in/2]."""
    in_dim = q.shape[0]
    assert in_dim % 2 == 0, in_dim
    half = in_dim // 2
    q32 = q.astype(jnp.int32)
    lo = q32[:half] & 0xF
    hi = (q32[half:] & 0xF) << 4
    byte = lo | hi  # 0..255
    return jnp.where(byte >= 128, byte - 256, byte).astype(jnp.int8)


def unpack_int4(packed):
    """Inverse of pack_int4: int8 [in/2, out] -> (lo, hi) int8 planes,
    lo = rows [0, in/2), hi = rows [in/2, in)."""
    p32 = packed.astype(jnp.int32) & 0xFF  # byte value 0..255
    lo = p32 & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = (p32 >> 4) & 0xF
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _w4a8_kernel(xq_ref, asc_ref, wp_ref, wsc_ref, o_ref, *, half: int,
                 out_dtype):
    """One [tr, in] x [in/2, to] tile: in-VMEM nibble unpack + two
    contiguous int8 MXU dots accumulated in int32. Unpack is int32 shifts
    (sign extension by `<<` then arithmetic `>>`, bit-exact vs the
    mask/compare/select form — tests/test_int4.py); narrow-int shifts
    don't exist in Mosaic, int32 shifts do. The high nibble needs only
    ONE shift: p32 is the sign-extended byte, so the arithmetic `>> 4`
    is floor(byte/16) = the signed high nibble exactly (byte = 16*hi +
    lo_u with lo_u in [0,16)) — the unpack is a VPU pass over every
    packed weight byte, so each shaved op matters at decode."""
    p32 = wp_ref[...].astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(jnp.int8)
    hi = (p32 >> 4).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq_ref[:, :half], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc + jax.lax.dot_general(
        xq_ref[:, half:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * asc_ref[...]
                  * wsc_ref[0]).astype(out_dtype)


def _tile(n: int, cap: int, align: int) -> int:
    """Largest divisor of n that is <= cap and a multiple of `align`
    (falls back to n when nothing aligns — caller gates on divisibility)."""
    best = n
    for t in range(cap, align - 1, -1):
        if t % align == 0 and n % t == 0:
            best = t
            break
    return best


def w4a8_matmul(xq, a_scale, packed, w_scale, out_dtype,
                interpret: bool = False, to_cap: Optional[int] = None):
    """xq: int8 [rows, in]; a_scale: f32 [rows, 1]; packed: int8
    [in/2, out]; w_scale: f32 [out]. Returns [rows, out] out_dtype.

    to_cap: out-tile size cap (DMA granularity of the weight stream);
    default picks by regime from the round-5 on-chip sweep, overridable
    for ablation (scripts/w4a8_decode_probe.py --to_cap)."""
    rows, in_dim = xq.shape
    half, out = packed.shape
    assert half * 2 == in_dim, (half, in_dim)

    # pad rows to the tile size up front: a divisor-of-rows tile would
    # degenerate to 8 on awkward prefill lengths (5128 = 8 x 641 -> 16x
    # MXU row waste); +<=5% padded rows is far cheaper
    tr = 8 if rows <= 256 else 256
    rp = -(-rows // tr) * tr
    if rp != rows:
        xq = jnp.pad(xq, ((0, rp - rows), (0, 0)))
        a_scale = jnp.pad(a_scale, ((0, rp - rows), (0, 0)),
                          constant_values=1.0)
    if to_cap is None:
        # 1024 everywhere — settled by a full-program A/B, not the
        # isolated kernel sweep. The round-5 relay-cache-hardened
        # layer-aggregate sweep favors 512 in isolation (591 vs 570 GB/s
        # effective), but the REAL full-depth decode measures 7.32 ms/tok
        # at 1024 vs 7.62 at 512 (same session, full iters): inside the
        # whole program the weight stream shares HBM with KV-cache reads
        # and attention, and fewer/larger weight DMAs coexist better.
        # Isolated-kernel optima do not transfer (BENCH_NOTES r5).
        # VLS_W4A8_TO_CAP_DECODE: ablation override for the decode regime
        import os

        to_cap = (int(os.environ.get("VLS_W4A8_TO_CAP_DECODE", "1024"))
                  if tr == 8 else 1024)
    to = _tile(out, to_cap, 128)

    # grid order: out tiles OUTER, row tiles inner — the weight tile's
    # block index then only changes with the outer step, so the packed
    # weights stream from HBM exactly once (decode's entire cost); the
    # small int8 activation tile is what re-fetches per out tile
    fn = pl.pallas_call(
        functools.partial(_w4a8_kernel, half=half, out_dtype=out_dtype),
        grid=(out // to, rp // tr),
        in_specs=[
            pl.BlockSpec((tr, in_dim), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half, to), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, to), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, out), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )
    y = fn(xq, a_scale, packed, w_scale.reshape(1, -1).astype(jnp.float32))
    return y[:rows] if rp != rows else y


def _supported(in_dim: int, out: int) -> bool:
    return in_dim % 2 == 0 and out % 128 == 0


def w4a8_dense(p, x, interpret: bool = False):
    """nn.dense body for a 'kernel_q4a' param dict. x: [..., in]."""
    from video_llava_seg_tpu.ops.attention import _on_tpu
    from video_llava_seg_tpu.ops.quantization import (
        quantize_activations_rowwise,
    )

    packed = p["kernel_q4a"]
    half, out = packed.shape
    in_dim = half * 2
    lead = x.shape[:-1]
    xq, a_scale = quantize_activations_rowwise(x.reshape(-1, in_dim))

    if ((_on_tpu() and USE_PALLAS_W4A8) or interpret) \
            and _supported(in_dim, out):
        y = w4a8_matmul(xq, a_scale, packed, p["kernel_scale"], x.dtype,
                        interpret=interpret)
    else:
        lo, hi = unpack_int4(packed)
        acc = (jnp.dot(xq[:, :half], lo, preferred_element_type=jnp.int32)
               + jnp.dot(xq[:, half:], hi,
                         preferred_element_type=jnp.int32))
        y = (acc.astype(jnp.float32) * a_scale
             * p["kernel_scale"]).astype(x.dtype)
    y = y.reshape(*lead, out)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y
