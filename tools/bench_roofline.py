#!/usr/bin/env python3
"""Practical roofline envelope of this chip through the relay (dev tool).

The per-block numbers (tools/bench_blocks.py) sit ~4-10x off the v5e paper
roofline (197 TFLOP/s bf16, ~800 GB/s HBM). Before writing more kernels, this
measures what raw XLA actually achieves HERE for the primitive shapes the model
is built from — big square matmuls (absolute ceiling), the model's actual matmul
shapes, an elementwise stream (bandwidth ceiling), LayerNorm chains, the grouped
kv-pool conv, and the head-split relayout. Numbers print as achieved TFLOP/s or
GB/s next to time.

ACCOUNTING FIX (round 4): the original harness consumed outputs with
``jnp.sum(fn(x))`` inside the jit, which let XLA fuse elementwise probes into
the reduction — the "copy"/"stream"/"transpose" outputs never materialized to
HBM while ``bytes_`` still credited read+write. That inflated every XLA
streaming row ~2x (the recorded 872-884 GB/s "XLA stream" is really ~436-457
honest; tools/probe_dma.py measured xla-copy-honest 456.9 on the same chip)
and made the head-split row meaningless (sum is permutation-invariant, the
transpose folded away). Pallas rows were always honest (a custom-call's output
materializes). The harness now wraps fn's output in lax.optimization_barrier
before the sum so EVERY probe pays its write; expect XLA streaming rows ~2x
lower and Pallas/matmul rows unchanged vs pre-round-4 records. Honest gap:
Pallas streams ~270 vs XLA ~457 GB/s (1.7x, the DMA-engine vs XLA-stream
paths — see probe_dma.py's verdict), not the 3.7x previously recorded.

Usage: python tools/bench_roofline.py [--iters 10] [--reps 8]
Run on the TPU host to natural exit; never kill (TPU claim wedges).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csts_tpu.utils import compcache

compcache.enable()  # persist remote AOT compiles across tool runs (CSTS_COMPCACHE=0 to opt out)

import jax
import jax.numpy as jnp

from csts_tpu import ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--only-pallas", action="store_true",
                    help="skip the XLA-primitive probes (already measured)")
    args = ap.parse_args()
    ITERS, REPS = args.iters, args.reps

    def bench(name, fn, x0, rest=(), flops=0, bytes_=0):
        """x0 replicated into REPS distinct inputs inside one jit (defeats CSE)."""
        key = jax.random.PRNGKey(42)
        noise = jax.random.normal(key, (REPS,) + x0.shape, x0.dtype)
        xs = x0[None] + noise

        def looped(xs, *rest):
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                # barrier: force fn's output to materialize (round-4 fix —
                # without it XLA fuses elementwise probes into the sum and
                # the advertised write bytes never happen)
                y = jax.lax.optimization_barrier(fn(xs[i], *rest))
                acc = acc + jnp.sum(y).astype(jnp.float32)
            return acc

        jitted = jax.jit(looped)
        for _ in range(2):
            float(jitted(xs, *rest))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jitted(xs, *rest)
        float(out)
        dt = (time.perf_counter() - t0) / (ITERS * REPS)
        extra = ""
        if flops:
            extra += f"  {flops / dt / 1e12:7.1f} TFLOP/s"
        if bytes_:
            extra += f"  {bytes_ / dt / 1e9:7.1f} GB/s"
        print(f"{name:44s} {dt*1000:8.3f} ms{extra}", flush=True)

    def rnd(shape, dtype=jnp.bfloat16, seed=0):
        return jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(seed), shape, dtype)
        )()

    if args.only_pallas:
        run_pallas_probes(bench, rnd)
        return

    # ---- absolute matmul ceiling (big square, bf16)
    for n in (4096, 8192):
        a = rnd((n, n))
        b = rnd((n, n), seed=1)
        bench(f"matmul {n}x{n}x{n} bf16", lambda x, b: jnp.dot(x, b), a, (b,),
              flops=2 * n**3, bytes_=3 * n * n * 2)

    # ---- the model's matmul shapes (batch 128)
    B = 128
    for (m, k, n, tag) in (
        (B * 1024, 384, 1152, "stage2 qkv"),
        (B * 1024, 384, 1536, "stage2 fc1"),
        (B * 1024, 1536, 384, "stage2 fc2"),
        (B * 16384, 96, 288, "stem qkv"),
        (B * 256, 768, 2304, "stage3+ qkv"),
    ):
        a = rnd((m, k))
        w = rnd((k, n), seed=1)
        bench(f"matmul {tag} ({m}x{k}x{n})", lambda x, w: jnp.dot(x, w), a, (w,),
              flops=2 * m * k * n, bytes_=(m * k + k * n + m * n) * 2)

    # ---- bandwidth ceiling: elementwise stream over ~400 MB
    x = rnd((B, 16384, 96))
    bench("elementwise x*1.0001+0.5 (400 MB)", lambda x: x * 1.0001 + 0.5, x,
          bytes_=2 * x.size * 2)

    # ---- LayerNorm over the stage2 activation
    x2 = rnd((B, 1024, 384))
    ln = {"scale": rnd((384,), jnp.float32), "bias": rnd((384,), jnp.float32, 1)}
    bench("layer_norm (128,1024,384)", lambda x, p: ops.layer_norm(p, x), x2, (ln,),
          bytes_=2 * x2.size * 2)

    # ---- LN + matmul fused (what ln1+qkv should cost)
    w = rnd((384, 1152), seed=2)
    bench("LN + qkv matmul fused", lambda x, p, w: jnp.dot(ops.layer_norm(p, x), w),
          x2, (ln, w), flops=2 * B * 1024 * 384 * 1152,
          bytes_=(x2.size + 384 * 1152 + B * 1024 * 1152) * 2)

    # ---- grouped kv-pool conv (stage2 shape): C=384, stride (1,2,2), k 3x3x3
    grid = rnd((B, 4, 16, 16, 384))
    wdw = rnd((3, 3, 3, 1, 384), jnp.float32, 3)
    bench("depthwise kv-pool conv C=384 s(1,2,2)",
          lambda g, w: ops.depthwise_conv3d(w, g, (1, 2, 2), (1, 1, 1)), grid, (wdw,),
          flops=2 * B * 4 * 8 * 8 * 384 * 384 * 27,  # what the dense lowering pays
          bytes_=(grid.size + B * 4 * 8 * 8 * 384) * 2)

    # ---- head-split relayout (B, L, C) -> (B, N, L, hd)
    bench("head split+transpose (4 heads)",
          lambda x: x.reshape(B, 1024, 4, 96).transpose(0, 2, 1, 3) * 1.0001,
          x2, bytes_=2 * x2.size * 2)

    # ---- fp32 softmax over (B, 4, 1024, 256) logits (attention probs shape)
    logits = rnd((B, 4, 1024, 256), jnp.float32)
    bench("softmax fp32 (128,4,1024,256)", lambda l: jax.nn.softmax(l, axis=-1),
          logits, bytes_=2 * logits.size * 4)

    run_pallas_probes(bench, rnd)


def run_pallas_probes(bench, rnd):
    """Mosaic streaming ceiling: trivial pallas copy at decoder-kernel-like
    block shapes. If THIS runs at ~60 GB/s, the fused kernels' floor is the
    pipeline itself, not their compute; if it streams near HBM peak, the
    decoder kernel's structure (views/revisited outputs) is the problem.
    Uses batch 32 so reps fit HBM (the batch-128 run OOM'd at 16 GB)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp = 32

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * jnp.bfloat16(1.0001)

    for tile, c in ((512, 384), (2048, 384), (512, 128)):
        buf = rnd((Bp, 16384, c))

        def pallas_copy(x, tile=tile, c=c):
            b, l, _ = x.shape
            return pl.pallas_call(
                copy_kernel,
                grid=(b, l // tile),
                in_specs=[pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
            )(x)

        bench(f"pallas copy tile={tile} c={c} ({Bp}x16384)", pallas_copy, buf,
              bytes_=2 * buf.size * 2)
        del buf

    buf = rnd((Bp, 16384, 384))
    # same stream through plain XLA for reference
    bench(f"XLA copy ({Bp},16384,384)", lambda x: x * jnp.bfloat16(1.0001),
          buf, bytes_=2 * Bp * 16384 * 384 * 2)

    # pallas copy with a 3-grid (batch, tile, revisit) axis like the decoder's
    # head axis — measures the cost of revisited output blocks
    def copy_rv_kernel(x_ref, o_ref):
        h = pl.program_id(2)

        @pl.when(h == 3)
        def _():
            o_ref[:] = x_ref[:] * jnp.bfloat16(1.0001)

    def pallas_copy_revisit(x):
        b, l, c = x.shape
        return pl.pallas_call(
            copy_rv_kernel,
            grid=(b, l // 512, 4),
            in_specs=[pl.BlockSpec((1, 512, c), lambda i, j, h: (i, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 512, c), lambda i, j, h: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        )(x)

    bench("pallas copy + 4x revisit axis", pallas_copy_revisit, buf,
          bytes_=2 * Bp * 16384 * 384 * 2)


if __name__ == "__main__":
    main()
