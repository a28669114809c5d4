#!/usr/bin/env python3
"""In-process A/B of the fused-block kernel variants vs the XLA composite (dev tool).

Times, on the real TPU chip in ONE process (tunnel variance is ±5% across
processes), a stack of identical eligible blocks at each flagship stage shape:

  composite  — multiscale_block_apply with the mega-kernel gated OFF
               (fused attention + fused MLP tail still on: the production
               fallback path for that block)
  loop       — single-grid-step kernel, unrolled per-head loop (round-1 design)
  hg         — head-grid kernel: grid (batch, tile, head), accumulating scratch

Usage: python tools/ab_block.py [--batch 32] [--iters 20]
Run as a background task; never kill it (TPU claim wedges).
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

from csts_tpu.kernels import block as kb
from csts_tpu.models import mvit
from csts_tpu.models.mvit import AttentionSpec

# (name, dim, dim_out, heads, thw, stride_kv, reps) — per flagship stage
SHAPES = [
    ("stem b0   L=16384 h=1 d=96 ", 96, 96, 1, (4, 64, 64), (1, 8, 8), 1),
    ("stage1 b2 L=4096  h=2 d=192", 192, 192, 2, (4, 32, 32), (1, 4, 4), 1),
    ("stage2    L=1024  h=4 d=384", 384, 384, 4, (4, 16, 16), (1, 2, 2), 10),
    ("stage3 b15 L=256  h=8 d=768", 768, 768, 8, (4, 8, 8), (1, 1, 1), 2),
]


def timed(fn, args, iters, warmup=3):
    def sync(out):
        return float(jnp.sum(out[0, 0]))

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}  batch={args.batch} iters={args.iters}")
    key = jax.random.PRNGKey(0)

    for name, dim, dim_out, heads, thw, stride_kv, reps in SHAPES:
        spec = AttentionSpec(
            dim=dim, dim_out=dim_out, num_heads=heads,
            kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(), stride_kv=stride_kv,
            fused=True,
        )
        l = thw[0] * thw[1] * thw[2]
        params = mvit.multiscale_block_init(jax.random.PRNGKey(1), spec)
        params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

        @jax.jit
        def make_x(key, l=l, dim=dim):
            return jax.random.normal(key, (args.batch, l, dim), jnp.bfloat16)

        x = make_x(key)

        def fused_stack(variant):
            def fn(params, x):
                for _ in range(reps):
                    k, v = mvit._pooled_kv(params, spec, x, thw)
                    x = kb.fused_block(x, k, v, params, spec, variant=variant)
                return x
            return jax.jit(fn)

        def composite_stack():
            def fn(params, x):
                for _ in range(reps):
                    x, _ = mvit.multiscale_block_apply(params, spec, x, thw)
                return x
            # gate the mega-kernel off at trace time
            orig = kb.eligible
            kb.eligible = lambda *a: False
            try:
                jitted = jax.jit(fn)
                jitted(params, x)  # force trace+compile under the patch
            finally:
                kb.eligible = orig
            return jitted

        results = {}
        results["composite"] = timed(composite_stack(), (params, x), args.iters)
        results["loop"] = timed(fused_stack("loop"), (params, x), args.iters)
        results["hg"] = timed(fused_stack("hg"), (params, x), args.iters)
        results["bd"] = timed(fused_stack("bd"), (params, x), args.iters)

        base = results["composite"]
        line = "  ".join(
            f"{k}={v*1000:7.2f}ms ({base/v:4.2f}x)" for k, v in results.items()
        )
        print(f"{name} reps={reps:2d}: {line}", flush=True)


if __name__ == "__main__":
    main()
