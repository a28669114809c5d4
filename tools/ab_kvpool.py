#!/usr/bin/env python3
"""A/B lowerings of the attention K/V depthwise-pool conv (dev tool).

The stage2 ablation (tools/bench_blocks.py) puts the grouped kv-pool convs at
4.6 ms of the 10.7 ms block — XLA lowers feature_group_count=C convs as dense
C×C matmuls, paying (N·hd)² where depthwise math needs N·hd². Variants, each
measured END-TO-END from the qkv tensor (B, L, 3, N, hd) to pooled+normed
(B, N, L', hd) so every relayout is included:

  A grouped    — the shipped path (transpose to heads-major, tile weights,
                 feature_group_count = N·hd)
  B headsbatch — fold heads into batch: (B·N, T, H, W, hd) then
                 feature_group_count = hd (dense cost hd², N× fewer FLOPs)
  C groupdiag  — feature_group_count = N with per-group diagonal-dense
                 (3,3,3,hd,hd) weights (dense cost N·hd², no relayout)

Shapes: stage2 (C=384, N=4), blk1-class (C=192, N=2, L=16384), blk14-class
(C=768, N=8). Usage: python tools/ab_kvpool.py [--batch 128] [--iters 20]
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
from jax import lax

from csts_tpu import ops
from csts_tpu.models import mvit

DIMSPEC = ("NDHWC", "DHWIO", "NDHWC")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    B, ITERS = args.batch, args.iters

    def timed(name, fn, *fargs):
        out = fn(*fargs)
        float(jnp.sum(out.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*fargs)
        float(jnp.sum(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:52s} {dt*1000:8.2f} ms", flush=True)
        return dt

    cases = [
        ("stage2 C=384 N=4 L=1024 s(1,2,2)", (4, 16, 16), 4, 96, (1, 2, 2)),
        ("blk1   C=192 N=2 L=16384 s(1,4,4)", (4, 64, 64), 2, 96, (1, 4, 4)),
        ("blk14  C=768 N=8 L=1024 s(1,2,2)", (4, 16, 16), 8, 96, (1, 2, 2)),
    ]

    for tag, thw, n, hd, stride in cases:
        t, h, w = thw
        l = t * h * w
        c = n * hd
        qkv = jax.jit(lambda l=l, c=c: jax.random.normal(
            jax.random.PRNGKey(0), (B, l, 3, c), jnp.bfloat16))()
        wdw = jax.jit(lambda hd=hd: jax.random.normal(
            jax.random.PRNGKey(1), (3, 3, 3, 1, hd), jnp.float32))()
        norm = {"scale": jnp.ones((hd,), jnp.float32), "bias": jnp.zeros((hd,), jnp.float32)}
        pad = (1, 1, 1)

        @jax.jit
        def variant_a(qkv, wdw, norm, thw=thw, n=n, hd=hd, stride=stride):
            b, l_, _, c_ = qkv.shape
            k = qkv[:, :, 1].reshape(b, l_, n, hd).transpose(0, 2, 1, 3)
            k, _ = mvit.pool_heads_conv(k, wdw, norm, thw, stride, pad)
            return k

        @jax.jit
        def variant_b(qkv, wdw, norm, thw=thw, n=n, hd=hd, stride=stride):
            b, l_, _, c_ = qkv.shape
            t_, h_, w_ = thw
            k = qkv[:, :, 1].reshape(b, l_, n, hd).transpose(0, 2, 1, 3)
            grid = k.reshape(b * n, t_, h_, w_, hd)
            pooled = lax.conv_general_dilated(
                grid, wdw.astype(grid.dtype), stride, [(p, p) for p in pad],
                dimension_numbers=DIMSPEC, feature_group_count=hd,
            )
            k2 = pooled.reshape(b, n, -1, hd)
            return ops.layer_norm(norm, k2, eps=1e-5)

        @jax.jit
        def variant_c(qkv, wdw, norm, thw=thw, n=n, hd=hd, stride=stride):
            b, l_, _, c_ = qkv.shape
            t_, h_, w_ = thw
            # heads-major channel grid, like A — but grouped by HEAD with a
            # diagonal-dense per-group weight (3,3,3,hd,C) so XLA pays N·hd²·27
            k = qkv[:, :, 1].reshape(b, l_, n, hd).transpose(0, 2, 1, 3)
            grid = k.transpose(0, 2, 1, 3).reshape(b, t_, h_, w_, n * hd)
            eye = jnp.eye(hd, dtype=wdw.dtype)  # (hd_in, hd_out) per group
            wg = (wdw[:, :, :, 0, :, None] * eye[None, None, None]).astype(grid.dtype)
            wg = jnp.tile(wg, (1, 1, 1, 1, n))  # (3,3,3,hd, n*hd)
            pooled = lax.conv_general_dilated(
                grid, wg, stride, [(p, p) for p in pad],
                dimension_numbers=DIMSPEC, feature_group_count=n,
            )
            b_, t2, h2, w2, _ = pooled.shape
            k2 = pooled.reshape(b_, t2 * h2 * w2, n, hd).transpose(0, 2, 1, 3)
            return ops.layer_norm(norm, k2, eps=1e-5)

        print(f"== {tag} ==", flush=True)
        ra = timed("A grouped (shipped)", variant_a, qkv, wdw, norm)
        rb = timed("B heads-in-batch", variant_b, qkv, wdw, norm)
        rc = timed("C group-diagonal-dense", variant_c, qkv, wdw, norm)
        # numerical agreement
        import numpy as np
        a = np.asarray(variant_a(qkv, wdw, norm), np.float32)
        bv = np.asarray(variant_b(qkv, wdw, norm), np.float32)
        cv = np.asarray(variant_c(qkv, wdw, norm), np.float32)
        print(f"   max|A-B|={np.abs(a-bv).max():.2e}  max|A-C|={np.abs(a-cv).max():.2e}",
              flush=True)


if __name__ == "__main__":
    main()
