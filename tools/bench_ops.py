#!/usr/bin/env python3
"""Micro-bench of the flagship's primitive ops on the real TPU (dev tool).

Each op is applied REPS times inside one jitted program on slightly perturbed
inputs (defeats CSE) with a jnp.sum reduce per application; the program is then
dispatched ITERS times with one scalar-readback fence — per-op time =
total / (ITERS · REPS). Relay noise is ~3 ms/call, so only the in-jit repetition
makes sub-5 ms ops measurable.

Shapes are the flagship 256² CSTS forward at batch 8 (so numbers compare with
the round-1 section budget: stem 5.7 / stage2 28 / audio 31.5 / decoder 34.5 ms).

Usage: python tools/bench_ops.py [--batch 8] [--iters 20] [--reps 10]
Run to natural exit; never kill (TPU claim wedges).
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
from csts_tpu.models import mvit


def bench(name, fn, args, iters, reps, warmup=2):
    """args[0] is replicated into `reps` DISTINCT random-ish inputs (leading axis)
    so XLA cannot CSE the repetitions — a scalar-multiply perturbation is NOT
    enough (it commutes through linear ops and LayerNorm is scale-invariant,
    which silently collapses all reps into one; measured 10x under-report)."""
    x0, rest = args[0], args[1:]
    key = jax.random.PRNGKey(42)
    noise = jax.random.normal(key, (reps,) + x0.shape, x0.dtype)
    xs = x0[None] + noise

    def looped(xs, *rest):
        acc = jnp.zeros((), jnp.float32)
        for i in range(reps):
            acc = acc + jnp.sum(fn(xs[i], *rest)).astype(jnp.float32)
        return acc

    jitted = jax.jit(looped)
    for _ in range(warmup):
        float(jitted(xs, *rest))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jitted(xs, *rest)
    float(out)
    dt = (time.perf_counter() - t0) / (iters * reps)
    print(f"{name:44s} {dt*1000:8.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=10)
    a = ap.parse_args()
    B = a.batch
    dt = jnp.bfloat16
    print(f"device: {jax.devices()[0]}  batch={B} reps={a.reps} iters={a.iters}")

    key = jax.random.PRNGKey(0)

    def rnd(shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, shape, dt)

    # ---- depthwise pooling convs (pool_heads_conv core) ----
    w3 = rnd((3, 3, 3, 1, 96))

    for name, heads, thw, stride in [
        ("kv pool  stem (4,64,64) s(1,8,8) h1", 1, (4, 64, 64), (1, 8, 8)),
        ("q  pool  b1   (4,64,64) s(1,2,2) h2", 2, (4, 64, 64), (1, 2, 2)),
        ("kv pool  b1   (4,64,64) s(1,4,4) h2", 2, (4, 64, 64), (1, 4, 4)),
        ("q  pool  b3   (4,32,32) s(1,2,2) h4", 4, (4, 32, 32), (1, 2, 2)),
        ("q  pool  a2   (4,32,32) s(1,2,2) h4", 4, (4, 32, 32), (1, 2, 2)),
        ("kv pool  b4   (4,16,16) s(1,2,2) h4", 4, (4, 16, 16), (1, 2, 2)),
    ]:
        l = thw[0] * thw[1] * thw[2]
        x = rnd((B, heads, l, 96))
        norm = {k2: jnp.ones((96,), dt) * 0.5 for k2 in ("scale", "bias")}
        bench(
            name,
            lambda x, w, thw=thw, stride=stride, norm=norm: mvit.pool_heads_conv(
                x, w, norm, thw, stride, (1, 1, 1)
            )[0],
            (x, w3), a.iters, a.reps,
        )

    # ---- decoder upsample convs ----
    for name, heads, thw, stride in [
        ("up conv d1 (4,8,8)->(4,16,16) h8", 8, (4, 8, 8), (1, 2, 2)),
        ("up conv d3 (4,32,32)->(4,64,64) h4", 4, (4, 32, 32), (1, 2, 2)),
        ("up conv d4 (4,64,64)->(8,64,64) h2", 2, (4, 64, 64), (2, 1, 1)),
    ]:
        l = thw[0] * thw[1] * thw[2]
        x = rnd((B, heads, l, 96))
        norm = {k2: jnp.ones((96,), dt) * 0.5 for k2 in ("scale", "bias")}
        outpad = tuple(0 if s == 1 else s - 1 for s in stride)
        bench(
            name,
            lambda x, w, thw=thw, stride=stride, outpad=outpad, norm=norm:
                mvit.upsample_heads_conv(x, w, norm, thw, stride, (1, 1, 1), outpad)[0],
            (x, w3), a.iters, a.reps,
        )

    # ---- skips ----
    x = rnd((B, 16384, 96))
    bench("maxpool skip b1 (4,64,64) s(1,2,2)",
          lambda x: mvit.pool_tokens_max(x, (4, 64, 64), (3, 3, 3), (1, 2, 2), (1, 1, 1))[0],
          (x,), a.iters, a.reps)
    x = rnd((B, 4, 32, 32, 192))
    bench("trilinear d3 skip (4,32,32)->(4,64,64)",
          lambda x: ops.trilinear_resize(x, (4, 64, 64)), (x,), a.iters, a.reps)
    x = rnd((B, 4, 64, 64, 192))
    bench("trilinear d4 skip (4,64,64)->(8,64,64)",
          lambda x: ops.trilinear_resize(x, (8, 64, 64)), (x,), a.iters, a.reps)

    # ---- stem convs ----
    wp = rnd((3, 7, 7, 3, 96))
    bp = rnd((96,))
    x = rnd((B, 8, 256, 256, 3))
    bench("patch embed video (2,4,4)",
          lambda x, w, b: ops.conv3d({"w": w, "b": b}, x, (2, 4, 4), (1, 3, 3)),
          (x, wp, bp), a.iters, a.reps)

    # ---- projections at stem scale ----
    x = rnd((B, 16384, 96))
    wq = rnd((96, 288))
    bench("qkv matmul stem (16384,96)@(96,288)",
          lambda x, w: jnp.einsum("blc,cd->bld", x, w), (x, wq), a.iters, a.reps)
    x = rnd((B, 4096, 192))
    wq = rnd((192, 576))
    bench("qkv matmul a1/b2 (4096,192)@(192,576)",
          lambda x, w: jnp.einsum("blc,cd->bld", x, w), (x, wq), a.iters, a.reps)

    # ---- layer norms at stem scale ----
    x = rnd((B, 16384, 96))
    norm = {k2: jnp.ones((96,), dt) for k2 in ("scale", "bias")}
    bench("layer_norm stem (16384,96)",
          lambda x: ops.layer_norm(norm, x), (x,), a.iters, a.reps)

    # ---- whole blocks (composite path) for audio + decoder ----
    from csts_tpu.models.mvit import AttentionSpec

    audio_specs = [
        ("audio a1 L16384->4096 d192", AttentionSpec(
            dim=192, dim_out=384, num_heads=2, kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
            stride_q=(1, 2, 2), stride_kv=(1, 4, 4), fused=True), (4, 64, 64)),
        ("audio a2 L4096->1024 d384", AttentionSpec(
            dim=384, dim_out=768, num_heads=4, kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
            stride_q=(1, 2, 2), stride_kv=(1, 2, 2), fused=True), (4, 32, 32)),
        ("audio a3 L1024->256 d768", AttentionSpec(
            dim=768, dim_out=768, num_heads=8, kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
            stride_q=(1, 2, 2), stride_kv=(1, 1, 1), fused=True), (4, 16, 16)),
    ]
    dec_specs = [
        (f"decoder d{i+1} d{d}->{do} L{t[0]*t[1]*t[2]}", AttentionSpec(
            dim=d, dim_out=do, num_heads=h, kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
            stride_q=sq, stride_kv=skv, upsample_q=True, fused=True), t)
        for i, (d, do, h, sq, skv, t) in enumerate([
            (768, 768, 8, (1, 2, 2), (1, 2, 2), (4, 8, 8)),
            (768, 384, 4, (1, 2, 2), (1, 4, 4), (4, 16, 16)),
            (384, 192, 4, (1, 2, 2), (1, 8, 8), (4, 32, 32)),
            (192, 96, 2, (2, 1, 1), (1, 16, 16), (4, 64, 64)),
        ])
    ]
    for name, spec, thw in audio_specs + dec_specs:
        params = mvit.multiscale_block_init(jax.random.PRNGKey(1), spec)
        params = jax.tree_util.tree_map(lambda p: p.astype(dt), params)
        l = thw[0] * thw[1] * thw[2]
        x = rnd((B, l, spec.dim))
        bench(name,
              lambda x, params=params, spec=spec, thw=thw:
                  mvit.multiscale_block_apply(params, spec, x, thw)[0],
              (x,), a.iters, a.reps)

    # ---- decoder sub-ops: where does a decode block's time go? ----
    from csts_tpu.kernels import attention as ka
    from csts_tpu.kernels import block as kblock

    for tag, dim, heads, thw in [("d3", 384, 4, (4, 32, 32)), ("d4", 192, 2, (4, 64, 64))]:
        l = thw[0] * thw[1] * thw[2]
        sq = (2, 1, 1) if tag == "d4" else (1, 2, 2)
        lq = l * 2 if tag == "d4" else l * 4
        thw_q = (thw[0] * sq[0], thw[1] * sq[1], thw[2] * sq[2])
        hd = dim // heads
        x = rnd((B, l, dim))
        norm = {k2: jnp.ones((dim,), dt) for k2 in ("scale", "bias")}
        bench(f"{tag} ln1+qkv (L{l},d{dim})",
              lambda x, w: jnp.einsum("blc,cd->bld", ops.layer_norm(norm, x), w),
              (x, rnd((dim, 3 * dim))), a.iters, a.reps)
        xh = rnd((B, heads, l, hd))
        wdw = rnd((3, 3, 3, 1, hd))
        nrm = {k2: jnp.ones((hd,), dt) for k2 in ("scale", "bias")}
        outpad = tuple(0 if s == 1 else s - 1 for s in sq)
        bench(f"{tag} q upsample conv (L{l}->{lq})",
              lambda xh, w: mvit.upsample_heads_conv(xh, w, nrm, thw, sq, (1, 1, 1), outpad)[0],
              (xh, wdw), a.iters, a.reps)
        skv = {"d3": (1, 8, 8), "d4": (1, 16, 16)}[tag]
        bench(f"{tag} kv pool conv  (L{l}->64)",
              lambda xh, w: mvit.pool_heads_conv(xh, w, nrm, thw, skv, (1, 1, 1))[0],
              (xh, wdw), a.iters, a.reps)
        q = rnd((B, heads, lq, hd))
        kv = rnd((B, heads, 64, hd))
        bench(f"{tag} attention core (Lq{lq},Lk64)",
              lambda q, kv: ka.fused_attention(q, kv, kv, hd ** -0.5),
              (q, kv), a.iters, a.reps)
        xq = rnd((B, lq, dim))
        bench(f"{tag} out proj (L{lq},d{dim})",
              lambda xq, w: jnp.einsum("blc,cd->bld", xq, w),
              (xq, rnd((dim, dim))), a.iters, a.reps)
        xg = rnd((B, *thw, dim))
        bench(f"{tag} trilinear skip",
              lambda xg: ops.trilinear_resize(xg, thw_q), (xg,), a.iters, a.reps)
        from csts_tpu.models.mvit import AttentionSpec as AS
        tspec = AS(dim=dim, dim_out=dim // 2, num_heads=heads, kernel_q=(3, 3, 3),
                   kernel_kv=(3, 3, 3), stride_q=sq, stride_kv=skv,
                   upsample_q=True, fused=True)
        tparams = mvit.multiscale_block_init(jax.random.PRNGKey(2), tspec)
        tparams = jax.tree_util.tree_map(lambda p: p.astype(dt), tparams)
        bench(f"{tag} fused mlp tail (L{lq},d{dim})",
              lambda xq: kblock.fused_mlp_tail(xq, tparams, tspec), (xq,), a.iters, a.reps)


if __name__ == "__main__":
    main()
