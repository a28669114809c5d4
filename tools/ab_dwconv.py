#!/usr/bin/env python3
"""Micro A/B of the depthwise pool-conv GRADIENT lowerings (dev tool).

The round-4 train-step profile (tools/profile_forward.py --train, batch 16:
412-417 ms device-op, convolution fusions 295-320 ms) shows the kv-pool
depthwise convs costing ~90x more per clip inside the train step than in the
eval forward: the same {out 4,8,8,384 | w 3,3,3,1,384 | in 4,16,16,384} conv
is 0.25 ms at batch 128 eval but 2.77 ms at batch 16 train, and the stage-3
768-dim stride-1 pools hit 23.7 ms each (3.2 GB/s) with f32 batch-minor
outputs. This tool isolates, in ONE process on the real chip:

  fwd-bf16          the eval-style forward conv (sanity floor)
  fwd-f32           same conv on f32 operands (precision=HIGHEST multi-pass)
  grad-autodiff     value_and_grad of sum(conv(w,x)·cot), stock JAX transpose
  grad-f32cot       same but the cotangent arrives f32 (the train-step case:
                    pool-norm computes fp32 stats downstream)
  dx-subpixel       input-grad as the subpixel transposed depthwise conv
                    (ops/conv._depthwise_conv_transpose3d_xla — the decoder
                    q-upsample path, phases are small dense convs)
  dw-taps           weight-grad as 27 strided-slice multiply-reduces
  grad-custom       value_and_grad with ops.conv's custom VJP enabled

Usage: python tools/ab_dwconv.py [--iters 10] [--reps 4] [--batch 16]
Run on the TPU host to natural exit; never kill (TPU claim wedges).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csts_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
from jax import lax

from csts_tpu.ops import conv as conv_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    ITERS, REPS, B = args.iters, args.reps, args.batch

    def bench(name, fn, *xs):
        """REPS distinct input sets unrolled in one jit; barrier-honest."""
        keys = jax.random.split(jax.random.PRNGKey(0), REPS)
        sets = [tuple(x + 0.001 * jax.random.normal(k, x.shape, x.dtype) for x in xs)
                for k in keys]
        flat = [x for s in sets for x in s]
        n = len(xs)

        def looped(*flat):
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                outs = fn(*flat[i * n:(i + 1) * n])
                if not isinstance(outs, tuple):
                    outs = (outs,)
                for o in jax.tree_util.tree_leaves(outs):
                    o = lax.optimization_barrier(o)
                    acc = acc + jnp.sum(o.ravel()[:128]).astype(jnp.float32)
            return acc

        jitted = jax.jit(looped)
        for _ in range(2):
            float(jitted(*flat))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jitted(*flat)
        float(out)
        dt = (time.perf_counter() - t0) / (ITERS * REPS)
        print(f"{name:52s} {dt*1000:8.3f} ms", flush=True)
        return dt

    print(f"device: {jax.devices()[0]}  batch={B}", flush=True)

    CASES = [
        # (tag, T,H,W,C, stride) — the train profile's worst offenders
        ("stage3 kv C=768 s(1,1,1) in(4,16,16)", 4, 16, 16, 768, (1, 1, 1)),
        ("stage2 kv C=384 s(1,2,2) in(4,16,16)", 4, 16, 16, 384, (1, 2, 2)),
        ("stage1 kv C=192 s(1,4,4) in(4,32,32)", 4, 32, 32, 192, (1, 4, 4)),
    ]
    pad = (1, 1, 1)

    for tag, T, H, W, C, stride in CASES:
        print(f"-- {tag} --", flush=True)
        kx, kw_ = jax.random.split(jax.random.PRNGKey(1))
        x16 = jax.random.normal(kx, (B, T, H, W, C), jnp.bfloat16)
        w16 = jax.random.normal(kw_, (3, 3, 3, 1, C), jnp.bfloat16) * 0.1
        x32, w32 = x16.astype(jnp.float32), w16.astype(jnp.float32)

        fwd = lambda w, x, s=stride: conv_mod._depthwise_conv3d_xla(w, x, s, pad)
        out_shape = jax.eval_shape(fwd, w16, x16).shape
        kc = jax.random.PRNGKey(2)
        cot16 = jax.random.normal(kc, out_shape, jnp.bfloat16)
        cot32 = cot16.astype(jnp.float32)

        bench("fwd-bf16", fwd, w16, x16)
        bench("fwd-f32 (HIGHEST)", fwd, w32, x32)

        def loss16(w, x, cot, s=stride):
            return jnp.sum((fwd(w, x, s) * cot).astype(jnp.float32))

        def grad_both(w, x, cot):
            return jax.grad(loss16, argnums=(0, 1))(w, x, cot)

        bench("grad-autodiff (bf16 cot)", grad_both, w16, x16, cot16)

        def loss_f32cot(w, x, cot, s=stride):
            # the train-step pattern: conv output converts to f32 downstream
            return jnp.sum(fwd(w, x, s).astype(jnp.float32) * cot)

        bench("grad-f32cot", lambda w, x, c: jax.grad(loss_f32cot, (0, 1))(w, x, c),
              w16, x16, cot32)

        # -- candidate custom-VJP pieces --
        k3 = tuple(w16.shape[:3])
        op = tuple(
            x16.shape[1 + d] - ((out_shape[1 + d] - 1) * stride[d] - 2 * pad[d] + k3[d])
            for d in range(3)
        )
        bench("dx-subpixel (transpose conv)",
              lambda w, g: conv_mod._depthwise_conv_transpose3d_xla(w, g, stride, pad, op),
              w16, cot16)
        bench("dw-taps (27 strided reduces)",
              lambda x, g: conv_mod._depthwise_weight_grad((3, 3, 3, 1, C), x, g, stride, pad),
              x16, cot16)

        if hasattr(conv_mod, "depthwise_conv3d_cv"):
            def loss_cv(w, x, cot, s=stride):
                return jnp.sum(
                    (conv_mod.depthwise_conv3d_cv(w, x, s, pad) * cot).astype(jnp.float32))
            bench("grad-custom-vjp (bf16 cot)",
                  lambda w, x, c: jax.grad(loss_cv, (0, 1))(w, x, c), w16, x16, cot16)
            def loss_cv32(w, x, cot, s=stride):
                return jnp.sum(
                    conv_mod.depthwise_conv3d_cv(w, x, s, pad).astype(jnp.float32) * cot)
            bench("grad-custom-vjp (f32 cot)",
                  lambda w, x, c: jax.grad(loss_cv32, (0, 1))(w, x, c), w16, x16, cot32)


if __name__ == "__main__":
    main()
