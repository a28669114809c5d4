#!/usr/bin/env python3
"""A/B the flagship TRAIN step: composite tail vs fused stored-residual tail (dev tool).

Round-1 baseline: 234.6 ms/step at batch 8 bf16 (kldiv+egonce fwd+bwd+AdamW), all
Pallas kernels gated to inference. This measures, in ONE process (tunnel variance is
±5% across processes), the full jitted train step with:
  A) kernels disabled (the round-1 configuration), and
  B) the training-mode fused MLP tail (kernels/block.py fused_mlp_tail_train) live.

Usage: python tools/ab_train.py [--batch 8] [--iters 20]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--configs", default="ABCD", help="subset of configs to run")
    ap.add_argument("--batches", type=str, nargs="+", default=None,
                    help="sweep the composite config over these batch sizes "
                         "(one process; overrides --configs). An 'r' suffix "
                         "turns on MODEL.ACT_CHECKPOINT (encoder remat), "
                         "e.g. '--batches 16 32r'")
    ap.add_argument("--dwvjp-ab", action="store_true",
                    help="A/B ops.conv.DW_CUSTOM_VJP off/on on the composite "
                         "config at --batch, one process (overrides --configs)")
    ap.add_argument("--barrier-ab", action="store_true",
                    help="A/B ops.conv.DW_BARRIER off/on (the depthwise-conv "
                         "layout fix) on the composite config at --batch, one "
                         "process (overrides --configs)")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from csts_tpu.kernels import attention as ka
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import step as step_lib

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    cfg.TRAIN.BATCH_SIZE = args.batch
    spec = csts_lib.build_spec(cfg)

    B = args.batch
    print(f"device: {jax.devices()[0]}  batch={B} iters={args.iters}", flush=True)

    def make_batch(b):
        @jax.jit
        def _mk(key):
            kv, ka_, kl = jax.random.split(key, 3)
            hm = jax.nn.softmax(
                jax.random.normal(kl, (b, 8, 64 * 64), jnp.float32), axis=-1
            ).reshape(b, 8, 64, 64)
            return {
                "video": jax.random.normal(kv, (b, 8, 256, 256, 3), jnp.bfloat16),
                "audio": jax.random.normal(ka_, (b, 8, 256, 256, 1), jnp.bfloat16),
                "labels_hm": hm,
            }
        return _mk(jax.random.PRNGKey(0))

    batch = make_batch(B)

    if args.batches:
        # train-batch sweep, composite config, ONE process (the per-chip train
        # optimum can move with server-side backend drift — round 2 measured
        # batch 8 best at 281.7 ms; round 3's composite is 230 ms)
        ka.set_enabled(False)
        for bs in args.batches:
            remat = bs.endswith("r")
            b = int(bs.rstrip("r"))
            cfg.TRAIN.BATCH_SIZE = b
            cfg.MODEL.ACT_CHECKPOINT = remat
            spec = csts_lib.build_spec(cfg)
            B = b
            batch = make_batch(b)
            run_sweep_tag = f"composite batch {b:<3d}{' remat' if remat else '      '}      "
            state, tx = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(1))
            train_step = step_lib.make_train_step(cfg, spec, tx, steps_per_epoch=100)
            rng = jax.random.PRNGKey(2)
            t0 = time.perf_counter()
            state, stats, _ = train_step(state, batch, rng)
            float(stats["loss"])
            print(f"{run_sweep_tag}: compile+first step {time.perf_counter()-t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, stats, _ = train_step(state, batch, rng)
            float(stats["loss"])
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{run_sweep_tag}: {dt*1000:.1f} ms/step  ({b/dt:.1f} clips/s)", flush=True)
            del state
        return

    def run(tag):
        state, tx = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(1))
        train_step = step_lib.make_train_step(cfg, spec, tx, steps_per_epoch=100)
        rng = jax.random.PRNGKey(2)
        # warmup/compile
        t0 = time.perf_counter()
        state, stats, _ = train_step(state, batch, rng)
        float(stats["loss"])
        print(f"{tag}: compile+first step {time.perf_counter()-t0:.1f}s", flush=True)
        state, stats, _ = train_step(state, batch, rng)
        float(stats["loss"])

        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, stats, _ = train_step(state, batch, rng)
        float(stats["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{tag}: {dt*1000:.1f} ms/step  ({B/dt:.1f} clips/s)", flush=True)
        return dt

    if args.dwvjp_ab:
        from csts_tpu.ops import conv as conv_mod

        ka.set_enabled(False)
        conv_mod.DW_BARRIER_TRAIN_AUTO = False
        conv_mod.DW_CUSTOM_VJP = False
        off = run("dwvjp OFF (stock autodiff)      ")
        conv_mod.DW_CUSTOM_VJP = True
        on = run("dwvjp ON  (custom dx lowering)  ")
        print(f"dwvjp on vs off: {off/on:.3f}x", flush=True)
        return

    if args.barrier_ab:
        from csts_tpu.ops import conv as conv_mod

        ka.set_enabled(False)
        conv_mod.DW_BARRIER_TRAIN_AUTO = False
        conv_mod.DW_BARRIER = False
        off = run("barrier OFF (poisoned layouts)  ")
        conv_mod.DW_BARRIER = True
        on = run("barrier ON  (dw-conv layout fix)")
        print(f"barrier on vs off: {off/on:.3f}x", flush=True)
        return

    res = {}
    if "A" in args.configs:
        ka.set_enabled(False)
        res["A"] = run("A composite (kernels off)       ")
    if "B" in args.configs:
        ka.set_enabled(True)
        ka.set_train_attention(False)
        ka.set_train_decoder(False)
        res["B"] = run("B fused train tail only         ")
    if "C" in args.configs:
        ka.set_enabled(True)
        ka.set_train_attention(False)
        ka.set_train_decoder(True)
        res["C"] = run("C tail + decoder kernel         ")
    if "D" in args.configs:
        ka.set_enabled(True)
        ka.set_train_attention(True)
        ka.set_train_decoder(True)
        res["D"] = run("D tail + decoder + attn kernels ")
    if "A" in res:
        for tag, dt in res.items():
            if tag != "A":
                print(f"{tag} vs composite: {res['A']/dt:.3f}x", flush=True)


if __name__ == "__main__":
    main()
