#!/usr/bin/env python3
"""One-process A/B of module-level experiment flags on the full flagship forward.

The relay's cross-process variance is ±5%, so flag experiments must flip inside
ONE process: each config re-jits a fresh step function with the flags set, warms,
then times a pipelined dispatch loop with a single scalar-readback fence (the
bench.py protocol — block_until_ready does not fence on this transport).

'base' means ALL registry flags forced OFF (module defaults are overridden in
both directions, so the tool keeps working after a flag defaults to True).

Known flags (module attribute registry below):
  head_commute  — classify the stem skip BEFORE its T-resize (models/csts.py)
  split_resize  — sequential single-axis trilinear resizes, T first (ops/resize.py)
  t2_skip       — fused Pallas T×2 decoder-skip upsample (kernels/upsample.py)

Usage:
  python tools/ab_flags.py [--batch 128] [--iters 20] \
      [--configs base head_commute split_resize head_commute+split_resize]
Run on the TPU host to natural exit; never kill (TPU claim wedges).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csts_tpu.utils import compcache

compcache.enable()  # persist remote AOT compiles across tool runs (CSTS_COMPCACHE=0 to opt out)

import jax
import jax.numpy as jnp


def flag_registry():
    from csts_tpu.kernels import upsample as upsample_mod
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.ops import resize as resize_mod

    return {
        "head_commute": (csts_lib, "HEAD_COMMUTE"),
        "split_resize": (resize_mod, "SPLIT_AXES_T_FIRST"),
        "t2_skip": (upsample_mod, "T2_SKIP_KERNEL"),
        "hw2_skip": (upsample_mod, "HW2_SKIP_KERNEL"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument(
        "--configs", nargs="+",
        default=["base", "head_commute", "split_resize",
                 "head_commute+split_resize"],
        help="each entry: 'base' or '+'-joined flag names from the registry")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import losses

    registry = flag_registry()

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    @jax.jit
    def make_inputs(key):
        kv, ka = jax.random.split(key)
        video = jax.random.normal(kv, (args.batch, 8, 256, 256, 3), jnp.bfloat16)
        audio = jax.random.normal(ka, (args.batch, 8, 256, 256, 1), jnp.bfloat16)
        return video, audio

    video, audio = make_inputs(jax.random.PRNGKey(0))

    def sync(x):
        return float(jnp.sum(x[0, 0, 0, 0]))

    results = {}
    ref_out = None
    for conf in args.configs:
        names = [] if conf == "base" else conf.split("+")
        # Every config sets EVERY registry flag explicitly — False unless
        # named, True if named — so 'base' really is all-flags-off even after
        # a flag's module default flips to True (otherwise every config would
        # silently compare the identical default program against itself).
        saved = {}
        for key, (mod, attr) in registry.items():
            saved[key] = getattr(mod, attr)
            setattr(mod, attr, key in names)
        try:
            # fresh lambda => fresh jit cache entry under the flipped flags
            step = jax.jit(lambda p, v, a: losses.frame_softmax(
                csts_lib.csts_apply(p, spec, v, a, deterministic=True),
                temperature=2.0))
            for _ in range(args.warmup):
                out = step(params, video, audio)
                sync(out)
            # numerical guard: configs must agree at bf16 rounding level.
            # Only the 'base' config may seed the reference output — without it
            # a delta "vs base" would silently baseline against whichever
            # config happened to run first.
            if conf == "base":
                ref_out = jax.device_get(out)
            elif ref_out is not None:
                delta = float(abs(jax.device_get(out).astype("float32")
                                  - ref_out.astype("float32")).max())
                print(f"#   {conf}: max|Δ| vs base = {delta:.2e}", flush=True)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = step(params, video, audio)
            sync(out)
            dt = time.perf_counter() - t0
        finally:
            for key, (mod, attr) in registry.items():
                setattr(mod, attr, saved[key])
        ms = dt / args.iters * 1000
        results[conf] = ms
        print(f"{conf:32s} {ms:8.1f} ms/step  "
              f"{args.batch / (dt / args.iters):7.1f} clips/s", flush=True)

    base = results.get("base")
    if base:
        for conf, ms in results.items():
            if conf != "base":
                print(f"# {conf}: {base / ms:.3f}x vs base", flush=True)


if __name__ == "__main__":
    main()
