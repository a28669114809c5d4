#!/usr/bin/env python3
"""Minimal repro bisect for the DEC_VOL_VIEWS Mosaic compile failure (dev tool).

kernels/block.py's whole_vol mode (DEC_VOL_VIEWS) keeps the whole padded coarse
volume resident as one batch-constant (1, T+2, H+2, W+2, heads*hd_p) VMEM block
and reads per-plane windows with a DYNAMIC T index derived from program_id:

    win = vol_ref[0, t_f + et + 1, pl.ds(c0, rc + 2), :, h*hd_p:(h+1)*hd_p]

On-chip this dies in the remote TPU compiler (HTTP 500, subprocess exit 1 — the
relay surfaces no Mosaic stderr), while interpret mode is fine. This tool
compiles ONE tiny kernel per candidate construct so the crash bisects to a
specific load pattern; run on the TPU host, never kill mid-run.

  static    per-plane static index (control — the shipped per-plane views path)
  dyn-t     scalar dynamic index on dim 1 + pl.ds rows + static lane slice
            (the whole_vol construct)
  dyn-ds    same read expressed as pl.ds(t, 1) on dim 1, then squeeze
  dyn-full  dynamic T index but full rows/lanes (no ds, no lane slice)

Usage: python tools/repro_volviews.py [--interpret]
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csts_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, H, W, C = 6, 10, 10, 256  # tiny padded volume, 2 "heads" of 128 lanes
RC = 4


def run(name, kernel, interpret):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, H, W, C), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(2, T - 2),
            in_specs=[pl.BlockSpec((1, T, H, W, C), lambda i, j: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, RC, W, 128), lambda i, j: (i, j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, T - 2, RC, W, 128), jnp.bfloat16),
            interpret=interpret,
        )(x)
        print(f"{name:10s} OK   sum={float(jnp.sum(out.astype(jnp.float32))):.3f}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report, don't abort the bisect
        msg = str(e).splitlines()[0][:140]
        print(f"{name:10s} FAIL {type(e).__name__}: {msg}", flush=True)
        if interpret:
            traceback.print_exc()
        return False


def k_static(x_ref, o_ref):
    win = x_ref[0, 1, pl.ds(2, RC), :, 128:256]
    o_ref[0, 0] = win


def k_dyn_t(x_ref, o_ref):
    t = pl.program_id(1)
    win = x_ref[0, t + 1, pl.ds(2, RC), :, 128:256]
    o_ref[0, 0] = win


def k_dyn_ds(x_ref, o_ref):
    t = pl.program_id(1)
    win = x_ref[0, pl.ds(t + 1, 1), pl.ds(2, RC), :, 128:256]
    o_ref[0, 0] = win.reshape(RC, W, 128)


def k_dyn_full(x_ref, o_ref):
    t = pl.program_id(1)
    win = x_ref[0, t + 1]  # (H, W, C), dynamic T only
    o_ref[0, 0] = win[2:2 + RC, :, 128:256]


def run_at_size(name, dyn_t, interpret, B=4):
    """Exact d3 whole-vol geometry: volume (1,10,18,18,512) bf16 batch-constant,
    grid (B, t_f=8, tiles=2), 4 heads x 3 ets window reads per step with the
    shipped pl.ds row slice + static lane slot + column shifts."""
    TT, HH, WW, CC = 10, 18, 18, 512  # padded coarse volume, 4 heads x 128 lanes
    x = jax.random.normal(jax.random.PRNGKey(0), (B, TT, HH, WW, CC), jnp.bfloat16)

    def kernel(x_ref, o_ref):
        t = pl.program_id(1) if dyn_t else 3
        j = pl.program_id(2)
        c0 = j * 8
        acc = jnp.zeros((8, 16, 128), jnp.float32)
        for h in range(4):
            for et in (-1, 0, 1):
                win = x_ref[0, t + et + 1, pl.ds(c0, 10), :,
                            h * 128:(h + 1) * 128].astype(jnp.float32)
                for ew in (-1, 0, 1):
                    acc = acc + win[:8, 1 + ew:1 + ew + 16, :]
        o_ref[0, 0, 0] = acc.reshape(128, 128).astype(jnp.bfloat16)

    try:
        out = pl.pallas_call(
            kernel,
            grid=(B, 8, 2),
            in_specs=[pl.BlockSpec((1, TT, HH, WW, CC), lambda i, j, k: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1, 128, 128),
                                   lambda i, j, k: (i, j, k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, 2, 128, 128), jnp.bfloat16),
            interpret=interpret,
        )(x)
        print(f"{name:16s} OK   sum={float(jnp.sum(out.astype(jnp.float32))):.3f}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report, don't abort the bisect
        msg = str(e).splitlines()[0][:140]
        print(f"{name:16s} FAIL {type(e).__name__}: {msg}", flush=True)
        if interpret:
            traceback.print_exc()
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--at-size", action="store_true",
                    help="exact d3 whole-vol geometry instead of tiny constructs")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print(f"device: {jax.devices()[0]}", flush=True)
    if args.at_size:
        run_at_size("size-static", False, args.interpret)
        run_at_size("size-dyn-t", True, args.interpret)
        return
    run("static", k_static, args.interpret)
    run("dyn-t", k_dyn_t, args.interpret)
    run("dyn-ds", k_dyn_ds, args.interpret)
    run("dyn-full", k_dyn_full, args.interpret)


if __name__ == "__main__":
    main()
