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


def run_at_size(name, dyn_t, interpret, B=4, ballast_mb=0):
    """Exact d3 whole-vol geometry: the flagship d3 padded coarse volume is
    (1, 6, 34, 34, 512) bf16 = 7.1 MB (coarse (4,32,32), 4 heads x 128 lanes —
    see pad.209 in the eval profile), batch-constant over grid
    (B, t_f=4, tiles=8); each step reads 3 ets x 4 heads windows with the
    shipped pl.ds row slice + static lane slot + column shifts.

    ``ballast_mb`` adds a VMEM scratch of that size to emulate the real
    kernel's other residents (MLP weights + fp32 hidden tile ~5-6 MB) so a
    scoped-VMEM overflow reproduces as a compile failure here too."""
    TT, HH, WW, CC = 6, 34, 34, 512  # padded coarse volume, 4 heads x 128 lanes
    RCW = 4  # coarse rows per fine tile (r_fine=8, sh=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, TT, HH, WW, CC), jnp.bfloat16)

    def kernel(x_ref, o_ref, *scratch):
        t = pl.program_id(1) if dyn_t else 2
        j = pl.program_id(2)
        c0 = j * RCW
        acc = jnp.zeros((RCW, 32, 128), jnp.float32)
        for h in range(4):
            for et in (-1, 0, 1):
                win = x_ref[0, t + et + 1, pl.ds(c0, RCW + 2), :,
                            h * 128:(h + 1) * 128].astype(jnp.float32)
                for ew in (-1, 0, 1):
                    acc = acc + win[:RCW, 1 + ew:1 + ew + 32, :]
        if scratch:
            scratch[0][0, :] = acc[0, 0]  # keep the ballast live
        o_ref[0, 0, 0] = acc.reshape(128, 128).astype(jnp.bfloat16)

    scratch_shapes = []
    if ballast_mb:
        scratch_shapes = [pltpu.VMEM((ballast_mb * 2 ** 20 // 512, 128),
                                     jnp.float32)]
    try:
        out = pl.pallas_call(
            kernel,
            grid=(B, 4, 8),
            in_specs=[pl.BlockSpec((1, TT, HH, WW, CC), lambda i, j, k: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1, 128, 128),
                                   lambda i, j, k: (i, j, k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 4, 8, 128, 128), jnp.bfloat16),
            scratch_shapes=scratch_shapes,
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
        run_at_size("size-dyn-t+6mb", True, args.interpret, ballast_mb=6)
        return
    run("static", k_static, args.interpret)
    run("dyn-t", k_dyn_t, args.interpret)
    run("dyn-ds", k_dyn_ds, args.interpret)
    run("dyn-full", k_dyn_full, args.interpret)


if __name__ == "__main__":
    main()
