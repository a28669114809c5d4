#!/usr/bin/env python3
"""A/B the decoder blocks at their REAL shapes across kernel tile targets (dev tool).

The batch-128 section split puts the decoder at 300.7 ms of a 773 ms forward;
per-step work at tile 512 is small (d4: 128 batch · 64 tiles · heads grid
steps), so the hypothesis is grid-step overhead. This times each decoder block
separately (inputs at the true pre-block shape, thw tracked through
multiscale_block_apply) for tile targets {512 (shipped), 1024, 2048} plus the
composite, in ONE process.

Usage: python tools/ab_decoder.py [--batch 128] [--iters 20]
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

from __graft_entry__ import _flagship_cfg
from csts_tpu.kernels import attention as ka
from csts_tpu.kernels import block as kb
from csts_tpu.models import csts as csts_lib
from csts_tpu.models import mvit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ablate-kernel", action="store_true",
                    help="per-stage cost inside the decoder kernel (d3/d4)")
    ap.add_argument("--hybrid", action="store_true",
                    help="composite decoder + fused attention/tail kernels")
    ap.add_argument("--scales", type=int, nargs="+", default=[1, 2, 4],
                    help="DEC_TILE_SCALE values to sweep")
    ap.add_argument("--vol-views", action="store_true",
                    help="A/B kb.DEC_VOL_VIEWS (whole-volume coarse-Q block) "
                         "on the st=1 folded blocks (d3)")
    ap.add_argument("--paired-ab", action="store_true",
                    help="A/B kb.DEC_PAIRED_T (paired fine-T-phase grid) "
                         "on the st=2 folded blocks (d4)")
    args = ap.parse_args()
    B, ITERS = args.batch, args.iters

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def timed(name, fn, *fargs):
        out = fn(*fargs)
        float(jnp.sum(out.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*fargs)
        float(jnp.sum(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:46s} {dt*1000:8.2f} ms", flush=True)
        return dt

    # true decoder input thws: d1 (4,8,8) -> d2 (4,16,16) -> d3 (4,32,32) -> d4 (4,64,64)
    thws = [spec.fusion_thw]
    for bs in spec.decoder_blocks[:-1]:
        t, h, w = thws[-1]
        st, sh, sw = bs.stride_q
        thws.append((t * st, h * sh, w * sw))

    inputs = []
    for i, bs in enumerate(spec.decoder_blocks):
        t, h, w = thws[i]
        l = t * h * w
        x = jax.jit(lambda i=i, l=l, bs=bs: jax.random.normal(
            jax.random.PRNGKey(i), (B, l, bs.dim), jnp.bfloat16))()
        inputs.append(x)

    def block_fn(i):
        bs = spec.decoder_blocks[i]
        thw = thws[i]

        @jax.jit
        def fn(p, x):
            out, _ = mvit.multiscale_block_apply(p, bs, x, thw)
            return out
        return fn

    if args.hybrid:
        # composite XLA decoder (subpixel q-upsample conv) but WITH the fused
        # attention + MLP-tail kernels — Pallas only where it kills the fp32
        # probability tensor; XLA streams the bulk passes at ~884 GB/s vs
        # Mosaic's ~240 (tools/bench_roofline.py)
        orig = kb.decoder_eligible
        kb.decoder_eligible = lambda *a, **k: False
        try:
            for i in range(4):
                timed(f"decode blk {i+1} hybrid (attn+tail kernels)", block_fn(i),
                      params[f"decode_block{i+1}"], inputs[i])
        finally:
            kb.decoder_eligible = orig
        print("-- composite (all kernels off) --", flush=True)
        ka.set_enabled(False)
        try:
            for i in range(4):
                timed(f"decode blk {i+1} composite", block_fn(i),
                      params[f"decode_block{i+1}"], inputs[i])
        finally:
            ka.set_enabled(None)
        return

    if args.ablate_kernel:
        # per-stage cost attribution inside the decoder kernel (d3/d4 focus)
        for i in (2, 3):
            for skip in ({"qwin"}, {"qwin", "attn", "mlp"}):
                kb.DEC_DEBUG_SKIP = skip
                tag = "+".join(sorted(skip)) or "none"
                try:
                    timed(f"decode blk {i+1} skip={tag}", block_fn(i),
                          params[f"decode_block{i+1}"], inputs[i])
                except Exception as e:
                    print(f"blk {i+1} skip={tag}: FAILED {str(e)[:120]}", flush=True)
        kb.DEC_DEBUG_SKIP = set()
        return

    if args.paired_ab:
        for flag in (False, True):
            kb.DEC_PAIRED_T = flag
            tag = "paired-T" if flag else "per-fine-plane"
            try:
                timed(f"decode blk 4 {tag}", block_fn(3),
                      params["decode_block4"], inputs[3])
            except Exception as e:
                print(f"blk 4 {tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
        kb.DEC_PAIRED_T = True
        return

    if args.vol_views:
        # d3 is the only flagship block on the whole-volume path (fold + st=1
        # + volume ≤ 8 MB); d2 (unfolded) and d4 (paired st=2) are unaffected
        for flag in (False, True):
            kb.DEC_VOL_VIEWS = flag
            tag = "vol-views" if flag else "per-plane views"
            try:
                timed(f"decode blk 3 {tag}", block_fn(2),
                      params["decode_block3"], inputs[2])
            except Exception as e:
                print(f"blk 3 {tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
        kb.DEC_VOL_VIEWS = False
        return

    ref = {}
    for scale in args.scales:
        kb.DEC_TILE_SCALE = scale
        print(f"-- tile scale {scale}x --", flush=True)
        # d1/d2 (dim 768) already measured flat across tiles; sweep d3/d4 only
        # beyond the shipped scale
        for i in (range(4) if scale == 1 else (2, 3)):
            name = f"decode blk {i+1} d{spec.decoder_blocks[i].dim}->{spec.decoder_blocks[i].dim_out} x{scale}"
            try:
                dt = timed(name, block_fn(i), params[f"decode_block{i+1}"], inputs[i])
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            ref.setdefault(i, {})[scale] = dt
    kb.DEC_TILE_SCALE = 1

    for i, row in ref.items():
        best = min(row, key=row.get)
        print(f"blk {i+1}: best scale {best} ({row[best]*1000:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
