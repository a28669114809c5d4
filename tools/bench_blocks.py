#!/usr/bin/env python3
"""Per-BLOCK device timing of the flagship forward, plus intra-block ablations.

bench_sections.py ranks the sections; this ranks individual blocks inside them
and decomposes one representative identity-skip block (default: video block 5,
the stage-2 d384/4h shape that dominates stage 2) into its pipeline pieces so
the fat is attributable to qkv / kv-pool / attention / tail rather than guessed.

Every timing is a separately jitted program over on-device random inputs at the
exact intermediate shape (boundary relayouts are included — absolute numbers are
upper bounds, the RANKING is the product).

Usage: python tools/bench_blocks.py [--batch 128] [--iters 20] [--ablate 5]
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
from csts_tpu import ops
from csts_tpu.models import csts as csts_lib
from csts_tpu.models import mvit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ablate", type=int, default=5, help="video block index to decompose")
    ap.add_argument("--skip-blocks", action="store_true", help="only run the ablation")
    args = ap.parse_args()
    B, ITERS = args.batch, args.iters

    def timed(name, fn, *fargs):
        out = fn(*fargs)
        jax.tree_util.tree_map(lambda a: float(jnp.sum(a.ravel()[0])), out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*fargs)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0].ravel()[0]))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:40s} {dt*1000:8.2f} ms", flush=True)
        return dt

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def rand_tokens(l, c, seed=0):
        return jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(seed), (B, l, c), jnp.bfloat16)
        )()

    def block_fn(block_params, block_spec, thw_in):
        @jax.jit
        def fn(p, x):
            out, _ = mvit.multiscale_block_apply(p, block_spec, x, thw_in)
            return out
        return fn

    if not args.skip_blocks:
        # -------- every video block --------
        thw = spec.patch_dims
        for i, bs in enumerate(spec.video_blocks):
            l = thw[0] * thw[1] * thw[2]
            x = rand_tokens(l, bs.dim, i)
            timed(f"video blk {i:2d} (d{bs.dim}/{bs.num_heads}h, L={l})",
                  block_fn(params["blocks"][i], bs, thw), params["blocks"][i], x)
            thw = csts_lib._thw_after_blocks(thw, [bs])

        # -------- every audio block --------
        thw = spec.audio_patch_dims
        for i, bs in enumerate(spec.audio_blocks):
            l = thw[0] * thw[1] * thw[2]
            y = rand_tokens(l, bs.dim, 100 + i)
            timed(f"audio blk {i:2d} (d{bs.dim}/{bs.num_heads}h, L={l})",
                  block_fn(params["blocks_audio"][i], bs, thw), params["blocks_audio"][i], y)
            thw = csts_lib._thw_after_blocks(thw, [bs])

        # -------- every decoder block --------
        thw = spec.fusion_thw
        for i, bs in enumerate(spec.decoder_blocks):
            l = thw[0] * thw[1] * thw[2]
            f = rand_tokens(l, bs.dim, 200 + i)
            timed(f"decode blk {i+1} (d{bs.dim}->{bs.dim_out}, L={l})",
                  block_fn(params[f"decode_block{i+1}"], bs, thw),
                  params[f"decode_block{i+1}"], f)
            thw = csts_lib._thw_after_blocks(thw, [bs])

    # -------- ablation of one identity-skip block --------
    bi = args.ablate
    bs = spec.video_blocks[bi]
    thw = spec.patch_dims
    for j in range(bi):
        thw = csts_lib._thw_after_blocks(thw, [spec.video_blocks[j]])
    l = thw[0] * thw[1] * thw[2]
    p = params["blocks"][bi]
    print(f"-- ablation: video blk {bi} d{bs.dim}/{bs.num_heads}h L={l} thw={thw} --")
    x = rand_tokens(l, bs.dim, 999)

    from csts_tpu.kernels import attention as ka

    timed("full block (kernel dispatch)", block_fn(p, bs, thw), p, x)

    @jax.jit
    def composite(p, x):
        ka.set_enabled(False)
        try:
            out, _ = mvit.multiscale_block_apply(p, bs, x, thw)
        finally:
            ka.set_enabled(None)
        return out

    timed("full block (composite XLA)", composite, p, x)

    @jax.jit
    def ln_qkv(p, x):
        return ops.linear_apply(p["attn"]["qkv"], ops.layer_norm(p["norm1"], x))

    qkv = timed("ln1 + qkv matmul", ln_qkv, p, x)

    qkv_arr = jax.jit(ln_qkv)(p, x)

    @jax.jit
    def split_pool(p, qkv_arr):
        b, l_, _ = qkv_arr.shape
        qkv_r = qkv_arr.reshape(b, l_, 3, bs.num_heads, bs.head_dim)
        k = qkv_r[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv_r[:, :, 2].transpose(0, 2, 1, 3)
        if "pool_k" in p["attn"]:
            k, _ = mvit.pool_heads_conv(
                k, p["attn"]["pool_k"], p["attn"].get("norm_k"), thw,
                bs.stride_kv, bs.padding_kv)
            v, _ = mvit.pool_heads_conv(
                v, p["attn"]["pool_v"], p["attn"].get("norm_v"), thw,
                bs.stride_kv, bs.padding_kv)
        return k, v

    timed("split + kv pool convs + norms", split_pool, p, qkv_arr)
    k_arr, v_arr = jax.jit(split_pool)(p, qkv_arr)

    @jax.jit
    def q_path(p, qkv_arr):
        b, l_, _ = qkv_arr.shape
        qkv_r = qkv_arr.reshape(b, l_, 3, bs.num_heads, bs.head_dim)
        q = qkv_r[:, :, 0].transpose(0, 2, 1, 3)
        if "pool_q" in p["attn"]:
            q, _ = mvit.pool_heads_conv(
                q, p["attn"]["pool_q"], p["attn"].get("norm_q"), thw,
                bs.stride_q, bs.padding_q)
        return q

    timed("split + q pool conv + norm", q_path, p, qkv_arr)
    q_arr = jax.jit(q_path)(p, qkv_arr)

    @jax.jit
    def attn_core(q, k, v):
        out, _ = mvit._attention_core(q, k, v, bs.scale, fused=bs.fused)
        return out

    timed("attention core (pallas if eligible)", attn_core, q_arr, k_arr, v_arr)

    @jax.jit
    def attn_core_xla(q, k, v):
        out, _ = mvit._attention_core(q, k, v, bs.scale, fused=False)
        return out

    timed("attention core (plain XLA)", attn_core_xla, q_arr, k_arr, v_arr)

    @jax.jit
    def proj_only(p, q):
        return ops.linear_apply(p["attn"]["proj"], mvit._merge_heads(q))

    timed("out proj matmul", proj_only, p, q_arr)

    from csts_tpu.kernels import block as kb

    if kb.tail_eligible(bs, True, l):
        @jax.jit
        def tail_fused(p, x):
            return kb.fused_mlp_tail(x, p, bs)

        timed("mlp tail (fused kernel)", tail_fused, p, x)

    @jax.jit
    def tail_xla(p, x):
        x_norm = ops.layer_norm(p["norm2"], x)
        h = ops.linear_apply(p["mlp"]["fc1"], x_norm)
        h = jax.nn.gelu(h, approximate=False)
        h = ops.linear_apply(p["mlp"]["fc2"], h)
        # dim-change blocks (e.g. blk0 96->192) route the residual through the
        # tail's projection of x_norm (reference proj(x_norm) quirk)
        res = ops.linear_apply(p["proj"], x_norm) if "proj" in p else x
        return res + h

    timed("mlp tail (composite XLA)", tail_xla, p, x)


if __name__ == "__main__":
    main()
