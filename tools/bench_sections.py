#!/usr/bin/env python3
"""Per-section device timing of the flagship CSTS forward (dev tool).

Times patch-embed, each encoder stage, the audio branch, fusion, and the decoder as
separately jitted programs (batch 8, bf16), plus the full forward, using scalar-
readback fencing. Run on the TPU host: ``python tools/bench_sections.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_cfg
from csts_tpu.models import csts as csts_lib
from csts_tpu.models import mvit

BATCH = 8
ITERS = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.ravel()[0])), out)  # compile+settle
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].ravel()[0]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1000:8.2f} ms")
    return out


def main():
    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--no-fused", action="store_true")
    args = ap.parse_args()
    if args.no_fused:
        cfg.MODEL.FUSED_ATTENTION = False
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    @jax.jit
    def make_inputs(key):
        kv, ka = jax.random.split(key)
        return (
            jax.random.normal(kv, (BATCH, 8, 256, 256, 3), jnp.bfloat16),
            jax.random.normal(ka, (BATCH, 8, 256, 256, 1), jnp.bfloat16),
        )

    video, audio = make_inputs(jax.random.PRNGKey(0))

    @jax.jit
    def full(params, video, audio):
        return csts_lib.csts_apply(params, spec, video, audio)

    timed("full forward", full, params, video, audio)

    @jax.jit
    def stem(params, video):
        return csts_lib._patch_embed(params["patch_embed"], spec, video)

    x = timed("patch_embed (video)", stem, params, video)

    # encoder stages
    thw = spec.patch_dims
    start = 0
    for si, (vs, ve) in enumerate(spec.video_groups):
        blocks = list(range(vs, ve))
        thw_in = thw

        def stage(params, x, blocks=blocks, thw_in=thw_in):
            t = thw_in
            for i in blocks:
                x, t = mvit.multiscale_block_apply(
                    params["blocks"][i], spec.video_blocks[i], x, t
                )
            return x

        x = timed(f"video stage {si} (blk {vs}-{ve-1})", jax.jit(stage), params, x)
        thw = csts_lib._thw_after_blocks(thw_in, [spec.video_blocks[i] for i in blocks])

    @jax.jit
    def audio_branch(params, audio):
        y = csts_lib._patch_embed(params["patch_embed_audio"], spec, audio)
        t = spec.audio_patch_dims
        for i in range(4):
            y, t = mvit.multiscale_block_apply(
                params["blocks_audio"][i], spec.audio_blocks[i], y, t
            )
        return y

    y = timed("audio branch (4 blocks)", audio_branch, params, audio)

    @jax.jit
    def decoder(params, feat):
        t = spec.fusion_thw
        for i in range(4):
            feat, t = mvit.multiscale_block_apply(
                params[f"decode_block{i+1}"], spec.decoder_blocks[i], feat, t
            )
        return feat

    feat = jnp.zeros((BATCH, spec.fusion_thw[0] * spec.fusion_thw[1] * spec.fusion_thw[2],
                      spec.token_dim), jnp.bfloat16)
    timed("decoder (4 blocks)", decoder, params, feat)


if __name__ == "__main__":
    main()
