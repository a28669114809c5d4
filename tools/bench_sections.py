#!/usr/bin/env python3
"""Per-section device timing of the flagship CSTS forward (dev tool).

Times patch-embed, each encoder stage, the audio branch, the AV fusion section,
the decoder, and the head as separately jitted programs, plus the full forward,
using pipelined dispatch + scalar-readback fencing. Prints the section sum vs the
full forward so unattributed time is visible.

Usage: python tools/bench_sections.py [--batch 8] [--iters 10] [--no-fused]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-fused", action="store_true")
    args = ap.parse_args()
    BATCH, ITERS = args.batch, args.iters

    total = {"t": 0.0}

    def timed(name, fn, *fargs, count=True):
        out = fn(*fargs)
        jax.tree_util.tree_map(lambda a: float(jnp.sum(a.ravel()[0])), out)  # compile+settle
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*fargs)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0].ravel()[0]))
        dt = (time.perf_counter() - t0) / ITERS
        if count:
            total["t"] += dt
        print(f"{name:34s} {dt*1000:8.2f} ms", flush=True)
        return out

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
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

    timed(f"full forward (batch {BATCH})", full, params, video, audio, count=False)

    @jax.jit
    def stem(params, video):
        x = csts_lib._patch_embed(params["patch_embed"], spec, video)
        return x + csts_lib._pos_embed(params, spec, audio=False).astype(x.dtype)

    x = timed("patch_embed+pos (video)", stem, params, video)
    x_stem = x

    thw = spec.patch_dims
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
        y = y + csts_lib._pos_embed(params, spec, audio=True).astype(y.dtype)
        t = spec.audio_patch_dims
        for i in range(4):
            y, t = mvit.multiscale_block_apply(
                params["blocks_audio"][i], spec.audio_blocks[i], y, t
            )
        return y

    y = timed("audio branch (stem+4 blocks)", audio_branch, params, audio)

    # ---- fusion section (spatial fusion w/ mask + attn extraction, temporal, reweight)
    @jax.jit
    def fusion(params, x, y):
        b = x.shape[0]
        t, fh, fw = spec.fusion_thw
        td = spec.token_dim
        y_grid = csts_lib._tokens_to_grid(y, spec.audio_fusion_thw)
        y_spatial = ops.conv3d(params["audio_pool"], y_grid, (1, 1, 1), (0, 0, 0)).reshape(b, t, td)
        av_spatial = jnp.concatenate([x, y_spatial], axis=1)
        mask = jnp.asarray(mvit.build_inframe_mask(spec.fusion_thw, t))
        av_spatial, _, spatial_attn = mvit.multiscale_block_apply(
            params["spatial_fusion"], spec.spatial_fusion, av_spatial, spec.fusion_thw,
            mask=mask, return_attn=True,
        )
        x_spatial = av_spatial[:, : x.shape[1]]
        x_grid = csts_lib._tokens_to_grid(x, spec.fusion_thw)
        audio_attn = mvit.extract_audio_attention(spatial_attn, spec.fusion_thw)
        audio_attn = jnp.mean(audio_attn, axis=1)[..., None]
        x_grid = x_grid * audio_attn.astype(x.dtype)
        x_temporal = ops.conv3d(params["vision_pool"], x_grid, (1, 1, 1), (0, 0, 0)).reshape(b, t, td)
        y_temporal = ops.conv3d(params["audio_pool2"], y_grid, (1, 1, 1), (0, 0, 0)).reshape(b, t, td)
        av_temporal = jnp.concatenate([x_temporal, y_temporal], axis=1)
        av_temporal, _ = mvit.multiscale_block_apply(
            params["temporal_fusion"], spec.temporal_fusion, av_temporal, (2, 2, 2),
        )
        x_weights = av_temporal[:, :t]
        x_reweight = csts_lib._tokens_to_grid(x_spatial, spec.fusion_thw) * x_weights[:, :, None, None, :]
        return x_reweight.reshape(b, x.shape[1], td)

    feat = timed("fusion (spatial+temporal+rw)", fusion, params, x, y)

    @jax.jit
    def decoder(params, feat):
        t = spec.fusion_thw
        for i in range(4):
            feat, t = mvit.multiscale_block_apply(
                params[f"decode_block{i+1}"], spec.decoder_blocks[i], feat, t
            )
        return feat

    feat = timed("decoder (4 blocks, no skips)", decoder, params, feat)

    @jax.jit
    def head(params, feat, x_stem):
        t, h, w = spec.patch_dims
        thw_out = (t * 2, h, w)
        feat_grid = csts_lib._tokens_to_grid(feat, thw_out)
        stem_grid = csts_lib._tokens_to_grid(x_stem, spec.patch_dims)
        stem_up = ops.trilinear_resize(stem_grid, thw_out)
        return ops.conv3d(params["classifier"], feat_grid + stem_up, (1, 1, 1), (0, 0, 0))

    feat_full = jnp.zeros(
        (BATCH, spec.patch_dims[0] * 2 * spec.patch_dims[1] * spec.patch_dims[2],
         spec.decoder_blocks[-1].dim_out), jnp.bfloat16,
    )
    timed("head (stem skip + classifier)", head, params, feat_full, x_stem)

    print(f"{'SUM of sections':34s} {total['t']*1000:8.2f} ms")


if __name__ == "__main__":
    main()
