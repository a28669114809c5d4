"""Fused T×2 trilinear-skip upsample for stride-(2,1,1) decoder blocks.

The d4 decoder block's residual skip is ``nn.Upsample(scale_factor=(2,1,1),
mode='trilinear')`` of the block input (reference
``slowfast/models/attention.py:463-467``). XLA lowers the half-pixel T-resize
as a ``[T_c, 2·T_c]`` weight matmul at FINE spatial resolution and pays, at
batch 128 (PROFILE_r4.json): a batch-minor relayout into the matmul
(copy.1585, 3.2 ms), the resize fusion itself (convolution_bitcast_fusion,
3.8), a relayout out of it (copy.1586, 4.9), a token-major relayout
(copy.1719, 6.1), and the 192→256 lane pad that feeds the decoder kernel's
skip slot (pad.223, 6.6) — 24.5 ms of the 606 ms forward. This kernel streams
the lane-padded coarse grid once and emits the fine skip directly in the
decoder kernel's skip_in layout: ``(B, 2·T_c, H·W, cp)`` token-major with
zero lane pads, which ``kernels/block.py``'s ``_pad_last`` then passes
through untouched. Traffic: ~1.07 GB read + 2.15 GB written at the ~270 GB/s
Mosaic streaming cap (tools/probe_dma.py) ≈ 12 ms, plus a ~2 ms coarse-side
XLA pad.

Math — exactly ``jax.image.resize(method='linear')`` on axis T at scale 2
(half-pixel sample positions, edge-clamped):

  out[2m]   = 0.25·x[m-1] + 0.75·x[m]    (t=0 collapses to x[0] exactly)
  out[2m+1] = 0.75·x[m]   + 0.25·x[m+1]  (t=2·T_c-1 collapses to x[T_c-1])

Interior taps accumulate in fp32 and cast once (the XLA lowering's MXU
f32-accum semantics); clamped edge planes are direct copies. Inference-only
by construction: it is reached through models/mvit.py's
``_decoder_kernel_forward``, whose only training use is the forward of the
``_decoder_block_ad`` custom_vjp (the backward recomputes the composite
block, so no VJP is ever taken through this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# On-chip A/B via tools/ab_flags.py ('t2_skip'). Default ON: 607.4 → 582.8
# ms/step at batch 128 (210.7 → 219.6 clips/s); the composite XLA resize path
# remains the fallback whenever eligibility fails (and always off-TPU / in
# training).
T2_SKIP_KERNEL = True

# The HW×2 variant (d2/d3 stride-(1,2,2) skips) gets its own flag: measured
# on-chip as a LOSS on top of t2_skip (588.4 vs 582.8 ms/step at batch 128 —
# the d2/d3 XLA resize pipeline it replaces was only ~8.4 ms and mostly
# already fused, while the kernel adds grid-step overhead at fine spatial
# scale). Default OFF; kept for measurement (tools/ab_flags.py 'hw2_skip').
HW2_SKIP_KERNEL = False

# double-buffered (in + out) blocks must fit the 16 MB VMEM stack with slack
_VMEM_BUDGET = 12 * 2 ** 20


def _t2_kernel(x_ref, o_ref, *, t_c: int):
    f32 = jnp.float32
    x = x_ref[0]  # (t_c, tile, cp)
    for t in range(2 * t_c):
        lo = max((t - 1) // 2, 0)
        hi = min(t // 2 + (t & 1), t_c - 1)
        if lo == hi:  # edge-clamped taps collapse onto one plane: exact copy
            o_ref[0, t] = x[lo]
        else:
            w_hi = 0.75 if t % 2 == 0 else 0.25
            o_ref[0, t] = (
                x[lo].astype(f32) * (1.0 - w_hi) + x[hi].astype(f32) * w_hi
            ).astype(o_ref.dtype)


def _tile_for(hw: int, t_c: int, cp: int) -> int:
    tile = 512
    while tile >= 16:
        if hw % tile == 0 and 2 * (3 * t_c) * tile * cp * 2 <= _VMEM_BUDGET:
            return tile
        tile //= 2
    return 0


def eligible(spec, thw, thw_f) -> bool:
    """stride-(2,1,1) decoder skips only — the H/W-upsampling blocks' resize
    clusters are several times smaller (coarser grids) and their in-kernel
    2-D interp needs spatial halos; measured-NO territory (block.py)."""
    if not getattr(spec, "skip_upsample_on", True):
        return False
    st = tuple(int(s) for s in spec.stride_q)
    if st != (2, 1, 1):
        return False
    t_c, h, w = (int(v) for v in thw)
    if tuple(int(v) for v in thw_f) != (2 * t_c, h, w):
        return False
    cp = -(-spec.dim // 128) * 128
    return _tile_for(h * w, t_c, cp) > 0


def _hw2_kernel(x_ref, o_ref):
    """One (batch, T-plane) grid step: whole coarse plane resident, separable
    half-pixel ×2 interp on H then W in VMEM (the XLA phase-interp that lost
    as materialized HBM intermediates is free here), interleave via
    stack+reshape (strided writes lower as unsupported gathers on TPU)."""
    f32 = jnp.float32

    def up_axis(a, axis):
        # even = 0.25·prev + 0.75·a ; odd = 0.75·a + 0.25·next (edge-clamped)
        first = lax.slice_in_dim(a, 0, 1, axis=axis)
        last = lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis], axis=axis)
        prev = jnp.concatenate(
            [first, lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)], axis)
        nxt = jnp.concatenate(
            [lax.slice_in_dim(a, 1, a.shape[axis], axis=axis), last], axis)
        a32 = a.astype(f32)
        even = 0.25 * prev.astype(f32) + 0.75 * a32
        odd = 0.75 * a32 + 0.25 * nxt.astype(f32)
        inter = jnp.stack([even, odd], axis=axis + 1).astype(a.dtype)
        shape = list(a.shape)
        shape[axis] *= 2
        return inter.reshape(shape)

    plane = x_ref[0, 0]  # (Hc, Wc, C)
    xh = up_axis(plane, 0)  # (2Hc, Wc, C) bf16 — H-pass temps are coarse-sized
    # W pass in static row chunks so the fp32 temporaries stay ~1 MB (the
    # whole-(2Hc)-plane W pass measured over the 16 MB VMEM budget on paper)
    n = 4 if xh.shape[0] % 4 == 0 else 1
    step = xh.shape[0] // n
    for i in range(n):
        o_ref[0, 0, i * step:(i + 1) * step] = up_axis(
            xh[i * step:(i + 1) * step], 1)


def hw2_eligible(spec, thw, thw_f) -> bool:
    """stride-(1,2,2) decoder skips (d2/d3): whole-plane blocks, lane-aligned
    dims only (384/768 — both flagship decoder H/W blocks qualify)."""
    if not getattr(spec, "skip_upsample_on", True):
        return False
    if tuple(int(s) for s in spec.stride_q) != (1, 2, 2):
        return False
    t_c, h, w = (int(v) for v in thw)
    if tuple(int(v) for v in thw_f) != (t_c, 2 * h, 2 * w):
        return False
    c = int(spec.dim)
    if c % 128:
        return False  # in-plane lane dim must be 128-aligned (no pad fusion here)
    # whole coarse + fine plane double-buffered, plus ~4 coarse-plane-sized
    # fp32 temporaries for the H pass (the W pass is row-chunked in-kernel)
    if (2 * (h * w + 4 * h * w) * c * 2 + 4 * h * w * c * 4) > 15 * 2 ** 20:
        return False
    return h >= 8 and w >= 8


def hw2_upsample(x: jax.Array, thw, interpret: bool = False) -> jax.Array:
    """``x``: (B, L_c, C) tokens on (T, H, W) → (B, T·2H·2W, C) trilinear
    (1,2,2) upsample, bit-parity with jax.image.resize separable lowering."""
    b, l, c = x.shape
    t_c, h, w = (int(v) for v in thw)
    xg = x.reshape(b, t_c, h, w, c)
    out = pl.pallas_call(
        _hw2_kernel,
        grid=(b, t_c),
        in_specs=[pl.BlockSpec((1, 1, h, w, c), lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2 * h, 2 * w, c), lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_c, 2 * h, 2 * w, c), x.dtype),
        interpret=interpret,
    )(xg)
    return out.reshape(b, t_c * 4 * h * w, c)


def t2_upsample_padded(x: jax.Array, thw, interpret: bool = False) -> jax.Array:
    """``x``: (B, L_c, C) tokens on the coarse (T_c, H, W) grid → fine skip
    tokens (B, 2·L_c, cp) with cp = C rounded up to 128 lanes, pad lanes zero."""
    b, l, c = x.shape
    t_c, h, w = (int(v) for v in thw)
    hw = h * w
    cp = -(-c // 128) * 128
    tile = _tile_for(hw, t_c, cp)
    xp = jnp.pad(x, [(0, 0), (0, 0), (0, cp - c)]) if cp != c else x
    xg = xp.reshape(b, t_c, hw, cp)
    out = pl.pallas_call(
        functools.partial(_t2_kernel, t_c=t_c),
        grid=(b, hw // tile),
        in_specs=[pl.BlockSpec((1, t_c, tile, cp), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * t_c, tile, cp), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * t_c, hw, cp), x.dtype),
        interpret=interpret,
    )(xg)
    return out.reshape(b, 2 * t_c * hw, cp)
