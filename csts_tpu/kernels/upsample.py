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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# On-chip A/B via tools/ab_flags.py ('t2_skip'). Default ON pending the
# measured full-forward delta; the composite XLA resize path remains the
# fallback whenever eligibility fails (and always off-TPU / in training).
T2_SKIP_KERNEL = True

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
