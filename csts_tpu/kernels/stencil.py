"""Pallas depthwise 3-D stencil kernels (pool + transposed-conv upsample).

XLA lowers depthwise (feature_group_count == C) 3-D convolutions catastrophically on
TPU — the decoder's two big q-upsample transposed convs measured 24.5 / 27.8 ms at
batch 32 (tools/bench_ops.py), ~45% of the whole decoder, for what is bandwidth-wise
a ~1 ms op. These kernels run the stencil on the VPU with one HBM read of the input
(3 clamped T-plane views) and one write of the output.

Layout: activations (B, T, H, W, C) channels-last with C % 128 == 0 (callers pad the
lane dim; padded weight lanes are zero so padded channels stay zero). Weights
(kT, kH, kW, C) per-channel.

Supported geometry (everything the CSTS model uses — attention.py:11-49, 251-289):
kernel 3 per dim, padding k//2 = 1, pool strides {1,2,4,8}, transpose strides {1,2}
with output_padding stride-1. The dispatchers in ops/conv.py fall back to the XLA
path for anything else.

Math notes:
* pool:      out[o] = Σ_d w[d] · x[s·o + d − 1]      (dense accumulate + downsample)
* transpose: out[f] = Σ_d w[d] · x[(f + 1 − d) / s]  (terms where s divides exactly)
  For k=3, p=1, s≤2 every tap's coarse offset e = (r + 1 − d)/s lies in {−1, 0, 1},
  so three shifted T-plane views cover all cases; H/W taps come from a zero-padded
  in-VMEM plane. Spatial phases are interleaved in VMEM before the single fine write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _supported(kernel, stride, padding, transpose: bool) -> bool:
    if tuple(kernel) != (3, 3, 3) or tuple(padding) != (1, 1, 1):
        return False
    if transpose:
        return all(s in (1, 2) for s in stride)
    return all(s in (1, 2, 4, 8) for s in stride)


# ----------------------------------------------------------------------------------
# transposed conv (decoder q upsample)
# ----------------------------------------------------------------------------------


def _tconv_kernel(
    xm1_ref, x0_ref, xp1_ref, w_ref, out_ref,
    *, st: int, sh: int, sw: int, t_c: int, h_c: int, w_c: int,
):
    """One (batch, fine-T-plane, C-block) grid step.

    x views: (1, 1, H_c, W_c, 128) coarse planes m−1, m, m+1 (clamped; validity is
    re-derived here and invalid planes are zero-weighted). w: (3, 3, 3, 128).
    out: (1, 1, H_f, W_f, 128) one fine T plane."""
    f32 = jnp.float32
    t_f = pl.program_id(1)
    m = t_f // st

    views = {-1: xm1_ref, 0: x0_ref, 1: xp1_ref}

    def phase_grid(r_t, r_h, r_w, padded):
        def get_padded(et):
            # zero-pad H/W by 1 once per used view; zero the whole plane if m+et
            # is outside the coarse T range (the view index map clamped it). The
            # cache is scoped to one emit() so traced values never cross pl.when
            # sub-traces.
            if et not in padded:
                plane = views[et][0, 0].astype(f32)
                valid = jnp.logical_and(m + et >= 0, m + et < t_c)
                plane = plane * valid.astype(f32)
                padded[et] = jnp.pad(plane, ((1, 1), (1, 1), (0, 0)))
            return padded[et]

        acc = jnp.zeros((h_c, w_c, out_ref.shape[-1]), f32)
        for dt in range(3):
            if (r_t + 1 - dt) % st:
                continue
            et = (r_t + 1 - dt) // st
            for dh in range(3):
                if (r_h + 1 - dh) % sh:
                    continue
                eh = (r_h + 1 - dh) // sh
                for dw in range(3):
                    if (r_w + 1 - dw) % sw:
                        continue
                    ew = (r_w + 1 - dw) // sw
                    xp = get_padded(et)
                    win = xp[1 + eh : 1 + eh + h_c, 1 + ew : 1 + ew + w_c, :]
                    acc = acc + w_ref[dt, dh, dw].astype(f32) * win
        return acc

    def emit(r_t):
        # spatial phases, interleaved: out[sh·i+rh, sw·j+rw] = phase[rh][rw][i, j]
        padded = {}
        rows = []
        for r_h in range(sh):
            cols = [phase_grid(r_t, r_h, r_w, padded) for r_w in range(sw)]
            if sw == 1:
                row = cols[0]
            else:
                row = jnp.stack(cols, axis=2).reshape(h_c, w_c * sw, -1)
            rows.append(row)
        if sh == 1:
            full = rows[0]
        else:
            full = jnp.stack(rows, axis=1).reshape(h_c * sh, w_c * sw, -1)
        out_ref[0, 0] = full.astype(out_ref.dtype)

    if st == 1:
        emit(0)
    else:
        for r in range(st):
            @pl.when(t_f % st == r)
            def _(r=r):
                emit(r)


def depthwise_transpose3d(w, x, stride, padding, output_padding,
                          interpret: bool = False):
    """Pallas depthwise ConvTranspose3d. ``x``: (B, T, H, W, C), C % 128 == 0;
    ``w``: (3, 3, 3, 1, C) DHWIO (unflipped, torch semantics). Output spatial dims
    are exactly ``s·d`` per dim (k=3, p=1, op=s−1)."""
    b, t_c, h_c, w_c, c = x.shape
    st, sh, sw = (int(s) for s in stride)
    t_f, h_f, w_f = t_c * st, h_c * sh, w_c * sw

    wk = w.reshape(3, 3, 3, c).astype(x.dtype)

    kernel = functools.partial(
        _tconv_kernel, st=st, sh=sh, sw=sw, t_c=t_c, h_c=h_c, w_c=w_c
    )

    def view(e):
        return pl.BlockSpec(
            (1, 1, h_c, w_c, 128),
            lambda i, j, k_, e=e: (
                i, jnp.clip(j // st + e, 0, t_c - 1), 0, 0, k_,
            ),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(b, t_f, c // 128),
        in_specs=[
            view(-1), view(0), view(1),
            pl.BlockSpec((3, 3, 3, 128), lambda i, j, k_: (0, 0, 0, k_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h_f, w_f, 128), lambda i, j, k_: (i, j, 0, 0, k_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_f, h_f, w_f, c), x.dtype),
        interpret=interpret,
    )(x, x, x, wk)


# ----------------------------------------------------------------------------------
# strided pool conv (encoder q/k/v pooling)
# ----------------------------------------------------------------------------------


def _pool_kernel(
    xm1_ref, x0_ref, xp1_ref, w_ref, out_ref,
    *, st: int, sh: int, sw: int, t_c: int, h_c: int, w_c: int,
    h_o: int, w_o: int,
):
    """One (batch, out-T-plane, C-block) grid step. Views are coarse planes
    t_o·st − 1 + δ (clamped). Dense spatial stencil then stride-downsample."""
    f32 = jnp.float32
    t_o = pl.program_id(1)
    base = t_o * st - 1  # first T tap (dt = 0)

    acc = jnp.zeros((h_c, w_c, out_ref.shape[-1]), f32)
    for dt, ref in enumerate((xm1_ref, x0_ref, xp1_ref)):
        t_src = base + dt
        valid = jnp.logical_and(t_src >= 0, t_src < t_c)
        plane = ref[0, 0].astype(f32) * valid.astype(f32)
        xp = jnp.pad(plane, ((1, 1), (1, 1), (0, 0)))
        for dh in range(3):
            for dw in range(3):
                win = xp[dh : dh + h_c, dw : dw + w_c, :]
                acc = acc + w_ref[dt, dh, dw].astype(f32) * win

    # out[io, jo] = dense[io·sh, jo·sw]
    if sh > 1 or sw > 1:
        acc = acc[: h_o * sh, : w_o * sw, :]
        acc = acc.reshape(h_o, sh, w_o, sw, -1)[:, 0, :, 0, :]
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def depthwise_pool3d(w, x, stride, padding, interpret: bool = False):
    """Pallas depthwise strided conv (k=3, p=1). ``x``: (B, T, H, W, C), C%128==0;
    ``w``: (3, 3, 3, 1, C). Output dims: (d + 2 − 3)//s + 1."""
    b, t_c, h_c, w_c, c = x.shape
    st, sh, sw = (int(s) for s in stride)
    t_o = (t_c - 1) // st + 1
    h_o = (h_c - 1) // sh + 1
    w_o = (w_c - 1) // sw + 1

    wk = w.reshape(3, 3, 3, c).astype(x.dtype)
    kernel = functools.partial(
        _pool_kernel, st=st, sh=sh, sw=sw, t_c=t_c, h_c=h_c, w_c=w_c,
        h_o=h_o, w_o=w_o,
    )

    def view(dt):
        return pl.BlockSpec(
            (1, 1, h_c, w_c, 128),
            lambda i, j, k_, dt=dt: (
                i, jnp.clip(j * st - 1 + dt, 0, t_c - 1), 0, 0, k_,
            ),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(b, t_o, c // 128),
        in_specs=[
            view(0), view(1), view(2),
            pl.BlockSpec((3, 3, 3, 128), lambda i, j, k_: (0, 0, 0, k_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h_o, w_o, 128), lambda i, j, k_: (i, j, 0, 0, k_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_o, h_o, w_o, c), x.dtype),
        interpret=interpret,
    )(x, x, x, wk)
