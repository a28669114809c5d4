"""Fused transformer-block kernel (Pallas, TPU) for non-Q-pooling MViT blocks.

XLA cost analysis shows the CSTS forward is HBM-bound (≈23 flop/byte vs the v5e
ridge ≈240): every block materializes ~a dozen full-width activation tensors
(LN casts, qkv, per-head reshapes, attention probs, MLP hidden, residuals). This
kernel computes an ENTIRE block — LN1 → Q projection → attention against
precomputed pooled K/V → output projection → residual → LN2 → MLP (+ dim-change
projection) → residual — per 512-token tile with everything resident in VMEM.
HBM traffic per tile drops to: read x once, read the (tiny) pooled K/V and weights,
write the output once.

Eligibility (checked by :func:`eligible`): blocks whose residual skip is identity —
no Q-pooling (attention.py:234-241 reduces to identity when stride_q is empty),
no mask, deterministic or drop_path == 0. That covers 13 of 16 video blocks, audio
block 0, and the stage-2/3 workhorses where the bytes are. K/V pooling (a strided
depthwise conv needing cross-tile halos) and the Q-pool stage-transition blocks
stay on the XLA composite path.

Padding strategy: the lane dim must be 128-aligned, so channels are padded with
ZERO weights/params — zeros flow through LN (statistics divide by the REAL width),
matmuls, GELU and softmax contributions without affecting real lanes (tested).

Backward: custom VJP recomputing through the XLA composite block (rematerialized —
same memory story as flash attention).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf, |error| ≤ 1.5e-7 (fp32-exact).
    Mosaic implements neither the erf nor erfc primitives."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def eligible(spec, mask, deterministic: bool) -> bool:
    """Can this block run through the fused kernel?"""
    return (
        spec.fused
        and not spec.upsample_q
        and not spec.pool_q_on
        and not spec.skip_pool_on
        and not spec.has_cls
        and mask is None
        and deterministic  # inference-only: the recompute VJP loses to stored residuals
        and spec.dim % spec.num_heads == 0
        # Measured on-chip (tools/ab_block.py, batch 32 bf16, vs composite+fused
        # attention+fused tail). Round 2 re-measure: 1 head d96 1.25-1.26x,
        # 2 heads d192 1.24-1.32x WIN; 4-head d384 loses 2.6x; 8-head d768 now
        # loses too (loop 0.84x, hg 0.65x — the round-1 1.07x predates the
        # faster composite) — so only the 1-2 head blocks dispatch.
        and spec.num_heads <= 2
    )


def _pad_last(a, target):
    pad = target - a.shape[-1]
    if pad == 0:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])


def _block_kernel(
    x_ref, k_ref, v_ref,
    ln1s_ref, ln1b_ref, wq_ref, bq_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    wres_ref, bres_ref,
    out_ref,
    *, heads: int, hd_p: int, c_real: int, scale: float, has_res_proj: bool,
):
    """One (batch, token-tile) grid step. Shapes (padded):
    x (TILE, Cp) · k/v (heads, Lk, hd_p) · wq (Cp, heads*hd_p) · wproj (heads*hd_p, Cp)
    · wfc1 (Cp, HIDp) · wfc2 (HIDp, Cop) · wres (Cp, Cop) · out (TILE, Cop)."""
    f32 = jnp.float32
    x = x_ref[:].astype(f32)

    # LN1 — statistics over the REAL channel count (padded lanes are zero)
    mean = jnp.sum(x, axis=-1, keepdims=True) / c_real
    var = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / c_real - jnp.square(mean)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * ln1s_ref[:].astype(f32) + ln1b_ref[:].astype(f32)  # pads: scale 0 → 0
    xn16 = xn.astype(x_ref.dtype)

    # Q projection for all heads at once: (TILE, heads*hd_p)
    q = jnp.dot(xn16, wq_ref[:], preferred_element_type=f32) + bq_ref[:].astype(f32)

    # attention per head, probabilities resident in VMEM
    av_parts = []
    for h in range(heads):
        qh = q[:, h * hd_p : (h + 1) * hd_p].astype(x_ref.dtype)
        kh = k_ref[h]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        avh = jnp.dot(p.astype(x_ref.dtype), v_ref[h], preferred_element_type=f32)
        av_parts.append(avh)
    av = av_parts[0] if heads == 1 else jnp.concatenate(av_parts, axis=-1)

    attn_out = (
        jnp.dot(av.astype(x_ref.dtype), wproj_ref[:], preferred_element_type=f32)
        + bproj_ref[:].astype(f32)
    )
    res1 = x + attn_out  # identity skip (no Q-pool by eligibility)

    # LN2
    mean2 = jnp.sum(res1, axis=-1, keepdims=True) / c_real
    var2 = jnp.sum(jnp.square(res1), axis=-1, keepdims=True) / c_real - jnp.square(mean2)
    xn2 = (res1 - mean2) * jax.lax.rsqrt(var2 + 1e-6)
    xn2 = xn2 * ln2s_ref[:].astype(f32) + ln2b_ref[:].astype(f32)
    xn2_16 = xn2.astype(x_ref.dtype)

    hid = jnp.dot(xn2_16, wfc1_ref[:], preferred_element_type=f32) + bfc1_ref[:].astype(f32)
    # exact GELU via the polynomial erf (Mosaic lacks the erf/erfc primitives)
    hid = 0.5 * hid * (1.0 + _erf(hid * np.float32(1.0 / np.sqrt(2.0))))
    mlp = (
        jnp.dot(hid.astype(x_ref.dtype), wfc2_ref[:], preferred_element_type=f32)
        + bfc2_ref[:].astype(f32)
    )

    if has_res_proj:
        base = (
            jnp.dot(xn2_16, wres_ref[:], preferred_element_type=f32)
            + bres_ref[:].astype(f32)
        )
    else:
        base = res1
    out_ref[:] = (base + mlp).astype(out_ref.dtype)


def _pick_tile(l: int) -> int:
    for t in (512, 256, 128):
        if l % t == 0:
            return t
    return l


def _prep_operands(p: dict, spec, k, v):
    """Pad params/K/V to Mosaic-aligned shapes. Returns (operands, meta)."""
    c = spec.dim
    c_out = spec.dim_out
    heads = spec.num_heads
    hd = spec.head_dim
    hidden = int(spec.dim * spec.mlp_ratio)

    cp = _round_up(c, 128)
    cop = _round_up(c_out, 128)
    hd_p = _round_up(hd, 128)
    hid_p = _round_up(hidden, 128)

    dt = k.dtype
    # qkv weight (C, 3C): q slice reshaped (C, heads, hd) -> padded (Cp, heads*hd_p)
    wqkv = p["attn"]["qkv"]["w"]
    wq = wqkv[:, :c].reshape(c, heads, hd)
    wq = jnp.pad(wq, [(0, cp - c), (0, 0), (0, hd_p - hd)]).reshape(cp, heads * hd_p)
    bq_full = p["attn"]["qkv"].get("b")
    bq = bq_full[:c].reshape(heads, hd) if bq_full is not None else jnp.zeros((heads, hd))
    bq = jnp.pad(bq, [(0, 0), (0, hd_p - hd)]).reshape(1, heads * hd_p)

    wproj = p["attn"]["proj"]["w"].reshape(heads, hd, c)
    wproj = jnp.pad(wproj, [(0, 0), (0, hd_p - hd), (0, cp - c)]).reshape(heads * hd_p, cp)
    bproj = jnp.pad(p["attn"]["proj"]["b"], (0, cp - c)).reshape(1, cp)

    ln1s = jnp.pad(p["norm1"]["scale"], (0, cp - c)).reshape(1, cp)
    ln1b = jnp.pad(p["norm1"]["bias"], (0, cp - c)).reshape(1, cp)
    ln2s = jnp.pad(p["norm2"]["scale"], (0, cp - c)).reshape(1, cp)
    ln2b = jnp.pad(p["norm2"]["bias"], (0, cp - c)).reshape(1, cp)

    wfc1 = jnp.pad(p["mlp"]["fc1"]["w"], [(0, cp - c), (0, hid_p - hidden)])
    bfc1 = jnp.pad(p["mlp"]["fc1"]["b"], (0, hid_p - hidden)).reshape(1, hid_p)
    wfc2 = jnp.pad(p["mlp"]["fc2"]["w"], [(0, hid_p - hidden), (0, cop - c_out)])
    bfc2 = jnp.pad(p["mlp"]["fc2"]["b"], (0, cop - c_out)).reshape(1, cop)

    if c != c_out:
        wres = jnp.pad(p["proj"]["w"], [(0, cp - c), (0, cop - c_out)])
        bres = jnp.pad(p["proj"]["b"], (0, cop - c_out)).reshape(1, cop)
        has_res = True
    else:
        wres = jnp.zeros((cp, cop), dt)
        bres = jnp.zeros((1, cop), dt)
        has_res = False

    kp = _pad_last(k, hd_p)
    vp = _pad_last(v, hd_p)

    weights = [w.astype(dt) for w in (
        ln1s, ln1b, wq, bq, wproj, bproj, ln2s, ln2b, wfc1, bfc1, wfc2, bfc2, wres, bres
    )]
    meta = dict(cp=cp, cop=cop, hd_p=hd_p, heads=heads, has_res=has_res)
    return kp, vp, weights, meta


def _fused_block_impl(x, k, v, p, spec, interpret: bool):
    b, l, c = x.shape
    tile = _pick_tile(l)
    kp, vp, weights, meta = _prep_operands(p, spec, k, v)
    cp, cop, hd_p, heads = meta["cp"], meta["cop"], meta["hd_p"], meta["heads"]
    lk = kp.shape[2]

    xp = _pad_last(x, cp)

    kernel = functools.partial(
        _block_kernel,
        heads=heads, hd_p=hd_p, c_real=c, scale=float(spec.scale),
        has_res_proj=meta["has_res"],
    )

    def idx_x(i, j):
        return (i, j, 0)

    in_specs = [
        pl.BlockSpec((1, tile, cp), idx_x, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, lk, hd_p), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, lk, hd_p), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    # weights: full arrays, same for every grid step
    for w in weights:
        nd = w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i, j, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)
        )

    def wrapped(*refs):
        x_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        wrefs = refs[3:-1]
        out_ref = refs[-1]
        kernel(x_ref.at[0], k_ref.at[0], v_ref.at[0], *wrefs, out_ref.at[0])

    out = pl.pallas_call(
        wrapped,
        grid=(b, l // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, cop), idx_x, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, cop), x.dtype),
        interpret=interpret,
    )(xp, kp, vp, *weights)
    return out[..., : spec.dim_out]


# ----------------------------------------------------------------------------------
# Head-grid block kernel: grid (batch, token-tile, head) with heads innermost.
#
# The round-1 kernel ran a per-head Python loop inside one grid step; at 4-8 heads
# the concatenate of per-head outputs forced Mosaic relayouts and the loop kept the
# whole K/V of every head resident. This variant exploits the algebra
#     attn_out = bias + Σ_h softmax(q_h k_hᵀ) v_h @ W_proj[h]
# — the output projection is a SUM over heads, so each head can be one grid step
# that accumulates (TILE, C) into a VMEM scratch. LN1 runs once at h==0 (cached in
# scratch); the residual + LN2 + MLP tail runs at the last head. Per-step VMEM holds
# ONE head's K/V and weight slices (Mosaic double-buffers them across steps), which
# is what lets the kernel reach the 8-head dim-768 blocks.
# ----------------------------------------------------------------------------------


def _block_hg_kernel(
    x_ref, k_ref, v_ref,
    ln1s_ref, ln1b_ref, wq_ref, bq_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    wres_ref, bres_ref,
    out_ref,
    xn_scr, acc_scr,
    *, heads: int, c_real: int, scale: float, has_res_proj: bool,
):
    """One (batch, token-tile, head) grid step. Shapes (padded):
    x (1, TILE, Cp) · k/v (1, 1, Lk, hd_p) · wq (1, Cp, hd_p) · bq (1, 1, hd_p) ·
    wproj (1, hd_p, Cp) · wfc1 (Cp, HIDp) · wfc2 (HIDp, Cop) · out (1, TILE, Cop) ·
    scratch xn (TILE, Cp) input-dtype, acc (TILE, Cp) fp32."""
    f32 = jnp.float32
    h = pl.program_id(2)

    @pl.when(h == 0)
    def _():
        x = x_ref[0].astype(f32)
        mean = jnp.sum(x, axis=-1, keepdims=True) / c_real
        var = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / c_real - jnp.square(mean)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
        xn = xn * ln1s_ref[:].astype(f32) + ln1b_ref[:].astype(f32)
        xn_scr[:] = xn.astype(xn_scr.dtype)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    xn16 = xn_scr[:]
    qh = jnp.dot(xn16, wq_ref[0], preferred_element_type=f32) + bq_ref[0].astype(f32)
    logits = jax.lax.dot_general(
        qh.astype(xn16.dtype), k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    av = jnp.dot(p.astype(xn16.dtype), v_ref[0, 0], preferred_element_type=f32)
    acc_scr[:] += jnp.dot(av.astype(xn16.dtype), wproj_ref[0], preferred_element_type=f32)

    @pl.when(h == heads - 1)
    def _():
        res1 = x_ref[0].astype(f32) + acc_scr[:] + bproj_ref[:].astype(f32)
        mean2 = jnp.sum(res1, axis=-1, keepdims=True) / c_real
        var2 = jnp.sum(jnp.square(res1), axis=-1, keepdims=True) / c_real - jnp.square(mean2)
        xn2 = (res1 - mean2) * jax.lax.rsqrt(var2 + 1e-6)
        xn2 = xn2 * ln2s_ref[:].astype(f32) + ln2b_ref[:].astype(f32)
        xn2_16 = xn2.astype(xn16.dtype)
        hid = jnp.dot(xn2_16, wfc1_ref[:], preferred_element_type=f32) + bfc1_ref[:].astype(f32)
        hid = 0.5 * hid * (1.0 + _erf(hid * np.float32(1.0 / np.sqrt(2.0))))
        mlp = (
            jnp.dot(hid.astype(xn16.dtype), wfc2_ref[:], preferred_element_type=f32)
            + bfc2_ref[:].astype(f32)
        )
        if has_res_proj:
            base = (
                jnp.dot(xn2_16, wres_ref[:], preferred_element_type=f32)
                + bres_ref[:].astype(f32)
            )
        else:
            base = res1
        out_ref[0] = (base + mlp).astype(out_ref.dtype)


def _prep_operands_hg(p: dict, spec, k, v):
    """Pad params/K/V to Mosaic-aligned, head-major layouts for the head-grid kernel."""
    c = spec.dim
    c_out = spec.dim_out
    heads = spec.num_heads
    hd = spec.head_dim
    hidden = int(spec.dim * spec.mlp_ratio)

    cp = _round_up(c, 128)
    cop = _round_up(c_out, 128)
    hd_p = _round_up(hd, 128)
    hid_p = _round_up(hidden, 128)

    dt = k.dtype
    wqkv = p["attn"]["qkv"]["w"]
    wq = wqkv[:, :c].reshape(c, heads, hd)
    wq = jnp.pad(wq, [(0, cp - c), (0, 0), (0, hd_p - hd)]).transpose(1, 0, 2)  # (heads, Cp, hd_p)
    bq_full = p["attn"]["qkv"].get("b")
    bq = bq_full[:c].reshape(heads, hd) if bq_full is not None else jnp.zeros((heads, hd))
    bq = jnp.pad(bq, [(0, 0), (0, hd_p - hd)]).reshape(heads, 1, hd_p)

    wproj = p["attn"]["proj"]["w"].reshape(heads, hd, c)
    wproj = jnp.pad(wproj, [(0, 0), (0, hd_p - hd), (0, cp - c)])  # (heads, hd_p, Cp)
    bproj = jnp.pad(p["attn"]["proj"]["b"], (0, cp - c)).reshape(1, cp)

    ln1s = jnp.pad(p["norm1"]["scale"], (0, cp - c)).reshape(1, cp)
    ln1b = jnp.pad(p["norm1"]["bias"], (0, cp - c)).reshape(1, cp)
    ln2s = jnp.pad(p["norm2"]["scale"], (0, cp - c)).reshape(1, cp)
    ln2b = jnp.pad(p["norm2"]["bias"], (0, cp - c)).reshape(1, cp)

    wfc1 = jnp.pad(p["mlp"]["fc1"]["w"], [(0, cp - c), (0, hid_p - hidden)])
    bfc1 = jnp.pad(p["mlp"]["fc1"]["b"], (0, hid_p - hidden)).reshape(1, hid_p)
    wfc2 = jnp.pad(p["mlp"]["fc2"]["w"], [(0, hid_p - hidden), (0, cop - c_out)])
    bfc2 = jnp.pad(p["mlp"]["fc2"]["b"], (0, cop - c_out)).reshape(1, cop)

    if c != c_out:
        wres = jnp.pad(p["proj"]["w"], [(0, cp - c), (0, cop - c_out)])
        bres = jnp.pad(p["proj"]["b"], (0, cop - c_out)).reshape(1, cop)
        has_res = True
    else:
        wres = jnp.zeros((cp, cop), dt)
        bres = jnp.zeros((1, cop), dt)
        has_res = False

    kp = _pad_last(k, hd_p)
    vp = _pad_last(v, hd_p)

    weights = [w.astype(dt) for w in (
        ln1s, ln1b, wq, bq, wproj, bproj, ln2s, ln2b, wfc1, bfc1, wfc2, bfc2, wres, bres
    )]
    meta = dict(cp=cp, cop=cop, hd_p=hd_p, heads=heads, has_res=has_res)
    return kp, vp, weights, meta


def _fused_block_hg_impl(x, k, v, p, spec, interpret: bool):
    b, l, c = x.shape
    tile = _pick_tile(l)
    if spec.dim > 384:
        # VMEM: the fp32 MLP hidden tile (TILE, 4·dim) + resident fc weights
        tile = min(tile, 256)
        while l % tile:
            tile //= 2
    kp, vp, weights, meta = _prep_operands_hg(p, spec, k, v)
    cp, cop, hd_p, heads = meta["cp"], meta["cop"], meta["hd_p"], meta["heads"]
    lk = kp.shape[2]

    xp = _pad_last(x, cp)

    kernel = functools.partial(
        _block_hg_kernel,
        heads=heads, c_real=c, scale=float(spec.scale),
        has_res_proj=meta["has_res"],
    )

    # index maps take the full (i, j, h) grid position
    in_specs = [
        pl.BlockSpec((1, tile, cp), lambda i, j, h: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, hd_p), lambda i, j, h: (i, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, hd_p), lambda i, j, h: (i, h, 0, 0), memory_space=pltpu.VMEM),
    ]
    # weight specs: per-head slices for wq/bq/wproj, full residency for the rest
    per_head = {2, 3, 4}  # indices into `weights` of wq, bq, wproj
    for wi, w in enumerate(weights):
        if wi in per_head:
            blk = (1,) + w.shape[1:]
            in_specs.append(
                pl.BlockSpec(blk, lambda i, j, h, n=len(blk) - 1: (h,) + (0,) * n,
                             memory_space=pltpu.VMEM)
            )
        else:
            nd = w.ndim
            in_specs.append(
                pl.BlockSpec(w.shape, lambda i, j, h, nd=nd: (0,) * nd,
                             memory_space=pltpu.VMEM)
            )

    out = pl.pallas_call(
        kernel,
        grid=(b, l // tile, heads),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, cop), lambda i, j, h: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, cop), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, cp), x.dtype),
            pltpu.VMEM((tile, cp), jnp.float32),
        ],
        interpret=interpret,
    )(xp, kp, vp, *weights)
    return out[..., : spec.dim_out]


def _block_bd_kernel(
    x_ref, kbd_ref, vbd_ref,
    ln1s_ref, ln1b_ref, wq_ref, bq_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    wres_ref, bres_ref,
    out_ref,
    *, heads: int, lk: int, c_real: int, scale: float, has_res_proj: bool,
):
    """One (batch, token-tile) grid step; ALL heads' attention as two
    block-diagonal matmuls. kbd (heads·hd_p, heads·lk) / vbd (heads·lk,
    heads·hd_p) are block-diagonal, so ``logits = q·kbd`` has column block h
    equal to q_h·K_hᵀ and ``av = P·vbd`` has column block h equal to P_h·V_h —
    one MXU-shaped matmul each instead of ``heads`` small ones (the per-head
    loop and head-grid variants both measured slower at 4 heads). The off-block
    zeros waste heads× FLOPs on the attention matmuls — cheap next to the MLP
    at these shapes. Softmax runs per 128-aligned lane segment."""
    f32 = jnp.float32
    x = x_ref[0].astype(f32)
    mean = jnp.sum(x, axis=-1, keepdims=True) / c_real
    var = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / c_real - jnp.square(mean)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * ln1s_ref[:].astype(f32) + ln1b_ref[:].astype(f32)
    xn16 = xn.astype(x_ref.dtype)

    q = (
        jnp.dot(xn16, wq_ref[:], preferred_element_type=f32) + bq_ref[:].astype(f32)
    ).astype(x_ref.dtype)
    logits = jnp.dot(q, kbd_ref[0], preferred_element_type=f32) * scale
    segs = []
    for h in range(heads):
        seg = logits[:, h * lk : (h + 1) * lk]
        m = jnp.max(seg, axis=-1, keepdims=True)
        pseg = jnp.exp(seg - m)
        segs.append(pseg / jnp.sum(pseg, axis=-1, keepdims=True))
    p_all = segs[0] if heads == 1 else jnp.concatenate(segs, axis=-1)
    av = jnp.dot(p_all.astype(x_ref.dtype), vbd_ref[0], preferred_element_type=f32)
    attn_out = (
        jnp.dot(av.astype(x_ref.dtype), wproj_ref[:], preferred_element_type=f32)
        + bproj_ref[:].astype(f32)
    )
    res1 = x + attn_out

    mean2 = jnp.sum(res1, axis=-1, keepdims=True) / c_real
    var2 = jnp.sum(jnp.square(res1), axis=-1, keepdims=True) / c_real - jnp.square(mean2)
    xn2 = (res1 - mean2) * jax.lax.rsqrt(var2 + 1e-6)
    xn2 = xn2 * ln2s_ref[:].astype(f32) + ln2b_ref[:].astype(f32)
    xn2_16 = xn2.astype(x_ref.dtype)
    # MLP chunked over the hidden dim to stay inside the VMEM stack next to the
    # fp32 logits/probability tiles
    hid_p = wfc1_ref.shape[1]
    step = min(hid_p, 768)
    mlp = jnp.zeros((res1.shape[0], out_ref.shape[-1]), f32) + bfc2_ref[:].astype(f32)
    for s in range(0, hid_p, step):
        pre = (
            jnp.dot(xn2_16, wfc1_ref[:, s : s + step], preferred_element_type=f32)
            + bfc1_ref[:, s : s + step].astype(f32)
        )
        act = 0.5 * pre * (1.0 + _erf(pre * np.float32(1.0 / np.sqrt(2.0))))
        mlp = mlp + jnp.dot(
            act.astype(x_ref.dtype), wfc2_ref[s : s + step, :], preferred_element_type=f32
        )
    if has_res_proj:
        base = (
            jnp.dot(xn2_16, wres_ref[:], preferred_element_type=f32)
            + bres_ref[:].astype(f32)
        )
    else:
        base = res1
    out_ref[0] = (base + mlp).astype(out_ref.dtype)


def _fused_block_bd_impl(x, k, v, p, spec, interpret: bool):
    """Block-diagonal-heads variant (heads ∈ {3..8}, lk 128-aligned)."""
    b, l, c = x.shape
    tile = _pick_tile(l)
    kp, vp, weights, meta = _prep_operands(p, spec, k, v)
    cp, cop, hd_p, heads = meta["cp"], meta["cop"], meta["hd_p"], meta["heads"]
    lk = kp.shape[2]
    assert lk % 128 == 0, (lk, "bd variant requires lane-aligned Lk segments")

    # block-diagonal K/V, built once per forward in XLA (heads is small+static)
    kbd = jnp.zeros((b, heads * hd_p, heads * lk), kp.dtype)
    vbd = jnp.zeros((b, heads * lk, heads * hd_p), vp.dtype)
    for h in range(heads):
        kbd = kbd.at[:, h * hd_p : (h + 1) * hd_p, h * lk : (h + 1) * lk].set(
            kp[:, h].transpose(0, 2, 1)
        )
        vbd = vbd.at[:, h * lk : (h + 1) * lk, h * hd_p : (h + 1) * hd_p].set(vp[:, h])

    xp = _pad_last(x, cp)
    kernel = functools.partial(
        _block_bd_kernel,
        heads=heads, lk=lk, c_real=c, scale=float(spec.scale),
        has_res_proj=meta["has_res"],
    )
    in_specs = [
        pl.BlockSpec((1, tile, cp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads * hd_p, heads * lk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads * lk, heads * hd_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    for w in weights:
        nd = w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i, j, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        kernel,
        grid=(b, l // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, cop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, cop), x.dtype),
        interpret=interpret,
    )(xp, kbd, vbd, *weights)
    return out[..., : spec.dim_out]


def _composite_block(x, k, v, p, spec):
    """XLA reference path (used for the recompute backward); mirrors
    models/mvit.multiscale_block_apply for the eligible (identity-skip) case."""
    from csts_tpu import ops
    from csts_tpu.models import mvit

    xn = ops.layer_norm(p["norm1"], x)
    qkv = ops.linear_apply(p["attn"]["qkv"], xn)
    b, l, _ = qkv.shape
    q = qkv[..., : spec.dim].reshape(b, l, spec.num_heads, spec.head_dim).transpose(0, 2, 1, 3)
    out, _ = mvit._attention_core(q, k, v, spec.scale, None, fused=False)
    attn_out = ops.linear_apply(p["attn"]["proj"], mvit._merge_heads(out))
    res1 = x + attn_out
    xn2 = ops.layer_norm(p["norm2"], res1)
    mlp = ops.mlp_apply(p["mlp"], xn2)
    base = ops.linear_apply(p["proj"], xn2) if spec.dim != spec.dim_out else res1
    return base + mlp


def _dispatch_impl(x, k, v, p, spec, interpret, variant):
    if variant == "loop" or (variant == "auto" and spec.num_heads <= 2):
        # single-grid-step kernel with an unrolled head loop — wins at 1-2 heads
        # where the loop is short and K/V residency is cheap (measured round 1)
        return _fused_block_impl(x, k, v, p, spec, interpret)
    if variant == "bd" or (
        variant == "auto" and spec.num_heads > 2 and k.shape[2] % 128 == 0
    ):
        return _fused_block_bd_impl(x, k, v, p, spec, interpret)
    return _fused_block_hg_impl(x, k, v, p, spec, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_block(x, k, v, p, spec, interpret, variant):
    return _dispatch_impl(x, k, v, p, spec, interpret, variant)


def _fwd(x, k, v, p, spec, interpret, variant):
    return _dispatch_impl(x, k, v, p, spec, interpret, variant), (x, k, v, p)


def _bwd(spec, interpret, variant, residuals, g):
    x, k, v, p = residuals
    _, vjp = jax.vjp(lambda x_, k_, v_, p_: _composite_block(x_, k_, v_, p_, spec), x, k, v, p)
    return vjp(g)


_fused_block.defvjp(_fwd, _bwd)


def fused_block(x, k_pooled, v_pooled, params, spec, interpret: bool = False,
                variant: str = "auto"):
    """Run an eligible block through the fused kernel.

    x: (B, L, C) tokens; k/v_pooled: (B, H, Lk, hd) already pooled+normed.
    ``variant``: "auto" (head-count dispatch), "loop" (single-step unrolled heads),
    or "hg" (head-grid accumulation). Returns (B, L, dim_out)."""
    return _fused_block(x, k_pooled, v_pooled, params, spec, interpret, variant)


# ----------------------------------------------------------------------------------
# Fused MLP tail: LN2 → MLP (+ dim-change proj) → residual.
# Covers the second half of EVERY block — including the Q-pool/upsample blocks and
# the decoder, whose attention stays on the composite path.
# ----------------------------------------------------------------------------------


def _mlp_tail_kernel(
    x_ref, ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    wres_ref, bres_ref, out_ref,
    *, c_real: int, has_res_proj: bool,
):
    f32 = jnp.float32
    x = x_ref[:].astype(f32)
    mean = jnp.sum(x, axis=-1, keepdims=True) / c_real
    var = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / c_real - jnp.square(mean)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * ln2s_ref[:].astype(f32) + ln2b_ref[:].astype(f32)
    xn16 = xn.astype(x_ref.dtype)
    hid = jnp.dot(xn16, wfc1_ref[:], preferred_element_type=f32) + bfc1_ref[:].astype(f32)
    hid = 0.5 * hid * (1.0 + _erf(hid * np.float32(1.0 / np.sqrt(2.0))))
    mlp = (
        jnp.dot(hid.astype(x_ref.dtype), wfc2_ref[:], preferred_element_type=f32)
        + bfc2_ref[:].astype(f32)
    )
    if has_res_proj:
        base = jnp.dot(xn16, wres_ref[:], preferred_element_type=f32) + bres_ref[:].astype(f32)
    else:
        base = x
    out_ref[:] = (base + mlp).astype(out_ref.dtype)


def _prep_tail_weights(p: dict, spec, dt):
    c, c_out = spec.dim, spec.dim_out
    hidden = int((spec.dim_out if spec.upsample_q else spec.dim) * spec.mlp_ratio)
    cp, cop, hid_p = _round_up(c, 128), _round_up(c_out, 128), _round_up(hidden, 128)
    ln2s = jnp.pad(p["norm2"]["scale"], (0, cp - c)).reshape(1, cp)
    ln2b = jnp.pad(p["norm2"]["bias"], (0, cp - c)).reshape(1, cp)
    wfc1 = jnp.pad(p["mlp"]["fc1"]["w"], [(0, cp - c), (0, hid_p - hidden)])
    bfc1 = jnp.pad(p["mlp"]["fc1"]["b"], (0, hid_p - hidden)).reshape(1, hid_p)
    wfc2 = jnp.pad(p["mlp"]["fc2"]["w"], [(0, hid_p - hidden), (0, cop - c_out)])
    bfc2 = jnp.pad(p["mlp"]["fc2"]["b"], (0, cop - c_out)).reshape(1, cop)
    if c != c_out:
        wres = jnp.pad(p["proj"]["w"], [(0, cp - c), (0, cop - c_out)])
        bres = jnp.pad(p["proj"]["b"], (0, cop - c_out)).reshape(1, cop)
        has_res = True
    else:
        wres = jnp.zeros((cp, cop), dt)
        bres = jnp.zeros((1, cop), dt)
        has_res = False
    ws = [w.astype(dt) for w in (ln2s, ln2b, wfc1, bfc1, wfc2, bfc2, wres, bres)]
    return ws, cp, cop, has_res


def _mlp_tail_impl(x, p, spec, interpret: bool):
    b, l, c = x.shape
    tile = _pick_tile(l)
    if spec.dim > 384 or spec.dim_out > 384:
        # VMEM budget: the fp32 hidden tile (TILE, 4·dim) plus ~9 MB of weights
        tile = min(tile, 256)
        while l % tile:
            tile //= 2
    ws, cp, cop, has_res = _prep_tail_weights(p, spec, x.dtype)
    xp = _pad_last(x, cp)
    kernel = functools.partial(_mlp_tail_kernel, c_real=c, has_res_proj=has_res)

    in_specs = [pl.BlockSpec((1, tile, cp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)]
    for w in ws:
        nd = w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i, j, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)
        )

    def wrapped(*refs):
        kernel(refs[0].at[0], *refs[1:-1], refs[-1].at[0])

    out = pl.pallas_call(
        wrapped,
        grid=(b, l // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, cop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, cop), x.dtype),
        interpret=interpret,
    )(xp, *ws)
    return out[..., : spec.dim_out]


def _composite_tail(x, p, spec):
    from csts_tpu import ops

    xn2 = ops.layer_norm(p["norm2"], x)
    mlp = ops.mlp_apply(p["mlp"], xn2)
    base = ops.linear_apply(p["proj"], xn2) if spec.dim != spec.dim_out else x
    return base + mlp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _mlp_tail(x, p, spec, interpret):
    return _mlp_tail_impl(x, p, spec, interpret)


def _tail_fwd(x, p, spec, interpret):
    return _mlp_tail_impl(x, p, spec, interpret), (x, p)


def _tail_bwd(spec, interpret, residuals, g):
    x, p = residuals
    _, vjp = jax.vjp(lambda x_, p_: _composite_tail(x_, p_, spec), x, p)
    return vjp(g)


_mlp_tail.defvjp(_tail_fwd, _tail_bwd)


def tail_eligible(spec, deterministic: bool, l: int) -> bool:
    """LN2+MLP+proj+residual fusion applies to any block once the residual input is
    formed, as long as stochastic depth is inactive and tiles align."""
    return (
        spec.fused
        and deterministic  # inference-only (see eligible())
        and l % 128 == 0
        and spec.dim <= 768
    )


def fused_mlp_tail(x, params, spec, interpret: bool = False):
    """x: (B, L, C) residual-complete attention output. Returns (B, L, dim_out)."""
    return _mlp_tail(x, params, spec, interpret)


# ----------------------------------------------------------------------------------
# Decoder block kernel: the decoder is ~44% of the measured forward (138.9 of 278.7 ms
# at batch 32 bf16) because every sub-op makes a full HBM pass over FINE-resolution
# tensors (up to 32k tokens) in alternating head-major/token-major layouts. This
# kernel consumes the upsampled Q directly in TOKEN-major grid layout (heads are
# 128-lane-padded channel slots, so a (batch, tile, head) grid step reads one aligned
# (TILE, 128) slice), and per tile computes: per-head q-LayerNorm (pool-norm eps 1e-5)
# → attention against the tiny pooled K/V (all decoder blocks pool KV to 64 tokens)
# → output projection accumulated over head steps → trilinear-skip residual → LN2 →
# MLP (+ dim-change projection) → residual. XLA's fine-resolution work collapses to
# ONE subpixel transposed-conv write (ops/conv.py) and ONE trilinear-skip write; the
# head-major relayouts, probs, merge/proj and MLP passes all stay in VMEM.
# Reference semantics: attention.py:251-289 (attention_upsample) + :395-479
# (MultiScaleDecoderBlock).
# ----------------------------------------------------------------------------------


def _decoder_kernel(
    *refs,
    ets: Tuple[int, ...],
    heads: int, hd_p: int, hd_real: int, c_real: int, scale: float,
    has_res_proj: bool, has_norm_q: bool,
    st: int, sh: int, sw: int, t_c: int, h_c: int, w_c: int,
    r_fine: int, tiles_per_plane: int, fold_heads: bool = False,
    paired_t: bool = False, whole_vol: bool = False,
    debug_skip: frozenset = frozenset(),
):
    """One (batch, fine-row-tile[, head]) grid step.

    q views: one coarse-Q block per T-offset in ``ets``. Heads-folded mode:
    (1, 1, H_c+2, W_c+2, heads·hd_p) heads-IN-LANES blocks (the matmul-native
    slot layout, models/mvit.py _slot_q_proj); each head's slot is a STATIC
    lane slice inside the in-kernel head loop. Heads-on-grid mode (dim 768):
    (1, 1, heads, H_c+2, W_c+2, hd_p) heads-major blocks whose index maps do
    NOT depend on the head grid axis, so Mosaic skips the refetch across
    consecutive head steps — a per-head-indexed view refetches per head step
    (measured 12 GB of view traffic at d4 in round 2). Shared element-offset
    (pl.Element) views were measured NEUTRAL and removed (round 3: d2 53.2→52.6,
    d3 95.3→96.6, d4 112.8→112.2 ms — Mosaic already skips same-index
    refetches; see git history for the variant).

    The subpixel transposed conv (k=3, p=1, s≤2 — every tap's coarse offset is
    in {−1,0,1}) runs in VMEM on a (rc+2, W_c+2) window and the spatial phases
    interleave in registers, so fine-resolution Q never touches HBM. skip
    (1, TILE, Cp) · k/v (1, heads, Lk, hd_p) · wconv (3,3,3,hd_p) · wproj
    (heads, hd_p, Cp) · out (1, TILE, Cop) · scratch acc (TILE, Cp) fp32.
    TILE = r_fine·W_f fine tokens (whole fine rows of one fine T plane)."""
    nv = 1 if whole_vol else len(ets)
    qview_refs = refs[:nv]
    if fold_heads:
        (skip_ref, k_ref, v_ref, wconv_ref, nqs_ref, nqb_ref, wproj_ref, bproj_ref,
         ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
         wres_ref, bres_ref, out_ref) = refs[nv:]
        acc_scr = None
    else:
        (skip_ref, k_ref, v_ref, wconv_ref, nqs_ref, nqb_ref, wproj_ref, bproj_ref,
         ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
         wres_ref, bres_ref, out_ref, acc_scr) = refs[nv:]
    f32 = jnp.float32
    if paired_t:
        # grid (batch, coarse T plane, row tile): BOTH fine T phases of plane
        # pair [2p, 2p+2) are computed in one step from the same two coarse
        # views (ets 0/1 → planes p, p+1), halving views traffic and grid
        # steps vs the per-fine-plane grid, and replacing the traced-parity
        # jnp.where double-build with one explicit build per phase.
        t_f = None
        c0 = pl.program_id(2) * (r_fine // sh)
    else:
        j = pl.program_id(1)
        t_f = j // tiles_per_plane
        c0 = (j % tiles_per_plane) * (r_fine // sh)  # first coarse row of this tile
    rc = r_fine // sh                            # coarse rows per spatial phase
    w_f = w_c * sw
    views = dict(zip(ets, qview_refs))

    if fold_heads:

        def window(et, h):
            # rows [c0−1, c0+rc+1) of the PADDED coarse plane m+et, head h's
            # static lane slot. The one zero plane/row/column baked into q6 on
            # every side (models/mvit.py _coarse_q_slots) makes the load always
            # in-range AND makes OOB taps read zeros, so there is no validity
            # multiply or per-window pad here (each measured ~15-33 ms/block at
            # batch 128). Column-shifted (sublane) variants are hoisted and
            # computed ONCE per window.
            if whole_vol:
                # DEC_VOL_VIEWS experiment: the whole padded coarse volume is
                # one batch-constant block; planes are dynamic T slices of it
                win = qview_refs[0][0, t_f + et + 1, pl.ds(c0, rc + 2), :,
                                    h * hd_p : (h + 1) * hd_p]
            else:
                win = views[et][0, 0, pl.ds(c0, rc + 2), :, h * hd_p : (h + 1) * hd_p]
            win = win.astype(f32)
            return {ew: win[:, 1 + ew : 1 + ew + w_c, :] for ew in (-1, 0, 1)}
    else:

        def window(et, h):
            # heads-major block, head picked by the grid axis (see docstring)
            win = views[et][0, 0, h, pl.ds(c0, rc + 2)].astype(f32)
            return {ew: win[:, 1 + ew : 1 + ew + w_c, :] for ew in (-1, 0, 1)}

    def build_q(r_t, h, wins):
        rows = []
        for r_h in range(sh):
            cols = []
            for r_w in range(sw):
                acc = jnp.zeros((rc, w_c, hd_p), f32)
                applied = 0
                for dt in range(3):
                    if (r_t + 1 - dt) % st:
                        continue
                    et = (r_t + 1 - dt) // st
                    if et not in wins:
                        wins[et] = window(et, h)
                    for dh in range(3):
                        if (r_h + 1 - dh) % sh:
                            continue
                        eh = (r_h + 1 - dh) // sh
                        for dw in range(3):
                            if (r_w + 1 - dw) % sw:
                                continue
                            if "qbuild" in debug_skip and applied:
                                continue  # ablation: single-tap build
                            ew = (r_w + 1 - dw) // sw
                            sl = wins[et][ew][1 + eh : 1 + eh + rc]
                            acc = acc + wconv_ref[dt, dh, dw].astype(f32) * sl
                            applied += 1
                cols.append(acc)
            row = cols[0] if sw == 1 else jnp.stack(cols, axis=2).reshape(rc, w_f, hd_p)
            rows.append(row)
        full = rows[0] if sh == 1 else jnp.stack(rows, axis=1).reshape(rc * sh, w_f, hd_p)
        return full.reshape(r_fine * w_f, hd_p)

    def head_contrib(h, r_t=0, wins=None):
        """Per-head: upsampled Q → pool-norm → attention → projected (TILE, Cp)."""
        if wins is None:
            wins = {}
        if "qwin" in debug_skip:
            # ablation: no window loads/shifts at all — q is a constant
            q = jnp.zeros((r_fine * w_f, hd_p), f32) + wconv_ref[0, 0, 0].astype(f32)
        elif paired_t or st == 1:
            q = build_q(r_t, h, wins)
        else:
            # both T phases are cheap VPU work on small windows; select by parity
            q = jnp.where(t_f % st == 0, build_q(0, h, wins), build_q(1, h, wins))

        if has_norm_q:
            # pool-norm LayerNorm over the REAL head dim (pads zero), torch eps 1e-5
            mean = jnp.sum(q, axis=-1, keepdims=True) / hd_real
            var = jnp.sum(jnp.square(q), axis=-1, keepdims=True) / hd_real - jnp.square(mean)
            q = (q - mean) * jax.lax.rsqrt(var + 1e-5)
            q = q * nqs_ref[0].astype(f32) + nqb_ref[0].astype(f32)
        qh = q.astype(out_ref.dtype)

        if "attn" in debug_skip:
            av = qh.astype(f32)  # ablation: bypass logits/softmax/PV
        else:
            logits = jax.lax.dot_general(
                qh, k_ref[0, h], (((1,), (1,)), ((), ())), preferred_element_type=f32
            ) * scale
            lmax = jnp.max(logits, axis=-1, keepdims=True)
            prob = jnp.exp(logits - lmax)
            prob = prob / jnp.sum(prob, axis=-1, keepdims=True)
            av = jnp.dot(prob.astype(out_ref.dtype), v_ref[0, h], preferred_element_type=f32)
        return jnp.dot(av.astype(out_ref.dtype), wproj_ref[h], preferred_element_type=f32)

    def tail(acc, sl=None):
        skip_blk = skip_ref[0, sl] if paired_t else skip_ref[0]

        def write(val):
            if paired_t:
                out_ref[0, sl] = val
            else:
                out_ref[0] = val

        res1 = skip_blk.astype(f32) + acc + bproj_ref[:].astype(f32)
        if "mlp" in debug_skip:
            write(res1[:, : out_ref.shape[-1]].astype(out_ref.dtype))
            return
        mean2 = jnp.sum(res1, axis=-1, keepdims=True) / c_real
        var2 = jnp.sum(jnp.square(res1), axis=-1, keepdims=True) / c_real - jnp.square(mean2)
        xn2 = (res1 - mean2) * jax.lax.rsqrt(var2 + 1e-6)
        xn2 = xn2 * ln2s_ref[:].astype(f32) + ln2b_ref[:].astype(f32)
        xn2_16 = xn2.astype(out_ref.dtype)
        # MLP chunked over the hidden dim: the fp32 GELU temporaries on a full
        # (TILE, 3072) hidden put the d1 block 254 KB over the 16 MB VMEM stack.
        # Bigger tiles take proportionally smaller chunks (~3 MB of fp32 hidden).
        hid_p = wfc1_ref.shape[1]
        tile_rows = r_fine * w_f
        step = min(hid_p, 1536 if tile_rows <= 512 else max(512, (3 * 2 ** 20) // (tile_rows * 4) // 128 * 128))
        mlp = jnp.zeros((res1.shape[0], out_ref.shape[-1]), f32) + bfc2_ref[:].astype(f32)
        for s in range(0, hid_p, step):
            pre = (
                jnp.dot(xn2_16, wfc1_ref[:, s : s + step], preferred_element_type=f32)
                + bfc1_ref[:, s : s + step].astype(f32)
            )
            act = 0.5 * pre * (1.0 + _erf(pre * np.float32(1.0 / np.sqrt(2.0))))
            mlp = mlp + jnp.dot(
                act.astype(out_ref.dtype), wfc2_ref[s : s + step, :],
                preferred_element_type=f32,
            )
        if has_res_proj:
            base = (
                jnp.dot(xn2_16, wres_ref[:], preferred_element_type=f32)
                + bres_ref[:].astype(f32)
            )
        else:
            base = res1
        write((base + mlp).astype(out_ref.dtype))

    if paired_t:
        # both fine T phases per step; windows shared across phases per head
        accs = [None, None]
        for hh in range(heads):
            wins = {}
            for r_t in range(2):
                cb = head_contrib(hh, r_t, wins)
                accs[r_t] = cb if accs[r_t] is None else accs[r_t] + cb
        for r_t in range(2):
            tail(accs[r_t], r_t)
    elif fold_heads:
        # heads looped in ONE grid step: no revisited accumulator block, one out
        # write, heads× fewer grid steps (the d3/d4 grids were 16-33k steps)
        acc = head_contrib(0)
        for hh in range(1, heads):
            acc = acc + head_contrib(hh)
        tail(acc)
    else:
        h = pl.program_id(2)

        @pl.when(h == 0)
        def _():
            acc_scr[:] = jnp.zeros_like(acc_scr)

        acc_scr[:] += head_contrib(h)

        @pl.when(h == heads - 1)
        def _():
            tail(acc_scr[:])


# Experiment override for the decoder tile target (tools/ab_decoder.py): scales
# the per-dim heuristic target (1 = shipped). Absolute targets OOM the 16 MB
# VMEM budget on the dim-768 blocks (measured 20.96M at tile 1024 on d2).
DEC_TILE_SCALE = 1

# A/B flag (tools/ab_decoder.py --paired-ab): pair both fine T phases of the
# st=2 folded decoder blocks (d4) into one grid step. Default ON (parity-tested);
# the flag exists so the on-chip A/B runs in ONE process (tunnel variance is
# ±5% across processes).
DEC_PAIRED_T = True

# Experiment flag (tools/ab_decoder.py --vol-views): stride-1-T heads-folded
# decoder blocks keep the whole padded coarse-Q volume resident per batch step
# (one batch-constant block) instead of nv per-plane views. Numerics identical
# (parity-tested via the same kernel body). COMPILE-INFEASIBLE on the current
# remote toolchain: the full d3 kernel dies in the server-side Mosaic compile
# (HTTP 500, tpu_compile_helper exit 1, no stderr through the relay) while
# tools/repro_volviews.py --at-size proves the construct itself compiles and
# runs at the exact flagship geometry — (1,6,34,34,512) bf16 volume (7.1 MB),
# grid (B,4,8), 3-et x 4-head dynamic-T window reads, even with a 6 MB VMEM
# ballast emulating the kernel's resident MLP weights. The tell: those repro
# compiles take ~10-20 MINUTES each (vs seconds for the static per-plane
# construct) — dynamic-T indexing into a 5-D VMEM block sends Mosaic compile
# time superlinear, and at full-kernel complexity (attention + MLP + tail on
# top of the window builds) the compile helper crashes. Bounded upside anyway
# (~3-10 ms of d3's 64.7: the per-plane path refetches each coarse plane ~3x
# at the ~270 GB/s DMA cap). Stays OFF until a server toolchain update; if
# re-attempting, re-run repro_volviews --at-size first — if its compile times
# drop to seconds, the pathology is fixed and the full kernel may compile.
DEC_VOL_VIEWS = False

# Kernel-internals ablation flags (tools/ab_decoder.py --ablate-kernel): members
# of {"qwin" (window loads → single tap), "qbuild" (subpixel tap build),
# "attn", "mlp"} replace that stage with near-free stand-ins at
# trace time, so the per-stage cost of the decoder kernel is measurable on-chip.
# NEVER set outside dev tools — results are numerically wrong by construction.
DEC_DEBUG_SKIP: set = set()


def _decoder_tile_plan(spec, thw_f):
    """(r_fine, tile, tiles_per_plane) — whole fine rows per tile, or None."""
    t_f, h_f, w_f = thw_f
    sh = spec.stride_q[1] if len(spec.stride_q) > 1 else 1
    # VMEM: resident MLP weights + the fp32 hidden tile. d1 (dim 768 → 768, 9.4 MB
    # of fc weights) measured 374 KB over the 16 MB scoped budget at tile 256.
    hidden = int((spec.dim_out if spec.upsample_q else spec.dim) * spec.mlp_ratio)
    w_bytes = (spec.dim * hidden + hidden * spec.dim_out) * 2
    if w_bytes > 8 * 2 ** 20:
        # d1-class blocks (768→768: 9.4 MB of resident fc weights) end 2 KB over
        # the 16 MB VMEM stack even at tile 128 with a hidden-chunked MLP — and
        # their composite is only 5.4 ms at batch 32. Not worth it.
        return None
    target = 512 if spec.dim <= 384 else (256 if w_bytes <= 6 * 2 ** 20 else 128)
    target = int(target * DEC_TILE_SCALE)
    r = max(sh, target // w_f)
    if r > h_f:
        r = h_f
    if h_f % r or r % sh or (r * w_f) % 128:
        return None
    return r, r * w_f, h_f // r


def decoder_heads_in_lanes(spec) -> bool:
    """Heads-folded decoder blocks (dim ≤ 384) take the 5-D heads-in-lanes q6
    layout from models/mvit.py _coarse_q_slots; the dim-768 blocks keep the
    heads-major 6-D layout (see _decoder_kernel docstring)."""
    return spec.dim <= 384


def _fused_decoder_impl(q6, skip, k, v, p, spec, thw_f, interpret: bool):
    """q6: zero-halo-padded coarse Q (post LN1+Wq+bias, PRE upsample conv) —
    (B, T_c+2, H_c+2, W_c+2, heads·hd_p) heads-in-lanes for the heads-folded
    blocks, (B, T_c+2, heads, H_c+2, W_c+2, hd_p) heads-major otherwise; skip:
    (B, L_f, C) trilinear residual; k/v: (B, heads, Lk, hd) pooled+normed. The
    q upsample conv + pool norm run inside the kernel, so fine-resolution Q
    never exists in HBM.

    dim ≤ 384 blocks (d3/d4 — 16-33k grid steps at batch 128) fold the heads
    into an in-kernel loop: heads× fewer grid steps, no revisited fp32
    accumulator block, a single out write. The dim-768 blocks keep the heads
    grid axis (folding their per-head temporaries overflows the 16 MB VMEM).

    Measured NO (round 3, do not retry): building the trilinear skip IN VMEM
    from edge-padded coarse plane views (so the fine skip never exists in HBM)
    — d2 52.6→56.6 ms, d3 95.4→97.8 at batch 128, and d4 (st=2: THREE skip
    plane views + fp32 tap windows on top of the folded-heads temporaries)
    fails Mosaic compile at every tile scale. Eliminating the fine-skip stream
    does not move the d3/d4 floor: the floor is q-views + out traffic, and the
    per-plane coarse view refetch across revisits costs what the skip saved."""
    b = q6.shape[0]
    fold = decoder_heads_in_lanes(spec)
    if fold:
        t_c, h_c, w_c = q6.shape[1] - 2, q6.shape[2] - 2, q6.shape[3] - 2
    else:
        t_c, h_c, w_c = q6.shape[1] - 2, q6.shape[3] - 2, q6.shape[4] - 2
    c = spec.dim
    heads, hd = spec.num_heads, spec.head_dim
    tfd, hfd, wfd = thw_f
    l = tfd * hfd * wfd
    r_fine, tile, tiles_per_plane = _decoder_tile_plan(spec, thw_f)
    st, sh, sw = (int(s) for s in spec.stride_q)
    # T offsets actually used: stride-1 taps reach planes m−1..m+1; stride-2 phase
    # taps only m and m+1 (k=3, p=1, op=1)
    ets = (-1, 0, 1) if st == 1 else (0, 1)
    # stride-2-T heads-folded blocks (d4) pair both fine T phases into one grid
    # step: the phases share their two coarse views, so views traffic and grid
    # steps halve (the views refetch was d4's largest term — see the docstring)
    paired = DEC_PAIRED_T and fold and st == 2 and tfd == 2 * t_c
    # DEC_VOL_VIEWS experiment (dev-tool flag): stride-1-T heads-folded blocks
    # (d3) keep the WHOLE padded coarse volume resident as one batch-constant
    # block instead of nv per-plane views, cutting the 3× per-et plane refetch
    hd_p_est = _round_up(spec.head_dim, 128)
    vol_bytes = (t_c + 2) * (h_c + 2) * (w_c + 2) * heads * hd_p_est * 2
    whole_vol = (DEC_VOL_VIEWS and fold and st == 1
                 and vol_bytes <= 8 * 2 ** 20)

    ws, cp, cop, has_res = _prep_tail_weights(p, spec, skip.dtype)
    hd_p = _round_up(hd, 128)
    dt = skip.dtype

    wproj = p["attn"]["proj"]["w"].reshape(heads, hd, c)
    wproj = jnp.pad(wproj, [(0, 0), (0, hd_p - hd), (0, cp - c)]).astype(dt)
    bproj = jnp.pad(p["attn"]["proj"]["b"], (0, cp - c)).reshape(1, cp).astype(dt)

    # upsample conv weight: per-channel (hd,), shared by all heads (attention.py:280)
    wconv = jnp.pad(p["attn"]["pool_q"].reshape(3, 3, 3, hd), [(0, 0)] * 3 + [(0, hd_p - hd)])
    wconv = wconv.astype(dt)

    # the pool norm is nn.LayerNorm(head_dim) — one (hd,) scale/bias shared by all
    # heads (attention.py:206)
    has_norm_q = "norm_q" in p["attn"]
    if has_norm_q:
        nqs = jnp.pad(p["attn"]["norm_q"]["scale"], (0, hd_p - hd))
        nqb = jnp.pad(p["attn"]["norm_q"]["bias"], (0, hd_p - hd))
    else:
        nqs = jnp.ones((hd_p,))
        nqb = jnp.zeros((hd_p,))
    nqs = nqs.reshape(1, 1, hd_p).astype(dt)
    nqb = nqb.reshape(1, 1, hd_p).astype(dt)

    kp = _pad_last(k, hd_p).astype(dt)
    vp = _pad_last(v, hd_p).astype(dt)
    lk = kp.shape[2]
    skip_p = _pad_last(skip, cp)

    kernel = functools.partial(
        _decoder_kernel,
        ets=ets,
        heads=heads, hd_p=hd_p, hd_real=hd, c_real=c, scale=float(spec.scale),
        has_res_proj=has_res, has_norm_q=has_norm_q,
        st=st, sh=sh, sw=sw, t_c=t_c, h_c=h_c, w_c=w_c,
        r_fine=r_fine, tiles_per_plane=tiles_per_plane,
        fold_heads=fold, paired_t=paired, whole_vol=whole_vol,
        debug_skip=frozenset(DEC_DEBUG_SKIP),
    )

    def _bspec(shape, fn):
        """BlockSpec whose index map matches the grid arity for this mode.

        Paired mode's grid is (batch, coarse T plane, row tile); ``fn`` then
        receives ``(i, (p, r))`` so the skip/out maps can address the 4-D
        (B, T_f, H·W, C) layout directly."""
        if paired:
            return pl.BlockSpec(shape, lambda i, p, r, fn=fn: fn(i, (p, r)),
                                memory_space=pltpu.VMEM)
        if fold:
            return pl.BlockSpec(shape, lambda i, j, fn=fn: fn(i, j), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i, j, h, fn=fn: fn(i, j), memory_space=pltpu.VMEM)

    def qview(e):
        # head-independent index maps: consecutive tile (and, heads-on-grid,
        # head) steps hit the same block, so Mosaic fetches each coarse plane
        # once per fine T plane. The +1 skips the baked leading zero plane; no
        # clip needed (OOB offsets land on the zero planes). Fold mode carries
        # all heads in the lane dim (5-D, matmul-native); grid mode carries
        # them on a heads axis (6-D).
        if whole_vol:
            return _bspec(
                (1, t_c + 2, h_c + 2, w_c + 2, heads * hd_p),
                lambda i, j: (i, 0, 0, 0, 0),
            )
        if paired:
            return _bspec(
                (1, 1, h_c + 2, w_c + 2, heads * hd_p),
                lambda i, j, e=e: (i, j[0] + e + 1, 0, 0, 0),
            )
        if fold:
            return _bspec(
                (1, 1, h_c + 2, w_c + 2, heads * hd_p),
                lambda i, j, e=e: (i, j // tiles_per_plane // st + e + 1, 0, 0, 0),
            )
        return _bspec(
            (1, 1, heads, h_c + 2, w_c + 2, hd_p),
            lambda i, j, e=e: (i, j // tiles_per_plane // st + e + 1, 0, 0, 0, 0),
        )

    qviews = [qview(None)] if whole_vol else [qview(e) for e in ets]

    if paired:
        io_idx = lambda i, j: (i, j[0], j[1], 0)
        skip_blk, out_blk = (1, 2, tile, cp), (1, 2, tile, cop)
        skip_in = skip_p.reshape(b, tfd, hfd * wfd, cp)
        out_sds = jax.ShapeDtypeStruct((b, tfd, hfd * wfd, cop), dt)
        grid = (b, t_c, tiles_per_plane)
        kv_idx = lambda i, j: (i, 0, 0, 0)
    else:
        io_idx = lambda i, j: (i, j, 0)
        skip_blk, out_blk = (1, tile, cp), (1, tile, cop)
        skip_in = skip_p
        out_sds = jax.ShapeDtypeStruct((b, l, cop), dt)
        grid = (b, l // tile) if fold else (b, l // tile, heads)
        kv_idx = lambda i, j: (i, 0, 0, 0)

    in_specs = qviews + [
        _bspec(skip_blk, io_idx),
        _bspec((1, heads, lk, hd_p), kv_idx),
        _bspec((1, heads, lk, hd_p), kv_idx),
        _bspec((3, 3, 3, hd_p), lambda i, j: (0, 0, 0, 0)),
        _bspec((1, 1, hd_p), lambda i, j: (0, 0, 0)),
        _bspec((1, 1, hd_p), lambda i, j: (0, 0, 0)),
        _bspec((heads, hd_p, cp), lambda i, j: (0, 0, 0)),
        _bspec(bproj.shape, lambda i, j: (0, 0)),
    ]
    for w in ws:
        nd = w.ndim
        in_specs.append(_bspec(w.shape, lambda i, j, nd=nd: (0,) * nd))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=_bspec(out_blk, io_idx),
        out_shape=out_sds,
        scratch_shapes=[] if fold else [pltpu.VMEM((tile, cp), jnp.float32)],
        interpret=interpret,
    )(*([q6] * len(qviews)), skip_in, kp, vp, wconv, nqs, nqb, wproj, bproj, *ws)
    if paired:
        out = out.reshape(b, l, cop)
    return out[..., : spec.dim_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_decoder(q5, skip, k, v, p, spec, thw_f, interpret):
    return _fused_decoder_impl(q5, skip, k, v, p, spec, thw_f, interpret)


def _dec_fwd(q5, skip, k, v, p, spec, thw_f, interpret):
    return _fused_decoder_impl(q5, skip, k, v, p, spec, thw_f, interpret), None


def _dec_bwd(spec, thw_f, interpret, residuals, g):
    raise NotImplementedError(
        "fused decoder block is inference-only (dispatch gates on deterministic)"
    )


_fused_decoder.defvjp(_dec_fwd, _dec_bwd)


def decoder_eligible(spec, mask, deterministic: bool, thw_f, lk: int) -> bool:
    """Upsample-Q decoder blocks with small pooled KV and aligned fine tiling."""
    return (
        spec.fused
        and spec.upsample_q
        and mask is None
        and deterministic
        and spec.dim % spec.num_heads == 0
        and spec.head_dim <= 256
        and spec.dim <= 768
        and len(spec.stride_q) == 3
        and all(s in (1, 2) for s in spec.stride_q)
        and tuple(spec.kernel_q) == (3, 3, 3)
        and _decoder_tile_plan(spec, thw_f) is not None
        and lk <= 512  # K/V must sit whole in VMEM per head
    )


def fused_decoder_block(q5_coarse, skip, k_pooled, v_pooled, params, spec, thw_f,
                        interpret: bool = False):
    """Run a decoder (upsample-Q) block through the fused kernel.

    q5_coarse: zero-halo-padded coarse Q from models/mvit.py _coarse_q_slots
    (post LN1 + Q-projection + bias, PRE upsample conv) with each head in its
    own 128k-lane slot, pads zero — 5-D heads-in-lanes for heads-folded blocks,
    6-D heads-major otherwise (see _fused_decoder_impl); skip: (B, L_f, C)
    trilinear-upsampled residual; k/v: (B, heads, Lk, hd) pooled+normed;
    thw_f: fine grid. The subpixel upsample conv, pool norm, 64-token
    attention, head-accumulated projection, residual and MLP tail all run per
    fine tile in VMEM. Returns (B, L_f, dim_out)."""
    return _fused_decoder(q5_coarse, skip, k_pooled, v_pooled, params, spec,
                          tuple(thw_f), interpret)


# ----------------------------------------------------------------------------------
# Encoder Q-pool block kernel: the stage-transition blocks (video 1/3, audio 1/2 —
# ~60 ms of the batch-32 forward) pool Q by (1,2,2) with a depthwise conv, pool the
# skip with MaxPool(1,3,3)/s(1,2,2), then attend at the coarse resolution. Same
# recipe as the decoder kernel, downsampling instead of upsampling: XLA computes
# LN1 + the Q projection at fine resolution (one MXU matmul) into head-major padded
# planes; the kernel then pools Q (dense taps + stride-2 row/col selection), applies
# the pool norm, attends against the whole pooled K/V, accumulates the output
# projection over head grid steps, max-pools the skip from a −1e30-row-padded x
# plane, and runs the LN2+MLP(+proj) tail. Reference: attention.py:11-49 (pool),
# :234-241 (MaxPool skip), :165-248 (block).
# ----------------------------------------------------------------------------------


def _pool_block_kernel(
    *refs,
    heads: int, hd_p: int, hd_real: int, c_real: int, scale: float,
    has_res_proj: bool, has_norm_q: bool,
    t_c: int, h_f: int, w_f: int, r_out: int, tiles_per_plane: int,
):
    """One (batch, out-row-tile) grid step, heads folded in-kernel.

    q views: six (1, 1, RB, W_f, heads·hd_p) ROW-BLOCK views of the fine Q
    planes in the heads-in-lanes slot layout (models/mvit.py _pool_q_slots) —
    (T offset −1/0/+1) × (row-block jt, jt+1), RB = 2·r_out fine rows; the
    kernel stitches the (RB+2)-row halo window from two adjacent row blocks
    (VMEM holds row windows, never whole planes — a full 64-row plane set
    OOMs), slicing each head's 128k-lane slot statically inside the head loop
    so the fp32 temporaries stay per-head sized. k/v: (1, heads, Lk, hd_p).
    out: (1, TILE, Cop), TILE = r_out·(W_f/2) coarse tokens (whole output
    rows). Heads folded (round 3, same recipe as the d3/d4 decoder fold):
    heads× fewer grid steps, no revisited fp32 accumulator, one out write —
    and the head-independent index maps keep each view fetched once per tile."""
    (qa_m1, qb_m1, qa_0, qb_0, qa_p1, qb_p1, skip_ref,
     k_ref, v_ref, wconv_ref, nqs_ref, nqb_ref, wproj_ref, bproj_ref,
     ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
     wres_ref, bres_ref, out_ref) = refs
    f32 = jnp.float32
    j = pl.program_id(1)
    t_o = j // tiles_per_plane
    w_o = w_f // 2
    views = ((qa_m1, qb_m1), (qa_0, qb_0), (qa_p1, qb_p1))

    acc_all = None
    for h in range(heads):
        lo = h * hd_p
        # ---- pooled Q: dense 3×3×3 taps, stride-2 row selection + col pick ----
        acc = jnp.zeros((r_out, w_f, hd_p), f32)
        for dt in range(3):
            t_src = t_o + dt - 1
            va, vb = views[dt]
            win = jnp.concatenate(
                [va[0, 0, :, :, lo : lo + hd_p], vb[0, 0, :2, :, lo : lo + hd_p]],
                axis=0,
            )
            valid = jnp.logical_and(t_src >= 0, t_src < t_c)
            win = (win * valid.astype(win.dtype)).astype(f32)
            winp = jnp.pad(win, ((0, 0), (1, 1), (0, 0)))
            # hoist the three column-shifted (sublane) variants — one shuffle
            # each, reused across the 9 spatial taps. Strided row selection must
            # go through a reshape (Mosaic lowers a[::2] on 3-D arrays as an
            # unsupported gather).
            shifted = [winp[:, dw : dw + w_f, :] for dw in range(3)]
            for dh in range(3):
                for dw in range(3):
                    dense = shifted[dw][dh : dh + 2 * r_out]  # (2·r_out, W_f, hd_p)
                    rows = dense.reshape(r_out, 2, w_f, hd_p)[:, 0]
                    acc = acc + wconv_ref[dt, dh, dw].astype(f32) * rows
        q = acc.reshape(r_out, w_o, 2, hd_p)[:, :, 0].reshape(r_out * w_o, hd_p)

        if has_norm_q:
            mean = jnp.sum(q, axis=-1, keepdims=True) / hd_real
            var = jnp.sum(jnp.square(q), axis=-1, keepdims=True) / hd_real - jnp.square(mean)
            q = (q - mean) * jax.lax.rsqrt(var + 1e-5)
            q = q * nqs_ref[0].astype(f32) + nqb_ref[0].astype(f32)
        qh = q.astype(out_ref.dtype)

        logits = jax.lax.dot_general(
            qh, k_ref[0, h], (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * scale
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        prob = jnp.exp(logits - lmax)
        prob = prob / jnp.sum(prob, axis=-1, keepdims=True)
        av = jnp.dot(prob.astype(out_ref.dtype), v_ref[0, h], preferred_element_type=f32)
        contrib = jnp.dot(av.astype(out_ref.dtype), wproj_ref[h], preferred_element_type=f32)
        acc_all = contrib if acc_all is None else acc_all + contrib

    # MaxPool skip arrives pre-pooled from XLA (pool_tokens_max) — passing the
    # raw fine planes cost two more halo views per step (VMEM + traffic)
    res1 = skip_ref[0].astype(f32) + acc_all + bproj_ref[:].astype(f32)
    mean2 = jnp.sum(res1, axis=-1, keepdims=True) / c_real
    var2 = jnp.sum(jnp.square(res1), axis=-1, keepdims=True) / c_real - jnp.square(mean2)
    xn2 = (res1 - mean2) * jax.lax.rsqrt(var2 + 1e-6)
    xn2 = xn2 * ln2s_ref[:].astype(f32) + ln2b_ref[:].astype(f32)
    xn2_16 = xn2.astype(out_ref.dtype)
    hid_p2 = wfc1_ref.shape[1]
    step = min(hid_p2, 1536)
    mlp = jnp.zeros((res1.shape[0], out_ref.shape[-1]), f32) + bfc2_ref[:].astype(f32)
    for s in range(0, hid_p2, step):
        pre = (
            jnp.dot(xn2_16, wfc1_ref[:, s : s + step], preferred_element_type=f32)
            + bfc1_ref[:, s : s + step].astype(f32)
        )
        act = 0.5 * pre * (1.0 + _erf(pre * np.float32(1.0 / np.sqrt(2.0))))
        mlp = mlp + jnp.dot(
            act.astype(out_ref.dtype), wfc2_ref[s : s + step, :],
            preferred_element_type=f32,
        )
    if has_res_proj:
        base = (
            jnp.dot(xn2_16, wres_ref[:], preferred_element_type=f32)
            + bres_ref[:].astype(f32)
        )
    else:
        base = res1
    out_ref[0] = (base + mlp).astype(out_ref.dtype)


def _pool_tile_plan(spec, thw):
    """(r_out, tile, tiles_per_plane) over the POOLED grid, or None."""
    t, h_f, w_f = thw
    if h_f % 2 or w_f % 2:
        return None
    h_o, w_o = h_f // 2, w_f // 2
    hidden = int(spec.dim * spec.mlp_ratio)
    w_bytes = (spec.dim * hidden + hidden * spec.dim_out) * 2
    if w_bytes > 8 * 2 ** 20:
        return None  # dim-768 blocks: resident fc weights blow the VMEM stack
    hd_p = _round_up(spec.head_dim, 128)
    r = max(1, 256 // w_o)
    # six q row-block views of 2r rows each, double-buffered: keep them ≤ ~4 MB
    while r > 1 and 6 * spec.num_heads * (2 * r) * w_f * hd_p * 2 > 4 * 2 ** 20:
        r //= 2
    if r > h_o:
        r = h_o
    if h_o % r or (r * w_o) % 128:
        return None
    return r, r * w_o, h_o // r


def pool_block_eligible(spec, mask, deterministic: bool, thw, lk: int) -> bool:
    """Encoder Q-pool blocks: stride (1,2,2), MaxPool(1,3,3) skip, pooled KV whole
    in VMEM per head."""
    return (
        spec.fused
        and not spec.upsample_q
        and spec.pool_q_on
        and spec.skip_pool_on
        and not spec.has_cls
        and mask is None
        and deterministic
        and tuple(spec.stride_q) == (1, 2, 2)
        and tuple(spec.kernel_q) == (3, 3, 3)
        and tuple(spec.skip_kernel) == (1, 3, 3)
        and spec.dim % spec.num_heads == 0
        and spec.head_dim <= 128
        and _pool_tile_plan(spec, thw) is not None
        and lk <= 1024
    )


def _fused_pool_impl(q6, skip, k, v, p, spec, thw, interpret: bool):
    """q6: (B, T, H_f+RB, W_f, heads·hd_p) FINE Q in the heads-in-lanes slot
    layout (post LN1+Wq+bias, PRE pool conv) with rows padded (1 top zero, RB−1
    bottom zeros), RB = 2·r_out; skip: (B, L/4, C) the MaxPool residual, already
    pooled by XLA; k/v: (B, heads, Lk, hd) pooled+normed. thw: the UNPADDED
    fine grid."""
    b = q6.shape[0]
    t_c, h_fd, w_fd = thw
    c = spec.dim
    heads, hd = spec.num_heads, spec.head_dim
    r_out, tile, tiles_per_plane = _pool_tile_plan(spec, thw)
    rb = 2 * r_out
    assert q6.shape[2] == h_fd + rb, (q6.shape, thw, rb)
    l_out = t_c * (h_fd // 2) * (w_fd // 2)

    ws, cp, cop, has_res = _prep_tail_weights(p, spec, k.dtype)
    hd_p = _round_up(hd, 128)
    dt = k.dtype

    wproj = p["attn"]["proj"]["w"].reshape(heads, hd, c)
    wproj = jnp.pad(wproj, [(0, 0), (0, hd_p - hd), (0, cp - c)]).astype(dt)
    bproj = jnp.pad(p["attn"]["proj"]["b"], (0, cp - c)).reshape(1, cp).astype(dt)
    wconv = jnp.pad(p["attn"]["pool_q"].reshape(3, 3, 3, hd), [(0, 0)] * 3 + [(0, hd_p - hd)])
    wconv = wconv.astype(dt)

    has_norm_q = "norm_q" in p["attn"]
    if has_norm_q:
        nqs = jnp.pad(p["attn"]["norm_q"]["scale"], (0, hd_p - hd))
        nqb = jnp.pad(p["attn"]["norm_q"]["bias"], (0, hd_p - hd))
    else:
        nqs = jnp.ones((hd_p,))
        nqb = jnp.zeros((hd_p,))
    nqs = nqs.reshape(1, 1, hd_p).astype(dt)
    nqb = nqb.reshape(1, 1, hd_p).astype(dt)

    kp = _pad_last(k, hd_p).astype(dt)
    vp = _pad_last(v, hd_p).astype(dt)
    lk = kp.shape[2]

    kernel = functools.partial(
        _pool_block_kernel,
        heads=heads, hd_p=hd_p, hd_real=hd, c_real=c, scale=float(spec.scale),
        has_res_proj=has_res, has_norm_q=has_norm_q,
        t_c=t_c, h_f=h_fd, w_f=w_fd, r_out=r_out, tiles_per_plane=tiles_per_plane,
    )

    def qview(e_t, e_r):
        # row-block views: (T plane t_o+e_t clamped) × (row block jt+e_r); bottom
        # row padding guarantees jt+1 is always a valid block. All heads ride the
        # lane dim, so the maps stay head-free and each view loads once per tile.
        return pl.BlockSpec(
            (1, 1, rb, w_fd, heads * hd_p),
            lambda i, j, e_t=e_t, e_r=e_r: (
                i, jnp.clip(j // tiles_per_plane + e_t, 0, t_c - 1),
                j % tiles_per_plane + e_r, 0, 0,
            ),
            memory_space=pltpu.VMEM,
        )

    skip_p = _pad_last(skip, cp)

    in_specs = [
        qview(-1, 0), qview(-1, 1), qview(0, 0), qview(0, 1),
        qview(1, 0), qview(1, 1),
        pl.BlockSpec((1, tile, cp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, lk, hd_p), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, lk, hd_p), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, 3, hd_p), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hd_p), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hd_p), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, hd_p, cp), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bproj.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    for w in ws:
        nd = w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i, j, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        kernel,
        grid=(b, l_out // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, cop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l_out, cop), dt),
        interpret=interpret,
    )(q6, q6, q6, q6, q6, q6, skip_p, kp, vp, wconv, nqs, nqb, wproj, bproj, *ws)
    return out[..., : spec.dim_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_pool(q6, skip, k, v, p, spec, thw, interpret):
    return _fused_pool_impl(q6, skip, k, v, p, spec, thw, interpret)


def _pool_fwd(q6, skip, k, v, p, spec, thw, interpret):
    return _fused_pool_impl(q6, skip, k, v, p, spec, thw, interpret), None


def _pool_bwd(spec, thw, interpret, residuals, g):
    raise NotImplementedError(
        "fused Q-pool block is inference-only (dispatch gates on deterministic)"
    )


_fused_pool.defvjp(_pool_fwd, _pool_bwd)


def fused_pool_block(q6_fine, skip_pooled, k_pooled, v_pooled, params, spec, thw,
                     interpret: bool = False):
    """Run an encoder Q-pool block through the fused kernel. See _fused_pool_impl
    for layouts. Returns (B, L/4, dim_out)."""
    return _fused_pool(q6_fine, skip_pooled, k_pooled, v_pooled, params, spec,
                       tuple(thw), interpret)


# ----------------------------------------------------------------------------------
# Training-mode fused MLP tail: stored-residual VJP (VERDICT round-1 item 4).
#
# Forward: the same single-pass LN2→MLP(→proj)→residual kernel, but it additionally
# WRITES the pre-GELU hidden (the one tensor whose recompute costs a full fc1 matmul)
# and applies the per-sample stochastic-depth multiplier to the MLP branch inside the
# kernel. Backward is hand-written XLA from the stored (x, hid_pre): xn2/LN statistics
# are recomputed elementwise from x (cheap — x is a stored residual either way), so vs
# the composite autodiff path the forward saves the xn2 round-trip plus all LN/GELU
# fusion traffic while the backward's matmul count is identical. This is the
# stored-residual strategy the round-1 recompute VJP lost to (257 vs 235 ms/step).
# ----------------------------------------------------------------------------------


def _mlp_tail_train_kernel(
    x_ref, dp_ref, ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    wres_ref, bres_ref, out_ref, hid_ref,
    *, c_real: int, has_res_proj: bool,
):
    f32 = jnp.float32
    x = x_ref[:].astype(f32)
    mean = jnp.sum(x, axis=-1, keepdims=True) / c_real
    var = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / c_real - jnp.square(mean)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * ln2s_ref[:].astype(f32) + ln2b_ref[:].astype(f32)
    xn16 = xn.astype(x_ref.dtype)
    hid_pre = jnp.dot(xn16, wfc1_ref[:], preferred_element_type=f32) + bfc1_ref[:].astype(f32)
    hid_ref[:] = hid_pre.astype(hid_ref.dtype)
    hid = 0.5 * hid_pre * (1.0 + _erf(hid_pre * np.float32(1.0 / np.sqrt(2.0))))
    mlp = (
        jnp.dot(hid.astype(x_ref.dtype), wfc2_ref[:], preferred_element_type=f32)
        + bfc2_ref[:].astype(f32)
    )
    if has_res_proj:
        base = jnp.dot(xn16, wres_ref[:], preferred_element_type=f32) + bres_ref[:].astype(f32)
    else:
        base = x
    out_ref[:] = (base + dp_ref[pl.program_id(0), 0] * mlp).astype(out_ref.dtype)


def _mlp_tail_train_impl(x, p, dp_mask, spec, interpret: bool):
    b, l, c = x.shape
    tile = _pick_tile(l)
    if spec.dim > 384 or spec.dim_out > 384:
        tile = min(tile, 256)
        while l % tile:
            tile //= 2
    ws, cp, cop, has_res = _prep_tail_weights(p, spec, x.dtype)
    hid_p = ws[2].shape[1]  # padded hidden width (wfc1 is (Cp, HIDp))
    xp = _pad_last(x, cp)
    # per-sample stochastic-depth multiplier as an SMEM scalar (a (1,128) VMEM
    # block fails Mosaic's 8-sublane minimum on real hardware)
    dp = dp_mask.astype(jnp.float32).reshape(b, 1)
    kernel = functools.partial(_mlp_tail_train_kernel, c_real=c, has_res_proj=has_res)

    in_specs = [
        pl.BlockSpec((1, tile, cp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        # whole (B,1) array as one SMEM block (SMEM blocks must cover the array);
        # the kernel indexes it by the batch program id
        pl.BlockSpec((b, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
    ]
    for w in ws:
        nd = w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i, j, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)
        )

    def wrapped(*refs):
        kernel(refs[0].at[0], refs[1], *refs[2:-2], refs[-2].at[0], refs[-1].at[0])

    out, hid_pre = pl.pallas_call(
        wrapped,
        grid=(b, l // tile),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile, cop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, hid_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, cop), x.dtype),
            jax.ShapeDtypeStruct((b, l, hid_p), x.dtype),
        ],
        interpret=interpret,
    )(xp, dp, *ws)
    return out[..., : spec.dim_out], hid_pre


def _gelu_grad(z):
    """d/dz [z·Φ(z)] = Φ(z) + z·φ(z) (exact erf GELU)."""
    f32 = jnp.float32
    z = z.astype(f32)
    cdf = 0.5 * (1.0 + jax.lax.erf(z * np.float32(1.0 / np.sqrt(2.0))))
    pdf = jnp.exp(-0.5 * z * z) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    return cdf + z * pdf


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mlp_tail_train(x, p, dp_mask, spec, interpret):
    out, _ = _mlp_tail_train_impl(x, p, dp_mask, spec, interpret)
    return out


def _tail_train_fwd(x, p, dp_mask, spec, interpret):
    out, hid_pre = _mlp_tail_train_impl(x, p, dp_mask, spec, interpret)
    return out, (x, p, dp_mask, hid_pre)


def _tail_train_bwd(spec, interpret, residuals, g):
    x, p, dp_mask, hid_pre = residuals
    f32 = jnp.float32
    c = spec.dim
    hidden = int((spec.dim_out if spec.upsample_q else spec.dim) * spec.mlp_ratio)
    has_res = spec.dim != spec.dim_out
    dt = x.dtype
    prec = jax.lax.Precision.DEFAULT if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def mm(a, b_, dims):
        return jax.lax.dot_general(
            a.astype(dt), b_.astype(dt), dims,
            preferred_element_type=f32, precision=prec,
        )

    # recompute LN statistics + xn2 from the stored x (elementwise — no matmuls)
    x32 = x.astype(f32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-6)
    xhat = (x32 - mean) * rstd
    scale = p["norm2"]["scale"].astype(f32)
    xn2 = xhat * scale + p["norm2"]["bias"].astype(f32)

    hid_pre = hid_pre[..., :hidden]
    hid = 0.5 * hid_pre.astype(f32) * (
        1.0 + jax.lax.erf(hid_pre.astype(f32) * np.float32(1.0 / np.sqrt(2.0)))
    )

    g32 = g.astype(f32)
    gm = g32 * dp_mask.astype(f32)[:, None, None]  # MLP branch is dp-masked

    wfc1, wfc2 = p["mlp"]["fc1"]["w"], p["mlp"]["fc2"]["w"]
    # contraction over (batch, tokens): grads for the weights
    bl = (((0, 1), (0, 1)), ((), ()))
    d_wfc2 = mm(hid, gm, bl)
    d_bfc2 = jnp.sum(gm, axis=(0, 1))
    dhid = mm(gm, wfc2, (((2,), (1,)), ((), ())))
    dhid_pre = dhid * _gelu_grad(hid_pre)
    d_wfc1 = mm(xn2, dhid_pre, bl)
    d_bfc1 = jnp.sum(dhid_pre, axis=(0, 1))
    dxn2 = mm(dhid_pre, wfc1, (((2,), (1,)), ((), ())))

    dp_grads = {
        "norm2": {},
        "mlp": {
            "fc1": {"w": d_wfc1.astype(wfc1.dtype), "b": d_bfc1.astype(wfc1.dtype)},
            "fc2": {"w": d_wfc2.astype(wfc2.dtype), "b": d_bfc2.astype(wfc2.dtype)},
        },
    }
    if has_res:
        # residual projection consumes xn2 and is NOT dp-masked (composite:
        # x = proj(norm2(x)) + drop_path(mlp(...)), attention.py:243-247)
        dp_grads["proj"] = {
            "w": mm(xn2, g32, bl).astype(p["proj"]["w"].dtype),
            "b": jnp.sum(g32, axis=(0, 1)).astype(p["proj"]["b"].dtype),
        }
        dxn2 = dxn2 + mm(g32, p["proj"]["w"], (((2,), (1,)), ((), ())))
        dx_skip = 0.0
    else:
        dx_skip = g32

    # LayerNorm backward
    dp_grads["norm2"]["scale"] = jnp.sum(dxn2 * xhat, axis=(0, 1)).astype(
        p["norm2"]["scale"].dtype
    )
    dp_grads["norm2"]["bias"] = jnp.sum(dxn2, axis=(0, 1)).astype(
        p["norm2"]["bias"].dtype
    )
    dxhat = dxn2 * scale
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx = (dx + dx_skip).astype(x.dtype)

    # zero grads for param subtrees the tail never touches (norm1/attn/...)
    full = jax.tree_util.tree_map(jnp.zeros_like, p)
    for k_, v_ in dp_grads.items():
        sub = full[k_]
        for k2_, v2_ in v_.items():
            sub[k2_] = v2_
    return dx, full, jnp.zeros_like(dp_mask)


_mlp_tail_train.defvjp(_tail_train_fwd, _tail_train_bwd)


def tail_train_eligible(spec, l: int) -> bool:
    """Training-mode tail fusion: any aligned block; stochastic depth is handled
    in-kernel via the per-sample multiplier."""
    return spec.fused and l % 128 == 0 and spec.dim <= 768


def fused_mlp_tail_train(x, params, spec, dp_mask, interpret: bool = False):
    """Training tail with stored-residual custom VJP.

    x: (B, L, C) attention-residual output; dp_mask: (B,) fp32 per-sample MLP-branch
    multiplier — 1.0 everywhere when stochastic depth is off, else
    bernoulli(keep)/keep. Returns (B, L, dim_out)."""
    return _mlp_tail_train(x, params, dp_mask, spec, interpret)
