"""Fused multiscale-attention kernel (Pallas, TPU).

The MViT attention after q/k/v pooling has a distinctive shape: queries can be long
(16 384 tokens at the stem stage) but keys/values are always pooled short
(≤ 4 096, usually 256 — the reference's POOL_KV_STRIDE_ADAPTIVE design,
``custom_multimodal_builder.py:136-149``). XLA materializes the (B, H, Lq, Lk)
probability tensor in HBM between the two matmuls — at the stem stage that is
~134 MB of extra HBM write+read per block per batch-8 step.

This kernel exploits the short-KV structure: K and V live entirely in VMEM, each
grid step streams one query tile, computes logits, takes an exact single-pass
softmax over the full row (no flash-style running max/sum needed when Lk fits), and
multiplies into V — probabilities never leave VMEM.

Backward: custom VJP recomputing the probabilities from (q, k, v) — flash-style
rematerialization expressed in plain XLA (the backward is matmul-dominated and
already MXU-friendly; the HBM win is in not saving the forward probabilities).

Numerics: logits and softmax in fp32 regardless of input dtype, matching the XLA
composite in models/mvit.py bit-closely (tested in interpret mode and vs the
composite)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped by platform at import; overridable for tests/debug.
_ENABLED: Optional[bool] = None


def enabled() -> bool:
    global _ENABLED
    if _ENABLED is None:
        try:
            _ENABLED = jax.devices()[0].platform == "tpu"
        except Exception:
            _ENABLED = False
    return _ENABLED


def set_enabled(value: Optional[bool]) -> None:
    global _ENABLED
    _ENABLED = value


# Whether the fused attention kernel also runs inside TRAINING forwards (its VJP
# recomputes through the composite). Measured in tools/ab_train.py (batch 8 bf16,
# in-process): composite 281.7 ms/step, +fused train tail 160.0, +decoder kernel
# 174.4, +attention kernel 176.7 — so only the tail wins in training; the
# recompute-VJP kernels lose their forward savings to the duplicated backward work.
_TRAIN_ATTN: bool = False


def train_attention_enabled() -> bool:
    return _TRAIN_ATTN


def set_train_attention(value: bool) -> None:
    global _TRAIN_ATTN
    _TRAIN_ATTN = value


# Same switch for the fused decoder-block kernel in TRAINING forwards (exact when
# the block has no stochastic depth — the CSTS decoder ships drop_path=0; backward
# recomputes through the composite block). Measured OFF (see above).
_TRAIN_DECODER: bool = False


def train_decoder_enabled() -> bool:
    return _TRAIN_DECODER


def set_train_decoder(value: bool) -> None:
    global _TRAIN_DECODER
    _TRAIN_DECODER = value


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float, with_mask: bool):
    """One (batch·head, q-tile) grid step.

    q_ref: (BLK_Q, hd); k_ref/v_ref: (Lk, hd); mask_ref: (BLK_Q, Lk) or None.
    """
    q = q_ref[:]
    k = k_ref[:]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale
    if with_mask:
        logits = logits + mask_ref[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    out = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = out.astype(out_ref.dtype)


def _pick_block_q(lq: int) -> int:
    for blk in (512, 256, 128):
        if lq % blk == 0:
            return blk
    return lq  # small/odd Lq: single tile


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fused_attention_fwd_impl(q, k, v, mask, scale: float, interpret: bool):
    b, n, lq, hd_orig = q.shape
    lk = k.shape[2]
    blk_q = _pick_block_q(lq)
    bn = b * n
    # Mosaic requires the lane (last) dim 128-aligned; zero-pad head_dim (96 → 128 for
    # CSTS). Zero columns contribute nothing to q·kᵀ and produce zero output columns,
    # sliced off below.
    hd = _round_up(hd_orig, 128)
    if hd != hd_orig:
        pad = [(0, 0)] * 3 + [(0, hd - hd_orig)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # Sublane alignment: pad sequence dims to 16 (covers fp32 and bf16 tiles).
    # Padded QUERY rows produce garbage rows sliced off below; padded KEY rows must
    # be masked out of the softmax or they would absorb probability mass.
    lq_orig, lk_orig = lq, lk
    lq = _round_up(lq, 16)
    lk = _round_up(lk, 16)
    if lq != lq_orig:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lq - lq_orig), (0, 0)])
        blk_q = _pick_block_q(lq)
    if lk != lk_orig:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, lk - lk_orig), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, lk - lk_orig), (0, 0)])
        key_mask = jnp.full((1, lk), 0.0, jnp.float32).at[:, lk_orig:].set(-1e9)
        if mask is None:
            mask = jnp.broadcast_to(key_mask, (lq, lk))
        else:
            mask = jnp.pad(mask, [(0, lq - mask.shape[0]), (0, lk - mask.shape[1])]) + key_mask
    elif mask is not None and lq != lq_orig:
        mask = jnp.pad(mask, [(0, lq - mask.shape[0]), (0, 0)])

    qf = q.reshape(bn, lq, hd)
    kf = k.reshape(bn, lk, hd)
    vf = v.reshape(bn, lk, hd)

    with_mask = mask is not None
    in_specs = [
        pl.BlockSpec((1, blk_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if with_mask:
        in_specs.append(pl.BlockSpec((blk_q, lk), lambda i, j: (j, 0), memory_space=pltpu.VMEM))
        operands.append(mask.astype(jnp.float32))

    def kernel(*refs):
        if with_mask:
            q_ref, k_ref, v_ref, m_ref, out_ref = refs
        else:
            q_ref, k_ref, v_ref, out_ref = refs
            m_ref = None
        _attn_kernel(
            q_ref.at[0], k_ref.at[0], v_ref.at[0],
            m_ref, out_ref.at[0], scale=scale, with_mask=with_mask,
        )

    out = pl.pallas_call(
        kernel,
        grid=(bn, lq // blk_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bn, lq, hd), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, n, lq, hd)[:, :, :lq_orig, :hd_orig]


def _composite_probs(q, k, scale, mask):
    logits = jnp.einsum(
        "bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    if mask is not None:
        logits = logits + mask
    return jax.nn.softmax(logits, axis=-1)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, out_ref, g_ref, kmask_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float, with_kmask: bool):
    """One (batch·head, q-tile) backward step, probabilities VMEM-resident.

    dk/dv blocks revisit the same (lk, hd) slot on every q-tile step — TPU grid
    steps are sequential, so zero-at-first-tile + accumulate is race-free. The
    pl.when closure only zero-fills (captures refs, never traced values — the
    round-2 Mosaic gotcha).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    q = q_ref[:]
    k = k_ref[:]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if with_kmask:
        logits = logits + kmask_ref[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    g32 = g_ref[:].astype(jnp.float32)
    delta = jnp.sum(g32 * out_ref[:].astype(jnp.float32), axis=-1, keepdims=True)
    dp = jax.lax.dot_general(  # g · vᵀ : (blk, lk)
        g32, v_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dl = p * (dp - delta)
    dq = jax.lax.dot_general(  # dl · k : (blk, hd)
        dl, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[:] = dq
    dk_ref[:] += jax.lax.dot_general(  # dlᵀ · q : (lk, hd)
        dl, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv_ref[:] += jax.lax.dot_general(  # pᵀ · g : (lk, hd)
        p, g32, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_bwd_impl(q, k, v, out, g, scale: float, interpret: bool):
    """Stored-residual backward (save out, recompute probs IN VMEM only).

    The XLA-recompute backward materializes the fp32 (B, N, Lq, Lk) probability
    tensor in HBM (~134 MB per stem-scale block at batch 8) — measured to cancel
    the forward kernel's win in training (ab_train.py round 2: 176.7 vs 160.0
    ms/step). Here the probabilities are rebuilt per q-tile from q·kᵀ exactly as
    the forward computed them (same single-pass softmax ⇒ same fp32 values) and
    never leave VMEM; HBM traffic is just q/k/v/out/g in, dq/dk/dv out.
    Unmasked path only — masked (fusion) blocks fall back to the XLA backward.
    """
    b, n, lq, hd_orig = q.shape
    lk = k.shape[2]
    blk_q = _pick_block_q(lq)
    bn = b * n
    hd = _round_up(hd_orig, 128)
    if hd != hd_orig:
        pad = [(0, 0)] * 3 + [(0, hd - hd_orig)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        out, g = jnp.pad(out, pad), jnp.pad(g, pad)
    lq_orig, lk_orig = lq, lk
    lq = _round_up(lq, 16)
    lk = _round_up(lk, 16)
    if lq != lq_orig:
        pad = [(0, 0), (0, 0), (0, lq - lq_orig), (0, 0)]
        q, out, g = jnp.pad(q, pad), jnp.pad(out, pad), jnp.pad(g, pad)
        blk_q = _pick_block_q(lq)
    kmask = None
    if lk != lk_orig:
        pad = [(0, 0), (0, 0), (0, lk - lk_orig), (0, 0)]
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)
        kmask = jnp.full((blk_q, lk), 0.0, jnp.float32).at[:, lk_orig:].set(-1e9)

    qf = q.reshape(bn, lq, hd)
    kf = k.reshape(bn, lk, hd)
    vf = v.reshape(bn, lk, hd)
    outf = out.reshape(bn, lq, hd)
    gf = g.reshape(bn, lq, hd)

    with_kmask = kmask is not None
    in_specs = [
        pl.BlockSpec((1, blk_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf, outf, gf]
    if with_kmask:
        in_specs.append(pl.BlockSpec((blk_q, lk), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
        operands.append(kmask)

    def kernel(*refs):
        if with_kmask:
            q_ref, k_ref, v_ref, o_ref, g_ref, km_ref, dq_ref, dk_ref, dv_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref, g_ref, dq_ref, dk_ref, dv_ref = refs
            km_ref = None
        _flash_bwd_kernel(
            q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0], g_ref.at[0],
            km_ref, dq_ref.at[0], dk_ref.at[0], dv_ref.at[0],
            scale=scale, with_kmask=with_kmask,
        )

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bn, lq // blk_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, blk_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bn, lq, hd), jnp.float32),
            jax.ShapeDtypeStruct((bn, lk, hd), jnp.float32),
            jax.ShapeDtypeStruct((bn, lk, hd), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    dq = dq.reshape(b, n, lq, hd)[:, :, :lq_orig, :hd_orig]
    dk = dk.reshape(b, n, lk, hd)[:, :, :lk_orig, :hd_orig]
    dv = dv.reshape(b, n, lk, hd)[:, :, :lk_orig, :hd_orig]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_attention(q, k, v, scale, has_mask, interpret, mask):
    del has_mask
    return _fused_attention_fwd_impl(q, k, v, mask, scale, interpret)


def _fwd(q, k, v, scale, has_mask, interpret, mask):
    out = _fused_attention_fwd_impl(q, k, v, mask, scale, interpret)
    # ``out`` is a residual only for the flash backward; the masked/composite
    # path recomputes probabilities from q/k and must not keep the extra
    # (B, N, Lq, hd) tensor alive across the forward→backward gap.
    saved_out = out if mask is None and (enabled() or interpret) else None
    return out, (q, k, v, mask, saved_out)


def _bwd(scale, has_mask, interpret, residuals, g):
    q, k, v, mask, out = residuals
    if mask is None and (enabled() or interpret):
        dq, dk, dv = _flash_bwd_impl(q, k, v, out, g, scale, interpret)
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None
    p = _composite_probs(q, k, scale, mask)  # recompute (B, N, Lq, Lk) fp32
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bnqk,bnqd->bnkd", p, g32)
    dp = jnp.einsum("bnqd,bnkd->bnqk", g32, v32)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    dq = jnp.einsum("bnqk,bnkd->bnqd", dl, k32) * scale
    dk = jnp.einsum("bnqk,bnqd->bnkd", dl, q32) * scale
    dmask = None
    if mask is not None:
        # mask broadcasts over (b, n); sum the logit grads accordingly
        dmask = jnp.sum(dl, axis=tuple(range(dl.ndim - mask.ndim))).astype(jnp.float32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dmask


_fused_attention.defvjp(_fwd, _bwd)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q kᵀ · scale [+ mask]) v with VMEM-resident probabilities.

    q: (B, N, Lq, hd); k, v: (B, N, Lk, hd); mask: (Lq, Lk) additive, optional.
    Returns (B, N, Lq, hd) in q's dtype. Gradients supported (recompute backward).
    """
    if mask is not None:
        assert mask.ndim == 2, "kernel mask is (Lq, Lk), broadcast over batch/heads"
    return _fused_attention(q, k, v, float(scale), mask is not None, interpret, mask)
