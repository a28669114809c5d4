"""Multiscale Vision Transformer blocks, TPU-native.

Functional re-design of the reference's block zoo:

* ``MultiScaleAttention`` / ``MultiScaleBlock``  (attention.py:52-248)
* ``MultiScaleDecoderAttention`` / ``MultiScaleDecoderBlock``  (attention.py:292-479)
* ``TemporalAttention`` / ``TemporalBlock``  (av_attention.py:50-250)
* ``SpatialAttention`` / ``SpatialBlock``  (av_attention.py:253-473)

Design differences from the reference (deliberate, TPU-first):

* channels-last token layout ``(B, L, C)`` with static ``thw`` carried in the spec —
  no data-dependent shapes anywhere, so everything jits once;
* the per-head depthwise q/k/v pooling convs run as ONE fused depthwise conv over all
  heads (weight tiled across heads) instead of a ``B*heads``-batched conv;
* the spatial-fusion in-frame mask (av_attention.py:336-346 builds it with a Python
  loop on every forward) is precomputed once at spec-build time as a static constant;
* attention probabilities are computed in fp32 regardless of activation dtype;
* stochastic depth takes an explicit PRNG key (functional, reproducible).

Every block is a pair ``*_init(key, spec) -> params`` / ``*_apply(params, spec, x, ...)``
over plain dict pytrees, which keeps pjit sharding rules and the torch checkpoint
converter straightforward.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csts_tpu import ops


def round_width(width: int, multiplier: float, min_width: int = 1, divisor: int = 1) -> int:
    """Channel rounding rule (slowfast/models/utils.py:9-24)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


THW = Tuple[int, int, int]


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


@dataclasses.dataclass(frozen=True)
class AttentionSpec:
    """Static metadata for one attention block."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    # () means "no pool op on that path" (attention.py:94-97 skip rule)
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    mode: str = "conv"
    # decoder blocks upsample Q with ConvTranspose3d instead of pooling
    upsample_q: bool = False
    # dispatch the attention core to the Pallas fused kernel (TPU only)
    fused: bool = False
    # leading cls token excluded from spatial pooling (attention.py:24-27 split);
    # off for CSTS (CLS_EMBED_ON False), on for the classification MViT family
    has_cls: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def scale(self) -> float:
        return self.head_dim ** -0.5

    @property
    def pool_q_on(self) -> bool:
        if not self.kernel_q:
            return False
        return not (_prod(self.kernel_q) == 1 and _prod(self.stride_q) == 1)

    @property
    def pool_kv_on(self) -> bool:
        if not self.kernel_kv:
            return False
        return not (_prod(self.kernel_kv) == 1 and _prod(self.stride_kv) == 1)

    @property
    def padding_q(self) -> Tuple[int, ...]:
        return tuple(int(k // 2) for k in self.kernel_q)

    @property
    def padding_kv(self) -> Tuple[int, ...]:
        return tuple(int(k // 2) for k in self.kernel_kv)

    @property
    def output_padding_q(self) -> Tuple[int, ...]:
        # attention.py:323 — outpadding = stride-1 where stride>1
        return tuple(0 if s == 1 else s - 1 for s in self.stride_q)

    @property
    def skip_kernel(self) -> Tuple[int, ...]:
        # attention.py:193 — kernel_skip = [s+1 if s>1 else s for s in stride_q]
        return tuple(s + 1 if s > 1 else s for s in self.stride_q)

    @property
    def skip_pool_on(self) -> bool:
        return len(self.skip_kernel) > 0

    @property
    def skip_upsample_on(self) -> bool:
        # attention.py:463-467 — trilinear upsample unless all strides are 1
        return bool(self.stride_q) and sum(self.stride_q) != len(self.stride_q)


# ----------------------------------------------------------------------------------
# attention-internal pooling / upsampling over all heads at once
# ----------------------------------------------------------------------------------


def _heads_to_grid(x: jax.Array, thw: THW) -> jax.Array:
    """(B, N, L, hd) -> (B, T, H, W, N*hd), channel index = head*hd + d."""
    b, n, l, hd = x.shape
    t, h, w = thw
    return x.transpose(0, 2, 1, 3).reshape(b, t, h, w, n * hd)


def _grid_to_heads(x: jax.Array, num_heads: int) -> Tuple[jax.Array, THW]:
    b, t, h, w, c = x.shape
    hd = c // num_heads
    out = x.reshape(b, t * h * w, num_heads, hd).transpose(0, 2, 1, 3)
    return out, (t, h, w)


def _qkv_col_slice(qkv_p: dict, off: int, dim: int) -> dict:
    """Column slice [off, off+dim) of the fused qkv projection as a linear op."""
    sl = {"w": qkv_p["w"][:, off : off + dim]}
    b = qkv_p.get("b")
    if b is not None:
        sl["b"] = b[off : off + dim]
    return sl


def pooled_proj_token_major(
    qkv_p: dict,
    off: int,
    dim: int,
    xn: jax.Array,
    thw: THW,
    pool_w: jax.Array,
    num_heads: int,
    stride: Sequence[int],
    padding: Sequence[int],
    norm: Optional[dict] = None,
    *,
    transposed: bool = False,
    output_padding: Sequence[int] = (0, 0, 0),
) -> Tuple[jax.Array, THW]:
    """One pooled projection, token-major (the round-3 layout recipe, shared by
    the composite attention and the fused-kernel K/V phase): slice the fused
    qkv weight columns so the matmul emits ONLY this projection straight into a
    conv-ready (B, T, H, W, C) grid — the qkv channel order IS
    ``_heads_to_grid``'s — run the head-tiled depthwise (transposed) conv, and
    split heads only afterwards, with the reference's pool-norm at eps 1e-5
    (attention.py:99-118). Fusing the projections or splitting heads first
    forces fine-resolution split/transpose passes XLA can't eliminate (a slice
    cannot fuse into a conv operand; ~13 ms/block at stem scale, batch 128)."""
    b = xn.shape[0]
    grid = ops.linear_apply(_qkv_col_slice(qkv_p, off, dim), xn).reshape(
        b, *thw, -1)
    w_tiled = jnp.tile(pool_w, (1, 1, 1, 1, num_heads)) if num_heads > 1 else pool_w
    if transposed:
        out_grid = ops.depthwise_conv_transpose3d(
            w_tiled, grid, stride, padding, output_padding)
    else:
        out_grid = ops.depthwise_conv3d(w_tiled, grid, stride, padding)
    out, new_thw = _grid_to_heads(out_grid, num_heads)
    if norm is not None:
        out = ops.layer_norm(norm, out, eps=1e-5)
    return out, new_thw


def pool_heads_conv(
    x: jax.Array,
    w: jax.Array,
    norm: Optional[dict],
    thw: THW,
    stride: Sequence[int],
    padding: Sequence[int],
    has_cls: bool = False,
) -> Tuple[jax.Array, THW]:
    """Depthwise-conv pooling of per-head tokens (attention_pool, attention.py:11-49).

    ``x``: (B, N_heads, L, head_dim); ``w``: (kT,kH,kW,1,head_dim) shared across heads.
    With ``has_cls`` the leading token bypasses the pool and is re-prepended before
    the norm (attention.py:24-43).
    """
    num_heads = x.shape[1]
    cls_tok = None
    if has_cls:
        cls_tok, x = x[:, :, :1], x[:, :, 1:]
    grid = _heads_to_grid(x, thw)
    w_tiled = jnp.tile(w, (1, 1, 1, 1, num_heads)) if num_heads > 1 else w
    pooled = ops.depthwise_conv3d(w_tiled, grid, stride, padding)
    out, thw_new = _grid_to_heads(pooled, num_heads)
    if cls_tok is not None:
        out = jnp.concatenate([cls_tok, out], axis=2)
    if norm is not None:
        # the reference hard-codes nn.LayerNorm (torch-default eps 1e-5) for the
        # q/k/v pool norms (attention.py:206), unlike the 1e-6 block norms
        out = ops.layer_norm(norm, out, eps=1e-5)
    return out, thw_new


def upsample_heads_conv(
    x: jax.Array,
    w: jax.Array,
    norm: Optional[dict],
    thw: THW,
    stride: Sequence[int],
    padding: Sequence[int],
    output_padding: Sequence[int],
) -> Tuple[jax.Array, THW]:
    """ConvTranspose3d upsampling of per-head Q (attention_upsample, attention.py:251-289)."""
    num_heads = x.shape[1]
    grid = _heads_to_grid(x, thw)
    w_tiled = jnp.tile(w, (1, 1, 1, 1, num_heads)) if num_heads > 1 else w
    up = ops.depthwise_conv_transpose3d(w_tiled, grid, stride, padding, output_padding)
    out, thw_new = _grid_to_heads(up, num_heads)
    if norm is not None:
        out = ops.layer_norm(norm, out, eps=1e-5)  # torch-default eps (see pool note)
    return out, thw_new


def pool_tokens_max(
    x: jax.Array, thw: THW, kernel, stride, padding, has_cls: bool = False
) -> Tuple[jax.Array, THW]:
    """MaxPool3d on (B, L, C) tokens — the residual skip path (attention.py:234-241)."""
    cls_tok = None
    if has_cls:
        cls_tok, x = x[:, :1], x[:, 1:]
    b, l, c = x.shape
    t, h, w = thw
    grid = x.reshape(b, t, h, w, c)
    pooled = ops.max_pool3d(grid, kernel, stride, padding)
    t2, h2, w2 = pooled.shape[1:4]
    out = pooled.reshape(b, t2 * h2 * w2, c)
    if cls_tok is not None:
        out = jnp.concatenate([cls_tok, out], axis=1)
    return out, (t2, h2, w2)


def upsample_tokens_trilinear(x: jax.Array, thw: THW, stride: Sequence[int]) -> Tuple[jax.Array, THW]:
    """nn.Upsample(scale_factor=stride, trilinear) on tokens (attention.py:463-467)."""
    b, l, c = x.shape
    t, h, w = thw
    grid = x.reshape(b, t, h, w, c)
    size = (t * stride[0], h * stride[1], w * stride[2])
    up = ops.trilinear_resize(grid, size)
    return up.reshape(b, size[0] * size[1] * size[2], c), size


# ----------------------------------------------------------------------------------
# core attention
# ----------------------------------------------------------------------------------


def _attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mask: Optional[jax.Array] = None,
    fused: bool = False,
    need_attn: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """softmax(q k^T * scale [+ mask]) v with fp32 probabilities.

    q: (B, N, Lq, d); k/v: (B, N, Lk, d). Returns (out (B, N, Lq, d), attn fp32 or
    None). When ``fused`` and the probabilities aren't needed, dispatches to the
    Pallas VMEM-resident kernel (csts_tpu.kernels.attention).
    """
    if fused and not need_attn:
        from csts_tpu.kernels import attention as ka

        if ka.enabled():
            return ka.fused_attention(q, k, v, scale, mask), None
    prec = (
        jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    logits = jnp.einsum(
        "bnqd,bnkd->bnqk", q, k,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bnqk,bnkd->bnqd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(v.dtype)
    return out, attn


def _merge_heads(x: jax.Array) -> jax.Array:
    b, n, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, n * hd)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, l, c = x.shape
    return x.reshape(b, l, num_heads, c // num_heads).transpose(0, 2, 1, 3)


# ----------------------------------------------------------------------------------
# MultiScaleAttention (encoder) — attention.py:52-162
# ----------------------------------------------------------------------------------


def _pool_conv_init(key, head_dim: int, kernel, dtype) -> jax.Array:
    # torch Conv3d(groups=head_dim, bias=False) default init: kaiming uniform with
    # fan_in = prod(kernel) (one input channel per group)
    fan_in = _prod(kernel)
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(
        key, (*kernel, 1, head_dim), dtype, minval=-bound, maxval=bound
    )


def multiscale_attention_init(key: jax.Array, spec: AttentionSpec, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 6)
    hd = spec.head_dim
    p = {
        "qkv": ops.linear_init(keys[0], spec.dim, spec.dim * 3, bias=spec.qkv_bias, dtype=dtype),
        "proj": ops.linear_init(keys[1], spec.dim, spec.dim, dtype=dtype),
    }
    assert spec.mode == "conv", "only 'conv' pooling mode is exercised by CSTS"
    if spec.pool_q_on:
        p["pool_q"] = _pool_conv_init(keys[2], hd, spec.kernel_q, dtype)
        p["norm_q"] = ops.layer_norm_init(hd, dtype)
    if spec.pool_kv_on:
        p["pool_k"] = _pool_conv_init(keys[3], hd, spec.kernel_kv, dtype)
        p["norm_k"] = ops.layer_norm_init(hd, dtype)
        p["pool_v"] = _pool_conv_init(keys[4], hd, spec.kernel_kv, dtype)
        p["norm_v"] = ops.layer_norm_init(hd, dtype)
    return p


def multiscale_attention_apply(
    p: dict,
    spec: AttentionSpec,
    x: jax.Array,
    thw: THW,
    mask: Optional[jax.Array] = None,
    return_attn: bool = False,
    reverse_split: Optional[int] = None,
):
    """Returns (out, thw_q[, attn]).

    ``reverse_split``: TemporalAttention's ``reverse`` mode (av_attention.py:140-146)
    — after pooling, the value rows are rotated so tokens [split:] come first
    (swapping the video/audio halves of the fused sequence).

    Pooled projections run token-major (round 3): each of q/k/v that feeds a
    conv gets its own matmul slice whose (B, L, C) output the depthwise conv
    consumes directly — the qkv channel order IS ``_heads_to_grid``'s — and
    heads split only at the attention input. The fused-qkv form forced a
    materialized 3-way split plus a heads round trip at conv (fine) resolution
    (XLA cannot fuse a slice into a conv operand; ~13 ms/block at stem scale,
    batch 128 — tools/profile_forward.py). ``has_cls`` and conv-free blocks
    keep the fused-qkv path (the cls token bypasses pooling, and without convs
    one fused matmul is strictly better)."""
    b, l, _ = x.shape
    c = spec.num_heads * spec.head_dim
    token_major = not spec.has_cls and ("pool_q" in p or "pool_k" in p)
    q_thw = thw

    if token_major:

        def split_heads(tokens):
            return tokens.reshape(
                b, tokens.shape[1], spec.num_heads, spec.head_dim
            ).transpose(0, 2, 1, 3)

        def plain_proj(idx):
            return split_heads(ops.linear_apply(
                _qkv_col_slice(p["qkv"], idx * spec.dim, spec.dim), x))

        def pooled(idx, w_key, norm_key, transposed: bool):
            q_side = w_key == "pool_q"
            return pooled_proj_token_major(
                p["qkv"], idx * spec.dim, spec.dim, x, thw, p[w_key],
                spec.num_heads,
                spec.stride_q if q_side else spec.stride_kv,
                spec.padding_q if q_side else spec.padding_kv,
                p.get(norm_key),
                transposed=transposed, output_padding=spec.output_padding_q,
            )

        if "pool_q" in p:
            q, q_thw = pooled(0, "pool_q", "norm_q", transposed=spec.upsample_q)
        else:
            q = plain_proj(0)
        if "pool_k" in p:
            k, _ = pooled(1, "pool_k", "norm_k", transposed=False)
            v, _ = pooled(2, "pool_v", "norm_v", transposed=False)
        else:
            k = plain_proj(1)
            v = plain_proj(2)
    else:
        qkv = ops.linear_apply(p["qkv"], x)
        qkv = qkv.reshape(b, l, 3, spec.num_heads, spec.head_dim)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)

        if spec.upsample_q:
            if "pool_q" in p:
                q, q_thw = upsample_heads_conv(
                    q, p["pool_q"], p.get("norm_q"), thw,
                    spec.stride_q, spec.padding_q, spec.output_padding_q,
                )
        elif "pool_q" in p:
            q, q_thw = pool_heads_conv(
                q, p["pool_q"], p.get("norm_q"), thw, spec.stride_q, spec.padding_q,
                has_cls=spec.has_cls,
            )
        if "pool_k" in p:
            k, _ = pool_heads_conv(
                k, p["pool_k"], p.get("norm_k"), thw, spec.stride_kv, spec.padding_kv,
                has_cls=spec.has_cls,
            )
            v, _ = pool_heads_conv(
                v, p["pool_v"], p.get("norm_v"), thw, spec.stride_kv, spec.padding_kv,
                has_cls=spec.has_cls,
            )

    if reverse_split is not None:
        v = jnp.concatenate([v[:, :, reverse_split:], v[:, :, :reverse_split]], axis=2)
    out, attn = _attention_core(
        q, k, v, spec.scale, mask, fused=spec.fused, need_attn=return_attn
    )
    out = ops.linear_apply(p["proj"], _merge_heads(out))
    if return_attn:
        return out, q_thw, attn
    return out, q_thw


def _pooled_kv(p: dict, spec: AttentionSpec, x: jax.Array, thw: THW):
    """Phase 1 for the fused-block kernel: LN1 + the K/V slice of the fused qkv
    projection + depthwise-conv pooling + pool-norm, in XLA (the pooling conv needs
    cross-tile halos, so it stays outside the kernel).

    The head split happens AFTER the pooling conv: the qkv projection packs k's
    channels head-major (head·hd + d), which is exactly ``_heads_to_grid``'s
    channel order, so the conv consumes the matmul output's token-major layout
    directly (a lane slice + bitcast reshape). Splitting heads first — the
    obvious (B, heads, L, hd) form — materialized two fine-resolution head
    transposes per block plus a k/v split pass (~13 ms/block at stem scale,
    batch 128; tools/profile_forward.py timeline). At the pooled Lk the
    transpose is noise."""
    xn = ops.layer_norm(p["norm1"], x)
    b = x.shape[0]
    if "pool_k" in p["attn"]:
        # separate k and v matmuls (pooled_proj_token_major): one fused
        # (B,L,2C) projection forces a materialized split pass before the
        # convs (XLA cannot fuse a slice into a convolution operand —
        # measured 4.9 ms/block at stem scale)
        attn_p = p["attn"]
        k, _ = pooled_proj_token_major(
            attn_p["qkv"], spec.dim, spec.dim, xn, thw, attn_p["pool_k"],
            spec.num_heads, spec.stride_kv, spec.padding_kv,
            attn_p.get("norm_k"))
        v, _ = pooled_proj_token_major(
            attn_p["qkv"], 2 * spec.dim, spec.dim, xn, thw, attn_p["pool_v"],
            spec.num_heads, spec.stride_kv, spec.padding_kv,
            attn_p.get("norm_v"))
        return k, v
    kv_w = _qkv_col_slice(p["attn"]["qkv"], spec.dim, 2 * spec.dim)
    kv = ops.linear_apply(kv_w, xn)
    l = kv.shape[1]
    kv = kv.reshape(b, l, 2, spec.num_heads, spec.head_dim)
    k = kv[:, :, 0].transpose(0, 2, 1, 3)
    v = kv[:, :, 1].transpose(0, 2, 1, 3)
    return k, v


def _slot_q_proj(p: dict, spec: AttentionSpec, xn: jax.Array) -> jax.Array:
    """LN1'd tokens -> (B, L, heads·hd_p) Q with each head in its own 128k-lane
    slot, emitted DIRECTLY by the matmul: the Q weight/bias columns are padded to
    the slot layout, so the zero lanes come out of the MXU for free. Padding the
    activations instead cost a full-tensor pad pass per block (3.3 ms at stem
    scale, batch 128 — tools/profile_forward.py timeline)."""
    hd, heads = spec.head_dim, spec.num_heads
    hd_p = (hd + 127) // 128 * 128
    wq = p["attn"]["qkv"]["w"][:, : spec.dim].reshape(-1, heads, hd)
    slot_w = {"w": jnp.pad(wq, [(0, 0), (0, 0), (0, hd_p - hd)]).reshape(-1, heads * hd_p)}
    if "b" in p["attn"]["qkv"]:
        bq = p["attn"]["qkv"]["b"][: spec.dim].reshape(heads, hd)
        slot_w["b"] = jnp.pad(bq, [(0, 0), (0, hd_p - hd)]).reshape(heads * hd_p)
    return ops.linear_apply(slot_w, xn)


def _coarse_q_slots(p: dict, spec: AttentionSpec, x: jax.Array, thw: THW):
    """Phase 1 for the fused decoder kernel (kernels/block.py): LN1 + the Q slice of
    the fused qkv projection, emitted as a COARSE grid with each head padded
    into its own 128k-lane channel slot (pads zero) and one zero plane/row/column
    on every spatial side — the kernel's halo windows then never go out of range
    AND out-of-range taps read zeros directly, so the kernel does no validity
    multiply or per-window pad (both measured ~33 ms at d3/batch 128). The
    subpixel upsample conv and the pool-norm LayerNorm run inside the kernel, so
    fine-resolution Q never exists in HBM (attention.py:251-289).

    Heads-folded blocks (kb.decoder_heads_in_lanes) take the 5-D heads-IN-LANES
    layout (B, T+2, H+2, W+2, heads·hd_p) — the matmul output order, no
    transpose; the kernel slices each head's lane slot statically. The dim-768
    blocks (heads on the Pallas grid) keep the heads-major 6-D layout so their
    view index maps stay head-independent (a per-head-indexed view refetches
    per head step — measured 12 GB of view traffic at d4 in round 2)."""
    from csts_tpu.kernels import block as kb

    xn = ops.layer_norm(p["norm1"], x)
    t, h, w = thw
    b = x.shape[0]
    hd, heads = spec.head_dim, spec.num_heads
    hd_p = (hd + 127) // 128 * 128
    q = _slot_q_proj(p, spec, xn)  # (B, L, heads·hd_p) at coarse resolution
    if kb.decoder_heads_in_lanes(spec):
        grid = q.reshape(b, t, h, w, heads * hd_p)
        return jnp.pad(grid, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    grid = q.reshape(b, t, h, w, heads, hd_p).transpose(0, 1, 4, 2, 3, 5)
    return jnp.pad(grid, [(0, 0), (1, 1), (0, 0), (1, 1), (1, 1), (0, 0)])


def _pool_q_slots(p: dict, spec: AttentionSpec, x: jax.Array, thw: THW, r_out: int):
    """Fine-resolution Q for the fused Q-pool kernel (kernels/block.py): LN1 + the
    Q slice of the qkv projection in the 5-D heads-in-lanes slot layout
    (B, T, 1+H_f+(2·r_out−1), W_f, heads·hd_p) — matmul-native, no transpose —
    with rows padded (1 zero top, 2·r_out−1 zeros bottom) so the kernel's
    two-row-block halo windows are always whole blocks."""
    xn = ops.layer_norm(p["norm1"], x)
    b = x.shape[0]
    t, h, w = thw
    hd, heads = spec.head_dim, spec.num_heads
    hd_p = (hd + 127) // 128 * 128
    q = _slot_q_proj(p, spec, xn)
    grid = q.reshape(b, t, h, w, heads * hd_p)
    rb = 2 * r_out
    return jnp.pad(grid, [(0, 0), (0, 0), (1, rb - 1), (0, 0), (0, 0)])


def _static_pool_out(thw: THW, kernel, stride, padding) -> THW:
    return tuple(
        (d + 2 * p - k) // s + 1 for d, k, s, p in zip(thw, kernel, stride, padding)
    )


def _static_upsample_out(thw: THW, kernel, stride, padding, output_padding) -> THW:
    return tuple(
        (d - 1) * s - 2 * p + k + op
        for d, k, s, p, op in zip(thw, kernel, stride, padding, output_padding)
    )


# ----------------------------------------------------------------------------------
# MultiScaleBlock (encoder & decoder share this skeleton) — attention.py:165-248,395-479
# ----------------------------------------------------------------------------------


def multiscale_block_init(key: jax.Array, spec: AttentionSpec, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 5)
    hidden = int(spec.dim * spec.mlp_ratio) if not spec.upsample_q else int(spec.dim_out * spec.mlp_ratio)
    p = {
        "norm1": ops.layer_norm_init(spec.dim, dtype),
        "attn": multiscale_attention_init(keys[0], spec, dtype),
        "norm2": ops.layer_norm_init(spec.dim, dtype),
        "mlp": ops.mlp_init(keys[1], spec.dim, hidden, spec.dim_out, dtype),
    }
    if spec.dim != spec.dim_out:
        p["proj"] = ops.linear_init(keys[2], spec.dim, spec.dim_out, dtype=dtype)
    return p


def multiscale_block_apply(
    p: dict,
    spec: AttentionSpec,
    x: jax.Array,
    thw: THW,
    *,
    mask: Optional[jax.Array] = None,
    drop_path_key: Optional[jax.Array] = None,
    deterministic: bool = True,
    return_attn: bool = False,
    reverse_split: Optional[int] = None,
    drop_path_rate: Optional[jax.Array] = None,
):
    """Pre-LN attention + residual (pooled/upsampled skip) + MLP.

    ``drop_path_rate``, when given, overrides ``spec.drop_path`` with a traced
    scalar — the pipelined identity-block stack (parallel/pipeline.py) shares
    one static spec across stacked blocks and threads the per-block stochastic-
    depth ramp through as data.

    Reference quirks replicated exactly:
    * the residual skip is MaxPool3d (encoder, attention.py:234-241) or trilinear
      upsample (decoder, attention.py:463-472) of the *unnormed* input;
    * when dim != dim_out the second residual is ``proj(norm2(x))``, i.e. the MLP
      residual uses the *normed* activations (attention.py:243-247);
    * fusion blocks pass stride_q=() so both skip transforms are identity
      (av_attention.py:231,449 set pool_skip = None).

    Eligible identity-skip blocks dispatch the whole post-KV computation to the
    fused Pallas mega-kernel (kernels/block.py) on TPU — the HBM-traffic fix for
    the bandwidth-bound profile.
    """
    from csts_tpu.kernels import attention as ka
    from csts_tpu.kernels import block as kb

    if (
        kb.eligible(spec, mask, deterministic)
        and ka.enabled()
        and not return_attn
        and spec.dim <= 768  # VMEM budget for the resident MLP weights
        and x.shape[1] % 128 == 0  # token tiles must align to sublane tiling
    ):
        k, v = _pooled_kv(p, spec, x, thw)
        out = kb.fused_block(x, k, v, p, spec)
        return out, thw

    # decoder (upsample-Q) blocks: only the trilinear skip is materialized at fine
    # resolution in XLA; the q upsample conv, pool norm, 64-token attention, proj,
    # residual and MLP tail all run fused per fine-token tile
    if (
        spec.upsample_q
        and "pool_q" in p["attn"]
        and ka.enabled()
        and not return_attn
        and reverse_split is None
    ):
        thw_f = _static_upsample_out(
            thw, spec.kernel_q, spec.stride_q, spec.padding_q, spec.output_padding_q
        )
        lk_thw = (
            _static_pool_out(thw, spec.kernel_kv, spec.stride_kv, spec.padding_kv)
            if spec.pool_kv_on
            else thw
        )
        lk = lk_thw[0] * lk_thw[1] * lk_thw[2]
        if kb.decoder_eligible(spec, mask, True, thw_f, lk):
            if deterministic:
                return _decoder_kernel_forward(x, p, spec, thw, thw_f), thw_f
            if spec.drop_path == 0.0 and ka.train_decoder_enabled():
                # exact in training too (no stochastic depth in the decoder,
                # custom_multimodal_builder.py:288); backward recomputes the
                # composite block
                return _decoder_block_ad(x, p, spec, thw, tuple(thw_f)), thw_f

    # encoder Q-pool (stage-transition) blocks: LN1+Q-projection stay one XLA
    # matmul; the q pool conv, pool norm, attention, MaxPool skip, residual and
    # MLP tail run fused per coarse-row tile
    if (
        not spec.upsample_q
        and spec.pool_q_on
        and "pool_q" in p["attn"]
        and ka.enabled()
        and not return_attn
        and reverse_split is None
    ):
        lk_thw = (
            _static_pool_out(thw, spec.kernel_kv, spec.stride_kv, spec.padding_kv)
            if spec.pool_kv_on
            else thw
        )
        lk = lk_thw[0] * lk_thw[1] * lk_thw[2]
        if kb.pool_block_eligible(spec, mask, deterministic, thw, lk):
            r_out = kb._pool_tile_plan(spec, thw)[0]
            k, v = _pooled_kv(p, spec, x, thw)
            q6 = _pool_q_slots(p, spec, x, thw, r_out)
            pad = tuple(int(kk // 2) for kk in spec.skip_kernel)
            skip, _ = pool_tokens_max(x, thw, spec.skip_kernel, spec.stride_q, pad)
            out = kb.fused_pool_block(q6, skip, k, v, p, spec, thw)
            return out, (thw[0], thw[1] // 2, thw[2] // 2)

    # during training the attention kernel's VJP recomputes through the composite;
    # whether that wins is measured (tools/ab_train.py) and gated here
    attn_spec = spec
    if not deterministic and spec.fused and not ka.train_attention_enabled():
        import dataclasses as _dc

        attn_spec = _dc.replace(spec, fused=False)
    attn_out = multiscale_attention_apply(
        p["attn"], attn_spec, ops.layer_norm(p["norm1"], x), thw,
        mask=mask, return_attn=return_attn, reverse_split=reverse_split,
    )
    if return_attn:
        x_block, thw_new, attn = attn_out
    else:
        x_block, thw_new = attn_out

    if spec.upsample_q:
        if spec.skip_upsample_on:
            x_res, _ = upsample_tokens_trilinear(x, thw, spec.stride_q)
        else:
            x_res = x
    else:
        if spec.skip_pool_on:
            pad = tuple(int(k // 2) for k in spec.skip_kernel)
            x_res, _ = pool_tokens_max(
                x, thw, spec.skip_kernel, spec.stride_q, pad, has_cls=spec.has_cls
            )
        else:
            x_res = x

    dp_rate = spec.drop_path if drop_path_rate is None else drop_path_rate
    k1 = k2 = None
    if drop_path_key is not None:
        k1, k2 = jax.random.split(drop_path_key)
    x = x_res + ops.drop_path(x_block, dp_rate, k1, deterministic)

    # second half of the block — fused LN2+MLP+proj+residual kernel when possible
    if (
        kb.tail_eligible(spec, deterministic, x.shape[1])
        and ka.enabled()
        and mask is None
    ):
        x = kb.fused_mlp_tail(x, p, spec)
        if return_attn:
            return x, thw_new, attn
        return x, thw_new

    # training: same fusion with a stored-residual VJP; stochastic depth folds into
    # the kernel as a per-sample multiplier on the MLP branch
    if (
        not deterministic
        and kb.tail_train_eligible(spec, x.shape[1])
        and ka.enabled()
        and mask is None
    ):
        bsz = x.shape[0]
        traced_rate = drop_path_rate is not None
        if (traced_rate or spec.drop_path > 0.0) and k2 is not None:
            # with a traced rate the >0 short-circuit can't be static; the
            # bernoulli(keep=1.0) limit is the same all-ones mask
            keep = 1.0 - dp_rate
            dp_mask = jax.random.bernoulli(k2, keep, (bsz,)).astype(jnp.float32) / keep
        else:
            dp_mask = jnp.ones((bsz,), jnp.float32)
        x = kb.fused_mlp_tail_train(x, p, spec, dp_mask)
        if return_attn:
            return x, thw_new, attn
        return x, thw_new

    x_norm = ops.layer_norm(p["norm2"], x)
    x_mlp = ops.mlp_apply(p["mlp"], x_norm)
    if spec.dim != spec.dim_out:
        x = ops.linear_apply(p["proj"], x_norm)
    x = x + ops.drop_path(x_mlp, dp_rate, k2, deterministic)
    if return_attn:
        return x, thw_new, attn
    return x, thw_new


def _decoder_kernel_forward(x, p, spec, thw, thw_f):
    """Assemble the fused decoder-block kernel's inputs (coarse Q slots, pooled
    K/V, trilinear skip) and run it. thw/thw_f: coarse/fine grids."""
    from csts_tpu.kernels import block as kb
    from csts_tpu.kernels import upsample as kup

    k, v = _pooled_kv(p, spec, x, thw)
    q6 = _coarse_q_slots(p, spec, x, thw)
    if spec.skip_upsample_on:
        if kup.T2_SKIP_KERNEL and kup.eligible(spec, thw, thw_f):
            # stride-(2,1,1) skips: fused T-interp emitting the decoder
            # kernel's lane-padded token-major skip_in directly (kills the
            # XLA resize's relayout/pad pipeline — see kernels/upsample.py)
            skip = kup.t2_upsample_padded(x, thw)
        elif kup.HW2_SKIP_KERNEL and kup.hw2_eligible(spec, thw, thw_f):
            # stride-(1,2,2) skips (d2/d3): whole-plane in-VMEM separable interp
            skip = kup.hw2_upsample(x, thw)
        else:
            skip, _ = upsample_tokens_trilinear(x, thw, spec.stride_q)
    else:
        skip = x
    return kb.fused_decoder_block(q6, skip, k, v, p, spec, thw_f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _decoder_block_ad(x, p, spec, thw, thw_f):
    return _decoder_kernel_forward(x, p, spec, thw, thw_f)


def _dec_ad_fwd(x, p, spec, thw, thw_f):
    return _decoder_kernel_forward(x, p, spec, thw, thw_f), (x, p)


def _dec_ad_bwd(spec, thw, thw_f, residuals, g):
    """Recompute backward through the XLA composite block (valid because the
    eligible decoder blocks have drop_path == 0, so the deterministic composite
    IS the training forward)."""
    import dataclasses as _dc

    x, p = residuals
    spec_nf = _dc.replace(spec, fused=False)

    def comp(x_, p_):
        out, _ = multiscale_block_apply(p_, spec_nf, x_, thw, deterministic=True)
        return out

    _, vjp = jax.vjp(comp, x, p)
    return vjp(g)


_decoder_block_ad.defvjp(_dec_ad_fwd, _dec_ad_bwd)


# ----------------------------------------------------------------------------------
# Spatial-fusion in-frame mask — av_attention.py:336-346, precomputed
# ----------------------------------------------------------------------------------


def build_inframe_mask(thw: THW, num_audio_tokens: int) -> np.ndarray:
    """Additive fp32 mask (L, L): 0 where attention is allowed, -1e8 elsewhere.

    Token layout: [T*H*W video tokens frame-major, then T audio tokens]. A video token
    of frame t may attend to frame t's video tokens and audio token t; audio token t may
    attend to frame t's video tokens and itself. Exactly reproduces the offset matrix
    the reference rebuilds per forward with a Python loop (av_attention.py:337-346).
    """
    t, h, w = thw
    assert num_audio_tokens == t
    hw = h * w
    total = t * hw + t
    mask = np.full((total, total), -1e8, dtype=np.float32)
    for f in range(t):
        sl = slice(hw * f, hw * (f + 1))
        mask[sl, sl] = 0.0
        mask[sl, t * hw + f] = 0.0
        mask[t * hw + f, sl] = 0.0
        mask[t * hw + f, t * hw + f] = 0.0
    return mask


def extract_audio_attention(attn: jax.Array, thw: THW) -> jax.Array:
    """Per-frame audio→video attention map, min-max rescaled (av_attention.py:360-370).

    ``attn``: (B, N, L, L) fp32 probabilities from the spatial-fusion block.
    Returns (B, N, T, H, W) in [0, 1].
    """
    t, h, w = thw
    hw = h * w
    thw_total = t * hw
    rows = []
    for f in range(t):
        rows.append(attn[:, :, thw_total + f, hw * f : hw * (f + 1)])
    audio_attn = jnp.stack(rows, axis=2)  # (B, N, T, HW)
    amax = jnp.max(audio_attn, axis=-1, keepdims=True)
    amin = jnp.min(audio_attn, axis=-1, keepdims=True)
    rescaled = (audio_attn - amin) / (amax - amin + 1e-8)
    return rescaled.reshape(*rescaled.shape[:2], t, h, w)
