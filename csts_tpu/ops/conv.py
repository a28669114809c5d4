"""3-D convolution / pooling primitives, channels-last (NDHWC), XLA-native.

These are the TPU equivalents of the cuDNN ops the reference leans on
(``nn.Conv3d`` / ``nn.ConvTranspose3d`` / ``nn.MaxPool3d`` in
``slowfast/models/attention.py`` and ``stem_helper.py``). Everything here is expressed
through ``lax.conv_general_dilated`` / ``lax.reduce_window`` so XLA can tile the work
onto the MXU and fuse surrounding elementwise ops.

Layout convention (TPU-first): activations are ``(B, T, H, W, C)`` — channels last, so
the channel dim maps onto the 128-wide lane dimension of the VPU/MXU. Weights are
``(kT, kH, kW, C_in_per_group, C_out)`` (DHWIO). The torch→jax checkpoint converter
transposes from torch's OIDHW at load time.

Numerical-parity notes (validated against torch CPU in tests/test_ops_parity.py):
* padding is symmetric SAME-style pairs, matching torch's single-int padding,
* transposed conv reproduces ``nn.ConvTranspose3d(stride, padding, output_padding)``
  exactly via lhs dilation + flipped kernels (attention.py:344-349),
* max pool pads with -inf like torch (padding never wins the max).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMSPEC = ("NDHWC", "DHWIO", "NDHWC")

# fp32 inputs use full-precision convs (TPU's DEFAULT would silently drop to bf16
# passes — a 3e-3 error against the torch goldens). bf16 activations already multiply
# in bf16 with fp32 accumulation, where HIGHEST would force a slow multi-pass fp32
# emulation — so pick per dtype.
def _precision(dtype):
    return lax.Precision.DEFAULT if dtype == jnp.bfloat16 else lax.Precision.HIGHEST


def conv3d_init(
    key: jax.Array,
    dim_in: int,
    dim_out: int,
    kernel: Sequence[int],
    groups: int = 1,
    bias: bool = True,
    dtype=jnp.float32,
) -> dict:
    """Kaiming-uniform init matching torch Conv3d's default (for from-scratch training)."""
    kt, kh, kw = kernel
    fan_in = (dim_in // groups) * kt * kh * kw
    bound = float(1.0 / np.sqrt(fan_in)) if fan_in > 0 else 0.0
    wkey, bkey = jax.random.split(key)
    # Torch uses kaiming_uniform(a=sqrt(5)) => U(-sqrt(6/((1+5)*fan_in)), ...) = U(-1/sqrt(fan_in),...)
    w = jax.random.uniform(
        wkey, (kt, kh, kw, dim_in // groups, dim_out), dtype, minval=-bound, maxval=bound
    )
    params = {"w": w}
    if bias:
        params["b"] = jax.random.uniform(bkey, (dim_out,), dtype, minval=-bound, maxval=bound)
    return params


def conv3d(
    params: dict,
    x: jax.Array,
    stride: Sequence[int],
    padding: Sequence[int],
    groups: int = 1,
) -> jax.Array:
    """Standard conv, ``x``: (B, T, H, W, C_in) -> (B, T', H', W', C_out)."""
    pad = [(int(p), int(p)) for p in padding]
    w = params["w"]
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=tuple(int(s) for s in stride),
        padding=pad,
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
        precision=_precision(x.dtype),
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def _depthwise_conv3d_xla(
    w: jax.Array,
    x: jax.Array,
    stride: Sequence[int],
    padding: Sequence[int],
) -> jax.Array:
    c = x.shape[-1]
    pad = [(int(p), int(p)) for p in padding]
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=tuple(int(s) for s in stride),
        padding=pad,
        dimension_numbers=_DIMSPEC,
        feature_group_count=c,
        precision=_precision(x.dtype),
    )


def depthwise_conv3d(
    w: jax.Array,
    x: jax.Array,
    stride: Sequence[int],
    padding: Sequence[int],
) -> jax.Array:
    """Depthwise conv (groups == channels), the attention q/k/v pooling op.

    ``w``: (kT, kH, kW, 1, C); ``x``: (B, T, H, W, C). Equivalent of the per-head
    ``nn.Conv3d(head_dim, head_dim, groups=head_dim, bias=False)`` in
    ``attention.py:104-116`` — callers tile the per-head weight across heads so all
    heads run as one fused depthwise conv instead of a B*heads batched loop.

    The real fix for the HOT depthwise convs is consuming Q at coarse resolution
    inside the fused decoder / Q-pool block kernels (kernels/block.py);
    everything else stays on this grouped path, which is the best of FIVE
    lowerings measured at batch 32 (tools/bench_ops.py, round 2; the losers were
    removed — git history has them): grouped (q-pool b1 5.9 ms) < diagonal-dense
    conv (taps on the diagonal of a (3,3,3,C,C) weight, groups=1 — 7.2 ms, plus
    a ~1 h remote-compile stall on the first diag shape) < Pallas whole-plane
    stencil (9.9 ms; fp32 plane temporaries + per-tap sublane-shift relayouts
    OOM the 16 MB VMEM budget at the decoder d3 shape) << shift-multiply-add
    stacks (43.6 ms — XLA materializes every strided slice). A whole-grid
    one-step-per-batch Pallas kernel for the small stage-2/3 K/V pool grids
    measured NEUTRAL where it fit (kv-pool b4 1.08 vs 1.10 ms; the ~1 ms cost is
    the surrounding head-layout relayouts, not the conv) and OOM'd at C=768.
    TRAINING (round 4): JAX's stock transpose of the grouped formulation is
    catastrophic on this chip — the train-step per-op profile (batch 16,
    tools/profile_forward.py --train) showed the kv-pool convs' backward
    family at ~90x the eval forward's per-clip cost (stage-3 768-dim
    stride-1 pools: 23.7 ms each at 3.2 GB/s, f32 batch-minor outputs;
    convolution fusions = 295-320 of the 417 ms step). Per-op train profiles
    pinned the pathology on XLA layout assignment, NOT the gradient
    formulation: the FORWARD pool convs inside the train graph emit f32
    batch-in-sublanes {4,0,3,2,1} outputs (9.95 ms each vs ~0.7 ms for the
    same conv in the eval graph), every grad lowering is fine in isolation
    (tools/ab_dwconv.py), and ``DW_CUSTOM_VJP`` (subpixel-transposed-conv dx,
    stock dw — the 27-tap strided-reduce dw variant measured slower and its
    padded-x temporary OOM'd train batch 16) measured neutral end to end.
    ``DW_BARRIER`` is the layout fix under test instead.
    """
    if DW_CUSTOM_VJP:
        y = depthwise_conv3d_cv(
            w, x, tuple(int(s) for s in stride), tuple(int(p) for p in padding)
        )
    else:
        y = _depthwise_conv3d_xla(w, x, stride, padding)
    if DW_BARRIER:
        y = lax.optimization_barrier(y)
    return y


# Route depthwise_conv3d gradients through the custom VJP below (dev flag;
# measured NEUTRAL-to-slightly-worse in the train-step per-op profile —
# total 235.5 stock vs 238.0 custom ms at batch 8, conv fusions 184.38 vs
# 184.31, the pathological ops identical under both formulations — because
# the poisoned layout hits the FORWARD pool convs inside the train graph,
# not the gradient formulation; see DW_BARRIER). Stock autodiff is the
# configuration of record; the machinery stays for measurement
# (tools/ab_dwconv.py, tools/ab_train.py --dwvjp-ab).
DW_CUSTOM_VJP = False

# Layout-poisoning experiment: the train-step profile shows the SAME kv-pool
# convs that stream fine in the eval graph emitting f32 batch-in-sublanes
# {4,0,3,2,1} outputs inside the train graph (9.95 ms vs ~0.7 ms at batch 8,
# 3.8 GB/s) — XLA layout assignment serves a backward consumer at the conv's
# expense. DW_BARRIER puts an optimization_barrier on the conv output (and on
# dx in the custom VJP) so the conv keeps its natural layout and the consumer
# pays an explicit relayout copy (~550 GB/s class) instead. Measured on-chip
# (profile_forward --train, batch 8): 235.5 -> 131.2 ms/iter device-op (-44%),
# conv fusions 184.4 -> 78.5, no offsetting copy growth. Default OFF for eval
# graphs (their conv fusions are healthy); make_train_step turns it on at
# trace time unless DW_BARRIER_TRAIN_AUTO is cleared (measurement tools clear
# it to A/B the poisoned configuration).
DW_BARRIER = False
DW_BARRIER_TRAIN_AUTO = True


def _depthwise_weight_grad(wshape, x, g, stride, padding):
    """Weight-grad of the depthwise conv as kT·kH·kW strided-slice
    multiply-reduces (one per tap), accumulated in fp32.

    Stock autodiff emits a batch_group_count conv whose TPU lowering ran at
    ~22 GB/s in the train profile; each tap here is a plain elementwise
    multiply + full reduce that XLA streams at the elementwise rate."""
    kt, kh, kw, _, c = (int(v) for v in wshape)
    st, sh, sw = (int(s) for s in stride)
    b = x.shape[0]
    to, ho, wo = g.shape[1:4]
    xp = jnp.pad(x, [(0, 0)] + [(int(p), int(p)) for p in padding] + [(0, 0)])
    g32 = g.astype(jnp.float32)
    taps = []
    for dt in range(kt):
        for dh in range(kh):
            for dw_ in range(kw):
                xs = lax.slice(
                    xp,
                    (0, dt, dh, dw_, 0),
                    (b, dt + (to - 1) * st + 1, dh + (ho - 1) * sh + 1,
                     dw_ + (wo - 1) * sw + 1, c),
                    (1, st, sh, sw, 1),
                )
                taps.append(jnp.sum(xs.astype(jnp.float32) * g32, axis=(0, 1, 2, 3)))
    return jnp.stack(taps).reshape(kt, kh, kw, 1, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv3d_cv(w, x, stride, padding):
    """depthwise_conv3d with hand-picked gradient lowerings (see its docstring).
    ``stride``/``padding`` must be tuples (static)."""
    return _depthwise_conv3d_xla(w, x, stride, padding)


def _dw_cv_fwd(w, x, stride, padding):
    return _depthwise_conv3d_xla(w, x, stride, padding), (w, x)


def _dw_cv_bwd(stride, padding, res, g):
    w, x = res
    g = g.astype(x.dtype)
    k = tuple(int(v) for v in w.shape[:3])
    # output_padding that makes the transposed conv recover x's spatial shape
    op = tuple(
        int(x.shape[1 + d])
        - ((int(g.shape[1 + d]) - 1) * stride[d] - 2 * padding[d] + k[d])
        for d in range(3)
    )
    # dx: the subpixel transposed-conv lowering in the activation dtype. The
    # bad in-train lowering is context, not formulation (the isolated stock
    # grad is fine — tools/ab_dwconv.py): the train consumers force an f32
    # batch-minor output layout onto the stock dx conv, which then runs at
    # 3.2 GB/s. The subpixel phase convs emit default-layout bf16.
    dx = _depthwise_conv_transpose3d_xla(w, g, stride, padding, op)
    # dw: stock transpose-rule formulation (the 27-tap strided-reduce variant
    # measured slower AND its padded-x temporary OOM'd HBM at train batch 16)
    _, pull = jax.vjp(lambda w_: _depthwise_conv3d_xla(w_, x, stride, padding), w)
    dw, = pull(g)
    dx = dx.astype(x.dtype)
    if DW_BARRIER:
        dx = lax.optimization_barrier(dx)
    return dw.astype(w.dtype), dx


depthwise_conv3d_cv.defvjp(_dw_cv_fwd, _dw_cv_bwd)


def _transpose_phase_plan(k: int, s: int, p: int, op: int, l: int):
    """Per-dim subpixel plan for one output phase set.

    For out[s·m + r] = Σ_j w[s·j + r + p] · x[m − j] (the transposed-conv identity),
    phase r is an ordinary correlation whose taps are the strided weight slice
    ``w[s·j_max + r + p :: -s]``. Returns, per phase r: (tap start index, tap count,
    pad_low, pad_high, phase length). None if the phases have unequal lengths
    (odd output size — fall back to the general path)."""
    l_out = (l - 1) * s - 2 * p + k + op
    plans = []
    lens = set()
    for r in range(s):
        js = [j for j in range(-k, k + 1) if 0 <= s * j + r + p < k]
        if not js or js != list(range(js[0], js[-1] + 1)):
            return None  # non-contiguous taps (never for k=3,s<=2) — fallback
        j_min, j_max = js[0], js[-1]
        l_r = (l_out - r + s - 1) // s
        lens.add(l_r)
        pad_low = j_max
        pad_high = (l_r - 1 - j_min) - (l - 1)
        if pad_low < 0 or pad_high < 0:
            return None
        plans.append((s * j_max + r + p, len(js), pad_low, pad_high, l_r))
    if len(lens) != 1:
        return None
    return plans


def _depthwise_conv_transpose3d_xla(
    w: jax.Array,
    x: jax.Array,
    stride: Sequence[int],
    padding: Sequence[int],
    output_padding: Sequence[int],
) -> jax.Array:
    """Depthwise transposed conv == torch ``nn.ConvTranspose3d(..., groups=C)``.

    The reference's decoder Q-upsample (``attention.py:344-349``). XLA's native
    lowering (lhs-dilated conv over zero-stuffed input) wastes ~s³× of the work and
    measured ~6 ms/block at the decoder's big stages — so for stride ≤ 2 this runs
    the SUBPIXEL decomposition instead: each output parity phase
    ``out[s·m + r] = Σ_j w[s·j + r + p] · x[m − j]`` is a small DENSE depthwise
    correlation (kernel 1-3 taps per dim); phases are computed independently and
    interleaved with a reshape (inverse pixel-shuffle). Same math, no zero
    multiplies, conv shapes XLA tiles well.

    ``w``: (kT, kH, kW, 1, C), natural DHWIO order (the flip for the general path
    happens here so the torch→jax converter stays a pure transpose).
    """
    c = x.shape[-1]
    k = tuple(int(d) for d in w.shape[:3])
    stride = tuple(int(s) for s in stride)
    padding = tuple(int(p) for p in padding)
    output_padding = tuple(int(o) for o in output_padding)

    plans = [
        _transpose_phase_plan(k[d], stride[d], padding[d], output_padding[d], x.shape[1 + d])
        for d in range(3)
    ]
    if all(pl is not None for pl in plans) and max(stride) <= 2:
        phases = []
        for rt in range(stride[0]):
            for rh in range(stride[1]):
                for rw in range(stride[2]):
                    sel = (plans[0][rt], plans[1][rh], plans[2][rw])
                    wk = w
                    for d, (start, count, _, _, _) in enumerate(sel):
                        idx = [start - stride[d] * a for a in range(count)]
                        wk = jnp.take(wk, jnp.asarray(idx), axis=d)
                    pad = [(pl[2], pl[3]) for pl in sel]
                    phases.append(
                        lax.conv_general_dilated(
                            x, wk.astype(x.dtype), window_strides=(1, 1, 1),
                            padding=pad, dimension_numbers=_DIMSPEC,
                            feature_group_count=c, precision=_precision(x.dtype),
                        )
                    )
        b = x.shape[0]
        t0, h0, w0 = (pl[0][4] for pl in plans)
        st, sh, sw = stride
        out = jnp.stack(phases)  # (st·sh·sw, B, T0, H0, W0, C)
        out = out.reshape(st, sh, sw, b, t0, h0, w0, c)
        out = out.transpose(3, 4, 0, 5, 1, 6, 2, 7)  # (B, T0, st, H0, sh, W0, sw, C)
        return out.reshape(b, t0 * st, h0 * sh, w0 * sw, c)

    # general fallback: gradient-of-conv formulation (lhs dilation + flipped kernel)
    pad = [
        (int(k[d] - 1 - padding[d]), int(k[d] - 1 - padding[d] + output_padding[d]))
        for d in range(3)
    ]
    w_flipped = jnp.flip(w, axis=(0, 1, 2))
    return lax.conv_general_dilated(
        x,
        w_flipped.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=pad,
        lhs_dilation=tuple(int(s) for s in stride),
        dimension_numbers=_DIMSPEC,
        feature_group_count=c,
        precision=_precision(x.dtype),
    )


def depthwise_conv_transpose3d(
    w: jax.Array,
    x: jax.Array,
    stride: Sequence[int],
    padding: Sequence[int],
    output_padding: Sequence[int],
) -> jax.Array:
    """Depthwise transposed conv (see _depthwise_conv_transpose3d_xla for the math).

    The decoder q-upsamples that made this op hot (24-28 ms at batch 32 where
    ~1 ms of bandwidth is needed) now run inside the fused decoder kernel
    (kernels/block.py) and never reach this path at inference; see
    depthwise_conv3d for the measured-slower alternative lowerings. JAX
    differentiates the subpixel/XLA formulation directly."""
    return _depthwise_conv_transpose3d_xla(w, x, stride, padding, output_padding)


def max_pool3d(
    x: jax.Array,
    kernel: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
) -> jax.Array:
    """Torch-parity MaxPool3d (ceil_mode=False, -inf padding). attention.py:234-236."""
    kt, kh, kw = (int(v) for v in kernel)
    pad = [(0, 0)] + [(int(p), int(p)) for p in padding] + [(0, 0)]
    neg_inf = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    )
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, kt, kh, kw, 1),
        window_strides=(1, *(int(s) for s in stride), 1),
        padding=pad,
    )


def avg_pool3d(
    x: jax.Array,
    kernel: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
) -> jax.Array:
    """Torch-parity AvgPool3d (count_include_pad=True, matching torch's default)."""
    kt, kh, kw = (int(v) for v in kernel)
    pad = [(0, 0)] + [(int(p), int(p)) for p in padding] + [(0, 0)]
    summed = lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, kt, kh, kw, 1),
        window_strides=(1, *(int(s) for s in stride), 1),
        padding=pad,
    )
    return summed / (kt * kh * kw)
