"""CSTS: audio-visual egocentric gaze model, TPU-native.

Capability-parity rebuild of the reference architecture
(``slowfast/models/custom_multimodal_builder.py:19-499``): dual-branch MViT encoder
(16-block video / 4-block audio), correlation-based spatial+temporal audio-visual
fusion, and a 4-block transformer decoder emitting per-frame gaze heatmap logits
``(B, T_out, 64, 64, 1)`` (channels-last here; the reference emits (B, 1, 8, 64, 64)).

Everything static (block dims/strides/thw trajectories, the fusion mask) is derived
once at spec-build time; ``csts_apply`` is a pure function of (params, inputs, rng)
that jits to a single XLA program with no Python in the hot path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csts_tpu import ops
from csts_tpu.config import Config
from csts_tpu.models import mvit
from csts_tpu.parallel import pipeline as pipeline_lib
from csts_tpu.parallel.mesh import seq_constraint
from csts_tpu.models.mvit import AttentionSpec, THW, round_width

# Classify the stem skip BEFORE its T-resize (exact commute — see the head
# block in ``csts_apply``). On-chip A/B (tools/ab_flags.py, batch 128, one
# process, max|Δ| vs base 3.8e-06 bf16): 607.7 ms/step vs 618.3 base when the
# resize is the SPLIT_AXES_T_FIRST separable lowering; with the joint lowering
# the 1-channel resize is pathological (18.5 s/step), so the use site only
# commutes when ops.resize.SPLIT_AXES_T_FIRST is also on. Default ON.
HEAD_COMMUTE = True


@dataclasses.dataclass(frozen=True)
class CSTSSpec:
    """All static metadata for one CSTS instantiation."""

    # inputs
    crop_size: int
    num_frames: int
    in_chans: int
    patch_kernel: Tuple[int, ...]
    patch_stride: Tuple[int, ...]
    patch_padding: Tuple[int, ...]
    embed_dim: int
    patch_dims: THW  # (T, H, W) of the video token grid after the stem
    audio_patch_dims: THW  # (T, F', S') of the audio token grid after the stem
    sep_pos_embed: bool
    # encoder
    video_blocks: Tuple[AttentionSpec, ...]
    audio_blocks: Tuple[AttentionSpec, ...]
    # execution groups: video blocks [0:g0], [g0:g1], ... interleaved with audio blocks
    video_groups: Tuple[Tuple[int, int], ...]
    audio_groups: Tuple[Tuple[int, int], ...]
    # fusion
    token_dim: int
    fusion_thw: THW  # video grid at fusion, (4, 8, 8) at 256²
    audio_fusion_thw: THW  # audio grid at fusion, (4, 8, 8) for 256² STFT slices
    spatial_fusion: AttentionSpec
    temporal_fusion: AttentionSpec
    spatial_audio_attn: bool
    # decoder
    decoder_blocks: Tuple[AttentionSpec, ...]
    # losses
    use_nce: bool
    nce_embed_dim: int = 256
    # input normalization, applied on-device when the feed ships raw uint8 frames
    # (DATA_LOADER.UINT8_TRANSFER; host-side path: datasets/utils.py:290-307)
    data_mean: Tuple[float, ...] = (0.45, 0.45, 0.45)
    data_std: Tuple[float, ...] = (0.225, 0.225, 0.225)
    # compute
    dtype: str = "float32"
    # jax.checkpoint (rematerialization) around encoder blocks — MODEL.ACT_CHECKPOINT
    # (reference wraps blocks in fairscale checkpoint_wrapper, :154-155,178-179)
    remat: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def build_spec(cfg: Config) -> CSTSSpec:
    """Derive the block-by-block architecture from config.

    Replicates the reference's constructor math exactly
    (``custom_multimodal_builder.py:25-301``): DIM_MUL/HEAD_MUL progressive widening
    with ``round_width``, POOL_KV_STRIDE_ADAPTIVE shrinking past each Q-pool stage,
    the hard-coded 4-block audio branch, fusion blocks, and the 4-block decoder.
    """
    assert cfg.DATA.TRAIN_CROP_SIZE == cfg.DATA.TEST_CROP_SIZE
    assert not cfg.MVIT.CLS_EMBED_ON, "CSTS runs without a cls token (yaml: CLS_EMBED_ON False)"
    assert cfg.MVIT.MODE == "conv"
    assert cfg.MVIT.NORM == "layernorm"

    spatial_size = cfg.DATA.TRAIN_CROP_SIZE
    temporal_size = cfg.DATA.NUM_FRAMES
    patch_stride = tuple(cfg.MVIT.PATCH_STRIDE)
    patch_kernel = tuple(cfg.MVIT.PATCH_KERNEL)
    patch_padding = tuple(cfg.MVIT.PATCH_PADDING)
    if cfg.MVIT.PATCH_2D:
        # 2-D patchify == per-frame conv == 3-D conv with temporal extent 1
        # (stem_helper.py:22-26 + the [1]+stride prepend at builder :40-41)
        patch_kernel = (1, *patch_kernel[-2:])
        patch_stride = (1, *patch_stride[-2:])
        patch_padding = (0, *patch_padding[-2:])
    patch_dims = (
        temporal_size // patch_stride[0],
        spatial_size // patch_stride[1],
        spatial_size // patch_stride[2],
    )
    audio_patch_dims = (
        temporal_size // patch_stride[0],
        cfg.DATA.AUDIO_FREQ_BINS // patch_stride[1],
        cfg.DATA.AUDIO_WINDOW // patch_stride[2],
    )
    depth = cfg.MVIT.DEPTH
    drop_path_rate = cfg.MVIT.DROPPATH_RATE
    dpr = [float(x) for x in np.linspace(0, drop_path_rate, depth)]

    dim_mul = np.ones(depth + 1)
    head_mul = np.ones(depth + 1)
    for idx, mul in cfg.MVIT.DIM_MUL:
        dim_mul[int(idx)] = mul
    for idx, mul in cfg.MVIT.HEAD_MUL:
        head_mul[int(idx)] = mul

    pool_q = [() for _ in range(depth)]
    pool_kv = [() for _ in range(depth)]
    stride_q = [() for _ in range(depth)]
    stride_kv = [() for _ in range(depth)]

    for entry in cfg.MVIT.POOL_Q_STRIDE:
        i = int(entry[0])
        stride_q[i] = tuple(int(s) for s in entry[1:])
        if cfg.MVIT.POOL_KVQ_KERNEL is not None:
            pool_q[i] = tuple(cfg.MVIT.POOL_KVQ_KERNEL)
        else:
            pool_q[i] = tuple(s + 1 if s > 1 else s for s in stride_q[i])

    if cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE is not None:
        _stride_kv = list(cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE)
        pool_kv_stride = []
        for i in range(depth):
            if len(stride_q[i]) > 0:
                _stride_kv = [max(_stride_kv[d] // stride_q[i][d], 1) for d in range(3)]
            pool_kv_stride.append([i] + list(_stride_kv))
    else:
        pool_kv_stride = cfg.MVIT.POOL_KV_STRIDE or []

    for entry in pool_kv_stride:
        i = int(entry[0])
        stride_kv[i] = tuple(int(s) for s in entry[1:])
        if cfg.MVIT.POOL_KVQ_KERNEL is not None:
            pool_kv[i] = tuple(cfg.MVIT.POOL_KVQ_KERNEL)
        else:
            pool_kv[i] = tuple(s + 1 if s > 1 else s for s in stride_kv[i])

    fused = cfg.MODEL.FUSED_ATTENTION
    video_blocks = []
    num_heads = cfg.MVIT.NUM_HEADS
    embed_dim = cfg.MVIT.EMBED_DIM
    for i in range(depth):
        num_heads = round_width(num_heads, head_mul[i])
        embed_dim = round_width(embed_dim, dim_mul[i], divisor=num_heads)
        dim_out = round_width(
            embed_dim, dim_mul[i + 1], divisor=round_width(num_heads, head_mul[i + 1])
        )
        video_blocks.append(
            AttentionSpec(
                dim=embed_dim,
                dim_out=dim_out,
                num_heads=num_heads,
                mlp_ratio=cfg.MVIT.MLP_RATIO,
                qkv_bias=cfg.MVIT.QKV_BIAS,
                drop_path=dpr[i],
                kernel_q=pool_q[i],
                kernel_kv=pool_kv[i],
                stride_q=stride_q[i],
                stride_kv=stride_kv[i],
                fused=fused,
            )
        )

    # Audio branch: 4 blocks (custom_multimodal_builder.py:184-191 hard-codes dims
    # [96,192,384,768] for EMBED_DIM 96; expressed here as e·{1,2,4,8} so the whole
    # family scales with EMBED_DIM).
    e = cfg.MVIT.EMBED_DIM
    audio_dims = [e, 2 * e, 4 * e, 8 * e]
    audio_dims_out = [2 * e, 4 * e, 8 * e, 8 * e]
    audio_heads = [1, 2, 4, 8]
    audio_kernel_q = [(), (3, 3, 3), (3, 3, 3), (3, 3, 3)]
    audio_kernel_kv = [(3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)]
    audio_stride_q = [(), (1, 2, 2), (1, 2, 2), (1, 2, 2)]
    audio_stride_kv = [(1, 8, 8), (1, 4, 4), (1, 2, 2), (1, 1, 1)]
    audio_blocks = tuple(
        AttentionSpec(
            dim=audio_dims[i],
            dim_out=audio_dims_out[i],
            num_heads=audio_heads[i],
            mlp_ratio=cfg.MVIT.MLP_RATIO,
            qkv_bias=cfg.MVIT.QKV_BIAS,
            drop_path=0.0,  # audio blocks ship without stochastic depth (:204)
            kernel_q=audio_kernel_q[i],
            kernel_kv=audio_kernel_kv[i],
            stride_q=audio_stride_q[i],
            stride_kv=audio_stride_kv[i],
            fused=fused,
        )
        for i in range(4)
    )

    token_dim = video_blocks[-1].dim_out
    # The interleaved execution groups. The reference hard-codes [:1],[1:3],[3:14],
    # [14:] (custom_multimodal_builder.py:386-411); those boundaries are exactly the
    # Q-pool stage-transition blocks, so derive them — the architecture then
    # generalizes to other MViT depths.
    q_blocks = sorted(int(e[0]) for e in cfg.MVIT.POOL_Q_STRIDE)
    assert len(q_blocks) == 3, "CSTS interleaving expects 3 Q-pool stage transitions"
    video_groups = (
        (0, q_blocks[0]),
        (q_blocks[0], q_blocks[1]),
        (q_blocks[1], q_blocks[2]),
        (q_blocks[2], depth),
    )
    audio_groups = ((0, 1), (1, 2), (2, 3), (3, 4))

    fusion_thw = _thw_after_blocks(patch_dims, video_blocks)
    audio_fusion_thw = _thw_after_blocks(audio_patch_dims, audio_blocks)
    assert audio_fusion_thw[0] == fusion_thw[0], "audio/video temporal grids must match"

    fusion_common = dict(
        dim=token_dim,
        dim_out=token_dim,
        num_heads=num_heads,  # the post-loop value, 8 (:236)
        mlp_ratio=cfg.MVIT.MLP_RATIO,
        qkv_bias=cfg.MVIT.QKV_BIAS,
        drop_path=0.0,
        kernel_q=(),  # (1,1,1) kernels/strides in the reference => pooling skipped
        kernel_kv=(),
        stride_q=(),
        stride_kv=(),
        fused=fused,
    )
    spatial_fusion = AttentionSpec(**fusion_common)
    temporal_fusion = AttentionSpec(**fusion_common)

    # Decoder: 4 blocks (custom_multimodal_builder.py:271-299 hard-codes
    # [768,768,384,192]→[768,384,192,96] for EMBED_DIM 96).
    dec_dims = [8 * e, 8 * e, 4 * e, 2 * e]
    dec_dims_out = [8 * e, 4 * e, 2 * e, e]
    dec_heads = [8, 4, 4, 2]
    dec_stride_q = [(1, 2, 2), (1, 2, 2), (1, 2, 2), (2, 1, 1)]
    dec_stride_kv = [(1, 2, 2), (1, 4, 4), (1, 8, 8), (1, 16, 16)]
    decoder_blocks = tuple(
        AttentionSpec(
            dim=dec_dims[i],
            dim_out=dec_dims_out[i],
            num_heads=dec_heads[i],
            mlp_ratio=cfg.MVIT.MLP_RATIO,
            qkv_bias=cfg.MVIT.QKV_BIAS,
            drop_path=0.0,  # decoder ships without stochastic depth (:288)
            kernel_q=(3, 3, 3),
            kernel_kv=(3, 3, 3),
            stride_q=dec_stride_q[i],
            stride_kv=dec_stride_kv[i],
            upsample_q=True,
            fused=fused,
        )
        for i in range(4)
    )

    return CSTSSpec(
        crop_size=spatial_size,
        num_frames=temporal_size,
        in_chans=cfg.DATA.INPUT_CHANNEL_NUM[0],
        patch_kernel=patch_kernel,
        patch_stride=patch_stride,
        patch_padding=patch_padding,
        embed_dim=cfg.MVIT.EMBED_DIM,
        patch_dims=patch_dims,
        audio_patch_dims=audio_patch_dims,
        sep_pos_embed=cfg.MVIT.SEP_POS_EMBED,
        video_blocks=tuple(video_blocks),
        audio_blocks=audio_blocks,
        video_groups=video_groups,
        audio_groups=audio_groups,
        token_dim=token_dim,
        fusion_thw=fusion_thw,
        audio_fusion_thw=audio_fusion_thw,
        spatial_fusion=spatial_fusion,
        temporal_fusion=temporal_fusion,
        spatial_audio_attn=cfg.MVIT.SPATIAL_AUDIO_ATTN,
        decoder_blocks=decoder_blocks,
        use_nce="nce" in cfg.MODEL.LOSS_FUNC,
        data_mean=tuple(float(m) for m in cfg.DATA.MEAN),
        data_std=tuple(float(s) for s in cfg.DATA.STD),
        dtype="bfloat16" if cfg.TRAIN.MIXED_PRECISION else "float32",
        remat=cfg.MODEL.ACT_CHECKPOINT,
    )


def _conv_out(size: int, kernel: int, stride: int, padding: int) -> int:
    return (size + 2 * padding - kernel) // stride + 1


def _thw_after_blocks(thw: THW, blocks) -> THW:
    t, h, w = thw
    for b in blocks:
        if b.pool_q_on:
            for d, s in enumerate(b.stride_q):
                k, p = b.kernel_q[d], b.kernel_q[d] // 2
                if d == 0:
                    t = _conv_out(t, k, s, p)
                elif d == 1:
                    h = _conv_out(h, k, s, p)
                else:
                    w = _conv_out(w, k, s, p)
    return (t, h, w)


# ----------------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------------


def csts_init(key: jax.Array, spec: CSTSSpec, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))
    t, h, w = spec.patch_dims
    p: dict = {
        "patch_embed": ops.conv3d_init(
            next(keys), spec.in_chans, spec.embed_dim, spec.patch_kernel, dtype=dtype
        ),
        "patch_embed_audio": ops.conv3d_init(
            next(keys), 1, spec.embed_dim, spec.patch_kernel, dtype=dtype
        ),
    }
    ta, fa, sa = spec.audio_patch_dims
    if spec.sep_pos_embed:
        p["pos_embed_spatial"] = ops.trunc_normal(next(keys), (1, h * w, spec.embed_dim), dtype=dtype)
        p["pos_embed_temporal"] = ops.trunc_normal(next(keys), (1, t, spec.embed_dim), dtype=dtype)
        p["pos_embed_spatial_audio"] = ops.trunc_normal(next(keys), (1, fa * sa, spec.embed_dim), dtype=dtype)
        p["pos_embed_temporal_audio"] = ops.trunc_normal(next(keys), (1, ta, spec.embed_dim), dtype=dtype)
    else:
        p["pos_embed"] = ops.trunc_normal(next(keys), (1, t * h * w, spec.embed_dim), dtype=dtype)
        p["pos_embed_audio"] = ops.trunc_normal(next(keys), (1, ta * fa * sa, spec.embed_dim), dtype=dtype)

    p["blocks"] = [mvit.multiscale_block_init(next(keys), b, dtype) for b in spec.video_blocks]
    p["blocks_audio"] = [mvit.multiscale_block_init(next(keys), b, dtype) for b in spec.audio_blocks]

    td = spec.token_dim
    if spec.use_nce:
        p["vision_proj"] = ops.linear_init(next(keys), td, spec.nce_embed_dim, dtype=dtype)
        p["audio_proj"] = ops.linear_init(next(keys), td, spec.nce_embed_dim, dtype=dtype)
    fh, fw = spec.fusion_thw[1], spec.fusion_thw[2]
    afh, afw = spec.audio_fusion_thw[1], spec.audio_fusion_thw[2]
    p["vision_pool"] = ops.conv3d_init(next(keys), td, td, (1, fh, fw), dtype=dtype)
    p["audio_pool"] = ops.conv3d_init(next(keys), td, td, (1, afh, afw), dtype=dtype)
    p["audio_pool2"] = ops.conv3d_init(next(keys), td, td, (1, afh, afw), dtype=dtype)

    p["temporal_fusion"] = mvit.multiscale_block_init(next(keys), spec.temporal_fusion, dtype)
    p["spatial_fusion"] = mvit.multiscale_block_init(next(keys), spec.spatial_fusion, dtype)

    for i, b in enumerate(spec.decoder_blocks):
        p[f"decode_block{i+1}"] = mvit.multiscale_block_init(next(keys), b, dtype)

    p["classifier"] = ops.conv3d_init(next(keys), spec.decoder_blocks[-1].dim_out, 1, (1, 1, 1), dtype=dtype)
    return p


# ----------------------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------------------


def _patch_embed(p: dict, spec: CSTSSpec, x: jax.Array) -> jax.Array:
    """(B, T, H, W, C_in) -> (B, T'·H'·W', embed_dim) tokens (stem_helper.py:8-38)."""
    out = ops.conv3d(p, x, spec.patch_stride, spec.patch_padding)
    b = out.shape[0]
    return out.reshape(b, -1, out.shape[-1])


def _pos_embed(p: dict, spec: CSTSSpec, audio: bool) -> jax.Array:
    """Separable pos embed: spatial tiled over T + temporal repeated over HW (:362-366)."""
    t, h, w = spec.audio_patch_dims if audio else spec.patch_dims
    if spec.sep_pos_embed:
        suffix = "_audio" if audio else ""
        pe = jnp.tile(p[f"pos_embed_spatial{suffix}"], (1, t, 1)) + jnp.repeat(
            p[f"pos_embed_temporal{suffix}"], h * w, axis=1
        )
        return pe
    return p["pos_embed_audio" if audio else "pos_embed"]


def _tokens_to_grid(x: jax.Array, thw: THW) -> jax.Array:
    b, l, c = x.shape
    return x.reshape(b, *thw, c)


def csts_apply(
    params: dict,
    spec: CSTSSpec,
    video: jax.Array,
    audio: jax.Array,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    return_embed: bool = False,
    return_spatial_attn: bool = False,
    return_temporal_attn: bool = False,
    capture: Optional[dict] = None,
):
    """Forward pass (custom_multimodal_builder.py:343-498).

    Args:
      video: (B, T, H, W, 3) channels-last frames (reference: (B, 3, T, H, W)).
      audio: (B, T, F, S, 1) log-STFT slices (reference: (B, 1, T, 256, 256)).
      capture: optional dict filled with named intermediate activations (the
        functional replacement for the reference's forward hooks — see
        ``extract_activations``).

    Returns logits (B, T_out, H', W', 1), plus optional NCE embeddings / attention maps.
    """

    def _cap(name, value):
        if capture is not None:
            capture[name] = value
    cdt = spec.compute_dtype
    if jnp.issubdtype(video.dtype, jnp.integer):
        # raw-uint8 feed (DATA_LOADER.UINT8_TRANSFER): fold /255 + mean/std into
        # the step — XLA fuses this into the patch-embed conv's input read
        # (host-side equivalent: datasets/utils.py:290-307 tensor_normalize)
        mean = jnp.asarray(spec.data_mean, cdt)
        std = jnp.asarray(spec.data_std, cdt)
        video = (video.astype(cdt) / 255.0 - mean) / std
    else:
        video = video.astype(cdt)
    audio = audio.astype(cdt)

    x = _patch_embed(params["patch_embed"], spec, video)
    y = _patch_embed(params["patch_embed_audio"], spec, audio)
    _cap("patch_embed", x)
    _cap("patch_embed_audio", y)
    x = seq_constraint(x + _pos_embed(params, spec, audio=False).astype(cdt))
    y = seq_constraint(y + _pos_embed(params, spec, audio=True).astype(cdt))

    thw: THW = spec.patch_dims
    thw_audio: THW = spec.audio_patch_dims

    if rng is None:
        rng = jax.random.PRNGKey(0)
    n_blocks = len(spec.video_blocks)
    dp_keys = jax.random.split(rng, n_blocks)

    def _encoder_block(block_params, block_spec, tokens, thw_in, dp_key):
        """One encoder block, optionally rematerialized (MODEL.ACT_CHECKPOINT)."""
        thw_out = _thw_after_blocks(thw_in, [block_spec])

        def fn(p, t, k):
            out, _ = mvit.multiscale_block_apply(
                p, block_spec, t, thw_in,
                drop_path_key=k, deterministic=deterministic,
            )
            return out

        if spec.remat:
            fn = jax.checkpoint(fn)
        return fn(block_params, tokens, dp_key), thw_out

    # GPipe pipeline parallelism over uniform identity-block runs (flagship
    # blocks 4–13: ten d384/4h blocks with one static spec): when the ambient
    # mesh carries a ``pipe`` axis, stack the run's params + stochastic-depth
    # (rate, key) streams on a leading block axis and hand it to
    # parallel/pipeline.py. Stays off whenever capture needs per-block
    # activations, the run doesn't fill the pipe, or the batch doesn't
    # microbatch evenly.
    pipe_S = pipeline_lib.pipe_size() if capture is None else None

    def _pipelined_run_len(lo: int, hi: int) -> int:
        if (
            pipe_S is None
            or pipe_S < 2
            or x.shape[0] % pipeline_lib.effective_microbatches(pipe_S)
        ):
            return 0
        b0 = spec.video_blocks[lo]
        if b0.dim != b0.dim_out or b0.pool_q_on or b0.upsample_q:
            return 0
        j = lo + 1
        while j < hi and dataclasses.replace(
            spec.video_blocks[j], drop_path=b0.drop_path
        ) == b0:
            j += 1
        n = ((j - lo) // pipe_S) * pipe_S
        return n if n >= 2 else 0

    def _pipelined_blocks(lo: int, n: int, tokens: jax.Array, thw_in: THW):
        idxs = range(lo, lo + n)
        bspec = spec.video_blocks[lo]
        stacked = {
            "p": jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls), *[params["blocks"][k] for k in idxs]
            ),
            "key": jnp.stack([dp_keys[k] for k in idxs]),
            "rate": jnp.asarray(
                [spec.video_blocks[k].drop_path for k in idxs], jnp.float32
            ),
        }

        def apply_one(slot, z, m):
            out, _ = mvit.multiscale_block_apply(
                slot["p"], bspec, z, thw_in,
                # per-microbatch stream: without the fold every microbatch of a
                # block would draw the same stochastic-depth mask
                drop_path_key=jax.random.fold_in(slot["key"], m),
                deterministic=deterministic,
                drop_path_rate=slot["rate"],
            )
            return out

        if spec.remat:
            apply_one = jax.checkpoint(apply_one)
        return pipeline_lib.pipeline_blocks(stacked, tokens, apply_one)

    # Interleaved encoder groups, capturing the decoder skip features (:384-411).
    inter_feat = [(x, thw)]
    for gi, ((vs, ve), (as_, ae)) in enumerate(zip(spec.video_groups, spec.audio_groups)):
        i = vs
        while i < ve:
            n_pipe = _pipelined_run_len(i, ve)
            if n_pipe:
                x = seq_constraint(_pipelined_blocks(i, n_pipe, x, thw))
                i += n_pipe
                continue
            x, thw = _encoder_block(
                params["blocks"][i], spec.video_blocks[i], x, thw, dp_keys[i]
            )
            x = seq_constraint(x)
            _cap(f"blocks/{i}", x)
            i += 1
        if gi < len(spec.video_groups) - 1:
            inter_feat.append((x, thw))
        for i in range(as_, ae):
            y, thw_audio = _encoder_block(
                params["blocks_audio"][i], spec.audio_blocks[i], y, thw_audio, None
            )
            y = seq_constraint(y)
            _cap(f"blocks_audio/{i}", y)

    # ---------------- Spatial-temporal fusion (:413-462) ----------------
    b = x.shape[0]
    t, fh, fw = spec.fusion_thw
    td = spec.token_dim

    y_grid = _tokens_to_grid(y, thw_audio)  # (B, 4, 8, 8, 768)
    # audio_pool: full Conv3d k(1,8,8) -> one audio token per frame (:420-421)
    y_spatial = ops.conv3d(params["audio_pool"], y_grid, (1, 1, 1), (0, 0, 0))
    y_spatial = y_spatial.reshape(b, t, td)

    av_spatial = jnp.concatenate([x, y_spatial], axis=1)  # (B, THW+T, 768)
    mask = jnp.asarray(mvit.build_inframe_mask(spec.fusion_thw, t))
    need_audio_attn = spec.spatial_audio_attn
    sf_out = mvit.multiscale_block_apply(
        params["spatial_fusion"], spec.spatial_fusion, av_spatial, thw,
        mask=mask, deterministic=deterministic,
        return_attn=need_audio_attn or return_spatial_attn,
    )
    if need_audio_attn or return_spatial_attn:
        av_spatial, _, spatial_attn = sf_out
    else:
        av_spatial, _ = sf_out
        spatial_attn = None
    n_video_tokens = x.shape[1]
    _cap("spatial_fusion", av_spatial)
    x_spatial = av_spatial[:, :n_video_tokens]

    # Temporal branch (:434-452)
    x_grid = _tokens_to_grid(x, thw)
    if spec.spatial_audio_attn:
        audio_attn = mvit.extract_audio_attention(spatial_attn, spec.fusion_thw)
        audio_attn = jnp.mean(audio_attn, axis=1)[..., None]  # (B, T, H, W, 1)
        x_grid = x_grid * audio_attn.astype(cdt)
    x_temporal = ops.conv3d(params["vision_pool"], x_grid, (1, 1, 1), (0, 0, 0)).reshape(b, t, td)
    y_temporal = ops.conv3d(params["audio_pool2"], y_grid, (1, 1, 1), (0, 0, 0)).reshape(b, t, td)

    av_temporal = jnp.concatenate([x_temporal, y_temporal], axis=1)  # (B, 2T, 768)
    tf_out = mvit.multiscale_block_apply(
        params["temporal_fusion"], spec.temporal_fusion, av_temporal, (2, 2, 2),
        deterministic=deterministic, return_attn=return_temporal_attn,
    )
    if return_temporal_attn:
        av_temporal, _, temporal_attn = tf_out
    else:
        av_temporal, _ = tf_out
        temporal_attn = None
    _cap("temporal_fusion", av_temporal)

    # Reweight (:454-461): per-frame temporal weights scale spatially-fused tokens.
    x_weights = av_temporal[:, :t]  # (B, T, 768)
    x_reweight = _tokens_to_grid(x_spatial, thw) * x_weights[:, :, None, None, :]
    x_reweight = x_reweight.reshape(b, n_video_tokens, td)
    y_weights = av_temporal[:, t:]
    y_reweight = y_grid * y_weights[:, :, None, None, :]
    y_reweight = y_reweight.reshape(b, -1, td)

    # ---------------- Decoder (:465-481) ----------------
    feat = x_reweight
    for i in range(len(spec.decoder_blocks)):
        feat, thw = mvit.multiscale_block_apply(
            params[f"decode_block{i+1}"], spec.decoder_blocks[i], feat, thw,
            deterministic=deterministic,
        )
        if i < len(spec.decoder_blocks) - 1:
            feat = feat + inter_feat[-(i + 1)][0]
        # the decoder's fine grids outgrow the stem (8·64·64 tokens at d4), so
        # context parallelism keeps sharding through the upsampling path
        feat = seq_constraint(feat)
        _cap(f"decode_block{i+1}", feat)

    feat_grid = _tokens_to_grid(feat, thw)
    stem_feat, stem_thw = inter_feat[0]
    stem_grid = _tokens_to_grid(stem_feat, stem_thw)
    if HEAD_COMMUTE and ops.resize.SPLIT_AXES_T_FIRST:
        # The classifier is a 1x1x1 conv (a per-voxel linear map), which
        # commutes exactly with the channel-independent trilinear T-resize —
        # classify the stem grid FIRST (C -> 1: 96x fewer resize bytes, kills
        # the batch-minor relayout pair around the stem-skip resize), resize
        # the 1-channel map, add to the classified decoder grid (bias rides
        # the feat term once; interp weights sum to 1 so resize(bias)=bias).
        # Gated on the separable resize: the joint lowering of the 1-channel
        # map measured 18.5 s/step on-chip (see the flag comment above).
        logits = ops.conv3d(params["classifier"], feat_grid, (1, 1, 1), (0, 0, 0))
        w = params["classifier"]["w"]
        w2 = w.reshape(w.shape[-2], w.shape[-1]).astype(stem_grid.dtype)
        stem_cls = jnp.einsum("bthwc,co->bthwo", stem_grid, w2)
        logits = logits + ops.trilinear_resize(
            stem_cls, (stem_thw[0] * 2, stem_thw[1], stem_thw[2]))
    else:
        stem_up = ops.trilinear_resize(stem_grid, (stem_thw[0] * 2, stem_thw[1], stem_thw[2]))
        feat_grid = feat_grid + stem_up
        logits = ops.conv3d(params["classifier"], feat_grid, (1, 1, 1), (0, 0, 0))
    # (B, T_out, H', W', 1)

    if not return_embed and not return_spatial_attn and not return_temporal_attn:
        return logits
    if not return_embed:
        out = [logits]
        if return_spatial_attn:
            out.append(spatial_attn)
        if return_temporal_attn:
            out.append(temporal_attn)
        return out
    # NCE embeddings (:492-498): mean-pool reweighted tokens then project.
    x_embed = ops.linear_apply(params["vision_proj"], jnp.mean(x_reweight, axis=1))
    y_embed = ops.linear_apply(params["audio_proj"], jnp.mean(y_reweight, axis=1))
    return logits, x_embed, y_embed


# ----------------------------------------------------------------------------------
# activation / weight extraction (functional replacement for torch forward hooks —
# reference GetWeightAndActivation, visualization/utils.py:158-254)
# ----------------------------------------------------------------------------------

#: layer names `extract_activations` can capture (hierarchical, "/"-separated,
#: mirroring the reference's "s1/pathway0_stem/conv" convention)
CAPTURABLE = (
    "patch_embed", "patch_embed_audio", "blocks/<i>", "blocks_audio/<i>",
    "spatial_fusion", "temporal_fusion", "decode_block<1-4>",
)


def extract_activations(
    params: dict,
    spec: CSTSSpec,
    video: jax.Array,
    audio: jax.Array,
    layers: Optional[Tuple[str, ...]] = None,
):
    """Run the forward and return ``(logits, {layer_name: activation})``.

    Where the reference registers forward hooks on nn.Modules
    (``GetWeightAndActivation._register_hooks``), the functional model records
    named intermediates during one traced forward — same capability, one program,
    jit-compatible. ``layers=None`` captures everything in :data:`CAPTURABLE`.
    """
    acts: dict = {}
    logits = csts_apply(params, spec, video, audio, deterministic=True, capture=acts)
    if layers is not None:
        acts = {k: v for k, v in acts.items() if k in set(layers)}
    return logits, acts


def get_weights(params: dict, layers) -> dict:
    """{layer_name: params subtree} by hierarchical "/" path into the param pytree
    (reference get_weights, visualization/utils.py:238-254)."""
    out = {}
    for name in layers:
        node = params
        for part in name.split("/"):
            node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
        out[name] = node
    return out
