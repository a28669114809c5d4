"""Plain MViT video classifier — the K400-pretrain base model of the CSTS lineage.

The reference fork dropped PySlowFast's original ``MViT`` class when specializing to
CSTS, but its checkpoint (MVIT_B_16x4_CONV, the fine-tune init, README.md:110-114)
IS that model. This rebuild restores the family: patch-embed → optional cls token →
sep/joint pos embed → multiscale blocks (cls-aware pooling) → LN → head.

Registered as ``MVIT``; reuses the CSTS spec derivation for the encoder trajectory.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csts_tpu import ops
from csts_tpu.config import Config
from csts_tpu.models import mvit
from csts_tpu.models.build import MODEL_REGISTRY
from csts_tpu.models.csts import build_spec as build_csts_spec
from csts_tpu.models.mvit import AttentionSpec, THW


@dataclasses.dataclass(frozen=True)
class MViTSpec:
    crop_size: int
    num_frames: int
    in_chans: int
    patch_kernel: Tuple[int, ...]
    patch_stride: Tuple[int, ...]
    patch_padding: Tuple[int, ...]
    embed_dim: int
    patch_dims: THW
    sep_pos_embed: bool
    cls_embed_on: bool
    blocks: Tuple[AttentionSpec, ...]
    num_classes: int
    head_dropout: float
    head_act: str
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def build_mvit_spec(cfg: Config) -> MViTSpec:
    # reuse the CSTS derivation for the video-block trajectory, then re-tag cls
    cls_on = cfg.MVIT.CLS_EMBED_ON
    if cls_on:
        # CSTS's builder asserts no-cls; temporarily flip for derivation
        import copy

        cfg2 = copy.deepcopy(cfg)
        cfg2.MVIT.CLS_EMBED_ON = False
        base = build_csts_spec(cfg2)
    else:
        base = build_csts_spec(cfg)
    blocks = tuple(
        dataclasses.replace(b, has_cls=cls_on) for b in base.video_blocks
    )
    return MViTSpec(
        crop_size=base.crop_size,
        num_frames=base.num_frames,
        in_chans=base.in_chans,
        patch_kernel=base.patch_kernel,
        patch_stride=base.patch_stride,
        patch_padding=base.patch_padding,
        embed_dim=base.embed_dim,
        patch_dims=base.patch_dims,
        sep_pos_embed=base.sep_pos_embed,
        cls_embed_on=cls_on,
        blocks=blocks,
        num_classes=cfg.MODEL.NUM_CLASSES,
        head_dropout=cfg.MODEL.DROPOUT_RATE,
        head_act=cfg.MODEL.HEAD_ACT,
        dtype=base.dtype,
    )


def mvit_init(key: jax.Array, spec: MViTSpec, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 8 + len(spec.blocks)))
    t, h, w = spec.patch_dims
    p: dict = {
        "patch_embed": ops.conv3d_init(
            next(keys), spec.in_chans, spec.embed_dim, spec.patch_kernel, dtype=dtype
        )
    }
    if spec.cls_embed_on:
        p["cls_token"] = jnp.zeros((1, 1, spec.embed_dim), dtype)
    if spec.sep_pos_embed:
        p["pos_embed_spatial"] = ops.trunc_normal(next(keys), (1, h * w, spec.embed_dim), dtype=dtype)
        p["pos_embed_temporal"] = ops.trunc_normal(next(keys), (1, t, spec.embed_dim), dtype=dtype)
        if spec.cls_embed_on:
            p["pos_embed_class"] = ops.trunc_normal(next(keys), (1, 1, spec.embed_dim), dtype=dtype)
    else:
        n = t * h * w + (1 if spec.cls_embed_on else 0)
        p["pos_embed"] = ops.trunc_normal(next(keys), (1, n, spec.embed_dim), dtype=dtype)
    p["blocks"] = [mvit.multiscale_block_init(next(keys), b, dtype) for b in spec.blocks]
    p["norm"] = ops.layer_norm_init(spec.blocks[-1].dim_out, dtype)
    p["head"] = ops.linear_init(next(keys), spec.blocks[-1].dim_out, spec.num_classes, dtype=dtype)
    return p


def mvit_apply(
    params: dict,
    spec: MViTSpec,
    video: jax.Array,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, T, H, W, C) -> (B, num_classes) logits (softmax/sigmoid applied in eval
    per MODEL.HEAD_ACT by the caller, matching the reference head)."""
    cdt = spec.compute_dtype
    x = ops.conv3d(params["patch_embed"], video.astype(cdt), spec.patch_stride, spec.patch_padding)
    b = x.shape[0]
    x = x.reshape(b, -1, x.shape[-1])
    t, h, w = spec.patch_dims

    if spec.cls_embed_on:
        cls = jnp.broadcast_to(params["cls_token"].astype(cdt), (b, 1, spec.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)

    if spec.sep_pos_embed:
        pe = jnp.tile(params["pos_embed_spatial"], (1, t, 1)) + jnp.repeat(
            params["pos_embed_temporal"], h * w, axis=1
        )
        if spec.cls_embed_on:
            pe = jnp.concatenate([params["pos_embed_class"], pe], axis=1)
    else:
        pe = params["pos_embed"]
    x = x + pe.astype(cdt)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    dp_keys = jax.random.split(rng, len(spec.blocks) + 1)
    thw: THW = spec.patch_dims
    for i, bspec in enumerate(spec.blocks):
        x, thw = mvit.multiscale_block_apply(
            params["blocks"][i], bspec, x, thw,
            drop_path_key=dp_keys[i], deterministic=deterministic,
        )
    x = ops.layer_norm(params["norm"], x)
    feat = x[:, 0] if spec.cls_embed_on else jnp.mean(x, axis=1)
    if not deterministic and spec.head_dropout > 0:
        keep = 1.0 - spec.head_dropout
        mask = jax.random.bernoulli(dp_keys[-1], keep, feat.shape).astype(feat.dtype)
        feat = feat * mask / keep
    return ops.linear_apply(params["head"], feat)


@MODEL_REGISTRY.register("MVIT")
def _build_mvit(cfg: Config):
    spec = build_mvit_spec(cfg)

    def init_fn(key, dtype=None):
        return mvit_init(key, spec, dtype or jnp.float32)

    def apply_fn(params, video, **kwargs):
        return mvit_apply(params, spec, video, **kwargs)

    return spec, init_fn, apply_fn
