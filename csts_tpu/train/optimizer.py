"""Optimizer factory (reference: ``slowfast/models/optimizer.py:11-130``), on optax.

Parameter-group rules replicated:

* zero weight decay for 1-D params and biases when SOLVER.ZERO_WD_1D_PARAM
  (optimizer.py:48-50) — covers every LayerNorm scale/bias, linear/conv bias, and
  positional embedding of rank 1;
* zero weight decay for the ``no_weight_decay()`` name set (pos embeds / cls token)
  when MVIT.ZERO_DECAY_POS_CLS (custom_multimodal_builder.py:327-341);
* AdamW (eps 1e-8, betas (0.9, 0.999)) / Adam / SGD-momentum selection.

The learning rate is a traced scalar recomputed inside the jitted train step from the
fractional epoch (the reference mutates optimizer.param_groups host-side per iter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from csts_tpu.config import Config

# Reference no_weight_decay() name set (sep-pos-embed, no cls token case).
_POS_EMBED_NAMES = {
    "pos_embed_spatial", "pos_embed_temporal", "pos_embed_class",
    "pos_embed", "cls_token",
    # the audio branch mirrors the video pos embeds; the reference's name set
    # (written for the video-only MViT) misses them — include them for symmetry
    "pos_embed_spatial_audio", "pos_embed_temporal_audio", "pos_embed_audio",
}


def _path_names(path) -> list:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
    return out


def weight_decay_mask(params, cfg: Config):
    """True = apply weight decay."""

    def decide(path, leaf):
        names = _path_names(path)
        if cfg.MVIT.ZERO_DECAY_POS_CLS and names and names[0] in _POS_EMBED_NAMES:
            return False
        if cfg.SOLVER.ZERO_WD_1D_PARAM and (leaf.ndim <= 1 or names[-1] in ("b", "bias")):
            return False
        # pos embeds are rank-3; without ZERO_WD_1D they still decay, matching torch
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def construct_optimizer(params, cfg: Config) -> optax.GradientTransformation:
    """Build the optax chain. LR is injected per step via ``optax.inject_hyperparams``."""
    solver = cfg.SOLVER
    mask = weight_decay_mask(params, cfg)

    chain = []
    if solver.CLIP_GRAD_VAL:
        chain.append(optax.clip(solver.CLIP_GRAD_VAL))
    elif solver.CLIP_GRAD_L2NORM:
        chain.append(optax.clip_by_global_norm(solver.CLIP_GRAD_L2NORM))

    # SOLVER.BF16_MOMENTS halves first-moment memory (optax casts mu on store,
    # accumulates the update in fp32). nu stays fp32: the second moment's
    # dynamic range (grad²) underflows bf16's 8-bit mantissa near convergence.
    # Composes with ZeRO-1/FSDP sharding for large family members.
    mu_dtype = jnp.bfloat16 if solver.BF16_MOMENTS else None

    method = solver.OPTIMIZING_METHOD
    if method == "adamw":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, mu_dtype=mu_dtype))
        chain.append(optax.add_decayed_weights(solver.WEIGHT_DECAY, mask=lambda p: mask))
    elif method == "adam":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, mu_dtype=mu_dtype))
        # torch Adam applies L2 into the gradient before the moment update; the
        # reference ships AdamW, so plain Adam keeps optax's decoupled behaviour here.
        chain.append(optax.add_decayed_weights(solver.WEIGHT_DECAY, mask=lambda p: mask))
    elif method == "sgd":
        if solver.WEIGHT_DECAY:
            # torch SGD folds L2 into the gradient pre-momentum
            chain.append(optax.add_decayed_weights(solver.WEIGHT_DECAY, mask=lambda p: mask))
        chain.append(
            optax.trace(decay=solver.MOMENTUM, nesterov=solver.NESTEROV)
        )
    else:
        raise NotImplementedError(f"Does not support {method} optimizer")

    def make(learning_rate):
        return optax.chain(*chain, optax.scale_by_learning_rate(learning_rate))

    return optax.inject_hyperparams(make)(learning_rate=solver.BASE_LR)


def set_learning_rate(opt_state, lr):
    """Per-iteration LR update (reference ``set_lr``, optimizer.py:122-130)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
    return opt_state
