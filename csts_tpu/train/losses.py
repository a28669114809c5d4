"""Loss functions (reference: ``slowfast/models/losses.py`` + ``utils/utils.py:5-24``).

All functions are pure jax and jit through the training step. Heatmap tensors are
channels-last ``(B, T, H, W[, 1])``; embedding tensors ``(B, D)``.

The composite ``kldiv+egonce`` training objective is assembled in the train step (as
the reference assembles it inline at ``train_avgaze_net.py:71-88``), with the EgoNCE
similarity computed over the full cross-device batch via ``lax.all_gather`` — JAX's
all_gather is differentiable by construction, which *fixes* the reference's
``AllGather_multi`` backward bug (every rank taking rank-0's gradient slice,
``distributed.py:23,30``). Single-device training is numerically identical; multi-
device gradients differ from the reference only where the reference was wrong.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_softmax(logits: jax.Array, temperature: float = 2.0) -> jax.Array:
    """Per-frame spatial softmax (utils/utils.py:5-12). (B,T,H,W,C) -> same shape."""
    b, t, h, w, c = logits.shape
    flat = logits.reshape(b, t, h * w, c) / temperature
    probs = jax.nn.softmax(flat.astype(jnp.float32), axis=2).astype(logits.dtype)
    return probs.reshape(b, t, h, w, c)


def sim_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Cosine-similarity matrix (utils/utils.py:15-24)."""
    a_n = jnp.linalg.norm(a, axis=1, keepdims=True)
    b_n = jnp.linalg.norm(b, axis=1, keepdims=True)
    a_norm = a / jnp.maximum(a_n, eps)
    b_norm = b / jnp.maximum(b_n, eps)
    return jnp.dot(
        a_norm, b_norm.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kldiv_loss(pred: jax.Array, target: jax.Array | None = None) -> jax.Array:
    """KL divergence over per-frame heatmaps, normalized by T·log(HW) (losses.py:51-82).

    ``pred``: per-frame probability maps (B, T, H, W) or (B, T, H, W, 1), already
    through :func:`frame_softmax`. ``target`` ditto (or None for the uniform prior).
    """
    if pred.ndim == 5:
        pred = pred[..., 0]
    b, t, h, w = pred.shape
    p = pred.reshape(b, t, h * w).astype(jnp.float32)
    log_p = jnp.log(p + 1e-10)
    if target is None:
        log_q = jnp.log(1.0 / (h * w))
        kl = jnp.sum(p * log_p, axis=-1) - log_q
    else:
        if target.ndim == 5:
            target = target[..., 0]
        q = target.reshape(b, t, h * w).astype(jnp.float32)
        log_q = jnp.log(q + 1e-10)
        kl = jnp.sum(p * log_p, axis=-1) - jnp.sum(p * log_q, axis=-1)
    norm = t * jnp.log(jnp.asarray(float(h * w)))
    return jnp.mean(jnp.sum(kl, axis=-1) / norm)


def egonce_loss(sim: jax.Array, temperature: float = 0.05) -> jax.Array:
    """Symmetric InfoNCE on a similarity matrix (losses.py:152-170).

    The reference's hard-coded ``.cuda()`` eye mask (losses.py:158) becomes a plain
    traced identity — device placement is XLA's job.
    """
    n = sim.shape[0]
    i_sm = jax.nn.softmax(sim / temperature, axis=1)
    j_sm = jax.nn.softmax(sim.T / temperature, axis=1)
    diag_i = jnp.log(jnp.diagonal(i_sm) + 0.0)
    diag_j = jnp.log(jnp.diagonal(j_sm) + 0.0)
    return -jnp.mean(diag_i) - jnp.mean(diag_j)


def soft_target_cross_entropy(x: jax.Array, y: jax.Array, reduction: str = "mean") -> jax.Array:
    """(losses.py:12-33)"""
    loss = jnp.sum(-y * jax.nn.log_softmax(x, axis=-1), axis=-1)
    return jnp.mean(loss) if reduction == "mean" else loss


def weighted_bce_with_logits(x: jax.Array, y: jax.Array, pos_weight: float = 5.0,
                             reduction: str = "mean") -> jax.Array:
    """5×-positive-weighted BCE (losses.py:36-48)."""
    loss = -(pos_weight * y * jax.nn.log_sigmoid(x) + (1 - y) * jnp.log1p(-jax.nn.sigmoid(x)))
    return jnp.mean(loss) if reduction == "mean" else loss


def bce_loss(p: jax.Array, y: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    eps = 1e-12
    loss = -(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps))
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss)


def _floss_weight(target: jax.Array) -> jax.Array:
    """Distance-to-peak reciprocal weight map (losses.py:125-149), vectorized.

    ``target``: (B, T, H, W). The reference finds every argmax pixel and averages the
    coordinates; heatmap labels have a unique peak so mean-of-argmax == argmax, which
    we compute with a flat argmax (no Python loops).
    """
    b, t, h, w = target.shape
    flat = target.reshape(b, t, h * w)
    # mean coordinate over all pixels attaining the max (torch.where equivalence)
    is_max = (flat == jnp.max(flat, axis=-1, keepdims=True)).astype(jnp.float32)
    idx = jnp.arange(h * w, dtype=jnp.float32)
    denom = jnp.sum(is_max, axis=-1)
    mean_flat_x = jnp.sum(is_max * (idx[None, None, :] // w), axis=-1) / denom
    mean_flat_y = jnp.sum(is_max * (idx[None, None, :] % w), axis=-1) / denom
    rows = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    a = rows - mean_flat_x[:, :, None, None]
    bb = cols - mean_flat_y[:, :, None, None]
    dist = jnp.sqrt(a**2 + bb**2)
    return 1.0 / ((dist + 1.0) / w)


def floss(pred_sigmoid: jax.Array, target: jax.Array) -> jax.Array:
    """Distance-weighted BCE (losses.py:85-95)."""
    if pred_sigmoid.ndim == 5:
        pred_sigmoid = pred_sigmoid[..., 0]
    if target.ndim == 5:
        target = target[..., 0]
    weights = _floss_weight(target)
    return bce_loss(pred_sigmoid, target, weights)


def kldiv_plus_floss(logits: jax.Array, target: jax.Array, alpha: float = 1.0) -> jax.Array:
    """(losses.py:173-183)"""
    kld = kldiv_loss(frame_softmax(logits, temperature=2.0), target)
    fl = floss(jax.nn.sigmoid(logits), target)
    return kld + alpha * fl


_LOSSES = {
    "kldiv": kldiv_loss,
    "egonce": egonce_loss,
    "floss": floss,
    "kldiv+floss": kldiv_plus_floss,
    "soft_cross_entropy": soft_target_cross_entropy,
    "bce_logit": weighted_bce_with_logits,
    "bce": bce_loss,
}


def get_loss_fn(name: str):
    """Loss registry (losses.py:187-207). ``kldiv+egonce`` is assembled in the
    train step, matching the reference's inline composition."""
    if name not in _LOSSES:
        raise NotImplementedError(f"Loss {name} is not supported")
    return _LOSSES[name]
