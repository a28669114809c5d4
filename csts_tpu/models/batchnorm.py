"""BatchNorm helpers (reference: ``slowfast/models/batchnorm_helper.py:15-218`` +
``bn_helper.py:11-77``).

MViT/CSTS is LayerNorm-only, but the framework surface carries the BN family for the
conv models of the PySlowFast lineage (SURVEY C32). Functional versions:

* :func:`batch_norm` — BatchNorm3d on channels-last grids with running stats carried
  explicitly (state in, state out — no mutation);
* sync (cross-replica) statistics via ``lax.pmean`` over the data axis of the mesh —
  the SPMD replacement for ``NaiveSyncBatchNorm3d``'s hand-rolled autograd allgather
  (batchnorm_helper.py:112-218), which XLA differentiates correctly by construction;
* :func:`SubBatchNorm` — split-stats BN (train on per-split stats, aggregate for
  eval; batchnorm_helper.py:37-109);
* :func:`update_precise_stats` — precise-BN recomputation over a loader
  (bn_helper.py:11-77 / fvcore update_bn_stats).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def bn_init(dim: int, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones((dim,), dtype),
        "bias": jnp.zeros((dim,), dtype),
    }


def bn_state_init(dim: int, dtype=jnp.float32) -> dict:
    return {
        "mean": jnp.zeros((dim,), dtype),
        "var": jnp.ones((dim,), dtype),
    }


def batch_norm(
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, dict]:
    """BatchNorm over all axes except the last (channels-last convention).

    ``axis_name``: when set (e.g. "data" inside shard_map/pmap), statistics are
    averaged across replicas — synchronized BN.
    Returns (normalized, new_state).
    """
    reduce_axes = tuple(range(x.ndim - 1))
    if training:
        mean = jnp.mean(x, axis=reduce_axes)
        mean_sq = jnp.mean(jnp.square(x), axis=reduce_axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * inv * params["scale"] + params["bias"]
    return out, new_state


class SubBatchNorm:
    """Split-stats BN: the batch is normalized in ``num_splits`` independent groups
    during training; :meth:`aggregate_stats` folds split stats into the global
    running stats for eval (batchnorm_helper.py:37-109)."""

    def __init__(self, num_splits: int, dim: int):
        self.num_splits = num_splits
        self.dim = dim

    def init(self, dtype=jnp.float32) -> Tuple[dict, dict]:
        params = bn_init(self.dim, dtype)
        state = {
            "split": bn_state_init(self.dim * self.num_splits, dtype),
            "global": bn_state_init(self.dim, dtype),
        }
        return params, state

    def apply(self, params, state, x, *, training: bool, momentum=0.1, eps=1e-5):
        if training:
            b = x.shape[0]
            assert b % self.num_splits == 0
            xs = x.reshape(self.num_splits, b // self.num_splits, *x.shape[1:])
            # per-split stats: fold split into the channel dim
            xs = jnp.moveaxis(xs, 0, -2)  # (..., splits, C)
            xs = xs.reshape(*xs.shape[:-2], self.num_splits * self.dim)
            split_params = {
                "scale": jnp.tile(params["scale"], self.num_splits),
                "bias": jnp.tile(params["bias"], self.num_splits),
            }
            out, new_split = batch_norm(
                split_params, state["split"], xs, training=True,
                momentum=momentum, eps=eps,
            )
            out = out.reshape(*out.shape[:-1], self.num_splits, self.dim)
            out = jnp.moveaxis(out, -2, 0)
            out = out.reshape(b, *x.shape[1:])
            return out, {**state, "split": new_split}
        out, _ = batch_norm(params, state["global"], x, training=False, eps=eps)
        return out, state

    def aggregate_stats(self, state: dict) -> dict:
        """Fold per-split running stats into the global stats
        (batchnorm_helper.py:60-83: mean of means; var of the mixture)."""
        mean_s = state["split"]["mean"].reshape(self.num_splits, self.dim)
        var_s = state["split"]["var"].reshape(self.num_splits, self.dim)
        mean = jnp.mean(mean_s, axis=0)
        var = jnp.mean(var_s + jnp.square(mean_s), axis=0) - jnp.square(mean)
        return {**state, "global": {"mean": mean, "var": var}}


def _is_bn_stats(d) -> bool:
    return isinstance(d, dict) and set(d) == {"mean", "var"}


def _is_subbn_state(d) -> bool:
    return (
        isinstance(d, dict)
        and set(d) == {"split", "global"}
        and _is_bn_stats(d["split"])
        and _is_bn_stats(d["global"])
    )


def sub_to_normal_bn_state(tree):
    """Canonicalize SubBN states for saving: keep only the aggregated global
    stats in normal-BN layout (reference ``checkpoint.py:477-511``
    ``sub_to_normal_bn`` — it renames the aggregated ``bn.bn`` copy to ``bn``
    and drops the per-split copy; call :meth:`SubBatchNorm.aggregate_stats`
    first, as the reference's trainer does before every save). The reference's
    4-D→1-D weight squeeze is a caffe2-era torch layout artifact with no
    analogue here (our scale/bias are 1-D by construction)."""
    if _is_subbn_state(tree):
        return dict(tree["global"])
    if isinstance(tree, dict):
        return {k: sub_to_normal_bn_state(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [sub_to_normal_bn_state(v) for v in tree]
    return tree


def normal_to_sub_bn_state(ckpt_tree, model_tree):
    """Expand normal-BN stats in a checkpoint to SubBN layout wherever the model
    expects one (reference ``checkpoint.py:538-577`` ``normal_to_sub_bn``: the
    flat stats become the global copy AND are tiled ``num_splits``× for the
    split copy). Subtrees the checkpoint lacks keep the model's values; SubBN
    states already in split layout pass through unchanged."""
    if ckpt_tree is None:
        return model_tree
    if _is_subbn_state(model_tree):
        if _is_subbn_state(ckpt_tree):
            return ckpt_tree
        if _is_bn_stats(ckpt_tree):
            split_n = np.shape(model_tree["split"]["mean"])[0]
            flat_n = np.shape(ckpt_tree["mean"])[0]
            assert split_n % flat_n == 0, (split_n, flat_n)
            reps = split_n // flat_n
            return {
                "global": {k: jnp.asarray(ckpt_tree[k]) for k in ("mean", "var")},
                "split": {
                    k: jnp.tile(jnp.asarray(ckpt_tree[k]), reps)
                    for k in ("mean", "var")
                },
            }
        return model_tree
    if isinstance(model_tree, dict):
        return {
            k: normal_to_sub_bn_state(
                ckpt_tree.get(k) if isinstance(ckpt_tree, dict) else None, v
            )
            for k, v in model_tree.items()
        }
    if isinstance(model_tree, list):
        return [
            normal_to_sub_bn_state(
                ckpt_tree[i]
                if isinstance(ckpt_tree, list) and i < len(ckpt_tree)
                else None,
                v,
            )
            for i, v in enumerate(model_tree)
        ]
    return ckpt_tree


def update_precise_stats(apply_fn, params, state, batches, num_iters: int):
    """Recompute running stats with momentum 1/i averaging over ``num_iters`` batches
    (precise-BN, bn_helper.py:35-77)."""
    agg_mean = jax.tree_util.tree_map(jnp.zeros_like, state)
    count = 0
    for i, batch in enumerate(batches):
        if i >= num_iters:
            break
        _, new_state = apply_fn(params, state, batch)
        agg_mean = jax.tree_util.tree_map(lambda a, s: a + s, agg_mean, new_state)
        count += 1
    return jax.tree_util.tree_map(lambda a: a / max(count, 1), agg_mean)
