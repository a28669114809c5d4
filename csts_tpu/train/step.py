"""The jitted training / evaluation step functions.

Reference: the body of ``train_epoch`` (``tools/train_avgaze_net.py:25-155``) minus
host-side bookkeeping. Everything device-side is one compiled XLA program per step:
forward, loss (kldiv + α·egonce over the global batch), backward, grad clip,
AdamW update, per-step cosine LR — no host round-trips, donated buffers.

Under a data-sharded mesh the gradient mean and the cross-device EgoNCE similarity
both come from XLA's partitioner; there is no hand-written collective here at all
(compare distributed.py:15-90 + DDP in the reference).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from csts_tpu.config import Config
from csts_tpu.models import csts as csts_lib
from csts_tpu.train import losses
from csts_tpu.train.lr_policy import get_lr_at_epoch
from csts_tpu.train.optimizer import construct_optimizer


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # scalar int32
    # EMA of params (SOLVER.EMA_DECAY > 0), else None. None flattens to zero
    # leaves, so EMA-off states keep the historical leaf order/count (old
    # checkpoints load unchanged); ema sits LAST so load_params_npz's
    # "params are the leading leaves" invariant holds either way.
    ema: Any = None

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step, self.ema), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step, s.ema), None),
    lambda _, c: TrainState(*c),
)


def create_train_state(cfg: Config, spec, key: jax.Array) -> Tuple[TrainState, optax.GradientTransformation]:
    params = csts_lib.csts_init(key, spec)
    tx = construct_optimizer(params, cfg)
    opt_state = tx.init(params)
    # distinct buffers (not aliases of params): the train step donates the whole
    # state, and aliased donated leaves are rejected
    ema = (
        jax.tree_util.tree_map(jnp.copy, params)
        if cfg.SOLVER.EMA_DECAY > 0 else None
    )
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32), ema), tx


def make_train_step(cfg: Config, spec, tx, steps_per_epoch: int, accum_steps: int = 1,
                    state_shardings: Any = None):
    """Returns ``train_step(state, batch, rng) -> (state, stats)``, jitted with
    donated state. ``batch``: dict with video (B,T,H,W,3), audio (B,T,F,S,1),
    labels (B,T,3), labels_hm (B,T,h,w).

    ``state_shardings`` (a TrainState-shaped pytree of NamedShardings) pins the
    OUTPUT state's placement — used by ZeRO-1 (``SOLVER.ZERO1``) to keep the
    sharded Adam moments sharded across steps so the donated buffers round-trip
    without a gather.

    ``accum_steps > 1`` splits the batch into micro-batches and scan-accumulates
    gradients before the single optimizer update — large effective batches within
    one chip's HBM (a capability the reference lacks). With EgoNCE in the loss the
    accumulation is GradCache-style two-pass so the contrastive negatives stay
    GLOBAL over the effective batch (the whole point of the reference's
    gradient-carrying gather, train_avgaze_net.py:82-88): pass A scans the
    micro-batches forward-only to collect every embedding, the NCE loss and its
    embedding cotangents are computed once over the full set, and pass B replays
    each micro-batch (same per-micro RNG, so drop-path masks match) through a VJP
    seeded with (kldiv_cotangent, α·dV_i, α·dA_i). Gradients equal the
    single-big-batch program's (pinned by tests/test_train_components.py); cost is
    one extra forward (~1.4× a plain micro-step).
    """
    solver = cfg.SOLVER
    alpha = cfg.MODEL.LOSS_ALPHA
    loss_name = cfg.MODEL.LOSS_FUNC
    use_nce = "nce" in loss_name
    ema_decay = solver.EMA_DECAY

    # Training-only layout fix: inside the train graph XLA layout assignment
    # poisons the depthwise kv-pool convs (f32 batch-in-sublanes outputs, 9.95
    # vs ~0.7 ms each at batch 8); an optimization_barrier on the conv output
    # restores the natural layout. On-chip per-op profile: 235.5 -> 131.2
    # ms/iter device-op at batch 8 (-44%). Module-level like the kernel gates
    # (kernels/attention.py set_enabled): the flag is read when the jitted
    # step TRACES, so setting it here covers this step's first call; eval-only
    # processes (bench.py, serving) never import it ON.
    from csts_tpu.ops import conv as conv_mod

    if conv_mod.DW_BARRIER_TRAIN_AUTO:
        conv_mod.DW_BARRIER = True

    def main_loss(logits, preds, labels_hm):
        """The non-NCE term, dispatched identically in the single-step and
        grad-accum paths (kldiv+egonce is assembled here, not in the registry —
        train_avgaze_net.py:71-88; other '<x>+egonce' composites raise in
        ``get_loss_fn`` on both paths rather than silently training kldiv)."""
        if loss_name in ("kldiv", "kldiv+egonce"):
            return losses.kldiv_loss(preds, labels_hm)
        return losses.get_loss_fn(loss_name)(logits, labels_hm)

    def loss_fn(params, batch, rng):
        out = csts_lib.csts_apply(
            params, spec, batch["video"], batch["audio"],
            deterministic=False, rng=rng, return_embed=use_nce,
        )
        if use_nce:
            logits, v_embed, a_embed = out
        else:
            logits = out
        preds = losses.frame_softmax(logits, temperature=2.0)
        main = main_loss(logits, preds, batch["labels_hm"])
        stats = {"kldiv_loss": main}
        loss = main
        if use_nce:
            # Embeddings are batch-sharded; this similarity is over the GLOBAL batch —
            # XLA inserts the gather (replaces all_gather_with_grad,
            # train_avgaze_net.py:82-83, with correct gradients).
            sim = losses.sim_matrix(v_embed, a_embed)
            nce = losses.egonce_loss(sim)
            loss = loss + alpha * nce
            stats["egonce_loss"] = nce
        stats["loss"] = loss
        return loss, (stats, preds)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        epoch_frac = state.step.astype(jnp.float32) / steps_per_epoch
        lr = get_lr_at_epoch(solver, epoch_frac)

        if accum_steps == 1:
            (_, (stats, preds)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
        elif use_nce:
            micro = {
                k: v.reshape(accum_steps, v.shape[0] // accum_steps, *v.shape[1:])
                for k, v in batch.items()
            }
            rngs = jax.random.split(rng, accum_steps)

            def micro_fwd(params, mb, mrng):
                logits, v_embed, a_embed = csts_lib.csts_apply(
                    params, spec, mb["video"], mb["audio"],
                    deterministic=False, rng=mrng, return_embed=True,
                )
                preds = losses.frame_softmax(logits, temperature=2.0)
                kl = main_loss(logits, preds, mb["labels_hm"])
                return (kl, v_embed, a_embed), preds

            # Pass A: embeddings of every micro-batch, forward only.
            def embed_pass(_, inputs):
                mb, mrng = inputs
                (_, v_embed, a_embed), _ = micro_fwd(state.params, mb, mrng)
                return None, (v_embed, a_embed)

            _, (v_all, a_all) = jax.lax.scan(embed_pass, None, (micro, rngs))
            v_flat = v_all.reshape(-1, v_all.shape[-1])
            a_flat = a_all.reshape(-1, a_all.shape[-1])

            # NCE over the GLOBAL effective batch + its embedding cotangents.
            def nce_of(v, a):
                return losses.egonce_loss(losses.sim_matrix(v, a))

            nce, (dv, da) = jax.value_and_grad(nce_of, argnums=(0, 1))(v_flat, a_flat)
            dv = dv.reshape(v_all.shape)
            da = da.reshape(a_all.shape)

            # Pass B: per-micro VJP with the cached embedding cotangents.
            def accum_nce(grads_acc, inputs):
                mb, mrng, dv_i, da_i = inputs
                (kl_i, v_i, a_i), vjp_fn, preds_i = jax.vjp(
                    lambda p: micro_fwd(p, mb, mrng), state.params, has_aux=True
                )
                (grads_i,) = vjp_fn((
                    jnp.asarray(1.0 / accum_steps, kl_i.dtype),
                    (alpha * dv_i).astype(v_i.dtype),
                    (alpha * da_i).astype(a_i.dtype),
                ))
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads_i)
                return grads_acc, (kl_i, preds_i)

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grads, (kl_stack, preds_stack) = jax.lax.scan(
                accum_nce, zero_grads, (micro, rngs, dv, da)
            )
            kl_mean = jnp.mean(kl_stack)
            stats = {
                "kldiv_loss": kl_mean,
                "egonce_loss": nce,
                "loss": kl_mean + alpha * nce,
            }
            preds = preds_stack.reshape(-1, *preds_stack.shape[2:])
        else:
            micro = {
                k: v.reshape(accum_steps, v.shape[0] // accum_steps, *v.shape[1:])
                for k, v in batch.items()
            }

            def accum(carry, inputs):
                grads_acc, stats_acc = carry
                mb, mrng = inputs
                (_, (stats_i, preds_i)), grads_i = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, mb, mrng)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads_i)
                stats_acc = jax.tree_util.tree_map(jnp.add, stats_acc, stats_i)
                return (grads_acc, stats_acc), preds_i

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zero_stats = {
                k: jnp.zeros((), jnp.float32)
                for k in (["kldiv_loss", "egonce_loss", "loss"] if use_nce else ["kldiv_loss", "loss"])
            }
            rngs = jax.random.split(rng, accum_steps)
            (grads, stats), preds_stack = jax.lax.scan(
                accum, (zero_grads, zero_stats), (micro, rngs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            stats = jax.tree_util.tree_map(lambda s: s / accum_steps, stats)
            preds = preds_stack.reshape(-1, *preds_stack.shape[2:])
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr.astype(
            opt_state.hyperparams["learning_rate"].dtype
        )
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        stats = dict(stats)
        stats["lr"] = lr
        stats["grad_norm"] = optax.global_norm(grads)
        ema = state.ema
        if ema is not None:
            # Polyak average in fp32, stored back at the ema leaf's dtype
            # (beyond the reference: eval/serve from the smoothed weights).
            d = jnp.asarray(ema_decay, jnp.float32)
            ema = jax.tree_util.tree_map(
                lambda e, p: (
                    d * e.astype(jnp.float32) + (1.0 - d) * p.astype(jnp.float32)
                ).astype(e.dtype),
                state.ema, params,
            )
        new_state = TrainState(params, opt_state, state.step + 1, ema)
        if state_shardings is not None:
            new_state = jax.lax.with_sharding_constraint(new_state, state_shardings)
        return new_state, stats, preds

    return train_step


def make_eval_step(cfg: Config, spec):
    """Forward + frame_softmax, jitted (eval_epoch / perform_test device work)."""

    @jax.jit
    def eval_step(params, batch):
        logits = csts_lib.csts_apply(
            params, spec, batch["video"], batch["audio"], deterministic=True
        )
        return losses.frame_softmax(logits, temperature=2.0)

    return eval_step


def check_nan_loss(loss: float, step: int) -> None:
    """Host-side NaN guard (misc.py:26-33)."""
    import math

    if math.isnan(loss):
        raise RuntimeError(f"ERROR: Got NaN losses at step {step}")
