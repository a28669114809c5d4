"""The training driver: ``train(cfg)`` (reference: ``tools/train_avgaze_net.py:25-361``).

Host-side orchestration around the jitted train/eval steps: seeding, state build,
auto-resume, per-epoch loader shuffling, metric computation, meters/JSON logs,
checkpoint cadence, validation cadence. All device work happens inside
``make_train_step``'s single compiled program.
"""

from __future__ import annotations

import pprint
import signal
import threading

import numpy as np

import jax

from csts_tpu.config import Config
from csts_tpu.data import loader as loader_lib
from csts_tpu.eval import metrics
from csts_tpu.models import csts as csts_lib
from csts_tpu.parallel import mesh as mesh_lib
from csts_tpu.train import step as step_lib
from csts_tpu.train.meters import EpochTimer, TrainGazeMeter, ValGazeMeter
from csts_tpu.utils import checkpoint as cu
from csts_tpu.utils.logging import get_logger, setup_logging

logger = get_logger(__name__)

# Preemption handling (beyond the reference, whose only elasticity is start-over
# auto-resume — SURVEY §5): SIGTERM sets a flag; the iteration loop checkpoints
# *mid-epoch* (iter-tagged npz, utils/checkpoint.py) and exits within one step —
# sized for preemptible-TPU grace windows. Resume skips into the (seed, epoch)-keyed
# batch order at the saved iteration, so the replayed stream is bit-identical to an
# uninterrupted run (the reference's DataLoader can only restart the epoch).
_PREEMPTED = threading.Event()

# Deterministic fault injection for preemption drills and tests: when set to N,
# the trainer behaves as if SIGTERM arrived after N iterations of the first
# trained epoch. None = off.
_PREEMPT_AFTER_ITERS = None

# One-shot guard for the in-trainer profile capture (TRAIN.PROFILE_NUM_ITERS):
# the trace window fires once per train() call, not once per epoch.
_PROFILE_DONE = False


def _install_preemption_handler() -> None:
    def handler(signum, frame):
        logger.info("Received signal %s — will checkpoint and exit.", signum)
        _PREEMPTED.set()

    try:
        signal.signal(signal.SIGTERM, handler)
    except (ValueError, OSError):  # non-main thread / restricted env
        pass


def train(cfg: Config) -> None:
    global _PROFILE_DONE
    _PROFILE_DONE = False
    setup_logging(cfg.OUTPUT_DIR)
    logger.info("Train with config:")
    logger.info(pprint.pformat(cfg.dump()))
    if cfg.DEBUG_NANS:
        jax.config.update("jax_debug_nans", True)

    spec = csts_lib.build_spec(cfg)
    mesh = mesh_lib.mesh_from_cfg(cfg)

    key = jax.random.PRNGKey(cfg.RNG_SEED)
    state, tx = step_lib.create_train_state(cfg, spec, key)

    train_loader = loader_lib.construct_loader(cfg, "train")
    val_loader = loader_lib.construct_loader(cfg, "val")
    steps_per_epoch = max(len(train_loader), 1)

    # Checkpoint backend dispatch: orbax (async, sharding-aware, multihost —
    # utils/orbax_ckpt.py) resumes AFTER device placement so each leaf restores
    # directly into its shard; the npz path keeps the reference's host-side
    # master-only semantics. Torch-checkpoint fine-tune init always goes through
    # cu.load_train_checkpoint.
    ckpt_mngr = None
    if cfg.TRAIN.CHECKPOINT_BACKEND == "orbax":
        from csts_tpu.utils import orbax_ckpt

        ckpt_mngr = orbax_ckpt.OrbaxCheckpointer(cfg.OUTPUT_DIR)
    resume_step = (
        ckpt_mngr.latest_step()
        if ckpt_mngr is not None and cfg.TRAIN.AUTO_RESUME
        else None
    )
    if resume_step is None:
        state, start_epoch, start_iter = cu.load_train_checkpoint(cfg, state)
    else:
        # orbax is keyed by global iteration: boundary saves land on epoch
        # multiples (start_iter 0), preemption saves mid-epoch (see orbax_ckpt)
        start_epoch, start_iter = divmod(resume_step, steps_per_epoch)
    state_shardings = None
    tp_on = cfg.PARALLEL.MODEL > 1
    fsdp_on = cfg.SOLVER.FSDP
    if cfg.SOLVER.ZERO1 or tp_on or fsdp_on:
        # ZeRO-1 shards Adam moments over data; FSDP (ZeRO-3) shards the params
        # too (XLA gathers on use); tp shards the Megatron matmul weights over
        # model. All express as a TrainState of shardings; with tp but neither
        # ZeRO level the moments stay replicated (correct, just unsharded).
        param_shardings = (
            mesh_lib.fsdp_param_sharding(mesh, state.params, model_parallel=tp_on)
            if fsdp_on
            else mesh_lib.param_sharding_rules(
                mesh, state.params, model_parallel=tp_on
            )
        )
        state_shardings = step_lib.TrainState(
            param_shardings,
            mesh_lib.opt_state_sharding(mesh, state.opt_state)
            if (cfg.SOLVER.ZERO1 or fsdp_on)
            else jax.tree_util.tree_map(
                lambda _: mesh_lib.replicated(mesh), state.opt_state
            ),
            mesh_lib.replicated(mesh),
            # the EMA tree mirrors params, so it rides the same shardings
            param_shardings if state.ema is not None else None,
        )
    train_step = step_lib.make_train_step(
        cfg, spec, tx, steps_per_epoch, accum_steps=cfg.TRAIN.GRAD_ACCUM_STEPS,
        state_shardings=state_shardings,
    )
    eval_step = step_lib.make_eval_step(cfg, spec)

    train_meter = TrainGazeMeter(len(train_loader), cfg)
    val_meter = ValGazeMeter(len(val_loader), cfg)
    epoch_timer = EpochTimer()

    writer = None
    if cfg.TENSORBOARD.ENABLE and jax.process_index() == 0:
        from csts_tpu.utils.tensorboard import TensorboardWriter

        writer = TensorboardWriter(cfg)

    _PREEMPTED.clear()
    _install_preemption_handler()
    with jax.sharding.set_mesh(mesh):
        state = jax.device_put(
            state, state_shardings if state_shardings is not None
            else mesh_lib.replicated(mesh))
        if ckpt_mngr is not None and resume_step is not None:
            state, _ = ckpt_mngr.restore(state, resume_step)
        logger.info("Start epoch: %d (iter %d)", start_epoch + 1, start_iter)

        for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
            epoch_start_iter = start_iter if cur_epoch == start_epoch else 0
            train_loader.set_epoch(cur_epoch, start_iter=epoch_start_iter)
            epoch_timer.epoch_tic()
            state, stopped_at = _train_epoch(
                train_loader, state, train_step, train_meter, cur_epoch, cfg,
                mesh, writer, start_iter=epoch_start_iter,
            )
            epoch_timer.epoch_toc()
            if stopped_at is not None:
                # mid-epoch preemption: auto-resume continues this epoch at
                # iteration ``stopped_at``. Orbax rides the async sharding-aware
                # path (works with cross-host-sharded ZeRO-1/TP state); npz is
                # a synchronous iter-tagged host save.
                if ckpt_mngr is not None:
                    ckpt_mngr.save(state, cur_epoch * steps_per_epoch + stopped_at)
                else:
                    host_state = jax.tree_util.tree_map(np.asarray, state)
                    cu.save_checkpoint(
                        cfg.OUTPUT_DIR, host_state, cur_epoch - 1, cfg,
                        iter_idx=stopped_at,
                    )
                logger.info(
                    "Preemption checkpoint saved (epoch %d, iter %d); exiting.",
                    cur_epoch + 1, stopped_at,
                )
                break
            logger.info(
                "Epoch %d takes %.2fs (avg %.2fs/iter).",
                cur_epoch + 1, epoch_timer.last_epoch_time(),
                epoch_timer.last_epoch_time() / max(len(train_loader), 1),
            )

            if (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0:
                if ckpt_mngr is not None:
                    # async: the write overlaps the next epoch's steps
                    ckpt_mngr.save(state, (cur_epoch + 1) * steps_per_epoch)
                else:
                    host_state = jax.tree_util.tree_map(np.asarray, state)
                    cu.save_checkpoint(cfg.OUTPUT_DIR, host_state, cur_epoch, cfg)
            if (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0:
                _eval_epoch(val_loader, state, eval_step, val_meter, cur_epoch, cfg, mesh)
            if _PREEMPTED.is_set():
                # preemption landed on the epoch's last iteration: exit at the
                # boundary, making sure this epoch is checkpointed
                if (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD != 0:
                    if ckpt_mngr is not None:
                        ckpt_mngr.save(state, (cur_epoch + 1) * steps_per_epoch)
                    else:
                        host_state = jax.tree_util.tree_map(np.asarray, state)
                        cu.save_checkpoint(cfg.OUTPUT_DIR, host_state, cur_epoch, cfg)
                logger.info("Preemption checkpoint saved (epoch %d); exiting.", cur_epoch + 1)
                break

    if ckpt_mngr is not None:
        ckpt_mngr.wait()
        ckpt_mngr.close()
    if writer is not None:
        writer.close()
    logger.info("Training finished!")


def _train_epoch(
    train_loader, state, train_step, meter, cur_epoch, cfg, mesh, writer=None,
    start_iter=0,
):
    """One epoch (resumable mid-way at ``start_iter``). Returns
    ``(state, stopped_at)`` — ``stopped_at`` is the next iteration to run when
    the epoch was preempted, else None."""
    meter.iter_tic()
    data_size = len(train_loader)
    base_rng = jax.random.fold_in(jax.random.PRNGKey(cfg.RNG_SEED), cur_epoch)
    dataset_name = cfg.TRAIN.DATASET
    stopped_at = None

    prefetch = loader_lib.DevicePrefetcher(
        iter(train_loader), lambda b: mesh_lib.shard_batch(mesh, b),
        depth=cfg.DATA_LOADER.PREFETCH_DEPTH,
    )
    global _PROFILE_DONE
    prof_active = False
    prof_end = cfg.TRAIN.PROFILE_START_ITER + cfg.TRAIN.PROFILE_NUM_ITERS
    for offset, batch in enumerate(prefetch):
        cur_iter = start_iter + offset  # absolute epoch iteration (RNG stream key)
        if (
            cfg.TRAIN.PROFILE_NUM_ITERS
            and not _PROFILE_DONE
            and cur_iter == cfg.TRAIN.PROFILE_START_ITER
            and jax.process_index() == 0
        ):
            # in-trainer device trace (TRAIN.PROFILE_*): same format
            # tools/profile_forward.py analyzes offline
            import os as _os

            jax.profiler.start_trace(_os.path.join(cfg.OUTPUT_DIR, "profile"))
            prof_active = True
        meter.data_toc()
        rng = jax.random.fold_in(base_rng, cur_iter)
        state, stats, preds = train_step(state, batch, rng)

        loss = float(stats["loss"])
        if prof_active and cur_iter + 1 >= prof_end:
            # the float() above is the scalar-readback fence this transport needs
            jax.profiler.stop_trace()
            prof_active = False
            _PROFILE_DONE = True
            logger.info(
                "Profiled iterations [%d, %d) to %s/profile",
                cfg.TRAIN.PROFILE_START_ITER, prof_end, cfg.OUTPUT_DIR,
            )
        lr = float(stats["lr"])
        step_lib.check_nan_loss(loss, cur_iter)

        # metrics on the global batch (preds are sharded; metric jit handles it)
        preds_rescaled = metrics.minmax_rescale(preds)
        f1, recall, precision, threshold = metrics.adaptive_f1(
            preds_rescaled, batch["labels_hm"], batch["labels"], dataset_name
        )
        meter.update_stats(
            f1, recall, precision, threshold, loss, lr,
            mb_size=batch["labels"].shape[0],
        )
        if writer is not None:
            scalars = {
                "Train/loss": loss, "Train/lr": lr, "Train/F1": f1,
                "Train/Recall": recall, "Train/Precision": precision,
            }
            if "egonce_loss" in stats:
                scalars["Train/kldiv_loss"] = float(stats["kldiv_loss"])
                scalars["Train/nce_loss"] = float(stats["egonce_loss"])
            writer.add_scalars(scalars, global_step=data_size * cur_epoch + cur_iter)
        if "egonce_loss" in stats and (cur_iter + 1) % cfg.LOG_PERIOD == 0:
            logger.info(
                "Iter %d: kld_loss %.4f, egonce_loss %.4f, loss %.4f",
                cur_iter + 1, float(stats["kldiv_loss"]),
                float(stats["egonce_loss"]), loss,
            )
        meter.iter_toc()
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()
        if _PREEMPT_AFTER_ITERS is not None and offset + 1 >= _PREEMPT_AFTER_ITERS:
            _PREEMPTED.set()
        # preemption on the epoch's last iteration is an epoch-boundary exit
        # (handled by the caller), not a mid-epoch save pointing past the end
        if _PREEMPTED.is_set() and cur_iter + 1 < data_size:
            stopped_at = cur_iter + 1
            prefetch.close()
            break

    if prof_active:  # epoch ended (or preempted) inside the trace window
        jax.profiler.stop_trace()
        _PROFILE_DONE = True
    if stopped_at is None:
        meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return state, stopped_at


def _eval_epoch(val_loader, state, eval_step, meter, cur_epoch, cfg, mesh):
    meter.iter_tic()
    dataset_name = cfg.TRAIN.DATASET
    fix_idx = metrics.fixation_index(dataset_name)
    prefetch = loader_lib.DevicePrefetcher(
        iter(val_loader), lambda b: mesh_lib.shard_batch(mesh, b),
        depth=cfg.DATA_LOADER.PREFETCH_DEPTH,
    )
    # validate the smoothed weights when EMA is on (SOLVER.EMA_DECAY)
    eval_params = state.ema if state.ema is not None else state.params
    # fixation count on device: the GLOBAL batch's weight as a replicated
    # scalar — multi-host labels are global sharded arrays a host-side
    # np.sum cannot read (and per-host counts would mis-weight the global
    # f1 scalars)
    import jax as _jax

    count_fix = _jax.jit(lambda l: (l[:, :, 2] == fix_idx).sum())
    for cur_iter, batch in enumerate(prefetch):
        meter.data_toc()
        preds = eval_step(eval_params, batch)
        preds_rescaled = metrics.minmax_rescale(preds)
        f1, recall, precision, threshold = metrics.adaptive_f1(
            preds_rescaled, batch["labels_hm"], batch["labels"], dataset_name
        )
        meter.iter_toc()
        meter.update_stats(f1, recall, precision, None, threshold, fix_idx,
                           weight=int(count_fix(batch["labels"])))
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()
    meter.log_epoch_stats(cur_epoch)
    meter.reset()
