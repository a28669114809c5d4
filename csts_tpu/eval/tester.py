"""Evaluation driver: ``test(cfg)`` (reference: ``tools/test_avgaze_net.py:21-141``).

Loads the checkpoint (npz or converted .pyth), iterates the test loader through the
jitted eval step, accumulates streaming whole-test-set adaptive-F1 + AUC, and emits
the ``test_final`` JSON record — the headline number."""

from __future__ import annotations

import os
import pprint

import numpy as np

import jax

from csts_tpu.config import Config
from csts_tpu.data import loader as loader_lib
from csts_tpu.eval import metrics
from csts_tpu.models import csts as csts_lib
from csts_tpu.parallel import collectives
from csts_tpu.parallel import mesh as mesh_lib
from csts_tpu.train import step as step_lib
from csts_tpu.train.meters import TestGazeMeter
from csts_tpu.utils import checkpoint as cu
from csts_tpu.utils.logging import get_logger, setup_logging

logger = get_logger(__name__)


def _load_params(cfg: Config, spec, params):
    """Checkpoint chain: explicit npz/torch paths and epoch-npz files go through
    ``cu.load_test_checkpoint`` (checkpoint.py:579-614 semantics); an orbax-only
    training run (TRAIN.CHECKPOINT_BACKEND=orbax, which never writes npz) falls
    through to the orbax manager's latest step — restored via a full TrainState
    template so the saved tree structure matches, then reduced to params."""
    from csts_tpu.train import step as train_step_lib
    from csts_tpu.utils import orbax_ckpt

    def pick(state):
        """TEST.USE_EMA: evaluate the smoothed weights when the TrainState
        carries them (SOLVER.EMA_DECAY > 0 training runs)."""
        if cfg.TEST.USE_EMA:
            if state.ema is None:
                logger.warning(
                    "TEST.USE_EMA requested but the checkpoint has no EMA "
                    "weights; evaluating raw params."
                )
            else:
                logger.info("Evaluating EMA weights.")
                return state.ema
        return state.params

    has_file_source = (
        cfg.TEST.CHECKPOINT_FILE_PATH
        or cu.has_checkpoint(cfg.OUTPUT_DIR)
        or cfg.TRAIN.CHECKPOINT_FILE_PATH
    )
    if not has_file_source and orbax_ckpt.has_checkpoint(cfg.OUTPUT_DIR):
        template, _ = train_step_lib.create_train_state(
            cfg, spec, jax.random.PRNGKey(cfg.RNG_SEED)
        )
        ck = orbax_ckpt.OrbaxCheckpointer(cfg.OUTPUT_DIR)
        try:
            restored, step = ck.restore(template)
        finally:
            ck.close()
        logger.info("Testing with orbax checkpoint at step %d.", step)
        return pick(restored)
    if cfg.TEST.USE_EMA:
        # restore the full TrainState so the trailing EMA leaves are recovered
        # (load_test_checkpoint maps only the leading params leaves). Works for
        # both an OUTPUT_DIR npz and an explicit TEST.CHECKPOINT_FILE_PATH npz.
        npz_path = None
        if cfg.TEST.CHECKPOINT_FILE_PATH and cfg.TEST.CHECKPOINT_FILE_PATH.endswith(".npz"):
            npz_path = cfg.TEST.CHECKPOINT_FILE_PATH
        elif not cfg.TEST.CHECKPOINT_FILE_PATH and cu.has_checkpoint(cfg.OUTPUT_DIR):
            npz_path = cu.get_last_checkpoint(cfg.OUTPUT_DIR)
        if npz_path:
            template, _ = train_step_lib.create_train_state(
                cfg, spec, jax.random.PRNGKey(cfg.RNG_SEED)
            )
            try:
                state, _ = cu.load_checkpoint(npz_path, template)
            except AssertionError:
                logger.warning(
                    "TEST.USE_EMA requested but %s is not a TrainState archive "
                    "(leaf count differs); evaluating its raw params.", npz_path
                )
            else:
                return pick(state)
        else:
            logger.warning(
                "TEST.USE_EMA requested but the checkpoint source is not a "
                "TrainState .npz; evaluating raw weights."
            )
    return cu.load_test_checkpoint(cfg, params)


def _collect_results(results: dict, preds: np.ndarray, labels: np.ndarray, indices):
    """Append one batch's per-row outputs, skipping wrap-padded duplicate rows
    (the loader repeats leading samples to fill the final batch; each real
    dataset row — one (clip, view) pair — has a unique index)."""
    seen = set(int(i) for i in results["index"])
    fresh = []
    for i in indices:
        i = int(i)
        fresh.append(i not in seen)
        seen.add(i)  # wrap-pad can duplicate a row WITHIN one batch too
    fresh = np.asarray(fresh, bool)
    if not fresh.any():
        return
    preds, labels, indices = preds[fresh], labels[fresh], np.asarray(indices)[fresh]
    b, t, h, w = preds.shape
    flat_idx = np.argmax(preds.reshape(b, t, h * w), axis=-1)
    pred_xy = np.stack(
        [(flat_idx % w + 0.5) / w, (flat_idx // w + 0.5) / h], axis=-1
    ).astype(np.float32)
    results["index"].extend(int(i) for i in indices)
    results["pred_xy"].extend(pred_xy)
    results["label_xy"].extend(labels[:, :, :2].astype(np.float32))
    results["gaze_type"].extend(labels[:, :, 2].astype(np.int32))


def _merge_host_results(per_host: list) -> dict:
    """Merge per-host result stripes (list of the _collect_results dicts) into
    one, keeping the first occurrence of each dataset row index — the loader's
    per-host striping wrap-pads each stripe independently, so a row can recur
    across hosts."""
    merged = {k: [] for k in per_host[0]}
    seen = set()
    for host_results in per_host:
        fresh = []
        for i in host_results["index"]:
            fresh.append(int(i) not in seen)
            seen.add(int(i))
        for key, vals in host_results.items():
            merged[key].extend(v for v, f in zip(vals, fresh) if f)
    return merged


def test(cfg: Config) -> dict:
    setup_logging(cfg.OUTPUT_DIR)
    logger.info("Test with config:")
    logger.info(pprint.pformat(cfg.dump()))

    spec = csts_lib.build_spec(cfg)
    mesh = mesh_lib.mesh_from_cfg(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(cfg.RNG_SEED), spec)
    params = _load_params(cfg, spec, params)
    if cfg.TRAIN.MIXED_PRECISION:
        # cast weights once instead of per-op inside the step
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
        )

    test_loader = loader_lib.construct_loader(cfg, "test")
    num_views = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    assert len(test_loader.dataset) % num_views == 0
    eval_step = step_lib.make_eval_step(cfg, spec)
    meter = TestGazeMeter(cfg.TEST.DATASET, num_views=num_views)
    # TEST.SAVE_RESULTS_PATH (defaults.py:166 — dead config in the reference's
    # CSTS fork; its generic kinetics tester pickles [preds, labels]): here it
    # saves the compact per-row outputs — predicted gaze trajectory (argmax of
    # the rescaled heatmap, the serving.py convention), label xy + gaze type,
    # and the dataset row index — as an .npz. Full heatmaps are deliberately
    # not dumped (a real test set is GBs of (T,64,64) grids; use
    # tools/visualize.py for per-clip heatmap inspection).
    results = None
    results_path = None
    if cfg.TEST.SAVE_RESULTS_PATH:
        results = {"index": [], "pred_xy": [], "label_xy": [], "gaze_type": []}
        results_path = cfg.TEST.SAVE_RESULTS_PATH
        if not os.path.isabs(results_path):
            results_path = os.path.join(cfg.OUTPUT_DIR, results_path)
        if not results_path.endswith(".npz"):
            results_path += ".npz"  # np.savez appends it silently otherwise
        # fail on an unwritable directory now, not after the full eval loop
        os.makedirs(os.path.dirname(results_path) or ".", exist_ok=True)

    with jax.sharding.set_mesh(mesh):
        if cfg.PARALLEL.MODEL > 1:
            # tensor-parallel eval: the Megatron column/row rules shard the
            # matmul weights over the model axis (same placement the trainer
            # uses), instead of leaving the model axis idle
            params = jax.tree_util.tree_map(
                jax.device_put, params,
                mesh_lib.param_sharding_rules(mesh, params, model_parallel=True),
            )
        else:
            params = jax.device_put(params, mesh_lib.replicated(mesh))
        # shard_batch_padded: a batch that does not divide the data axis (e.g.
        # the test set's short final batch, or few clips on many chips) is
        # padded for the SPMD forward and sliced back before metrics
        prefetch = loader_lib.DevicePrefetcher(
            iter(test_loader), lambda b: mesh_lib.shard_batch_padded(mesh, b),
            depth=cfg.DATA_LOADER.PREFETCH_DEPTH,
        )
        # global positions: this host's stripe of global batch b covers rows
        # [b*G + proc*local, ...); positions >= the dataset size are the
        # loader's wrap-pad rows. Masking by POSITION drops every pad row on
        # every host exactly — per-host index dedup alone cannot see a pad
        # whose original row lives on another host's stripe.
        G = cfg.TEST.BATCH_SIZE
        local_bs = G // jax.process_count()
        n_total = len(test_loader.dataset)
        if jax.process_count() > 1 and num_views > 1:
            logger.warning(
                "multi-host + multi-view eval: views of a clip that straddle a "
                "host-stripe boundary are averaged per host, not globally"
            )
        meter.iter_tic()
        for cur_iter, (batch, true_n) in enumerate(prefetch):
            meter.data_toc()
            preds = eval_step(params, batch)
            preds_rescaled = metrics.minmax_rescale(preds)
            local = mesh_lib.host_local_batch(mesh, {
                "preds": preds_rescaled,
                "labels_hm": batch["labels_hm"],
                "labels": batch["labels"],
                "index": batch["index"],
            })
            meter.iter_toc()  # the host-local conversion read back the device outputs
            base = cur_iter * G + jax.process_index() * local_bs
            rows = base + np.arange(int(true_n))
            real = rows < n_total
            meter.update_stats(
                local["preds"][:true_n][real],
                local["labels_hm"][:true_n][real],
                local["labels"][:true_n][real],
                indices=local["index"][:true_n][real],
            )
            meter.log_iter_stats(cur_iter, cfg.LOG_PERIOD)
            if results is not None:
                _collect_results(
                    results,
                    local["preds"][:true_n][real],
                    local["labels"][:true_n][real],
                    local["index"][:true_n][real],
                )
            meter.iter_tic()

    if results is not None:
        if jax.process_count() > 1:
            # each host collected only its own loader stripe (loader.py
            # per-host striping); merge them so the npz holds the full set,
            # deduping stripe-pad repeats by dataset row index
            results = _merge_host_results(collectives.gather_objects(results))
        if jax.process_index() == 0:
            order = np.argsort(np.asarray(results["index"]))
            np.savez(
                results_path,
                **{k: np.asarray(v)[order] for k, v in results.items()},
            )
            logger.info("Saved %d test results to %s", len(order), results_path)

    if jax.process_count() > 1:
        # fold the other hosts' streaming partial sums in so test_final is the
        # WHOLE-test-set metric on every host (the reference all-gathers the
        # full prediction tensors instead, test_avgaze_net.py:58-59; the
        # position mask above already de-duplicated pad rows globally)
        for rank, state in enumerate(collectives.gather_objects(meter.stream.state())):
            if rank != jax.process_index():
                meter.stream.merge_state(state)
    stats = meter.finalize_metrics()
    logger.info("Testing finished: %s", stats)
    return stats
