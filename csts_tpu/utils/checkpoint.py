"""Checkpointing: save/auto-resume/fine-tune-init for TrainState pytrees.

Reference: ``slowfast/utils/checkpoint.py`` (save :110-143, auto-resume :617-659,
shape-filtered partial load + pos-embed interpolation :146-182,327-335, test-load
fallback chain :579-614). Re-designed for jax:

* checkpoints are flat ``.npz`` archives of the TrainState leaves (ordered flatten —
  no pickle, no torch, safe to load anywhere) + a JSON sidecar with step/epoch/cfg;
* master-process-only writes; epoch-numbered ``checkpoint_epoch_{:05d}.npz``;
* ``load_torch_weights`` ingests reference ``.pyth`` files (HF CSTS release / K400
  MViT pretrain) through csts_tpu.convert, with shape-matched partial load and
  token-axis interpolation of mismatched positional embeddings.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import numpy as np

import jax

from csts_tpu.utils.logging import get_logger

logger = get_logger(__name__)

CHECKPOINT_DIR = "checkpoints"
# Epoch-boundary files are checkpoint_epoch_{completed+1:05d}.npz (reference
# naming, checkpoint.py:36-46). Mid-epoch preemption saves (beyond the
# reference — its SIGTERM story is start-the-epoch-over) append _iter_{i:07d},
# where i = iterations already completed in epoch {completed+1}. The suffix is
# chosen so a plain lexical sort keeps true recency order:
# ..._00005.npz < ..._00005_iter_0000012.npz < ..._00006.npz
# ('.' < '_' < any digit-extension of the epoch field).
_NAME_RE = re.compile(r"checkpoint_epoch_(\d+)(?:_iter_(\d+))?\.npz$")


def checkpoint_dir(output_dir: str) -> str:
    return os.path.join(output_dir, CHECKPOINT_DIR)


def checkpoint_path(output_dir: str, epoch: int, iter_idx: Optional[int] = None) -> str:
    name = f"checkpoint_epoch_{epoch + 1:05d}"
    if iter_idx is not None:
        name += f"_iter_{iter_idx:07d}"
    return os.path.join(checkpoint_dir(output_dir), name + ".npz")


def is_master() -> bool:
    return jax.process_index() == 0


def save_checkpoint(
    output_dir: str, state: Any, epoch: int, cfg=None, iter_idx: Optional[int] = None
) -> Optional[str]:
    """Master-only save (checkpoint.py:110-143). Returns the path written.

    ``epoch`` is the last *completed* epoch; ``iter_idx`` (mid-epoch preemption
    saves only) is the number of iterations already completed in epoch
    ``epoch + 1`` — resume continues that epoch at that iteration.
    """
    if not is_master():
        return None
    os.makedirs(checkpoint_dir(output_dir), exist_ok=True)
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    path = checkpoint_path(output_dir, epoch, iter_idx)
    np.savez(path, **arrays)
    meta = {"epoch": epoch, "num_leaves": len(leaves)}
    if iter_idx is not None:
        meta["iter"] = iter_idx
    if cfg is not None:
        meta["cfg"] = cfg.dump()
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    logger.info("Saved checkpoint to %s", path)
    return path


def get_last_checkpoint(output_dir: str) -> Optional[str]:
    """(checkpoint.py:49-72)"""
    d = checkpoint_dir(output_dir)
    if not os.path.isdir(d):
        return None
    names = [n for n in os.listdir(d) if _NAME_RE.search(n)]
    if not names:
        return None
    return os.path.join(d, sorted(names)[-1])


def has_checkpoint(output_dir: str) -> bool:
    return get_last_checkpoint(output_dir) is not None


def load_checkpoint(path: str, state: Any) -> Tuple[Any, int]:
    """Restore a TrainState saved by :func:`save_checkpoint`. Returns (state, epoch)."""
    blob = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    keys = sorted(blob.files)
    assert len(keys) == len(leaves), (
        f"checkpoint has {len(keys)} leaves, state expects {len(leaves)} — "
        "optimizer/model configuration mismatch"
    )
    new_leaves = []
    for key, old in zip(keys, leaves):
        arr = blob[key]
        assert arr.shape == tuple(np.shape(old)), (key, arr.shape, np.shape(old))
        new_leaves.append(jax.numpy.asarray(arr).astype(np.asarray(old).dtype))
    epoch = checkpoint_meta(path)["epoch"]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), epoch


def checkpoint_meta(path: str) -> dict:
    """The JSON sidecar of a checkpoint: epoch, optional mid-epoch ``iter``, cfg."""
    with open(path + ".json") as f:
        return json.load(f)


def param_leaf_names(cfg) -> list:
    """Named model-param leaves ``[(path, shape), ...]`` in flatten order, via
    ``jax.eval_shape`` (no weights materialize, no compute runs).

    This is THE statement of the flat-archive convention every consumer relies
    on: a TrainState ``.npz`` written by :func:`save_checkpoint` stores the
    params as its leading ``len(param_leaf_names(cfg))`` leaves in exactly this
    order (then optimizer/EMA state) — :func:`load_params_npz`,
    ``tools/inspect_checkpoint.py`` and ``tools/average_checkpoints.py`` all
    consume it through here so the recipe lives in one place.
    """
    from csts_tpu.models import csts as csts_lib  # lazy: avoid an import cycle

    spec = csts_lib.build_spec(cfg)
    shapes = jax.eval_shape(
        lambda key: csts_lib.csts_init(key, spec), jax.random.PRNGKey(0)
    )
    names = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        names.append((name, tuple(leaf.shape)))
    return names


def load_params_npz(path: str, params: Any) -> Any:
    """Load only model params (ignores optimizer state) from a TrainState .npz by
    matching the params' leading leaves."""
    blob = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = sorted(blob.files)[: len(leaves)]
    new_leaves = [
        jax.numpy.asarray(blob[k]).astype(np.asarray(old).dtype)
        for k, old in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# ----------------------------------------------------------------------------------
# torch .pyth ingestion (fine-tune init / released-weights eval)
# ----------------------------------------------------------------------------------


def _merge_partial(params: Any, converted: Any, path: str = "") -> Tuple[Any, int, int]:
    """Shape-matched partial merge (checkpoint.py:146-182 semantics): leaves present
    in ``converted`` with matching shapes replace ``params``; pos embeds with a token-
    count mismatch are interpolated (checkpoint.py:327-335); everything else keeps
    its initialization."""
    from csts_tpu.convert.from_torch import interpolate_pos_embed

    loaded = skipped = 0
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            if isinstance(converted, dict) and k in converted:
                merged, l, s = _merge_partial(v, converted[k], f"{path}/{k}")
                out[k] = merged
                loaded += l
                skipped += s
            else:
                out[k] = v
                skipped += len(jax.tree_util.tree_leaves(v))
        return out, loaded, skipped
    if isinstance(params, list):
        out_list = []
        for i, v in enumerate(params):
            src = converted[i] if isinstance(converted, list) and i < len(converted) else None
            if src is not None:
                merged, l, s = _merge_partial(v, src, f"{path}/{i}")
                out_list.append(merged)
                loaded += l
                skipped += s
            else:
                out_list.append(v)
                skipped += len(jax.tree_util.tree_leaves(v))
        return out_list, loaded, skipped
    # leaf
    target_shape = tuple(np.shape(params))
    src = np.asarray(converted)
    if src.shape == target_shape:
        return jax.numpy.asarray(src).astype(np.asarray(params).dtype), 1, 0
    if "pos_embed" in path and src.ndim == 3 and src.shape[0] == 1 and src.shape[2] == target_shape[2]:
        interp = interpolate_pos_embed(src, target_shape[1])
        logger.info("Interpolated %s from %s to %s", path, src.shape, target_shape)
        return jax.numpy.asarray(interp).astype(np.asarray(params).dtype), 1, 0
    logger.info("Skipping %s: checkpoint %s vs model %s", path, src.shape, target_shape)
    return params, 0, 1


def load_torch_weights(path: str, params: Any) -> Any:
    """Ingest a reference ``.pyth`` checkpoint into the param tree (partial load)."""
    from csts_tpu.convert.from_torch import convert_csts_state_dict, load_pyth_checkpoint

    sd = load_pyth_checkpoint(path)
    num_blocks = 1 + max(
        (int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))), default=-1
    )
    num_audio = 1 + max(
        (int(m.group(1)) for k in sd if (m := re.match(r"blocks_audio\.(\d+)\.", k))), default=-1
    )
    converted = convert_csts_state_dict(sd, num_blocks, max(num_audio, 0))
    merged, loaded, skipped = _merge_partial(params, converted)
    logger.info("Loaded %d leaves from %s (%d kept initialization)", loaded, path, skipped)
    return merged


def load_train_checkpoint(cfg, state: Any) -> Tuple[Any, int, int]:
    """Auto-resume / fine-tune init dispatch (checkpoint.py:617-659).

    Returns (state, start_epoch, start_iter) — start_iter > 0 only when the
    latest checkpoint is a mid-epoch preemption save, in which case epoch
    ``start_epoch`` resumes at iteration ``start_iter`` of its (seeded,
    deterministic) batch order."""
    if cfg.TRAIN.AUTO_RESUME and has_checkpoint(cfg.OUTPUT_DIR):
        last = get_last_checkpoint(cfg.OUTPUT_DIR)
        logger.info("Auto-resuming from %s", last)
        state, epoch = load_checkpoint(last, state)
        start_iter = checkpoint_meta(last).get("iter", 0)
        return state, epoch + 1, start_iter
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        path = cfg.TRAIN.CHECKPOINT_FILE_PATH
        if path.endswith(".npz"):
            state, epoch = load_checkpoint(path, state)
            start = 0 if cfg.TRAIN.CHECKPOINT_EPOCH_RESET else epoch + 1
            return state, start, 0
        params = load_torch_weights(path, state.params)
        if cfg.TRAIN.AUDIO_CHECKPOINT_FILE_PATH:
            # dual video+audio init (checkpoint.py:357-474): the audio encoder comes
            # from a separately pretrained checkpoint
            params = _load_audio_branch(cfg.TRAIN.AUDIO_CHECKPOINT_FILE_PATH, params)
        # EMA (if on) restarts from the fine-tune init weights
        ema = (
            None if getattr(state, "ema", None) is None
            else jax.tree_util.tree_map(jax.numpy.copy, params)
        )
        state = state.__class__(params, state.opt_state, state.step, ema)
        return state, 0, 0
    return state, 0, 0


def _load_audio_branch(path: str, params: Any) -> Any:
    """Merge ``blocks.*``/``patch_embed``/pos-embeds of an audio-pretrained MViT
    checkpoint into the audio branch (checkpoint.py:357-474)."""
    from csts_tpu.convert.from_torch import convert_csts_state_dict, load_pyth_checkpoint

    sd = load_pyth_checkpoint(path)
    # remap: the audio checkpoint is a plain MViT — its blocks become blocks_audio
    remapped = {}
    for k, v in sd.items():
        if k.startswith("blocks."):
            remapped["blocks_audio." + k[len("blocks."):]] = v
        elif k.startswith("patch_embed."):
            remapped["patch_embed_audio." + k[len("patch_embed."):]] = v
        elif k.startswith("pos_embed"):
            remapped[k.replace("pos_embed", "pos_embed", 1) + "_audio"
                     if not k.endswith("_audio") else k] = v
        else:
            continue
    num_audio = 1 + max(
        (int(m.group(1)) for k in remapped if (m := re.match(r"blocks_audio\.(\d+)\.", k))),
        default=-1,
    )
    converted = convert_csts_state_dict(remapped, 0, num_audio)
    merged, loaded, skipped = _merge_partial(params, converted)
    logger.info("Audio branch: loaded %d leaves from %s", loaded, path)
    return merged


def load_test_checkpoint(cfg, params: Any) -> Any:
    """TEST path → latest in OUTPUT_DIR → TRAIN path fallback (checkpoint.py:579-614)."""
    if cfg.TEST.CHECKPOINT_FILE_PATH:
        path = cfg.TEST.CHECKPOINT_FILE_PATH
    elif has_checkpoint(cfg.OUTPUT_DIR):
        path = get_last_checkpoint(cfg.OUTPUT_DIR)
    elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
        path = cfg.TRAIN.CHECKPOINT_FILE_PATH
    else:
        logger.info("Testing with random initialization (no checkpoint found).")
        return params
    if path.endswith(".npz"):
        return load_params_npz(path, params)
    return load_torch_weights(path, params)
