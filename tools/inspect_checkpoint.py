#!/usr/bin/env python3
"""Inspect a checkpoint: leaves, shapes, sizes, metadata — without loading a model.

    python tools/inspect_checkpoint.py PATH [--cfg CFG.yaml] [--full]

Supports every checkpoint format this framework reads or writes:

* trainer ``.npz`` (flat TrainState/params leaves + JSON sidecar,
  ``csts_tpu/utils/checkpoint.py``) — prints totals, dtype breakdown, and the
  sidecar's epoch/iter. With ``--cfg`` the flat leaves are named by rebuilding
  the model's parameter TREE STRUCTURE via ``jax.eval_shape`` (no weights are
  materialized, no model compute runs): the leading leaves of a TrainState
  archive are the params in flatten order (the ``load_params_npz`` convention),
  the remainder optimizer/EMA state.
* reference ``.pyth`` (torch pickle) — prints the state-dict modules/shapes
  (requires torch, like the converters).
* an Orbax run directory (``TRAIN.CHECKPOINT_BACKEND=orbax``) — lists saved
  steps and the latest step's (epoch, iter) decomposition.

The reference has no equivalent tool (its checkpoints are opaque torch
pickles); this exists because flat-leaf npz archives are deliberately
model-code-free, so naming them back needs the spec.
"""

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _human(n_bytes: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n_bytes < 1024 or unit == "GB":
            return f"{n_bytes:.1f}{unit}"
        n_bytes /= 1024
    return f"{n_bytes:.1f}GB"


def _param_names(cfg_path):
    """Named param leaves in flatten order (the shared flat-archive convention,
    ``csts_tpu/utils/checkpoint.py:param_leaf_names``)."""
    from csts_tpu.config import load_config
    from csts_tpu.utils.checkpoint import param_leaf_names

    return param_leaf_names(load_config(cfg_path, output_dir="/tmp/inspect_ckpt_out"))


def inspect_npz(path: str, cfg_path=None, full=False):
    blob = np.load(path)
    keys = sorted(blob.files)
    sidecar = path + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        line = f"sidecar: epoch={meta.get('epoch')}"
        if "iter" in meta:
            line += f" iter={meta['iter']}"
        if "cfg" in meta:
            m = meta["cfg"].get("MODEL", {})
            line += f"  cfg: MODEL_NAME={m.get('MODEL_NAME')} LOSS_FUNC={m.get('LOSS_FUNC')}"
        print(line)

    names = None
    if cfg_path:
        names = _param_names(cfg_path)
        mismatched = [
            (n, s, blob[k].shape)
            for (n, s), k in zip(names, keys)
            if tuple(blob[k].shape) != s
        ]
        if len(keys) < len(names):
            print(
                f"WARNING: archive has {len(keys)} leaves but the cfg's model has "
                f"{len(names)} params — wrong --cfg?"
            )
            names = None
        elif mismatched:
            print(f"WARNING: {len(mismatched)} leaf shapes differ from the cfg's model, e.g.")
            for n, s, a in mismatched[:5]:
                print(f"  {n}: cfg {s} vs archive {a}")
            names = None

    total = count = 0
    by_dtype = defaultdict(int)
    by_module = defaultdict(lambda: [0, 0])  # name -> [elements, bytes]
    # Without names we cannot tell params from optimizer/EMA leaves — a
    # TrainState archive would otherwise print ~3x the model's "params".
    n_params_leaves = len(names) if names else len(keys)
    unlabeled = "[all leaves — pass --cfg to split params vs optimizer state]"
    opt_bytes = opt_leaves = 0
    for i, k in enumerate(keys):
        arr = blob[k]
        total += arr.nbytes
        count += arr.size
        by_dtype[str(arr.dtype)] += arr.nbytes
        if names and i >= n_params_leaves:
            opt_leaves += 1
            opt_bytes += arr.nbytes
        else:
            mod = names[i][0].split("/")[0] if names else unlabeled
            by_module[mod][0] += arr.size
            by_module[mod][1] += arr.nbytes
        if full:
            label = names[i][0] if names and i < n_params_leaves else k
            print(f"  {label:60s} {str(arr.shape):20s} {str(arr.dtype):10s} {_human(arr.nbytes)}")

    print(f"{len(keys)} leaves, {count / 1e6:.2f}M elements, {_human(total)} total")
    for mod, (p, b) in sorted(by_module.items(), key=lambda kv: -kv[1][1]):
        print(f"  {mod:30s} {p / 1e6:9.2f}M params  {_human(b)}")
    if opt_leaves:
        print(f"  {'[optimizer/EMA state]':30s} {opt_leaves} leaves            {_human(opt_bytes)}")
    print("dtypes: " + ", ".join(f"{d}={_human(b)}" for d, b in sorted(by_dtype.items())))


def inspect_pyth(path: str, full=False):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state", blob) if isinstance(blob, dict) else blob
    extra = [k for k in blob if k != "model_state"] if isinstance(blob, dict) else []
    if extra:
        print(f"top-level keys: {extra} (epoch={blob.get('epoch')})")
    by_module = defaultdict(lambda: [0, 0])
    total = count = 0
    for name, t in state.items():
        n = t.numel() if hasattr(t, "numel") else np.asarray(t).size
        b = n * t.element_size() if hasattr(t, "element_size") else np.asarray(t).nbytes
        total += b
        count += n
        by_module[name.split(".")[0]][0] += n
        by_module[name.split(".")[0]][1] += b
        if full:
            print(f"  {name:60s} {str(tuple(t.shape)):20s} {_human(b)}")
    print(f"{len(state)} tensors, {count / 1e6:.2f}M elements, {_human(total)} total")
    for mod, (p, b) in sorted(by_module.items(), key=lambda kv: -kv[1][1]):
        print(f"  {mod:30s} {p / 1e6:9.2f}M params  {_human(b)}")


def inspect_orbax(path: str):
    from csts_tpu.utils import orbax_ckpt

    ck = orbax_ckpt.OrbaxCheckpointer(path)
    steps = sorted(ck._mngr.all_steps())
    print(f"orbax run dir: {len(steps)} checkpoints, steps {steps}")
    if steps:
        print(f"latest step (global iteration): {ck.latest_step()}")
    ck.close()


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path")
    ap.add_argument("--cfg", default=None, help="YAML config: name npz leaves via the model spec")
    ap.add_argument("--full", action="store_true", help="print every leaf")
    args = ap.parse_args()

    if os.path.isdir(args.path):
        inspect_orbax(args.path)
    elif args.path.endswith((".pyth", ".pkl", ".pt")):
        inspect_pyth(args.path, full=args.full)
    else:
        inspect_npz(args.path, cfg_path=args.cfg, full=args.full)


if __name__ == "__main__":
    main()
