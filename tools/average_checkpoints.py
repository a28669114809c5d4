#!/usr/bin/env python3
"""Average N checkpoints into one (checkpoint soup / offline SWA).

    python tools/average_checkpoints.py ckpt_a.npz ckpt_b.npz ... --output soup.npz
    python tools/average_checkpoints.py OUTPUT_DIR/checkpoints/*.npz --last 3 --output soup.npz

Complements the in-training EMA (`SOLVER.EMA_DECAY`): this averages *saved*
epoch checkpoints after the fact — the classic tail-averaging eval trick.
Only the model params are averaged: a trainer checkpoint is a flat TrainState
archive whose leading leaves are the params in flatten order (the
`load_params_npz` convention, `csts_tpu/utils/checkpoint.py`); optimizer
state/EMA leaves are taken from the LAST input checkpoint unchanged, so the
output stays loadable both as a TrainState (resume) and through
`load_params_npz`/`GazePredictor` (eval/serving). Averaging runs in fp64 and
casts back to each leaf's stored dtype. The epoch sidecar is copied from the
last input. Inputs must agree in leaf count and shapes (same model+optimizer
configuration).

The reference has no equivalent (one more eval-quality tool it lacks).
"""

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def average(paths, output, n_params: int | None = None):
    blobs = [np.load(p) for p in paths]
    keys = sorted(blobs[0].files)
    for p, b in zip(paths[1:], blobs[1:]):
        assert sorted(b.files) == keys, f"{p}: leaf set differs from {paths[0]}"

    # Without a param count we average every leaf of a params-only archive; for
    # a TrainState archive the caller passes the model's param-leaf count so
    # optimizer moments/step counters are NOT averaged.
    n_params = len(keys) if n_params is None else n_params
    out = {}
    for i, k in enumerate(keys):
        ref = blobs[-1][k]
        if i < n_params:
            acc = np.zeros(ref.shape, np.float64)
            for b in blobs:
                arr = b[k]
                assert arr.shape == ref.shape, (k, arr.shape, ref.shape)
                acc += np.asarray(arr, np.float64)
            out[k] = (acc / len(blobs)).astype(ref.dtype)
        else:
            out[k] = ref  # optimizer/EMA state: last checkpoint's, unaveraged
    np.savez(output, **out)

    sidecar = paths[-1] + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        meta["averaged_from"] = [os.path.basename(p) for p in paths]
        with open(output + ".json", "w") as f:
            json.dump(meta, f)
    return len(keys), n_params


def _param_leaf_count(cfg_path: str) -> int:
    from csts_tpu.config import load_config
    from csts_tpu.utils.checkpoint import param_leaf_names

    return len(param_leaf_names(load_config(cfg_path, output_dir="/tmp/avg_ckpt_out")))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("inputs", nargs="+",
                    help=".npz checkpoints, oldest first (the last donates opt state)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--last", type=int, default=0,
                    help="use only the last N inputs as given")
    ap.add_argument("--cfg", default=None,
                    help="YAML config: average only the model's param leaves of a "
                         "TrainState archive (leaf count via jax.eval_shape)")
    args = ap.parse_args()

    # Inputs are used IN THE ORDER GIVEN (the last one donates opt state + the
    # sidecar). A shell glob of this framework's checkpoint names already
    # expands in recency order (the zero-padded naming, checkpoint.py:31-38);
    # re-sorting here would silently reorder explicitly listed or
    # differently-named inputs.
    paths = [p for p in args.inputs if re.search(r"\.npz$", p)]
    if args.last:
        paths = paths[-args.last:]
    assert len(paths) >= 2, f"need >= 2 checkpoints, got {paths}"
    n_params = _param_leaf_count(args.cfg) if args.cfg else None
    total, averaged = average(paths, args.output, n_params)
    print(f"averaged {averaged}/{total} leaves of {len(paths)} checkpoints -> {args.output}")


if __name__ == "__main__":
    main()
