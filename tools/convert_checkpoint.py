#!/usr/bin/env python3
"""Offline checkpoint conversion: reference ``.pyth`` → csts_tpu ``.npz`` params.

    python tools/convert_checkpoint.py --cfg configs/Ego4D/CSTS_Ego4D_Gaze_Forecast.yaml \
        --input csts_ego4d_forecast.pyth --output weights.npz \
        [--audio-checkpoint audio_mvit.pyth]

Applies the same shape-filtered partial load + positional-embedding interpolation as
the in-process loader (csts_tpu/utils/checkpoint.py), then writes the pure-numpy
params archive loadable with ``cu.load_params_npz`` / ``GazePredictor``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--input", required=True, help=".pyth checkpoint")
    ap.add_argument("--output", required=True, help=".npz output path")
    ap.add_argument("--audio-checkpoint", default=None,
                    help="separate audio-branch MViT .pyth to merge")
    args = ap.parse_args()

    import numpy as np
    import jax

    # Pure weight shuffling — never claim the TPU (the axon sitecustomize
    # overrides JAX_PLATFORMS from the environment, so set it in-process).
    jax.config.update("jax_platforms", "cpu")

    from csts_tpu.config import load_config
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.utils import checkpoint as cu

    cfg = load_config(args.cfg)
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(cfg.RNG_SEED), spec)
    params = cu.load_torch_weights(args.input, params)
    if args.audio_checkpoint:
        params = cu._load_audio_branch(args.audio_checkpoint, params)

    leaves, _ = jax.tree_util.tree_flatten(params)
    arrays = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(args.output, **arrays)
    import json

    with open(args.output + ".json", "w") as f:
        json.dump({"epoch": -1, "num_leaves": len(leaves), "cfg": cfg.dump()}, f)
    print(f"wrote {args.output} ({len(leaves)} leaves)")


if __name__ == "__main__":
    main()
