#!/usr/bin/env python3
"""Offline checkpoint export: csts_tpu ``.npz`` params → reference ``.pyth``.

    python tools/export_checkpoint.py --cfg configs/Ego4D/CSTS_Ego4D_Gaze_Forecast.yaml \
        --input checkpoints/checkpoint_epoch_00015.npz --output csts_exported.pyth

The inverse of ``tools/convert_checkpoint.py``: reads an npz params archive
written by this framework's trainer (``csts_tpu/utils/checkpoint.py``) and emits
a ``{"epoch", "model_state"}`` blob in the reference's module naming and weight
layout, loadable by ``/root/reference``'s ``slowfast/utils/checkpoint.py`` for
eval or fine-tuning. Round-trip parity is certified by
``tests/test_checkpoint.py::test_export_roundtrip_forward_parity``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--input", required=True, help=".npz params archive")
    ap.add_argument("--output", required=True, help=".pyth output path")
    ap.add_argument("--epoch", type=int, default=None,
                    help="epoch to record (default: the archive's metadata)")
    args = ap.parse_args()

    import json

    import jax

    # Pure weight shuffling — never claim the TPU (the axon sitecustomize
    # overrides JAX_PLATFORMS from the environment, so set it in-process).
    jax.config.update("jax_platforms", "cpu")

    from csts_tpu.config import load_config
    from csts_tpu.convert.to_torch import save_pyth_checkpoint
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.utils import checkpoint as cu

    cfg = load_config(args.cfg)
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(cfg.RNG_SEED), spec)
    params = cu.load_params_npz(args.input, params)

    epoch = args.epoch
    if epoch is None:
        meta_path = args.input + ".json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                epoch = json.load(f).get("epoch", 0)
        else:
            epoch = 0

    import numpy as np

    params_np = jax.tree_util.tree_map(np.asarray, params)
    save_pyth_checkpoint(args.output, params_np, epoch=int(epoch))
    print(f"wrote {args.output} (epoch {epoch})")


if __name__ == "__main__":
    main()
