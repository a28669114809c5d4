#!/usr/bin/env python3
"""Export a trained checkpoint as an AOT serving artifact (jax.export/StableHLO).

    python tools/export_serving.py --cfg configs/Ego4D/CSTS_Ego4D_Gaze_Forecast.yaml \
        --checkpoint weights.npz --out /srv/csts_artifact \
        [--batch-sizes 1 8] [--platforms tpu cpu] [KEY VALUE ...]

The artifact directory is self-contained: per-bucket StableHLO programs,
positional-leaf params.npz, and a meta.json with shapes + preprocessing
constants. Serving hosts reload it with ``GazePredictor.from_exported`` —
no model Python, no config, no torch (csts_tpu/serving.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--checkpoint", default=None, help=".npz or .pyth (optional)")
    ap.add_argument("--out", required=True, help="artifact directory to write")
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    ap.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    args = ap.parse_args()

    from csts_tpu.config import load_config
    from csts_tpu.serving import GazePredictor

    cfg = load_config(args.cfg, args.opts)
    predictor = GazePredictor.from_checkpoint(
        cfg, args.checkpoint, batch_sizes=tuple(args.batch_sizes)
    )
    predictor.export_compiled(args.out, platforms=tuple(args.platforms))
    print(f"wrote {sorted(os.listdir(args.out))} to {args.out}")


if __name__ == "__main__":
    main()
