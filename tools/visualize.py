"""Dump prediction/label heatmap overlays (and fusion-attention maps) for test clips.

    python tools/visualize.py --cfg configs/Ego4D/CSTS_Ego4D_Gaze_Forecast.yaml \
        TEST.CHECKPOINT_FILE_PATH weights.npz -- --num-clips 8 --attention

The reference wires these plots but leaves them commented out
(``tools/test_avgaze_net.py:73-82``); here they are a real CLI. Output goes to
``OUTPUT_DIR/visualization/clipNNNN/`` — per-frame side-by-side pred/label
overlays, plus per-head spatial/temporal fusion attention with ``--attention``.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--num-clips", type=int, default=4)
    parser.add_argument("--attention", action="store_true",
                        help="also dump spatial/temporal fusion attention maps")
    parser.add_argument("--out", default=None, help="override output directory")
    parser.add_argument("opts", nargs=argparse.REMAINDER, help="KEY VALUE overrides")
    args = parser.parse_args()

    from csts_tpu.config import load_config
    from csts_tpu.eval.visualize import run_visualization

    cfg = load_config(args.cfg, args.opts)
    out = run_visualization(
        cfg, num_clips=args.num_clips, attention=args.attention, out_dir=args.out
    )
    print(f"overlays written to {out}")


if __name__ == "__main__":
    main()
