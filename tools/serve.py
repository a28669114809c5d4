"""Serve gaze inference over HTTP with continuous micro-batching.

Two ways to load the model:

    # live params (npz framework checkpoint or reference .pyth, converted on load)
    python tools/serve.py --cfg configs/Ego4D/CSTS_Ego4D_Gaze_Forecast.yaml \
        --checkpoint weights.npz --port 8000 --buckets 1 8 32

    # AOT artifact from GazePredictor.export_compiled (no model code, no torch)
    python tools/serve.py --exported /path/to/artifact --port 8000

Protocol (csts_tpu/serving_server.py): POST /predict with an .npz body
{video (T,crop,crop,3) float32 normalized, audio (T,F,S,1) float32} returns an
.npz {heatmaps (T,h,w), gaze_xy (T,2)}; GET /healthz; GET /stats.
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cfg", help="YAML config (live-params mode)")
    parser.add_argument("--checkpoint", help=".npz or .pyth weights (live-params mode)")
    parser.add_argument("--exported", help="export_compiled artifact dir (AOT mode)")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--buckets", type=int, nargs="+", default=[1, 8],
                        help="static batch buckets to compile (live-params mode)")
    parser.add_argument("--use-ema", action="store_true",
                        help="serve the EMA weights of an SOLVER.EMA_DECAY run")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="micro-batching window")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="KEY VALUE config overrides (live-params mode)")
    args = parser.parse_args()

    from csts_tpu.serving import GazePredictor
    from csts_tpu.serving_server import GazeHTTPServer

    if args.exported:
        predictor = GazePredictor.from_exported(args.exported)
    else:
        assert args.cfg, "--cfg required unless --exported is given"
        from csts_tpu.config import load_config

        cfg = load_config(args.cfg, args.opts)
        predictor = GazePredictor.from_checkpoint(
            cfg, args.checkpoint, batch_sizes=tuple(args.buckets),
            use_ema=args.use_ema,
        )

    server = GazeHTTPServer(
        predictor, host=args.host, port=args.port, max_wait_ms=args.max_wait_ms
    ).start()
    print(f"serving on http://{args.host}:{server.port}  "
          f"(buckets={sorted(predictor.batch_sizes)}, "
          f"max_wait_ms={args.max_wait_ms})", flush=True)
    try:
        while True:
            time.sleep(60)
            print(f"stats: {server.batcher.stats()}", flush=True)
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
