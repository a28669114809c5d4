#!/usr/bin/env python3
"""Host-feed worker-count scaling curve (dev tool; CPU only, never touches the TPU).

The device consumes 219.6 eval clips/s/chip (bench.py, batch 128); the host input
pipeline must keep up. This sweeps GazeLoader's thread-pool NUM_WORKERS over
synthetic packed clips (the production npy layout, same data as bench_e2e.py) and
reports clips/s per worker count plus a cores-per-chip sizing estimate.

The loader is a GIL-sharing thread pool (data/loader.py): numpy crop/normalize
and npy mmap-reads release the GIL, so threads scale with cores until the Python
collate/bookkeeping share saturates one core. On this 1-CPU harness host the
curve saturates immediately; run on a real TPU host for the true knee — the
tool exists so that measurement is one command.

Reference analogue: slowfast hides this behind 8 torch DataLoader workers/GPU
(slowfast/datasets/loader.py:44-109) and never publishes feed-rate data.

Usage: python tools/bench_loader_scaling.py [--clips 16] [--workers 1 2 4 8]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Host-only tool: pin to CPU BEFORE any backend init (the axon sitecustomize
# overrides JAX_PLATFORMS env, so this must be a config.update like conftest).
jax.config.update("jax_platforms", "cpu")

DEVICE_RATE = 219.6  # bench.py eval clips/s/chip at batch 128 (round 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2, help="full passes per point")
    ap.add_argument("--data-dir", default=None)
    args = ap.parse_args()

    from tools.bench_e2e import RES, make_data
    from __graft_entry__ import _flagship_cfg
    from csts_tpu.data import loader as loader_lib

    root = args.data_dir or tempfile.mkdtemp(prefix="csts_loader_scaling_")
    made_tmp = args.data_dir is None
    if not os.path.exists(os.path.join(root, "splits", "test_ego4d_gaze.csv")):
        print(f"synthesizing {args.clips} packed {RES}² clips under {root} ...",
              flush=True)
        make_data(root, args.clips, RES)

    cfg = _flagship_cfg()
    cfg.DATA.PATH_PREFIX = os.path.join(root, "clips.gaze")
    cfg.DATA.PATH_TO_DATA_DIR = os.path.join(root, "splits")
    cfg.DATA.SAMPLING_RATE = 8
    cfg.DATA.TARGET_FPS = 30
    cfg.DATA.TRAIN_JITTER_SCALES = [256, 320]
    cfg.DATA.DECODING_BACKEND = "npy"
    cfg.TEST.DATASET = "ego4d_av_gaze"
    cfg.TEST.BATCH_SIZE = args.batch
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1

    curve = []
    for w in args.workers:
        cfg.DATA_LOADER.NUM_WORKERS = w
        loader = loader_lib.construct_loader(cfg, "test")
        # warmup pass (page cache + pool spinup), then timed epochs
        for _ in loader:
            pass
        n = 0
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            for batch in loader:
                n += batch["video"].shape[0]
        dt = time.perf_counter() - t0
        rate = n / dt
        curve.append({"workers": w, "clips_per_sec": round(rate, 2)})
        print(f"workers={w:3d}  {rate:8.2f} clips/s", flush=True)

    best = max(curve, key=lambda p: p["clips_per_sec"])
    per_core = best["clips_per_sec"] / os.cpu_count()
    sizing = {
        "host_cpus": os.cpu_count(),
        "best": best,
        "clips_per_sec_per_core": round(per_core, 2),
        "cores_to_feed_device": round(DEVICE_RATE / per_core, 1),
        "device_clips_per_sec": DEVICE_RATE,
    }
    print(json.dumps({"curve": curve, **sizing}), flush=True)

    if made_tmp:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
