#!/usr/bin/env python3
"""End-to-end eval benchmark INCLUDING the host input pipeline (dev tool).

Synthesizes packed 256² clips on disk (the production npy layout), then reports
three rates so the host-vs-device gap is explicit:

  loader_clips_per_sec   — GazeLoader alone (decode-free npy reads, crops,
                           STFT slicing, heatmaps) on this host's cores
  device_clips_per_sec   — jitted eval step on on-device random inputs
                           (what bench.py reports)
  e2e_clips_per_sec      — loader → DevicePrefetcher → h2d → eval step

Caveats on this harness: the TPU is behind a loopback relay with very low h2d
bandwidth, and the host has few cores — both loader and e2e numbers are lower
bounds that scale with a real TPU host's CPUs/PCIe. Run to natural exit.

Usage: python tools/bench_e2e.py [--clips 16] [--batch 8] [--iters 8]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csts_tpu.utils import compcache

compcache.enable()  # persist remote AOT compiles across tool runs (CSTS_COMPCACHE=0 to opt out)

import numpy as np

FRAMES = 150
FPS = 30
RES = 320  # source short-side (pack stage default); crops to 256


def make_data(root: str, n_clips: int, res: int) -> None:
    rng = np.random.default_rng(0)
    vid = "benchvid"
    os.makedirs(os.path.join(root, "clips.gaze", vid), exist_ok=True)
    os.makedirs(os.path.join(root, "clips.gaze.audio_stft", vid), exist_ok=True)
    os.makedirs(os.path.join(root, "gaze_frame_label"), exist_ok=True)
    os.makedirs(os.path.join(root, "splits"), exist_ok=True)
    rels = []
    for c in range(n_clips):
        clip = f"clip{c:03d}_t{c*5}_t{c*5+5}.mp4"
        rel = f"{vid}/{clip}"
        rels.append(rel)
        frames = rng.integers(0, 255, (FRAMES, res, res, 3), dtype=np.uint8)
        np.save(os.path.join(root, "clips.gaze", rel + ".frames.npy"), frames)
        with open(os.path.join(root, "clips.gaze", rel + ".meta.json"), "w") as f:
            json.dump({"fps": FPS, "duration_pts": FRAMES * 512}, f)
        stft = rng.standard_normal((256, 1200)).astype(np.float32)
        np.save(os.path.join(root, "clips.gaze.audio_stft", vid,
                             clip.replace(".mp4", ".npy")), stft)
    total = n_clips * 5 * FPS + 10
    with open(os.path.join(root, "gaze_frame_label", f"{vid}_frame_label.csv"), "w") as f:
        f.write("frame,x,y,type\n")
        for i in range(total):
            f.write(f"{i},{rng.uniform(.3,.7):.4f},{rng.uniform(.3,.7):.4f},{0 if i%5 else 1}\n")
    with open(os.path.join(root, "splits", "test_ego4d_gaze.csv"), "w") as f:
        f.write("\n".join(rels) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8, help="e2e/device timing batches")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--loader-only", action="store_true", help="skip the TPU parts")
    args = ap.parse_args()

    root = args.data_dir or tempfile.mkdtemp(prefix="csts_bench_e2e_")
    made_tmp = args.data_dir is None
    if not os.path.exists(os.path.join(root, "splits", "test_ego4d_gaze.csv")):
        print(f"synthesizing {args.clips} packed {RES}² clips under {root} ...", flush=True)
        make_data(root, args.clips, RES)

    from __graft_entry__ import _flagship_cfg
    from csts_tpu.data import loader as loader_lib

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    cfg.DATA.PATH_PREFIX = os.path.join(root, "clips.gaze")
    cfg.DATA.PATH_TO_DATA_DIR = os.path.join(root, "splits")
    cfg.DATA.SAMPLING_RATE = 8
    cfg.DATA.TARGET_FPS = FPS
    cfg.DATA.TRAIN_JITTER_SCALES = [256, 320]
    cfg.DATA.DECODING_BACKEND = "npy"
    cfg.TEST.DATASET = "ego4d_av_gaze"
    cfg.TEST.BATCH_SIZE = args.batch
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1  # the CSTS gaze test protocol (single view)
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.DATA_LOADER.NUM_WORKERS = args.workers

    loader = loader_lib.construct_loader(cfg, "test")

    # ---- loader only ----
    n = 0
    t0 = time.perf_counter()
    for batch in loader:
        n += batch["video"].shape[0]
    dt = time.perf_counter() - t0
    loader_rate = n / dt
    print(f"loader_clips_per_sec   {loader_rate:8.2f}  "
          f"({n} clips, {args.workers} workers, host cpus={os.cpu_count()})", flush=True)

    if args.loader_only:
        return

    import jax
    import jax.numpy as jnp

    from csts_tpu.models import csts as csts_lib
    from csts_tpu.parallel import mesh as mesh_lib
    from csts_tpu.train import losses

    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def eval_step(params, video, audio):
        logits = csts_lib.csts_apply(params, spec, video, audio, deterministic=True)
        return losses.frame_softmax(logits, temperature=2.0)

    jit_step = jax.jit(eval_step)

    # ---- device only (on-device inputs, bench.py protocol) ----
    @jax.jit
    def make_inputs(key):
        kv, ka = jax.random.split(key)
        return (
            jax.random.normal(kv, (args.batch, 8, 256, 256, 3), jnp.bfloat16),
            jax.random.normal(ka, (args.batch, 8, 256, 256, 1), jnp.bfloat16),
        )

    video, audio = make_inputs(jax.random.PRNGKey(0))
    for _ in range(2):
        float(jnp.sum(jit_step(params, video, audio)[0, 0, 0, 0]))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = jit_step(params, video, audio)
    float(jnp.sum(out[0, 0, 0, 0]))
    device_rate = args.batch * args.iters / (time.perf_counter() - t0)
    print(f"device_clips_per_sec   {device_rate:8.2f}", flush=True)

    # ---- end to end: loader -> prefetch -> h2d -> device ----
    mesh = mesh_lib.make_mesh(num_devices=1)
    with jax.sharding.set_mesh(mesh):
        done = 0
        t0 = time.perf_counter()
        out = None
        prefetch = loader_lib.DevicePrefetcher(
            iter(loader), lambda b: mesh_lib.shard_batch(mesh, b),
            depth=cfg.DATA_LOADER.PREFETCH_DEPTH,
        )
        for batch in prefetch:
            vid = batch["video"].astype(jnp.bfloat16)
            aud = batch["audio"].astype(jnp.bfloat16)
            out = jit_step(params, vid, aud)
            done += args.batch
            if done >= args.iters * args.batch:
                break
        float(jnp.sum(out[0, 0, 0, 0]))
        dt = time.perf_counter() - t0
    e2e_rate = done / dt
    print(f"e2e_clips_per_sec      {e2e_rate:8.2f}", flush=True)
    print(json.dumps({
        "loader_clips_per_sec": round(loader_rate, 2),
        "device_clips_per_sec": round(device_rate, 2),
        "e2e_clips_per_sec": round(e2e_rate, 2),
        "host_cpus": os.cpu_count(),
    }), flush=True)

    if made_tmp:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
