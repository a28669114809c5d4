#!/usr/bin/env python3
"""End-to-end tester validation on real TPU hardware.

Builds a synthetic 256² npy dataset, then drives the REAL eval pipeline:
construct_loader → device prefetch → jitted eval_step (fused Pallas kernels) →
streaming adaptive-F1/AUC finalize. Random weights ⇒ expect AUC ≈ 0.5.

    python tools/validate_tpu.py
"""
import json, os, sys, tempfile, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csts_tpu.utils import compcache

compcache.enable()  # persist remote AOT compiles across tool runs (CSTS_COMPCACHE=0 to opt out)

root = tempfile.mkdtemp()
prefix = os.path.join(root, "clips.gaze")
vid = "v01"
os.makedirs(os.path.join(prefix, vid))
os.makedirs(os.path.join(root, "clips.gaze.audio_stft", vid))
os.makedirs(os.path.join(root, "gaze_frame_label"))
os.makedirs(os.path.join(root, "splits"))
rng = np.random.default_rng(0)
rels = []
for c in range(8):
    clip = f"c{c:02d}_t{c*5}_t{c*5+5}.mp4"
    rel = f"{vid}/{clip}"
    rels.append(rel)
    np.save(os.path.join(prefix, rel + ".frames.npy"),
             rng.integers(0, 255, (150, 288, 384, 3), dtype=np.uint8))
    with open(os.path.join(prefix, rel + ".meta.json"), "w") as f:
        json.dump({"fps": 30, "duration_pts": 150*512}, f)
    np.save(os.path.join(root, "clips.gaze.audio_stft", vid, clip.replace(".mp4", ".npy")),
            rng.standard_normal((256, 1000)).astype(np.float32))
with open(os.path.join(root, "gaze_frame_label", f"{vid}_frame_label.csv"), "w") as f:
    f.write("frame,x,y,type\n")
    for i in range(1250):
        f.write(f"{i},{rng.uniform(0.3,0.7):.4f},{rng.uniform(0.3,0.7):.4f},0\n")
for split in ("train_ego4d_gaze.csv", "test_ego4d_gaze.csv"):
    with open(os.path.join(root, "splits", split), "w") as f:
        f.write("\n".join(rels) + "\n")

from csts_tpu.config import load_config
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cfg = load_config(os.path.join(repo, "configs/Ego4D/CSTS_Ego4D_Gaze_Forecast.yaml"), [
    "DATA.PATH_PREFIX", prefix,
    "DATA.PATH_TO_DATA_DIR", os.path.join(root, "splits"),
    "DATA.DECODING_BACKEND", "npy",
    "TRAIN.ENABLE", "False",
    "TRAIN.MIXED_PRECISION", "True",
    "TEST.BATCH_SIZE", "8",
    "NUM_DEVICES", "1",
    "DATA_LOADER.NUM_WORKERS", "4",
    "OUTPUT_DIR", os.path.join(root, "out"),
])
from csts_tpu.eval.tester import test as run_test
t0 = time.perf_counter()
stats = run_test(cfg)
print("E2E TPU eval:", stats, f"({time.perf_counter()-t0:.1f}s total incl. compile)")
