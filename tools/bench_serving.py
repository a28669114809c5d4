"""Serving latency/throughput per batch bucket on one TPU chip.

For each serving bucket (the static shapes GazePredictor compiles), measures:

* **latency**: fenced round-trip per request — dispatch + device compute +
  scalar readback, i.e. what one online request waits for its heatmaps
  (includes this harness's ~25 ms relay dispatch RTT; on a direct-attached
  host subtract that floor);
* **throughput**: pipelined dispatch (bench.py protocol — inputs generated
  on-device, one fence at the end).

Together they give the micro-batching operating curve for
csts_tpu/serving_server.py: the bucket choice trades per-request latency
against clips/s; the dispatcher's max_wait_ms should stay well under the
bucket's latency to be free.

    python tools/bench_serving.py [--buckets 1 8 32 128] [--out SERVING_LAT.json]

One JSON line per bucket + a summary file. TPU-claiming: run alone, wait for
natural exit (CLAUDE.md relay rules).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 3
LAT_ITERS = 20
THR_ITERS = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 32, 128])
    ap.add_argument("--out", default="SERVING_LAT.json")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import losses
    from csts_tpu.utils import compcache

    compcache.enable()
    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    @jax.jit
    def eval_step(params, video, audio):
        logits = csts_lib.csts_apply(params, spec, video, audio, deterministic=True)
        return losses.frame_softmax(logits, temperature=2.0)

    def sync(x):
        return float(jnp.sum(x[0, 0, 0, 0]))

    rows = []
    for b in args.buckets:
        @jax.jit
        def make_inputs(key, b=b):
            kv, ka = jax.random.split(key)
            video = jax.random.normal(kv, (b, 8, 256, 256, 3), jnp.bfloat16)
            audio = jax.random.normal(ka, (b, 8, 256, 256, 1), jnp.bfloat16)
            return video, audio

        video, audio = make_inputs(jax.random.PRNGKey(0))
        for _ in range(WARMUP):
            sync(eval_step(params, video, audio))

        # latency: fence EVERY request (what an online caller waits)
        lats = []
        for _ in range(LAT_ITERS):
            t0 = time.perf_counter()
            sync(eval_step(params, video, audio))
            lats.append(time.perf_counter() - t0)
        lats_ms = sorted(1e3 * l for l in lats)
        p50 = lats_ms[len(lats_ms) // 2]
        p90 = lats_ms[min(len(lats_ms) - 1, int(len(lats_ms) * 0.9))]

        # throughput: pipelined dispatches, one fence (bench.py protocol)
        t0 = time.perf_counter()
        out = None
        for _ in range(THR_ITERS):
            out = eval_step(params, video, audio)
        sync(out)
        dt = time.perf_counter() - t0
        clips_s = b * THR_ITERS / dt

        row = {
            "bucket": b,
            "latency_p50_ms": round(p50, 2),
            "latency_p90_ms": round(p90, 2),
            "pipelined_clips_per_sec": round(clips_s, 2),
            "pipelined_ms_per_batch": round(1e3 * dt / THR_ITERS, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(
            {"device": str(jax.devices()[0]), "rows": rows,
             "note": "latency includes the harness relay dispatch RTT (~25 ms floor)"},
            f, indent=1,
        )
    print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
