"""Benchmark: flagship CSTS-B 16x4 eval throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the device-side eval path (forward + per-frame softmax) at batch 8 on
256² video + 256² audio STFT inputs — the BASELINE.json headline
"AV clips/sec/chip (5s, MViT-B 16x4) at batch 8". bf16 activations, fp32 params
(the production eval configuration; fp32 parity mode is exercised by tests/).

``vs_baseline`` compares against the first recorded run on this hardware
(bench_baseline.json, committed after round 1) so cross-round progress is visible.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 8
WARMUP = 3
ITERS = 20
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def main():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_cfg
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import losses

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True  # bf16 activations
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)

    # one-time bf16 weight cast (the production eval configuration)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def eval_step(params, video, audio):
        logits = csts_lib.csts_apply(params, spec, video, audio, deterministic=True)
        return losses.frame_softmax(logits, temperature=2.0)

    # ITERS steps inside ONE dispatch via lax.scan: measures pure device throughput,
    # independent of the harness tunnel's per-call latency. Inputs are generated ON
    # DEVICE (host→device through the tunnel is slow and not what we measure); each
    # scan step re-derives its batch from a folded key so XLA cannot hoist the work.
    from functools import partial

    @partial(jax.jit, static_argnames="n_iters")
    def run_n(params, key, n_iters):
        kv, ka = jax.random.split(key)
        base_video = jax.random.normal(kv, (BATCH, 8, 256, 256, 3), jnp.bfloat16)
        base_audio = jax.random.normal(ka, (BATCH, 8, 256, 256, 1), jnp.bfloat16)

        def body(carry, i):
            # cheap per-step perturbation so iterations can't be CSE'd; full RNG per
            # step would dominate the measurement (threefry over 50M elements)
            eps = (i.astype(jnp.bfloat16) + 1) * jnp.bfloat16(1e-3)
            out = eval_step(params, base_video + eps, base_audio + eps)
            return carry + jnp.sum(out[0, 0, 0, 0]).astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(n_iters))
        return total

    def sync(x):
        # scalar readback — the only reliable completion fence on this transport
        return float(x)

    for _ in range(WARMUP):
        sync(run_n(params, jax.random.PRNGKey(0), 2))

    t0 = time.perf_counter()
    sync(run_n(params, jax.random.PRNGKey(1), ITERS))
    dt = time.perf_counter() - t0

    clips_per_sec = BATCH * ITERS / dt

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("clips_per_sec")
    if baseline is None:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {"clips_per_sec": clips_per_sec, "device": str(jax.devices()[0]),
                 "note": "first recorded run (round 1); later rounds compare here"},
                f, indent=1,
            )
        baseline = clips_per_sec

    print(json.dumps({
        "metric": "eval_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
