#!/usr/bin/env python3
"""On-TPU kernel correctness certificate (VERDICT r2 item 2).

All Pallas parity tests run in interpret mode on CPU; the real Mosaic compiles
were only smoke-validated. This tool runs ONE identical batch through the
flagship eval step twice on the real chip — kernels enabled (what bench.py
measures) vs ``set_enabled(False)`` (the composite the golden-256 fixtures
certify) — and asserts heatmap-level agreement at the golden-256 bf16
tolerances: frame-softmax max-abs < 0.02 and per-frame argmax within 1 px
(kernels/attention.py:154-158 semantics at the shipped shape).

Writes KERNEL_CERT.json at the repo root (driver-readable artifact).

    python tools/certify_kernels.py [--batch 8]

Run on the TPU host to natural exit; never kill (TPU claim wedges).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "KERNEL_CERT.json"))
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from csts_tpu.kernels import attention as ka
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import losses

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    @jax.jit
    def make_inputs(key):
        kv, kA = jax.random.split(key)
        return (
            jax.random.normal(kv, (args.batch, 8, 256, 256, 3), jnp.bfloat16),
            jax.random.normal(kA, (args.batch, 8, 256, 256, 1), jnp.bfloat16),
        )

    video, audio = make_inputs(jax.random.PRNGKey(7))

    def eval_step(params, video, audio):
        logits = csts_lib.csts_apply(params, spec, video, audio, deterministic=True)
        return losses.frame_softmax(logits, temperature=2.0)

    # Two separately-jitted programs; the kernel switch is read at trace time.
    ka.set_enabled(True)
    preds_kernel = np.asarray(jax.jit(eval_step)(params, video, audio), np.float32)
    ka.set_enabled(False)
    preds_composite = np.asarray(jax.jit(eval_step)(params, video, audio), np.float32)
    ka.set_enabled(None)

    # (B, T, h, w, 1) frame-softmax heatmaps
    pk = preds_kernel.reshape(args.batch, 8, -1)
    pc = preds_composite.reshape(args.batch, 8, -1)
    max_abs = float(np.abs(pk - pc).max())
    am_k = pk.argmax(-1)
    am_c = pc.argmax(-1)
    w = preds_kernel.shape[3]
    dy = np.abs(am_k // w - am_c // w)
    dx = np.abs(am_k % w - am_c % w)
    argmax_px = int(np.maximum(dy, dx).max())
    finite = bool(np.isfinite(pk).all() and np.isfinite(pc).all())

    ok = finite and max_abs < 0.02 and argmax_px <= 1
    cert = {
        "ok": ok,
        "batch": args.batch,
        "device": str(jax.devices()[0]),
        "softmax_max_abs": max_abs,
        "argmax_px_delta": argmax_px,
        "finite": finite,
        "tolerances": {"softmax_max_abs": 0.02, "argmax_px": 1},
        "note": "kernels-on vs set_enabled(False) composite, identical bf16 batch, "
                "flagship 256² shapes; composite is golden-256 parity-tested",
    }
    with open(args.out, "w") as f:
        json.dump(cert, f, indent=1)
    print(json.dumps(cert))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
