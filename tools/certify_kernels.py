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

    python tools/certify_kernels.py [--batch 8] [--golden]

``--golden`` loads the golden-256-seeded reference weights through the real
torch converter (same path as tests/test_golden_256.py) instead of jax-init
random weights, so the heatmaps carry the init statistics the golden parity
fixture certifies and the 1-px argmax criterion is evaluated on the same
program family. The cert records ``peak_prob`` (per-frame max softmax
probability) either way, so the artifact itself says whether heatmaps were
peaked enough for argmax to bind or the cross-peak value criterion decided.
One-off host->device weight upload (~376 MB bf16) rides the slow relay h2d —
fine for a certificate (expect minutes), never do this in a benchmark loop.

Run on the TPU host to natural exit; never kill (TPU claim wedges).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csts_tpu.utils import compcache

compcache.enable()  # persist remote AOT compiles across tool runs (CSTS_COMPCACHE=0 to opt out)

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--golden", action="store_true",
                    help="use golden-256-seeded converted reference weights")
    ap.add_argument("--out", default=None,
                    help="output path (default KERNEL_CERT.json, or "
                         "KERNEL_CERT_GOLDEN.json with --golden)")
    args = ap.parse_args()
    if args.out is None:
        name = "KERNEL_CERT_GOLDEN.json" if args.golden else "KERNEL_CERT.json"
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), name)

    from __graft_entry__ import _flagship_cfg
    from csts_tpu.kernels import attention as ka
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import losses

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    spec = csts_lib.build_spec(cfg)
    if args.golden:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, os.path.join(root, "tests"))
        from reference_oracle import load_reference_csts
        from csts_tpu.convert.from_torch import convert_csts_state_dict

        fixture = np.load(os.path.join(root, "tests", "fixtures", "golden_256.npz"))
        model, _ = load_reference_csts(
            crop_size=int(fixture["crop"]), num_frames=int(fixture["frames"]),
            seed=int(fixture["model_seed"]))
        params = convert_csts_state_dict(model.state_dict())
        del model
        weights_src = f"golden-256 converted (torch seed {int(fixture['model_seed'])})"
    else:
        params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
        weights_src = "jax-init PRNGKey(0)"
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if np.asarray(a).dtype == np.float32 else jnp.asarray(a), params
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
        return logits.astype(jnp.float32), losses.frame_softmax(logits, temperature=2.0)

    def run(enabled):
        """Trace + run with the switch set; returns (logits, preds, ms/iter).
        The timing difference is the proof the two traces are different programs
        (kernels-on measured ~35% faster at round 2)."""
        import time

        ka.set_enabled(enabled)
        try:
            step = jax.jit(lambda p, v, a: eval_step(p, v, a))
            logits, preds = step(params, video, audio)
            float(jnp.sum(preds[0, 0, 0]))
            t0 = time.perf_counter()
            out = None
            for _ in range(10):
                out = step(params, video, audio)
            float(jnp.sum(out[1][0, 0, 0]))
            ms = (time.perf_counter() - t0) / 10 * 1000
        finally:
            ka.set_enabled(None)
        return np.asarray(logits, np.float32), np.asarray(preds, np.float32), ms

    logits_kernel, preds_kernel, ms_kernel = run(True)
    logits_composite, preds_composite, ms_composite = run(False)
    logits_max_abs = float(np.abs(logits_kernel - logits_composite).max())

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
    # Random-weight heatmaps are near-uniform, so the argmax LOCATION is decided
    # by 1e-6-level noise between far-apart near-equal peaks — the robust gaze
    # criterion is value-based: each program's argmax must be a near-peak of the
    # OTHER program's map (within 2e-3 probability, vs the golden-256 0.02 bound).
    b_idx = np.arange(pk.shape[0])[:, None]
    t_idx = np.arange(8)[None, :]
    peak_gap = max(
        float((pc.max(-1) - pc[b_idx, t_idx, am_k]).max()),
        float((pk.max(-1) - pk[b_idx, t_idx, am_c]).max()),
    )
    finite = bool(np.isfinite(pk).all() and np.isfinite(pc).all())
    # peakedness: uniform over 64x64 fusion cells would be ~2.4e-4; a peak_prob
    # well above that means the argmax criterion binds on its own.
    npix = pk.shape[-1]
    peak_prob = {"mean": float(pc.max(-1).mean()), "max": float(pc.max(-1).max()),
                 "uniform": 1.0 / npix}

    ok = finite and max_abs < 0.02 and (argmax_px <= 1 or peak_gap < 2e-3)
    # Peaked-enough test: argmax is only a meaningful criterion when the map
    # has a real peak. Random jax-init weights produce near-uniform heatmaps
    # (peak ~1.7x uniform) whose argmax location is decided by 1e-6-level
    # noise — annotate so a reader never mistakes a large argmax_px_delta in
    # that lane for a kernel bug (the golden lane is the argmax proof).
    argmax_binds = peak_prob["mean"] > 4.0 * peak_prob["uniform"]
    cert = {
        "ok": ok,
        "batch": args.batch,
        "weights": weights_src,
        "peak_prob": peak_prob,
        "device": str(jax.devices()[0]),
        "softmax_max_abs": max_abs,
        "logits_max_abs": logits_max_abs,
        "argmax_px_delta": argmax_px if argmax_binds else None,
        "argmax_note": (
            "argmax binds: heatmaps are peaked"
            if argmax_binds
            else "near-uniform heatmap (random-weight lane): argmax location is "
                 "noise, decided by cross_peak_gap — see KERNEL_CERT_GOLDEN.json "
                 "for the argmax proof on converted reference weights"
        ),
        "cross_peak_gap": peak_gap,
        "ms_kernel": round(ms_kernel, 2),
        "ms_composite": round(ms_composite, 2),
        "finite": finite,
        "tolerances": {"softmax_max_abs": 0.02, "argmax_px_or_cross_peak_gap": [1, 2e-3]},
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
