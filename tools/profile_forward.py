#!/usr/bin/env python3
"""Per-op device profile of the flagship forward through jax.profiler (dev tool).

Round-3 discovery: the axon relay DOES carry the TPU device profiler — traces
contain a /device:TPU:0 plane with per-HLO-op events (name, device duration,
hlo_category, bytes_accessed, full HLO long_name). That makes the real per-op
breakdown measurable HERE, replacing the bench_sections/bench_blocks triangulation
("the relay is too noisy for xprof" was wrong). The per-op table is THE ground
truth for where batch-128 forward time goes — the five conv-lowering experiments'
"the cost is NOT where the op graph suggests" can now be checked directly.

Usage:
  python tools/profile_forward.py [--batch 128] [--iters 3] [--top 40]
      [--out PROFILE.json] [--trace-dir /tmp/csts_prof]
      [--train] [--kernels on|off|default]
Run on the TPU host to natural exit; never kill (TPU claim wedges).

``--train`` traces the FULL jitted train step instead (kldiv+egonce forward +
backward + AdamW update, same construction as tools/ab_train.py / the real
trainer), at --batch (use 16, the measured train knee). The train step donates
state, so the traced iterations chain through real state updates exactly like
training. ``--kernels off`` forces the composite path (the training
configuration of record; the default leaves module defaults = fused tail on
TPU). Round-4 purpose: the train path has never had the profile-first
treatment that took eval 121->211 clips/s — this is VERDICT task 3's tool.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csts_tpu.utils import compcache

compcache.enable()  # persist remote AOT compiles across tool runs (CSTS_COMPCACHE=0 to opt out)

import jax
import jax.numpy as jnp


def collect_trace(trace_dir: str):
    """Parse the newest trace.json.gz under trace_dir; return device-op events."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no trace found under {trace_dir}"
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    evs = tr["traceEvents"]
    device_pids = {
        ev["pid"] for ev in evs
        if ev.get("ph") == "M" and ev.get("name") == "process_name"
        and ev["args"].get("name", "").startswith("/device:TPU")
    }
    return [
        ev for ev in evs
        if ev.get("ph") == "X" and ev.get("pid") in device_pids
        and "hlo_category" in ev.get("args", {})
    ]


def aggregate(events, iters: int):
    """Group per-op events by (name, category); report per-iteration numbers."""
    ops = defaultdict(lambda: {"us": 0.0, "count": 0, "bytes": 0, "ln": ""})
    for ev in events:
        a = ev["args"]
        key = (ev["name"], a["hlo_category"])
        d = ops[key]
        d["us"] += float(a["device_duration_ps"]) / 1e6
        d["count"] += 1
        d["bytes"] += int(a.get("bytes_accessed", 0))
        if not d["ln"]:
            d["ln"] = a.get("long_name", "")
    rows = []
    for (name, cat), d in ops.items():
        us = d["us"] / iters
        by = d["bytes"] / iters
        rows.append({
            "op": name, "category": cat, "us_per_iter": round(us, 1),
            "calls_per_iter": d["count"] // iters,
            "gb_per_iter": round(by / 1e9, 3),
            "gbps": round(by / 1e3 / us, 1) if us > 0 else 0.0,
            # full HLO text (producer + operand shapes/layouts) so dumped
            # profiles stay attributable offline without the raw trace
            "hlo": d["ln"][:400],
        })
    rows.sort(key=lambda r: -r["us_per_iter"])
    cats = defaultdict(float)
    for r in rows:
        cats[r["category"]] += r["us_per_iter"]
    return rows, dict(sorted(cats.items(), key=lambda kv: -kv[1]))


def diff_profiles(old_path: str, new_path: str, top: int = 40) -> None:
    """Per-category and per-op deltas between two --out dumps. Ops are matched
    by HLO op name; renamed/refused ops show as a drop plus an add, so read the
    category block first (it's rename-proof)."""
    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    if old.get("batch") != new.get("batch"):
        print(f"WARNING: batch differs ({old.get('batch')} vs {new.get('batch')})")
    to = old["total_us_per_iter"] / 1000
    tn = new["total_us_per_iter"] / 1000
    print(f"total: {to:.1f} -> {tn:.1f} ms/iter ({tn - to:+.1f})")
    print("-- by category (ms/iter) --")
    cats = sorted(set(old["categories"]) | set(new["categories"]),
                  key=lambda c: -abs(new["categories"].get(c, 0) - old["categories"].get(c, 0)))
    for c in cats:
        o = old["categories"].get(c, 0) / 1000
        n = new["categories"].get(c, 0) / 1000
        print(f"  {c:32s} {o:8.2f} -> {n:8.2f}  ({n - o:+7.2f})")
    o_ops = {r["op"]: r for r in old["ops"]}
    n_ops = {r["op"]: r for r in new["ops"]}
    movers = []
    for name in set(o_ops) | set(n_ops):
        o = o_ops.get(name, {}).get("us_per_iter", 0) / 1000
        n = n_ops.get(name, {}).get("us_per_iter", 0) / 1000
        movers.append((abs(n - o), name, o, n))
    movers.sort(reverse=True)
    print(f"-- top {top} op movers (ms/iter) --")
    for d, name, o, n in movers[:top]:
        if d < 0.005:
            break
        tag = "" if name in o_ops and name in n_ops else (
            " [gone]" if name in o_ops else " [new]")
        print(f"  {name[:52]:52s} {o:8.2f} -> {n:8.2f}  ({n - o:+7.2f}){tag}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default=None, help="write the full table as JSON")
    ap.add_argument("--trace-dir", default="/tmp/csts_prof")
    ap.add_argument("--timeline", type=float, default=None, metavar="MS",
                    help="also print ops >= MS in device order (one iteration) "
                         "with their HLO output shapes — the section-attribution "
                         "view (program order follows model order, modulo XLA's "
                         "latency-hiding interleave of the video/audio branches)")
    ap.add_argument("--diff", nargs=2, default=None, metavar=("OLD.json", "NEW.json"),
                    help="offline: compare two --out dumps (no TPU run) — "
                         "category deltas + top per-op movers")
    ap.add_argument("--train", action="store_true",
                    help="trace the full train step (fwd+bwd+AdamW) instead")
    ap.add_argument("--kernels", choices=("default", "on", "off"), default="default",
                    help="force the Pallas kernel switch for the traced program")
    ap.add_argument("--dw-vjp", choices=("default", "on", "off"), default="default",
                    help="force ops.conv.DW_CUSTOM_VJP for the traced program")
    ap.add_argument("--dw-barrier", choices=("default", "on", "off"), default="default",
                    help="force ops.conv.DW_BARRIER (layout-poisoning barrier)")
    args = ap.parse_args()

    if args.diff:
        diff_profiles(*args.diff, top=args.top)
        return

    from __graft_entry__ import _flagship_cfg
    from csts_tpu.kernels import attention as ka_mod
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import losses

    if args.kernels != "default":
        ka_mod.set_enabled(args.kernels == "on")
    if args.dw_vjp != "default":
        from csts_tpu.ops import conv as conv_mod

        conv_mod.DW_CUSTOM_VJP = args.dw_vjp == "on"
    if args.dw_barrier != "default":
        from csts_tpu.ops import conv as conv_mod

        conv_mod.DW_BARRIER = args.dw_barrier == "on"
        conv_mod.DW_BARRIER_TRAIN_AUTO = False  # make_train_step must not override

    cfg = _flagship_cfg()
    cfg.TRAIN.MIXED_PRECISION = True
    cfg.TRAIN.BATCH_SIZE = args.batch
    spec = csts_lib.build_spec(cfg)

    if args.train:
        from csts_tpu.train import step as step_lib

        state, tx = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(1))
        train_step = step_lib.make_train_step(cfg, spec, tx, steps_per_epoch=100)

        @jax.jit
        def make_batch(key):
            kv, ka_, kl = jax.random.split(key, 3)
            hm = jax.nn.softmax(
                jax.random.normal(kl, (args.batch, 8, 64 * 64), jnp.float32), axis=-1
            ).reshape(args.batch, 8, 64, 64)
            return {
                "video": jax.random.normal(kv, (args.batch, 8, 256, 256, 3), jnp.bfloat16),
                "audio": jax.random.normal(ka_, (args.batch, 8, 256, 256, 1), jnp.bfloat16),
                "labels_hm": hm,
            }

        batch = make_batch(jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(2)
        state, stats, _ = train_step(state, batch, rng)  # compile outside the trace
        float(stats["loss"])

        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.iters):
            state, stats, _ = train_step(state, batch, rng)
        float(stats["loss"])
        jax.profiler.stop_trace()
    else:
        params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
        )

        @jax.jit
        def step(params, video, audio):
            logits = csts_lib.csts_apply(params, spec, video, audio, deterministic=True)
            return losses.frame_softmax(logits, temperature=2.0)

        @jax.jit
        def make_inputs(key):
            kv, ka = jax.random.split(key)
            video = jax.random.normal(kv, (args.batch, 8, 256, 256, 3), jnp.bfloat16)
            audio = jax.random.normal(ka, (args.batch, 8, 256, 256, 1), jnp.bfloat16)
            return video, audio

        video, audio = make_inputs(jax.random.PRNGKey(0))

        def sync(x):
            return float(jnp.sum(x[0, 0, 0, 0]))

        sync(step(params, video, audio))  # compile outside the trace

        jax.profiler.start_trace(args.trace_dir)
        out = None
        for _ in range(args.iters):
            out = step(params, video, audio)
        sync(out)
        jax.profiler.stop_trace()

    events = collect_trace(args.trace_dir)
    rows, cats = aggregate(events, args.iters)
    total_us = sum(r["us_per_iter"] for r in rows)
    mode = ("train step" if args.train else "forward") + (
        "" if args.kernels == "default" else f", kernels {args.kernels}")
    print(f"device op time {total_us/1000:.1f} ms/iter over {len(rows)} distinct ops "
          f"({mode}, batch {args.batch}, {args.iters} iters)", flush=True)
    print("-- by category (ms/iter) --")
    for cat, us in cats.items():
        print(f"  {cat:32s} {us/1000:8.2f}")
    print(f"-- top {args.top} ops --")
    print(f"{'op':48s} {'category':22s} {'ms':>8s} {'calls':>6s} {'GB':>8s} {'GB/s':>7s}")
    for r in rows[: args.top]:
        print(f"{r['op'][:48]:48s} {r['category'][:22]:22s} {r['us_per_iter']/1000:8.2f} "
              f"{r['calls_per_iter']:6d} {r['gb_per_iter']:8.3f} {r['gbps']:7.1f}")
    if args.timeline is not None:
        import re

        evs = sorted(events, key=lambda e: int(e["args"]["device_offset_ps"]))
        one_iter = evs[len(evs) // args.iters * (args.iters // 2):][: len(evs) // args.iters]
        print(f"-- timeline (ops >= {args.timeline} ms, one iteration) --")
        for ev in one_iter:
            dur = float(ev["args"]["device_duration_ps"]) / 1e9
            if dur < args.timeline:
                continue
            m = re.search(r"= ([a-z0-9_]+\[[0-9,]+\])", ev["args"].get("long_name", ""))
            shape = m.group(1) if m else ""
            print(f"{ev['name'][:36]:36s} {dur:7.2f} ms  "
                  f"{ev['args']['hlo_category'][:18]:18s} {shape}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"batch": args.batch, "iters": args.iters,
                       "train": args.train, "kernels": args.kernels,
                       "total_us_per_iter": total_us, "categories": cats,
                       "ops": rows}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
