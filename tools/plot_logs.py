#!/usr/bin/env python3
"""Parse json_stats records out of a run log into CSVs (+ PNG curves if
matplotlib is present).

    python tools/plot_logs.py OUTPUT_DIR/stdout.log --out analysis/

The trainer/tester emit one machine-readable ``json_stats: {...}`` line per
logged iteration/epoch (``csts_tpu/utils/logging.py``, the reference's
logging.py:87-96 contract). TensorBoard covers live monitoring; this tool is
the post-hoc path for headless pods — it needs nothing but the stdout.log.

Outputs one ``<record_type>.csv`` per ``_type`` (train_iter, train_epoch,
val_iter, val_epoch, test_iter, test_final), columns = the union of that
type's keys in record order, plus a global step column for iter records
(parsed from the "e/E" + "i/I" fraction fields). With matplotlib:
``loss_lr.png`` (train loss + LR vs step) and ``metrics.png``
(epoch/val F1 curves).
"""

import argparse
import csv
import json
import os
import re
import sys

_LINE = re.compile(r"json_stats: (\{.*\})\s*$")
_FRAC = re.compile(r"^(\d+)/(\d+)$")


def parse_records(path: str):
    """All json_stats records in the file, grouped by ``_type`` (file order)."""
    groups = {}
    with open(path, errors="replace") as f:
        for line in f:
            m = _LINE.search(line)
            if not m:
                continue
            try:
                rec = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            groups.setdefault(rec.get("_type", "untyped"), []).append(rec)
    return groups


def add_global_step(records):
    """epoch "e/E" + iter "i/I" -> 0-based global step. If ANY record lacks the
    fraction fields, fall back to sequential numbering for ALL of them — mixing
    computed and positional steps would interleave small and large x values."""
    steps = []
    for rec in records:
        me = _FRAC.match(str(rec.get("epoch", "")))
        mi = _FRAC.match(str(rec.get("iter", "")))
        if not (me and mi):
            return list(range(len(records)))
        steps.append((int(me.group(1)) - 1) * int(mi.group(2)) + int(mi.group(1)) - 1)
    return steps


def write_csvs(groups, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for rtype, records in groups.items():
        cols = []
        for rec in records:
            cols.extend(k for k in rec if k not in cols)
        path = os.path.join(out_dir, f"{rtype}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            header = ["step"] + cols if rtype.endswith("_iter") else cols
            w.writerow(header)
            steps = add_global_step(records) if rtype.endswith("_iter") else None
            for i, rec in enumerate(records):
                row = [rec.get(c, "") for c in cols]
                w.writerow(([steps[i]] + row) if steps is not None else row)
        paths.append(path)
    return paths


def plot(groups, out_dir: str):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available — CSVs only", file=sys.stderr)
        return []
    made = []
    ti = groups.get("train_iter", [])
    if ti:
        steps = add_global_step(ti)
        fig, ax1 = plt.subplots(figsize=(8, 4))
        ax1.plot(steps, [r.get("loss") for r in ti], label="loss")
        ax1.set_xlabel("step"), ax1.set_ylabel("loss")
        ax2 = ax1.twinx()
        ax2.plot(steps, [r.get("lr") for r in ti], color="tab:orange", label="lr")
        ax2.set_ylabel("lr")
        fig.tight_layout()
        p = os.path.join(out_dir, "loss_lr.png")
        fig.savefig(p), plt.close(fig)
        made.append(p)
    epochs = {t: groups[t] for t in ("train_epoch", "val_epoch") if t in groups}
    if epochs:
        fig, ax = plt.subplots(figsize=(8, 4))
        for t, recs in epochs.items():
            xs = list(range(1, len(recs) + 1))
            ax.plot(xs, [r.get("f1") for r in recs], marker="o", label=f"{t} f1")
        ax.set_xlabel("epoch"), ax.set_ylabel("f1"), ax.legend()
        fig.tight_layout()
        p = os.path.join(out_dir, "metrics.png")
        fig.savefig(p), plt.close(fig)
        made.append(p)
    return made


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("log", help="stdout.log (or any file with json_stats lines)")
    ap.add_argument("--out", default="log_analysis")
    args = ap.parse_args()
    groups = parse_records(args.log)
    if not groups:
        print(f"no json_stats records found in {args.log}", file=sys.stderr)
        return 1
    for p in write_csvs(groups, args.out) + plot(groups, args.out):
        print(p)
    final = groups.get("test_final")
    if final:
        print("test_final:", json.dumps(final[-1]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
