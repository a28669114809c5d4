"""TensorBoard writer + plotting machinery (reference tensorboard_vis.py:20-429)."""

import glob
import json
import os

import numpy as np
import pytest

from csts_tpu.config import get_cfg
from csts_tpu.eval.class_metrics import (
    confusion_matrix,
    plot_confusion_matrix,
    plot_topk_histogram,
)
from csts_tpu.utils.tensorboard import TensorboardWriter, _heatmap, _make_grid


@pytest.fixture
def cfg(tmp_path):
    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.LOG_DIR = str(tmp_path / "tb")
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE = True
    cfg.TENSORBOARD.HISTOGRAM.ENABLE = True
    cfg.TENSORBOARD.HISTOGRAM.TOPK = 3
    names = {f"cls{i}": i for i in range(5)}
    p = tmp_path / "names.json"
    p.write_text(json.dumps(names))
    cfg.TENSORBOARD.CLASS_NAMES_PATH = str(p)
    return cfg


def test_plot_eval_and_images(cfg, rng):
    w = TensorboardWriter(cfg)
    assert w.class_names == [f"cls{i}" for i in range(5)]
    preds = rng.standard_normal((40, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 40)
    w.plot_eval(preds, labels, global_step=1)

    # video dump: (B, T, H, W, C) channels-last in [0, 1]
    vid = rng.random((1, 3, 8, 8, 3)).astype(np.float32)
    w.add_video(vid, global_step=1)

    # weight/activation grids at every ndim
    w.plot_weights_and_activations(
        {
            "w1d": rng.standard_normal(16).astype(np.float32),
            "w2d": rng.standard_normal((6, 6)).astype(np.float32),
            "act4d": rng.standard_normal((2, 3, 4, 4)).astype(np.float32),
        },
        tag="layers/",
        global_step=1,
    )
    w.close()
    if w._writer is not None:
        events = glob.glob(os.path.join(cfg.TENSORBOARD.LOG_DIR, "events*"))
        assert events and os.path.getsize(events[0]) > 1000


def test_confusion_and_hist_figures(rng, tmp_path):
    preds = rng.integers(0, 4, 50)
    labels = rng.integers(0, 4, 50)
    cm = confusion_matrix(preds, labels, 4)
    assert cm.sum() == 50
    fig = plot_confusion_matrix(cm, class_names=list("abcd"),
                                path=str(tmp_path / "cm.png"))
    assert fig is None or (tmp_path / "cm.png").exists()
    fig = plot_topk_histogram("a", cm[0], k=3, class_names=list("abcd"),
                              path=str(tmp_path / "hist.png"))
    assert fig is None or (tmp_path / "hist.png").exists()


def test_heatmap_and_grid_shapes(rng):
    hm = _heatmap(rng.random((4, 6)).astype(np.float32))
    assert hm.shape == (3, 4, 6)
    grid = _make_grid(rng.random((5, 4, 4)).astype(np.float32), nrow=2,
                      normalize=True, heat_map=True)
    assert grid.shape[0] == 3 and grid.shape[1] > 4 and grid.shape[2] > 4


def test_jsonl_fallback_scalars(cfg, monkeypatch):
    import builtins

    real_import = builtins.__import__

    def block_tb(name, *a, **k):
        if "tensorboard" in name:
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block_tb)
    w = TensorboardWriter(cfg)
    assert w._writer is None
    w.add_scalars({"loss": 1.5}, global_step=3)
    w.plot_eval(np.zeros((4, 5)), np.zeros(4, np.int64))  # silently no-op
    w.close()
    rec = json.loads(
        open(os.path.join(cfg.TENSORBOARD.LOG_DIR, "scalars.jsonl")).readline()
    )
    assert rec["loss"] == 1.5 and rec["step"] == 3


def test_plot_logs_cli(tmp_path):
    """tools/plot_logs.py: json_stats lines -> per-type CSVs with a global step
    column, PNG curves, and the final-metrics echo (exit 0)."""
    import csv
    import importlib.util
    import json
    import subprocess
    import sys

    log = tmp_path / "stdout.log"
    lines = []
    for e in range(1, 3):
        for i in range(1, 3):
            lines.append("[x] INFO: json_stats: " + json.dumps({
                "_type": "train_iter", "epoch": f"{e}/2", "iter": f"{i}/2",
                "loss": 1.0 / (2 * (e - 1) + i), "lr": 1e-4, "device_mem": "0.00G",
            }))
        lines.append("[x] INFO: json_stats: " + json.dumps({
            "_type": "train_epoch", "epoch": f"{e}/2", "f1": 0.1 * e, "loss": 0.5,
        }))
    lines.append("not a stats line")
    lines.append("[x] INFO: json_stats: " + json.dumps({
        "_type": "test_final", "f1": 0.42, "auc": 0.5, "RAM": "1/2G",
    }))
    log.write_text("\n".join(lines) + "\n")

    tool = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tools", "plot_logs.py")
    out = tmp_path / "analysis"
    r = subprocess.run([sys.executable, tool, str(log), "--out", str(out)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "test_final" in r.stdout and "0.42" in r.stdout

    with open(out / "train_iter.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0][:2] == ["step", "_type"]
    assert [row[0] for row in rows[1:]] == ["0", "1", "2", "3"]  # global steps
    assert (out / "train_epoch.csv").exists() and (out / "test_final.csv").exists()
    assert (out / "loss_lr.png").exists() and (out / "metrics.png").exists()
