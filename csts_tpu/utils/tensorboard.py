"""TensorBoard writer (reference: ``slowfast/visualization/tensorboard_vis.py:20-429``).

Thin, dependency-gated: uses ``torch.utils.tensorboard`` when available (the torch
CPU wheel ships it), otherwise falls back to appending scalars to a JSONL file so
training never hard-depends on TensorBoard. The plotting surface (confusion
matrices, per-class top-k prediction histograms, n-dim weight/activation grids,
video input dumps) mirrors the reference's ``plot_eval`` / ``add_ndim_array`` /
``plot_weights_and_activations`` machinery on numpy arrays instead of torch
tensors."""

from __future__ import annotations

import json
import math
import os
import time
from typing import Dict, Optional

import numpy as np

from csts_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _load_json(path):
    if not path:
        return None
    with open(path) as f:
        return json.load(f)


def _normalize01(a: np.ndarray) -> np.ndarray:
    lo, hi = float(a.min()), float(a.max())
    return (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)


def _heatmap(a: np.ndarray) -> np.ndarray:
    """2-D [0,1]-normalized array -> (3, H, W) viridis image
    (tensorboard_vis.py:408-429, without the torch round-trip)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rgb = plt.get_cmap("viridis")(_normalize01(a))[..., :3]
    except ImportError:
        rgb = np.repeat(_normalize01(a)[..., None], 3, axis=-1)
    return rgb.transpose(2, 0, 1).astype(np.float32)


def _make_grid(tiles: np.ndarray, nrow: int, normalize: bool, heat_map: bool) -> np.ndarray:
    """(N, H, W) tiles -> (3, ...) grid image with 1px padding (torchvision
    make_grid equivalent for this use)."""
    n, h, w = tiles.shape
    if normalize:
        tiles = _normalize01(tiles)
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((3, nrows * (h + 1) + 1, ncol * (w + 1) + 1), np.float32)
    for i in range(n):
        r, c = divmod(i, ncol)
        img = _heatmap(tiles[i]) if heat_map else np.repeat(tiles[i][None], 3, 0)
        grid[:, r * (h + 1) + 1 : r * (h + 1) + 1 + h,
             c * (w + 1) + 1 : c * (w + 1) + 1 + w] = img
    return grid


class TensorboardWriter:
    def __init__(self, cfg):
        log_dir = cfg.TENSORBOARD.LOG_DIR or os.path.join(
            cfg.OUTPUT_DIR, "runs-csts"
        )
        self._writer = None
        self._jsonl = None
        self._cfg = cfg
        # class-name / subset metadata (tensorboard_vis.py:25-88). The reference's
        # CLASS_NAMES_PATH json may be {name: id} or [names]; subsets are id lists
        # or {parent: [children ids]}.
        names = _load_json(getattr(cfg.TENSORBOARD, "CLASS_NAMES_PATH", ""))
        num_classes = cfg.MODEL.NUM_CLASSES
        if isinstance(names, dict):
            self.class_names = [str(i) for i in range(num_classes)]
            for name, idx in names.items():
                if 0 <= int(idx) < num_classes:
                    self.class_names[int(idx)] = name
        elif names:
            # pad short lists with numeric ids so subset indexing can't IndexError
            self.class_names = list(names) + [
                str(i) for i in range(len(names), num_classes)
            ]
        else:
            self.class_names = names
        self.cm_subset = self._flatten_subset(
            _load_json(getattr(cfg.TENSORBOARD.CONFUSION_MATRIX, "SUBSET_PATH", ""))
        )
        self.hist_subset = self._flatten_subset(
            _load_json(getattr(cfg.TENSORBOARD.HISTOGRAM, "SUBSET_PATH", ""))
        )
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
            logger.info("TensorBoard events at %s", log_dir)
        except Exception as e:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            logger.info("tensorboard unavailable (%s); writing scalars.jsonl", e)

    @staticmethod
    def _flatten_subset(subset):
        """Subset JSONs are flat id lists or {parent: [child ids]}; flatten the
        dict form to the ordered union of child ids so plot_eval only sees ids."""
        if isinstance(subset, dict):
            seen, flat = set(), []
            for children in subset.values():
                for i in children:
                    if int(i) not in seen:
                        seen.add(int(i))
                        flat.append(int(i))
            return flat
        return subset

    def add_scalars(self, data_dict: Dict[str, float], global_step: Optional[int] = None):
        """(tensorboard_vis.py:90-99)"""
        if self._writer is not None:
            for key, item in data_dict.items():
                self._writer.add_scalar(key, item, global_step)
        else:
            rec = {"step": global_step, "ts": time.time(), **{k: float(v) for k, v in data_dict.items()}}
            self._jsonl.write(json.dumps(rec) + "\n")

    def plot_eval(self, preds, labels, global_step: Optional[int] = None):
        """Confusion matrices (full + optional subset) and per-class top-k
        prediction histograms (tensorboard_vis.py:101-169). ``preds``: (N, num_cls)
        scores or (N,) class ids; ``labels``: (N,) ids. No-op without a real
        SummaryWriter (figures can't go to JSONL)."""
        if self._writer is None:
            return
        from csts_tpu.eval.class_metrics import (
            confusion_matrix,
            plot_confusion_matrix,
            plot_topk_histogram,
        )

        cfg_tb = self._cfg.TENSORBOARD
        num_classes = self._cfg.MODEL.NUM_CLASSES
        if not (cfg_tb.CONFUSION_MATRIX.ENABLE or cfg_tb.HISTOGRAM.ENABLE):
            return
        cm = confusion_matrix(np.asarray(preds), np.asarray(labels), num_classes)
        names = self.class_names or [str(i) for i in range(num_classes)]
        if cfg_tb.CONFUSION_MATRIX.ENABLE:
            fig = plot_confusion_matrix(cm, class_names=names)
            if fig is not None:
                self._writer.add_figure("Confusion Matrix", fig, global_step)
            if self.cm_subset:
                ids = list(self.cm_subset)
                fig = plot_confusion_matrix(
                    cm[np.ix_(ids, ids)], class_names=[names[i] for i in ids]
                )
                if fig is not None:
                    self._writer.add_figure("Confusion Matrix Subset", fig, global_step)
        if cfg_tb.HISTOGRAM.ENABLE:
            k = cfg_tb.HISTOGRAM.TOPK
            ids = self.hist_subset or range(num_classes)
            for i in ids:
                fig = plot_topk_histogram(names[i], cm[i], k, names)
                if fig is not None:
                    self._writer.add_figure(
                        f"Top {k} predictions by classes/{names[i]}", fig, global_step
                    )

    def add_video(self, vid, tag: str = "Video Input", global_step=None, fps: int = 4):
        """(tensorboard_vis.py:171-182) ``vid``: (B, T, H, W, C) uint8 [0,255] or
        float [0,1], channels-last (the framework layout; transposed here)."""
        if self._writer is None:
            return
        import torch

        v = torch.from_numpy(np.asarray(vid)).permute(0, 1, 4, 2, 3)
        self._writer.add_video(tag, v, global_step=global_step, fps=fps)

    def plot_weights_and_activations(
        self, arrays: Dict[str, np.ndarray], tag: str = "",
        normalize: bool = False, global_step=None, batch_idx: Optional[int] = None,
        indexing_dict: Optional[dict] = None, heat_map: bool = True,
    ):
        """Render weight/activation tensors as 2-D grids
        (tensorboard_vis.py:183-226). Pairs with
        ``csts_tpu.models.csts.extract_activations`` / ``get_weights``."""
        if self._writer is None:
            return
        for name, array in arrays.items():
            array = np.asarray(array)
            if indexing_dict is not None and name in indexing_dict:
                array = array[indexing_dict[name]]
            elif batch_idx is not None and array.ndim > 2:
                array = array[batch_idx]
            self.add_ndim_array(array, tag + name, normalize=normalize,
                                global_step=global_step, heat_map=heat_map)

    def add_ndim_array(self, array, name: str, nrow: Optional[int] = None,
                       normalize: bool = False, global_step=None, heat_map: bool = True):
        """n-dim tensor -> grid of 2-D heatmap tiles (tensorboard_vis.py:332-405)."""
        if self._writer is None or array is None or array.ndim == 0:
            return
        array = np.asarray(array, np.float32)
        if array.ndim == 1:
            if nrow is None:
                nrow = int(math.sqrt(array.shape[0])) or 1
            array = array[: (array.shape[0] // nrow) * nrow].reshape(-1, nrow)
        if array.ndim == 2:
            img = _heatmap(array) if heat_map else array[None]
            self._writer.add_image(name, img, global_step=global_step, dataformats="CHW")
            return
        tiles = array.reshape(-1, *array.shape[-2:])
        if nrow is None:
            nrow = max(int(math.sqrt(tiles.shape[0])), 1)
        grid = _make_grid(tiles, nrow, normalize=normalize, heat_map=heat_map)
        self._writer.add_image(name, grid, global_step=global_step, dataformats="CHW")

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
        elif self._jsonl is not None:
            self._jsonl.flush()

    def close(self):
        self.flush()
        if self._writer is not None:
            self._writer.close()
        elif self._jsonl is not None:
            self._jsonl.close()
