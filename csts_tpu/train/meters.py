"""Training/validation/test meters (reference: ``slowfast/utils/meters.py:200-530``).

Same observable behaviour — windowed medians for iter stats, sample-weighted epoch
aggregates, ETA, ``json_stats`` records of types "train_iter"/"train_epoch"/
"val_iter"/"val_epoch"/"test_final" — without fvcore: a small deque ScalarMeter and
perf_counter timers.
"""

from __future__ import annotations

import datetime
import time
from collections import deque
from typing import Dict, Optional

import numpy as np

from csts_tpu.eval.metrics import StreamingF1
from csts_tpu.utils.logging import log_json_stats
from csts_tpu.utils.misc import mem_fields


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self._paused = None
        self._total = 0.0

    def pause(self):
        if self._paused is None:
            self._total += time.perf_counter() - self._start
            self._paused = True

    def resume(self):
        self._start = time.perf_counter()
        self._paused = None

    def seconds(self) -> float:
        if self._paused is None:
            return self._total + (time.perf_counter() - self._start)
        return self._total


class ScalarMeter:
    """Windowed scalar tracker (meters.py equivalent of fvcore's)."""

    def __init__(self, window_size: int = 10):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def reset(self):
        self.deque.clear()
        self.total = 0.0
        self.count = 0

    def add_value(self, value: float):
        self.deque.append(value)
        self.count += 1
        self.total += value

    def get_win_median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    def get_global_avg(self) -> float:
        return self.total / max(self.count, 1)


def _eta(seconds_per_iter: float, iters_left: int) -> str:
    return str(datetime.timedelta(seconds=int(seconds_per_iter * max(iters_left, 0))))


class TrainGazeMeter:
    """(meters.py:200-339)"""

    def __init__(self, epoch_iters: int, cfg):
        self.cfg = cfg
        self.epoch_iters = epoch_iters
        self.max_iter = cfg.SOLVER.MAX_EPOCH * epoch_iters
        self.iter_timer = Timer()
        self.data_timer = Timer()
        self.net_timer = Timer()
        self.loss = ScalarMeter(cfg.LOG_PERIOD)
        self.f1 = ScalarMeter(cfg.LOG_PERIOD)
        self.recall = ScalarMeter(cfg.LOG_PERIOD)
        self.precision = ScalarMeter(cfg.LOG_PERIOD)
        self.lr = 0.0
        self.reset_epoch_stats()

    def reset_epoch_stats(self):
        self.loss_total = 0.0
        self.f1_total = 0.0
        self.recall_total = 0.0
        self.precision_total = 0.0
        self.num_samples = 0

    reset = reset_epoch_stats

    def iter_tic(self):
        self.iter_timer.reset()
        self.data_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()
        self.net_timer.pause()

    def data_toc(self):
        self.data_timer.pause()
        self.net_timer.reset()

    def update_stats(self, f1, recall, precision, threshold, loss, lr, mb_size):
        self.loss.add_value(loss)
        self.f1.add_value(f1)
        self.recall.add_value(recall)
        self.precision.add_value(precision)
        self.lr = lr
        self.loss_total += loss * mb_size
        self.f1_total += f1 * mb_size
        self.recall_total += recall * mb_size
        self.precision_total += precision * mb_size
        self.num_samples += mb_size

    def log_iter_stats(self, cur_epoch: int, cur_iter: int):
        if (cur_iter + 1) % self.cfg.LOG_PERIOD != 0:
            return
        iters_left = self.max_iter - (cur_epoch * self.epoch_iters + cur_iter + 1)
        stats = {
            "_type": "train_iter",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "iter": f"{cur_iter + 1}/{self.epoch_iters}",
            "dt": self.iter_timer.seconds(),
            "dt_data": self.data_timer.seconds(),
            "dt_net": self.net_timer.seconds(),
            "eta": _eta(self.iter_timer.seconds(), iters_left),
            "loss": self.loss.get_win_median(),
            "f1": self.f1.get_win_median(),
            "recall": self.recall.get_win_median(),
            "precision": self.precision.get_win_median(),
            "lr": self.lr,
            **mem_fields(),
        }
        log_json_stats(stats)

    def log_epoch_stats(self, cur_epoch: int):
        n = max(self.num_samples, 1)
        stats = {
            "_type": "train_epoch",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "loss": self.loss_total / n,
            "f1": self.f1_total / n,
            "recall": self.recall_total / n,
            "precision": self.precision_total / n,
            "lr": self.lr,
            **mem_fields(with_ram=True),
        }
        log_json_stats(stats)


class ValGazeMeter:
    """(meters.py:342-475) — fixation-count-weighted epoch aggregates."""

    def __init__(self, epoch_iters: int, cfg):
        self.cfg = cfg
        self.epoch_iters = epoch_iters
        self.iter_timer = Timer()
        self.data_timer = Timer()
        self.net_timer = Timer()
        self.f1 = ScalarMeter(cfg.LOG_PERIOD)
        self.recall = ScalarMeter(cfg.LOG_PERIOD)
        self.precision = ScalarMeter(cfg.LOG_PERIOD)
        self.reset()

    def reset(self):
        self.f1_total = 0.0
        self.recall_total = 0.0
        self.precision_total = 0.0
        self.num_fixations = 0

    iter_tic = TrainGazeMeter.iter_tic
    iter_toc = TrainGazeMeter.iter_toc
    data_toc = TrainGazeMeter.data_toc

    def update_stats(self, f1, recall, precision, labels, threshold,
                     fixation_idx: int = 0, weight: Optional[int] = None):
        """``weight`` (the batch's fixation-frame count) may be precomputed —
        the trainer counts it ON DEVICE from the global batch, since multi-host
        ``labels`` is a global sharded array np.asarray cannot read."""
        self.f1.add_value(f1)
        self.recall.add_value(recall)
        self.precision.add_value(precision)
        if weight is None:
            weight = int(np.sum(np.asarray(labels)[:, :, 2] == fixation_idx))
        self.f1_total += f1 * weight
        self.recall_total += recall * weight
        self.precision_total += precision * weight
        self.num_fixations += weight

    def log_iter_stats(self, cur_epoch: int, cur_iter: int):
        if (cur_iter + 1) % self.cfg.LOG_PERIOD != 0:
            return
        log_json_stats({
            "_type": "val_iter",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "iter": f"{cur_iter + 1}/{self.epoch_iters}",
            "dt": self.iter_timer.seconds(),
            "f1": self.f1.get_win_median(),
            "recall": self.recall.get_win_median(),
            "precision": self.precision.get_win_median(),
            **mem_fields(),
        })

    def log_epoch_stats(self, cur_epoch: int):
        n = max(self.num_fixations, 1)
        log_json_stats({
            "_type": "val_epoch",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "f1": self.f1_total / n,
            "recall": self.recall_total / n,
            "precision": self.precision_total / n,
            **mem_fields(with_ram=True),
        })


class TestGazeMeter:
    """Whole-test-set metrics (meters.py:23-197) via the streaming accumulator —
    the reference concatenates every prediction on host (meters.py:133-136); this
    keeps O(num_thresholds) state instead and adds AUC.

    ``num_views`` > 1 enables multi-view ensembling (NUM_ENSEMBLE_VIEWS ×
    NUM_SPATIAL_CROPS): the dataset expands each clip into ``num_views``
    consecutive indices; predictions of one clip's views are averaged before
    entering the global F1 — the ``video_preds`` ensemble semantics of the
    reference's classification TestMeter (meters.py:96-146), which its gaze meter
    allocates but never applies (meters.py:48-50 notes "=1 for gaze tasks").
    Views are grouped by ``index // num_views``, so batch/host-stripe boundaries
    and wrap-padded duplicate samples are handled; labels come from the first
    view (views share labels for spatial crops / aligned uniform sampling)."""

    def __init__(self, dataset: str, num_views: int = 1):
        self.stream = StreamingF1(dataset)
        self.num_views = max(1, int(num_views))
        self._pending: Dict[int, Dict[int, tuple]] = {}
        self._done: set = set()
        self.iter_timer = Timer()
        self.data_timer = Timer()
        self.net_timer = Timer()
        self.stats: Optional[Dict] = None

    iter_tic = TrainGazeMeter.iter_tic
    iter_toc = TrainGazeMeter.iter_toc
    data_toc = TrainGazeMeter.data_toc

    def update_stats(self, preds, labels_hm, labels, indices=None):
        if indices is None:
            self.stream.update(preds, labels_hm, labels)
            return
        if self.num_views == 1:
            # drop wrap-padded duplicates (the loader repeats leading samples
            # to keep the final batch full, loader.py; the reference's torch
            # loader emits a short batch instead — counting the repeats would
            # bias the headline whole-test-set metric toward those clips)
            fresh = np.asarray(
                [int(i) not in self._done for i in np.asarray(indices)]
            )
            self._done.update(int(i) for i in np.asarray(indices))
            if not fresh.all():
                preds = np.asarray(preds)[fresh]
                labels_hm = np.asarray(labels_hm)[fresh]
                labels = np.asarray(labels)[fresh]
            if len(np.asarray(preds)):
                self.stream.update(preds, labels_hm, labels)
            return
        preds = np.asarray(preds)
        labels_hm = np.asarray(labels_hm)
        labels = np.asarray(labels)
        indices = np.asarray(indices)
        for i in range(preds.shape[0]):
            idx = int(indices[i])
            cid, view = divmod(idx, self.num_views)
            if cid in self._done:
                continue  # wrap-padded duplicate of a finished clip
            views = self._pending.setdefault(cid, {})
            views[view] = (preds[i], labels_hm[i], labels[i])
            if len(views) == self.num_views:
                self._flush(cid)

    def _flush(self, cid: int) -> None:
        views = self._pending.pop(cid)
        order = sorted(views)
        pred = np.mean([views[v][0] for v in order], axis=0, dtype=np.float64)
        _, labels_hm, labels = views[order[0]]
        self._done.add(cid)
        self.stream.update(
            pred[None].astype(np.float32), labels_hm[None], labels[None]
        )

    def log_iter_stats(self, cur_iter: int, log_period: int = 10):
        if (cur_iter + 1) % log_period != 0:
            return
        log_json_stats({
            "_type": "test_iter",
            "cur_iter": cur_iter + 1,
            "dt": self.iter_timer.seconds(),
            **mem_fields(),
        })

    def finalize_metrics(self) -> Dict:
        # flush clips with missing views (partial final batch) un-padded
        for cid in sorted(self._pending):
            self._flush(cid)
        result = self.stream.finalize()
        self.stats = {"_type": "test_final", **result, **mem_fields(with_ram=True)}
        log_json_stats(self.stats)
        return self.stats


class EpochTimer:
    """(meters.py:478-530)"""

    def __init__(self):
        self.timer = Timer()
        self.epoch_times = []

    def reset(self):
        self.epoch_times = []

    def epoch_tic(self):
        self.timer.reset()

    def epoch_toc(self):
        self.timer.pause()
        self.epoch_times.append(self.timer.seconds())

    def last_epoch_time(self):
        return self.epoch_times[-1]

    def avg_epoch_time(self):
        return float(np.mean(self.epoch_times))

    def median_epoch_time(self):
        return float(np.median(self.epoch_times))
