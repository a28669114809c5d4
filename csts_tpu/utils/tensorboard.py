"""TensorBoard writer (reference: ``slowfast/visualization/tensorboard_vis.py:20-429``).

Thin, dependency-gated: uses ``torch.utils.tensorboard`` when available (the torch
CPU wheel ships it), otherwise falls back to appending scalars to a JSONL file so
training never hard-depends on TensorBoard."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

from csts_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class TensorboardWriter:
    def __init__(self, cfg):
        log_dir = cfg.TENSORBOARD.LOG_DIR or os.path.join(
            cfg.OUTPUT_DIR, "runs-csts"
        )
        self._writer = None
        self._jsonl = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
            logger.info("TensorBoard events at %s", log_dir)
        except Exception as e:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            logger.info("tensorboard unavailable (%s); writing scalars.jsonl", e)

    def add_scalars(self, data_dict: Dict[str, float], global_step: Optional[int] = None):
        """(tensorboard_vis.py:90-99)"""
        if self._writer is not None:
            for key, item in data_dict.items():
                self._writer.add_scalar(key, item, global_step)
        else:
            rec = {"step": global_step, "ts": time.time(), **{k: float(v) for k, v in data_dict.items()}}
            self._jsonl.write(json.dumps(rec) + "\n")

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
