"""Logging: master-process-only stdout + file, structured JSON stat lines.

Reference: ``slowfast/utils/logging.py:19-96``. ``json_stats:`` lines are the
machine-readable training record ("train_iter", "val_epoch", "test_final" types).
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import Any, Dict


def _is_master() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def setup_logging(output_dir: str | None = None) -> None:
    if not _is_master():
        logging.getLogger().addHandler(logging.NullHandler())
        return
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    fmt = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(name)s: %(lineno)4d: %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    for h in list(root.handlers):
        root.removeHandler(h)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
        fh.setFormatter(fmt)
        root.addHandler(fh)


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)


def log_json_stats(stats: Dict[str, Any]) -> None:
    """``json_stats: {...}`` record (logging.py:87-96), 5-decimal floats."""
    rounded = {
        k: (round(v, 5) if isinstance(v, float) else v) for k, v in stats.items()
    }
    logger = get_logger(__name__)
    logger.info("json_stats: {:s}".format(json.dumps(rounded, sort_keys=True)))
