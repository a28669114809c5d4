"""Model stats, memory reporting, benchmark helpers.

Reference: ``slowfast/utils/misc.py:26-221`` (params/flops/memory logging, NaN
guard, eval-epoch cadence) and ``slowfast/utils/benchmark.py:20-103`` (data-loading
benchmark)."""

from __future__ import annotations

import time
from typing import Any, Dict

import numpy as np

import jax

from csts_tpu.utils.logging import get_logger, log_json_stats

logger = get_logger(__name__)


def params_count(params: Any) -> int:
    """(misc.py:37-44)"""
    return int(sum(np.prod(np.shape(p)) for p in jax.tree_util.tree_leaves(params)))


def params_bytes(params: Any) -> int:
    return int(
        sum(np.prod(np.shape(p)) * np.dtype(np.asarray(p).dtype).itemsize
            for p in jax.tree_util.tree_leaves(params))
    )


def flops_count(fn, *example_args) -> float:
    """Analytical FLOPs from XLA's cost analysis of the jitted forward — replaces
    fvcore's activation tracing (misc.py:78-124)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return float(cost.get("flops", float("nan"))) if cost else float("nan")


def log_model_info(params: Any, fn=None, example_args=()) -> Dict[str, float]:
    stats = {
        "params": params_count(params),
        "param_bytes": params_bytes(params),
    }
    if fn is not None:
        try:
            stats["gflops"] = flops_count(fn, *example_args) / 1e9
        except Exception as e:  # cost analysis is best-effort across backends
            logger.info("flops_count unavailable: %s", e)
    logger.info("Model info: %s", stats)
    return stats


def device_mem_usage() -> float:
    """Peak device (HBM) memory in use, in GB (misc.py:53-61's gpu_mem_usage).

    TPU backends report ``peak_bytes_in_use`` through ``device.memory_stats()``;
    this is the signal that explains silent XLA rematerialisation under HBM
    pressure (observed at train batch 16). Backends without allocator stats
    (the CPU test platform, and relayed TPU transports that forward
    ``memory_stats() = None``) fall back to summing live device buffers —
    bytes currently held, not a peak, but a real signal instead of 0.0.
    The field is always present so log consumers see a stable schema.
    """
    try:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats() or {}
    except Exception:
        return 0.0
    b = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) or 0
    if not b:
        # Per-device bytes via addressable shards: a replicated array holds a
        # FULL copy on every device (global nbytes / device-count would
        # undercount replicated params by the replication factor — exactly the
        # number this field exists to watch).
        try:
            b = sum(
                s.data.nbytes
                for x in jax.live_arrays()
                for s in x.addressable_shards
                if s.device == dev
            )
        except Exception:
            b = 0
    return float(b) / 1024**3


def cpu_mem_usage() -> tuple[float, float]:
    """Host RAM (used_gb, total_gb) from /proc/meminfo (misc.py:64-75, sans
    psutil — used = MemTotal - MemAvailable, the same accounting)."""
    total = avail = 0
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total = int(line.split()[1]) * 1024
                elif line.startswith("MemAvailable:"):
                    avail = int(line.split()[1]) * 1024
    except OSError:
        return 0.0, 0.0
    return (total - avail) / 1024**3, total / 1024**3


def mem_fields(with_ram: bool = False) -> Dict[str, str]:
    """The memory fields every meter record carries (meters.py:283-310 schema:
    per-iter records log device memory; epoch/final records add host RAM)."""
    fields = {"device_mem": "{:.2f}G".format(device_mem_usage())}
    if with_ram:
        fields["RAM"] = "{:.2f}/{:.2f}G".format(*cpu_mem_usage())
    return fields


def is_eval_epoch(cfg, cur_epoch: int) -> bool:
    """(misc.py:207-221)"""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0


class profile_trace:
    """Context manager around ``jax.profiler`` traces — the TPU replacement for the
    reference's fvcore timers + nvidia-smi shellouts (SURVEY §5 tracing row).

        with profile_trace("/tmp/trace"):
            train_step(...)
    View with TensorBoard's profile plugin or xprof."""

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


def benchmark_data_loading(cfg, num_batches: int = 20) -> Dict[str, float]:
    """Loader-only throughput (benchmark.py:20-103): batches/sec and clips/sec of
    the host input pipeline, no device work."""
    from csts_tpu.data import loader as loader_lib

    loader = loader_lib.construct_loader(cfg, "train")
    loader.set_epoch(0)
    it = iter(loader)
    # warmup one batch (thread pool spinup)
    next(it)
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += 1
        if n >= num_batches:
            break
    dt = time.perf_counter() - t0
    stats = {
        "batches_per_sec": n / dt,
        "clips_per_sec": n * loader.local_batch_size / dt,
        "batch_size": loader.local_batch_size,
    }
    log_json_stats({"_type": "data_benchmark", **stats})
    return stats
