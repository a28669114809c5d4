"""Persistent XLA compilation cache for the on-chip tools.

The TPU relay compiles remotely (AOT over HTTP): a full-flagship jit costs
minutes per process, and the measurement tools (bench, certify, profile,
ab_*) each pay it again for byte-identical programs. JAX's persistent
compilation cache keys on (HLO, flags, platform) and reuses the serialized
executable across processes, so enabling it turns every repeat compile into
a disk read.

Failure-tolerant by design: if the PJRT plugin doesn't support executable
serialization (possible for the axon relay — unverifiable while it's down),
JAX logs a warning per compile and proceeds uncached; nothing observable
changes in results or steady-state timings (the tools all measure post-warmup
dispatch loops, never compile time).

Opt out with CSTS_COMPCACHE=0. Default cache dir: ~/.cache/csts_tpu_xla.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None, min_compile_secs: float = 5.0) -> bool:
    """Enable the JAX persistent compilation cache. Returns True if configured.

    Call before the first jit compile (safe after backend init). Never raises.
    ``min_compile_secs``: persistence threshold — the CPU test suite lowers it
    (many distinct small programs) while on-chip tools keep the 5 s default.
    """
    if os.environ.get("CSTS_COMPCACHE", "1") == "0":
        return False
    try:
        import jax

        path = cache_dir or os.environ.get(
            "CSTS_COMPCACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "csts_tpu_xla"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # only persist compiles that are worth the disk round trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
        try:  # renamed across jax versions; absence is fine
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
        return True
    except Exception:
        return False
