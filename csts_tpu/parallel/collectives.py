"""Collective-communication primitives (reference: ``slowfast/utils/distributed.py``).

Inside a pjit program, collectives are implicit — XLA partitions global-array ops.
These explicit wrappers exist for ``shard_map`` regions and for API parity with the
reference's primitive set (SURVEY C20):

=========================  =======================================================
reference (NCCL)           here (XLA over ICI/DCN)
=========================  =======================================================
all_reduce (avg)           :func:`all_reduce_mean` → lax.pmean
all_gather (concat)        :func:`all_gather` → lax.all_gather(tiled)
all_gather_with_grad       :func:`all_gather` — differentiable by construction;
                           the reference's rank-0 backward bug does not exist here
all_gather_unaligned       host-side :func:`gather_objects` (pickle over processes)
get_world_size/rank        :func:`world_size` / :func:`rank`
synchronize (barrier)      :func:`barrier`
=========================  =======================================================
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import jax.numpy as jnp

from csts_tpu.parallel.mesh import DATA_AXIS


def all_reduce_mean(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """Average across the axis (distributed.py:74-90). Use inside shard_map/pmap."""
    return jax.lax.pmean(x, axis_name)


def all_reduce_sum(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    return jax.lax.psum(x, axis_name)


def all_gather(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """Concatenate along the leading dim across the axis (distributed.py:52-71).
    Differentiable (replaces AllGather_multi, distributed.py:15-49)."""
    return jax.lax.all_gather(x, axis_name, tiled=True)


def world_size() -> int:
    return jax.device_count()


def rank() -> int:
    return jax.process_index()


def is_master_proc() -> bool:
    """(distributed.py:160-173)"""
    return jax.process_index() == 0


def barrier() -> None:
    """Cross-process barrier: a tiny psum everyone must reach (distributed.py:176-185)."""
    if jax.process_count() == 1:
        return
    x = jnp.ones((jax.local_device_count(),))
    jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()


def gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from every process to all processes
    (all_gather_unaligned, distributed.py:266-302) via the jax key-value store."""
    if jax.process_count() == 1:
        return [obj]
    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across hosts
    n = np.asarray([len(payload)], np.int32)
    all_n = multihost_utils.process_allgather(n)
    max_n = int(all_n.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    sizes = all_n.reshape(-1)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]
