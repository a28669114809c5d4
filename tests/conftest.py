"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so multi-device sharding
semantics (pmean/all_gather/Mesh) are exercised without TPU hardware — the strategy
SURVEY.md §4 prescribes in place of the reference's (nonexistent) distributed tests.

Must set XLA flags before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform regardless of JAX_PLATFORMS;
# override it programmatically so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from csts_tpu.utils import compcache  # noqa: E402

# Persistent compile cache for the CPU suite: identical XLA programs recur
# across test modules and across suite runs (the family configs are shared);
# the cache keys on HLO so repeats become disk reads. CSTS_COMPCACHE=0 opts
# out. The threshold is low — this box compiles the tiny train steps in
# seconds each, hundreds of times per run.
compcache.enable(min_compile_secs=1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
