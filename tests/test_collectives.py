"""Collective wrappers on the 8-device CPU mesh (shard_map semantics)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from csts_tpu.parallel import collectives as coll
from csts_tpu.parallel import mesh as mesh_lib


def test_all_reduce_and_gather_in_shard_map():
    mesh = mesh_lib.make_mesh()
    x = jnp.arange(16.0).reshape(8, 2)

    def body(xs):
        mean = coll.all_reduce_mean(jnp.sum(xs), mesh_lib.DATA_AXIS)
        gathered = coll.all_gather(xs, mesh_lib.DATA_AXIS)
        return mean[None], gathered

    f = shard_map(
        body, mesh=mesh,
        in_specs=P(mesh_lib.DATA_AXIS),
        out_specs=(P(mesh_lib.DATA_AXIS), P()),
        check_vma=False,
    )
    mean, gathered = f(x)
    # each shard holds one row; pmean of per-shard sums == mean of row-sums
    np.testing.assert_allclose(np.asarray(mean), np.sum(np.asarray(x), axis=1).mean())
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(x))


def test_all_gather_is_differentiable():
    """The reference's AllGather_multi backward takes rank-0's slice on every rank
    (distributed.py:23,30) — correct gradients route each shard's cotangent back."""
    mesh = mesh_lib.make_mesh()
    x = jnp.arange(8.0)

    def loss(xs):
        def body(s):
            g = coll.all_gather(s, mesh_lib.DATA_AXIS)
            # weight each gathered element differently so shard grads differ
            return jnp.sum(g * jnp.arange(8.0)) / 8.0

        f = shard_map(body, mesh=mesh, in_specs=P(mesh_lib.DATA_AXIS), out_specs=P(),
                      check_vma=False)
        return f(xs)

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), np.arange(8.0) / 8.0, atol=1e-6)


def test_helpers():
    assert coll.world_size() == 8
    assert coll.rank() == 0
    assert coll.is_master_proc()
    coll.barrier()  # single-process: no-op
    assert coll.gather_objects({"a": 1}) == [{"a": 1}]


def test_device_grid_layouts():
    """_device_grid: CPU/virtual meshes keep enumeration order (test semantics
    unchanged); objects without topology attributes fall back to plain reshape;
    multi-axis make_mesh carries the documented [data, pipe, seq, model] order."""
    devs = jax.devices()
    grid = mesh_lib._device_grid(devs, [4, 2])
    assert grid.shape == (4, 2)
    assert [d.id for d in grid.flat] == [d.id for d in devs]

    class Fake:  # no slice_index / coords -> mesh_utils raises -> reshape path
        def __init__(self, i):
            self.id = i

    fakes = [Fake(i) for i in range(8)]
    fgrid = mesh_lib._device_grid(fakes, [2, 2, 2])
    assert fgrid.shape == (2, 2, 2)
    assert [d.id for d in fgrid.flat] == list(range(8))

    mesh = mesh_lib.make_mesh(
        num_devices=8, model_parallel=2, seq_parallel=2, pipe_parallel=2
    )
    assert mesh.axis_names == ("data", "pipe", "seq", "model")
    assert mesh.devices.shape == (1, 2, 2, 2)
