"""BN family tests: torch parity, sync-BN across the mesh, SubBN aggregation."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from csts_tpu.models import batchnorm as bn


def test_batch_norm_matches_torch_train_and_eval(rng):
    c = 16
    m = nn.BatchNorm3d(c, momentum=0.1, eps=1e-5)
    x = rng.standard_normal((4, c, 2, 5, 5)).astype(np.float32)

    params = bn.bn_init(c)
    state = bn.bn_state_init(c)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))

    m.train()
    ref = m(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 4, 1)
    out, new_state = bn.batch_norm(params, state, x_j, training=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), m.running_mean.numpy(), atol=1e-5)
    # torch uses unbiased variance for the running update; ours is biased — both are
    # legitimate conventions, compare loosely
    np.testing.assert_allclose(np.asarray(new_state["var"]), m.running_var.numpy(), rtol=0.05)

    m.eval()
    ref_eval = m(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 4, 1)
    state_t = {"mean": jnp.asarray(m.running_mean.numpy()), "var": jnp.asarray(m.running_var.numpy())}
    out_eval, _ = bn.batch_norm(params, state_t, x_j, training=False)
    np.testing.assert_allclose(np.asarray(out_eval), ref_eval, atol=1e-4)


def test_sync_bn_equals_global_stats(rng):
    """pmean-synced BN over 8 shards == single-device BN on the concatenated batch."""
    c = 8
    x = rng.standard_normal((8, 2, 4, 4, c)).astype(np.float32)
    params = bn.bn_init(c)
    state = bn.bn_state_init(c)

    global_out, _ = bn.batch_norm(params, state, jnp.asarray(x), training=True)

    def per_shard(xs):
        out, _ = bn.batch_norm(params, state, xs, training=True, axis_name="data")
        return out

    sharded_out = jax.pmap(per_shard, axis_name="data")(jnp.asarray(x)[:, None])
    np.testing.assert_allclose(
        np.asarray(sharded_out)[:, 0], np.asarray(global_out), atol=1e-5
    )


def test_subbn_aggregate(rng):
    sub = bn.SubBatchNorm(num_splits=2, dim=4)
    params, state = sub.init()
    x = jnp.asarray(rng.standard_normal((4, 2, 3, 3, 4)).astype(np.float32))
    out, state = sub.apply(params, state, x, training=True, momentum=1.0)
    assert out.shape == x.shape
    state = sub.aggregate_stats(state)
    # aggregated mean == full-batch mean when momentum=1
    full_mean = np.asarray(jnp.mean(x, axis=(0, 1, 2, 3)))
    np.testing.assert_allclose(np.asarray(state["global"]["mean"]), full_mean, atol=1e-5)
