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


def _ref_checkpoint_module():
    import sys

    from reference_oracle import install_stubs

    install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from slowfast.utils import checkpoint as ref_ckpt

    return ref_ckpt


def test_sub_to_normal_bn_state_matches_reference(rng):
    """Canonicalize-for-save parity with slowfast/utils/checkpoint.py:477-511:
    the saved stats are the aggregated copy, the split copy is dropped, and the
    layout is indistinguishable from a normal-BN state."""
    ref_ckpt = _ref_checkpoint_module()
    sub = bn.SubBatchNorm(num_splits=2, dim=4)
    params, state = sub.init()
    x = jnp.asarray(rng.standard_normal((4, 2, 3, 3, 4)).astype(np.float32))
    _, state = sub.apply(params, state, x, training=True, momentum=1.0)
    state = sub.aggregate_stats(state)

    tree = {"s1": {"bn": state}, "head": {"w": jnp.ones((4, 4))}}
    saved = bn.sub_to_normal_bn_state(tree)
    assert set(saved["s1"]["bn"]) == {"mean", "var"}
    np.testing.assert_array_equal(
        np.asarray(saved["s1"]["bn"]["mean"]), np.asarray(state["global"]["mean"])
    )
    assert saved["head"]["w"] is tree["head"]["w"]  # non-BN leaves untouched

    # the reference applied to the equivalent torch layout keeps the same values
    sd = {
        "s1.bn.bn.running_mean": torch.tensor(np.asarray(state["global"]["mean"])),
        "s1.bn.bn.running_var": torch.tensor(np.asarray(state["global"]["var"])),
        "s1.bn.split_bn.running_mean": torch.tensor(np.asarray(state["split"]["mean"])),
        "s1.bn.split_bn.running_var": torch.tensor(np.asarray(state["split"]["var"])),
        "s1.bn.weight": torch.tensor(np.asarray(params["scale"])),
    }
    ref_sd = ref_ckpt.sub_to_normal_bn(sd)
    assert "s1.bn.split_bn.running_mean" not in ref_sd
    np.testing.assert_allclose(
        ref_sd["s1.bn.running_mean"].numpy(), np.asarray(saved["s1"]["bn"]["mean"])
    )
    np.testing.assert_allclose(
        ref_sd["s1.bn.running_var"].numpy(), np.asarray(saved["s1"]["bn"]["var"])
    )


def test_normal_to_sub_bn_state_matches_reference(rng):
    """Expand-on-load parity with slowfast/utils/checkpoint.py:538-577: flat
    stats land in the global slot and are tiled num_splits x for the split slot,
    exactly the reference's torch.cat([v] * reps)."""
    ref_ckpt = _ref_checkpoint_module()
    num_splits, dim = 3, 4
    sub = bn.SubBatchNorm(num_splits=num_splits, dim=dim)
    _, model_state = sub.init()
    flat = {
        "mean": rng.standard_normal(dim).astype(np.float32),
        "var": rng.random(dim).astype(np.float32) + 0.5,
    }
    ckpt = {"s1": {"bn": flat}, "extra": 7}
    model = {"s1": {"bn": model_state}, "extra": 0}
    out = bn.normal_to_sub_bn_state(ckpt, model)
    assert out["extra"] == 7  # plain leaves come from the checkpoint

    # reference comparison on the equivalent torch dicts
    ckpt_sd = {
        "s1.bn.running_mean": torch.tensor(flat["mean"]),
        "s1.bn.running_var": torch.tensor(flat["var"]),
    }
    model_sd = {
        "s1.bn.split_bn.running_mean": torch.zeros(dim * num_splits),
        "s1.bn.split_bn.running_var": torch.ones(dim * num_splits),
        "s1.bn.bn.running_mean": torch.zeros(dim),
        "s1.bn.bn.running_var": torch.ones(dim),
    }
    ref_sd = ref_ckpt.normal_to_sub_bn(dict(ckpt_sd), model_sd)
    np.testing.assert_allclose(
        np.asarray(out["s1"]["bn"]["split"]["mean"]),
        ref_sd["s1.bn.split_bn.running_mean"].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(out["s1"]["bn"]["split"]["var"]),
        ref_sd["s1.bn.split_bn.running_var"].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(out["s1"]["bn"]["global"]["mean"]),
        ref_sd["s1.bn.bn.running_mean"].numpy(),
    )

    # already-split checkpoints pass through; missing subtrees keep model values
    out2 = bn.normal_to_sub_bn_state({"s1": {"bn": out["s1"]["bn"]}}, model)
    np.testing.assert_array_equal(
        np.asarray(out2["s1"]["bn"]["split"]["mean"]),
        np.asarray(out["s1"]["bn"]["split"]["mean"]),
    )
    assert out2["extra"] == 0
