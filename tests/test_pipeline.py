"""GPipe pipeline parallelism (parallel/pipeline.py) on the 8-device CPU mesh.

The reference ships data parallelism only (SURVEY §2.2 — DDP over NCCL,
``slowfast/utils/distributed.py``); the ``pipe`` mesh axis is a capability beyond
it. These tests pin the schedule's semantics: forward/grad parity of the shard_map
ppermute pipeline against a plain sequential loop, model-level parity of the
pipelined encoder identity run, and loss parity of the full train step under
dp×pp (with a stochastic-depth smoke for the traced drop-path-rate lane).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from csts_tpu.models import csts as csts_lib
from csts_tpu.parallel import mesh as mesh_lib
from csts_tpu.parallel.pipeline import pipe_size, pipeline_blocks
from csts_tpu.train import step as step_lib

from test_train_step import make_batch, tiny_cfg


def test_parallel_cfg_builds_mesh():
    """cfg.PARALLEL drives trainer/tester mesh construction (mesh_from_cfg):
    axis sizes, derived dp, the PIPE_MICROBATCHES module knob, and the finalize
    divisibility guard."""
    from csts_tpu.parallel import pipeline as pipeline_lib

    cfg = tiny_cfg()
    cfg.NUM_DEVICES = 8
    cfg.PARALLEL.PIPE = 2
    cfg.PARALLEL.MODEL = 2
    cfg.PARALLEL.PIPE_MICROBATCHES = 4
    cfg.finalize()
    saved = pipeline_lib.MICROBATCHES
    try:
        mesh = mesh_lib.mesh_from_cfg(cfg)
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "data": 2, "pipe": 2, "model": 2,
        }
        assert pipeline_lib.MICROBATCHES == 4
        assert pipeline_lib.effective_microbatches(2) == 4
        assert pipeline_lib.effective_microbatches(2, 8) == 8
    finally:
        pipeline_lib.MICROBATCHES = saved

    cfg.PARALLEL.PIPE = 3  # 8 % (3*2) != 0
    with pytest.raises(AssertionError):
        cfg.finalize()


def test_pipeline_blocks_matches_sequential_loop():
    """Forward bit-exact and grads fp32-close vs a plain per-block loop, on a
    dp2×pp4 mesh (L=8 blocks → 2 per stage, M=S=4 microbatches of 2)."""
    L, B, D = 8, 8, 16
    Ws = jax.random.normal(jax.random.PRNGKey(0), (L, D, D)) * 0.1
    bs = jax.random.normal(jax.random.PRNGKey(1), (L, D)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 4, D))
    stacked = {"w": Ws, "b": bs}

    def apply_one(slot, z, m):
        del m  # microbatch index (RNG-stream hook) — unused in this block
        return jnp.tanh(z @ slot["w"] + slot["b"])

    def ref(s, z):
        for j in range(L):
            z = apply_one(jax.tree_util.tree_map(lambda p: p[j], s), z, 0)
        return z

    mesh = mesh_lib.make_mesh(num_devices=8, pipe_parallel=4)
    with jax.sharding.set_mesh(mesh):
        assert pipe_size() == 4
        out = jax.jit(lambda s, z: pipeline_blocks(s, z, apply_one))(stacked, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref(stacked, x)))

        g = jax.jit(
            jax.grad(lambda s, z: jnp.sum(pipeline_blocks(s, z, apply_one) ** 2))
        )(stacked, x)

        # M != S lane: the PIPE_MICROBATCHES knob changes the schedule length
        # (M+S-1 steps) but not the result
        out_m8 = jax.jit(
            lambda s, z: pipeline_blocks(s, z, apply_one, microbatches=8)
        )(stacked, x)
        np.testing.assert_array_equal(np.asarray(out_m8), np.asarray(ref(stacked, x)))
    g_ref = jax.grad(lambda s, z: jnp.sum(ref(s, z) ** 2))(stacked, x)
    for k in g:
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ref[k]), atol=1e-5)


def test_pipeline_microbatch_index_reaches_apply_one():
    """The schedule hands apply_one the CORRECT microbatch index m (sample i
    rides microbatch i % M under the minor-index reshape) — the hook the model
    uses to decorrelate per-microbatch stochastic-depth streams."""
    B, M = 8, 4
    key = jax.random.PRNGKey(5)
    x = jnp.zeros((B, 4))
    stacked = {"k": jnp.stack([key] * M)}  # L=4 blocks, one per stage

    def apply_one(slot, z, m):
        # inject an m-dependent constant; every stage adds it again, so a
        # wrong m at ANY stage/step changes the output
        return z + jax.random.normal(jax.random.fold_in(slot["k"], m), ())

    mesh = mesh_lib.make_mesh(num_devices=8, pipe_parallel=4)
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda s, z: pipeline_blocks(s, z, apply_one))(stacked, x)
    per_m = np.asarray(
        [4.0 * jax.random.normal(jax.random.fold_in(key, m), ()) for m in range(M)]
    )
    expect = np.stack([np.full(4, per_m[i % M]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)
    assert len(np.unique(per_m)) == M  # streams actually differ


def _depth6_cfg(droppath):
    """tiny_cfg deepened to 6 blocks: blocks 4–5 form the uniform identity run
    the encoder pipelines (same derivation as the flagship's blocks 4–13)."""
    cfg = tiny_cfg()
    cfg.MVIT.DEPTH = 6
    cfg.MVIT.DROPPATH_RATE = droppath
    return cfg


@pytest.mark.slow
def test_pipeline_forward_matches_single_device():
    """Eval forward over dp4×pp2 equals the unmeshed program, and the compiled
    HLO carries collective-permutes (proof the run actually pipelines — the
    plain DP forward has no ppermute anywhere)."""
    cfg = _depth6_cfg(0.0)
    spec = csts_lib.build_spec(cfg)
    b0 = spec.video_blocks[4]
    assert dataclasses.replace(spec.video_blocks[5], drop_path=b0.drop_path) == b0

    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((8, 8, 32, 32, 3)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((8, 8, 32, 32, 1)), jnp.float32)

    def fwd(p, v, a):
        return csts_lib.csts_apply(p, spec, v, a, deterministic=True)

    base = jax.jit(fwd)(params, video, audio)

    mesh = mesh_lib.make_mesh(num_devices=8, pipe_parallel=2)
    with jax.sharding.set_mesh(mesh):
        pv = jax.device_put(params, mesh_lib.replicated(mesh))
        vv = jax.device_put(video, mesh_lib.batch_sharding(mesh))
        av = jax.device_put(audio, mesh_lib.batch_sharding(mesh))
        compiled = jax.jit(fwd).lower(pv, vv, av).compile()
        assert "collective-permute" in compiled.as_text(), "encoder run not pipelined"
        out = compiled(pv, vv, av)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-6)


@pytest.mark.slow
def test_pipeline_train_step_matches_dp():
    """Full train step (kldiv+egonce, AdamW) under dp4×pp2 reproduces the DP
    loss with stochastic depth off; with the drop-path ramp on, the traced
    per-block-rate lane still yields a finite loss (the draws are
    per-microbatch, a different stream than DP's full-batch masks)."""
    cfg = _depth6_cfg(0.0)
    spec = csts_lib.build_spec(cfg)
    batch_np = make_batch(np.random.default_rng(3), 8)

    def one_step(pipe_parallel):
        mesh = mesh_lib.make_mesh(num_devices=8, pipe_parallel=pipe_parallel)
        state, tx = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(0))
        train_step = step_lib.make_train_step(cfg, spec, tx, steps_per_epoch=10)
        with jax.sharding.set_mesh(mesh):
            state = jax.device_put(state, mesh_lib.replicated(mesh))
            _, stats, _ = train_step(
                state, mesh_lib.shard_batch(mesh, batch_np), jax.random.PRNGKey(7)
            )
            return float(stats["loss"])

    assert abs(one_step(1) - one_step(2)) < 1e-5

    cfg_sd = _depth6_cfg(0.2)
    spec_sd = csts_lib.build_spec(cfg_sd)
    mesh = mesh_lib.make_mesh(num_devices=8, pipe_parallel=2)
    state, tx = step_lib.create_train_state(cfg_sd, spec_sd, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(cfg_sd, spec_sd, tx, steps_per_epoch=10)
    with jax.sharding.set_mesh(mesh):
        state = jax.device_put(state, mesh_lib.replicated(mesh))
        _, stats, _ = train_step(
            state, mesh_lib.shard_batch(mesh, batch_np), jax.random.PRNGKey(7)
        )
        assert np.isfinite(float(stats["loss"]))
