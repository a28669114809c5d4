"""Worker process for the 2-process jax.distributed CPU simulation.

Driven by ``tests/test_multihost.py`` (not collected by pytest itself). Exercises
the NUM_SHARDS-analogue machinery that single-process unit tests can't: real
``jax.process_count() > 1`` with cross-process collectives, per-host loader
stripes (loader.py:101-112), pickled-object gather
(parallel/collectives.py:67-87 ≙ slowfast all_gather_unaligned,
distributed.py:266-302), barrier, and master-only checkpointing
(utils/checkpoint.py:46-61 ≙ checkpoint.py:110-143).

Exit codes: 0 ok, 2 init refused (launcher guard-skips), 1 assertion failure.
"""

import json
import os
import sys


def main() -> int:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    out_dir = sys.argv[4]

    # CPU platform with 2 virtual devices per process, set before backend init
    # (the axon sitecustomize overrides env — mirror __graft_entry__._force_virtual_cpu)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

    import numpy as np
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=proc_id,
            initialization_timeout=60,
        )
    except Exception as e:  # runtime refuses multi-process CPU — guard-skip
        print(f"MULTIHOST_INIT_FAILED: {e}", flush=True)
        return 2

    import jax.numpy as jnp

    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.process_index() == proc_id
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 2 * nprocs  # 2 virtual locals per process

    from csts_tpu.parallel import collectives

    # ---- pickled-object gather with per-process payload sizes (padding path)
    objs = collectives.gather_objects({"rank": proc_id, "blob": "x" * (7 + 100 * proc_id)})
    assert [o["rank"] for o in objs] == list(range(nprocs)), objs
    assert len(objs[1]["blob"]) == 107

    # ---- collective over ALL global devices inside jit (the DCN-analogue path)
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    local = np.full((jax.local_device_count(), 4), float(proc_id + 1), np.float32)
    garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    expect = sum(2 * 4 * (r + 1) for r in range(nprocs))
    assert float(total) == expect, (float(total), expect)

    # ---- per-host loader stripes (DistributedSampler semantics, loader.py:101-112)
    from csts_tpu.data.loader import GazeLoader

    class FakeDS:
        def __len__(self):
            return 8

        def __getitem__(self, i, rng=None):
            z = np.zeros((2, 2), np.float32)
            return {"video": np.full((1,), i, np.float32), "audio": z,
                    "labels": z, "labels_hm": z, "index": i}

    loader = GazeLoader(FakeDS(), batch_size=4, shuffle=False, num_workers=1,
                        process_index=proc_id, process_count=nprocs)
    got = [b["index"].tolist() for b in loader]
    mine = [i for i in range(8) if (i // 2) % nprocs == proc_id]
    assert sorted(sum(got, [])) == mine, (got, mine)

    # ---- the tester/trainer data path: per-host stripes -> one GLOBAL batch
    # (shard_batch must use make_array_from_process_local_data, not device_put),
    # a sharded jit consuming it, and host_local_batch recovering each host's
    # own stripe of the output
    from csts_tpu.parallel import mesh as mesh_lib

    gmesh = Mesh(np.array(jax.devices()), (mesh_lib.DATA_AXIS,))
    local_stripe = {
        "video": np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 100 * proc_id
    }
    dev_batch = mesh_lib.shard_batch(gmesh, local_stripe)
    assert dev_batch["video"].shape == (2 * nprocs, 3), dev_batch["video"].shape
    doubled = jax.jit(lambda b: {"video": b["video"] * 2})(dev_batch)
    back = mesh_lib.host_local_batch(gmesh, doubled)
    np.testing.assert_allclose(back["video"], local_stripe["video"] * 2)

    # padded path: a local stripe that does not fill this host's data-axis share
    short = {"video": np.ones((1, 3), np.float32) * (proc_id + 1)}
    dev_short, true_n = mesh_lib.shard_batch_padded(gmesh, short)
    assert true_n == 1 and dev_short["video"].shape[0] == 2 * nprocs

    # ---- whole-test-set metric merge: per-host StreamingF1 partials -> global
    from csts_tpu.eval.metrics import StreamingF1

    rng_m = np.random.default_rng(7)
    preds = rng_m.random((4, 2, 8, 8), np.float32)
    labels_hm = (rng_m.random((4, 2, 8, 8)) > 0.8).astype(np.float32)
    labels = np.zeros((4, 2, 3), np.float32)  # gaze_type 0 = fixation
    mine_sl = slice(proc_id * 2, proc_id * 2 + 2)
    local_stream = StreamingF1("ego4d_av_gaze_forecast")
    local_stream.update(preds[mine_sl], labels_hm[mine_sl], labels[mine_sl])
    for rank, st in enumerate(collectives.gather_objects(local_stream.state())):
        if rank != proc_id:
            local_stream.merge_state(st)
    merged = local_stream.finalize()
    ref_stream = StreamingF1("ego4d_av_gaze_forecast")
    ref_stream.update(preds, labels_hm, labels)  # the single-host global pass
    ref = ref_stream.finalize()
    for k in ("f1", "recall", "precision", "threshold", "auc"):
        assert abs(merged[k] - ref[k]) < 1e-6, (k, merged[k], ref[k])

    # ---- master-only checkpointing
    from csts_tpu.utils import checkpoint as cu

    assert cu.is_master() == (proc_id == 0)
    path = cu.save_checkpoint(out_dir, {"w": np.ones((2,), np.float32)}, epoch=0)
    assert (path is not None) == (proc_id == 0)
    collectives.barrier()
    assert cu.has_checkpoint(out_dir)  # every process sees the master's file

    with open(os.path.join(out_dir, f"worker_{proc_id}.json"), "w") as f:
        json.dump({"stripe": sum(got, []), "psum": float(total)}, f)
    print(f"MULTIHOST_OK {proc_id}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
