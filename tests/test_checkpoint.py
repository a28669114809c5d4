"""Checkpoint subsystem tests: .pyth ingestion, pos-embed interpolation, partial load."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from csts_tpu.config import get_cfg
from csts_tpu.convert.from_torch import interpolate_pos_embed
from csts_tpu.models import csts as csts_lib
from csts_tpu.utils import checkpoint as cu

from reference_oracle import load_reference_csts

CROP = 64


def tiny_cfg():
    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = CROP
    cfg.DATA.TEST_CROP_SIZE = CROP
    cfg.DATA.AUDIO_FREQ_BINS = CROP
    cfg.DATA.AUDIO_WINDOW = CROP
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MVIT.SEP_POS_EMBED = True
    cfg.MVIT.DIM_MUL = [[1, 2.0], [3, 2.0], [14, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [3, 2.0], [14, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 8, 8]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [3, 1, 2, 2], [14, 1, 2, 2]]
    cfg.MODEL.LOSS_FUNC = "kldiv+egonce"
    return cfg


@pytest.fixture(scope="module")
def pyth_checkpoint(tmp_path_factory):
    """A reference-format .pyth file from the torch oracle."""
    oracle, _ = load_reference_csts(crop_size=CROP, num_frames=8, seed=5)
    grid = CROP // 4 // 8
    torch.manual_seed(5)
    oracle.vision_pool = torch.nn.Conv3d(768, 768, (1, grid, grid))
    oracle.audio_pool = torch.nn.Conv3d(768, 768, (1, grid, grid))
    oracle.audio_pool2 = torch.nn.Conv3d(768, 768, (1, grid, grid))
    path = tmp_path_factory.mktemp("ckpt") / "model.pyth"
    torch.save({"epoch": 3, "model_state": oracle.state_dict()}, str(path))
    return str(path), oracle


def test_load_torch_weights_full(pyth_checkpoint):
    path, oracle = pyth_checkpoint
    cfg = tiny_cfg()
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    loaded = cu.load_torch_weights(path, params)
    # spot-check exact weight transfer (qkv transpose)
    ref = oracle.state_dict()["blocks.3.attn.qkv.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(loaded["blocks"][3]["attn"]["qkv"]["w"]), ref)
    ref_pe = oracle.state_dict()["pos_embed_spatial"].numpy()
    np.testing.assert_allclose(np.asarray(loaded["pos_embed_spatial"]), ref_pe)


def test_load_torch_weights_interpolates_pos_embed(pyth_checkpoint):
    """Loading 64²-trained weights into a 128² model interpolates pos embeds and
    skips the shape-mismatched fusion pools (checkpoint.py:146-182,327-335)."""
    path, _ = pyth_checkpoint
    cfg = tiny_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = 128
    cfg.DATA.TEST_CROP_SIZE = 128
    cfg.DATA.AUDIO_FREQ_BINS = 128
    cfg.DATA.AUDIO_WINDOW = 128
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    before = np.asarray(params["vision_pool"]["w"]).copy()
    loaded = cu.load_torch_weights(path, params)
    # pos embed token count: 32*32 = 1024 at 128² vs 16*16 = 256 in the checkpoint
    assert np.asarray(loaded["pos_embed_spatial"]).shape[1] == 1024
    # mismatched conv kept its init
    np.testing.assert_array_equal(np.asarray(loaded["vision_pool"]["w"]), before)
    # matched weights transferred
    assert not np.allclose(
        np.asarray(loaded["blocks"][0]["attn"]["qkv"]["w"]),
        np.asarray(params["blocks"][0]["attn"]["qkv"]["w"]),
    )


def test_interpolate_pos_embed_matches_torch():
    pe = np.random.default_rng(0).standard_normal((1, 16, 8)).astype(np.float32)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(pe).permute(0, 2, 1), size=36, mode="linear"
        )
        .permute(0, 2, 1)
        .numpy()
    )
    ours = interpolate_pos_embed(pe, 36)
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_audio_branch_checkpoint_merge(pyth_checkpoint, tmp_path):
    """TRAIN.AUDIO_CHECKPOINT_FILE_PATH merges a plain-MViT checkpoint into the
    audio branch (checkpoint.py:357-474)."""
    path, oracle = pyth_checkpoint
    # build a fake audio-pretrain checkpoint: a plain MViT state dict (blocks.*)
    sd = {
        k[len("blocks_audio."):] if False else k: v
        for k, v in oracle.state_dict().items()
    }
    audio_sd = {}
    for k, v in sd.items():
        if k.startswith("blocks_audio."):
            audio_sd["blocks." + k[len("blocks_audio."):]] = v + 1.0  # distinguishable
        elif k.startswith("patch_embed_audio."):
            audio_sd["patch_embed." + k[len("patch_embed_audio."):]] = v + 1.0
    audio_path = str(tmp_path / "audio.pyth")
    torch.save({"model_state": audio_sd}, audio_path)

    cfg = tiny_cfg()
    cfg.TRAIN.CHECKPOINT_FILE_PATH = path
    cfg.TRAIN.AUDIO_CHECKPOINT_FILE_PATH = audio_path
    cfg.TRAIN.AUTO_RESUME = False
    cfg.OUTPUT_DIR = str(tmp_path)
    spec = csts_lib.build_spec(cfg)
    from csts_tpu.train import step as step_lib

    state, tx = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(0))
    state, start, _ = cu.load_train_checkpoint(cfg, state)
    assert start == 0
    # audio branch came from the audio checkpoint (offset +1), video from the main one
    ref_audio = sd["blocks_audio.1.attn.qkv.weight"].numpy().T + 1.0
    np.testing.assert_allclose(
        np.asarray(state.params["blocks_audio"][1]["attn"]["qkv"]["w"]), ref_audio
    )
    ref_video = sd["blocks.1.attn.qkv.weight"].numpy().T
    np.testing.assert_allclose(
        np.asarray(state.params["blocks"][1]["attn"]["qkv"]["w"]), ref_video
    )


@pytest.mark.slow  # heavy compile; surface also covered by fast-lane tests
def test_convert_checkpoint_cli(pyth_checkpoint, tmp_path):
    """tools/convert_checkpoint.py writes an .npz loadable by the serving path."""
    import subprocess
    import sys

    path, oracle = pyth_checkpoint
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(
        "DATA:\n  TRAIN_CROP_SIZE: 64\n  TEST_CROP_SIZE: 64\n"
        "  AUDIO_FREQ_BINS: 64\n  AUDIO_WINDOW: 64\n"
        "MVIT:\n  PATCH_PADDING: [1, 3, 3]\n  CLS_EMBED_ON: False\n  SEP_POS_EMBED: True\n"
        "  DIM_MUL: [[1, 2.0], [3, 2.0], [14, 2.0]]\n  HEAD_MUL: [[1, 2.0], [3, 2.0], [14, 2.0]]\n"
        "  POOL_KVQ_KERNEL: [3, 3, 3]\n  POOL_KV_STRIDE_ADAPTIVE: [1, 8, 8]\n"
        "  POOL_Q_STRIDE: [[1, 1, 2, 2], [3, 1, 2, 2], [14, 1, 2, 2]]\n"
        "MODEL:\n  LOSS_FUNC: kldiv+egonce\n"
        f"OUTPUT_DIR: {tmp_path}\n"
    )
    out_npz = str(tmp_path / "weights.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable the TPU sitecustomize hook
    res = subprocess.run(
        [sys.executable, "tools/convert_checkpoint.py", "--cfg", str(cfg_yaml),
         "--input", path, "--output", out_npz],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(out_npz)

    cfg = tiny_cfg()
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    loaded = cu.load_params_npz(out_npz, params)
    ref = oracle.state_dict()["blocks.3.attn.qkv.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(loaded["blocks"][3]["attn"]["qkv"]["w"]), ref)

    # and back out: npz -> reference .pyth via the export CLI
    out_pyth = str(tmp_path / "exported.pyth")
    res = subprocess.run(
        [sys.executable, "tools/export_checkpoint.py", "--cfg", str(cfg_yaml),
         "--input", out_npz, "--output", out_pyth],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    blob = torch.load(out_pyth, map_location="cpu", weights_only=False)
    np.testing.assert_allclose(
        blob["model_state"]["blocks.3.attn.qkv.weight"].numpy(),
        oracle.state_dict()["blocks.3.attn.qkv.weight"].numpy(),
    )


def test_export_roundtrip_forward_parity(tmp_path):
    """to_torch round trip: params from csts_init -> export_csts_state_dict ->
    reference model load_state_dict(strict=True) -> fp32 forward parity, plus a
    save_pyth_checkpoint file re-ingested by the from_torch pathway. Proves a
    model trained HERE is directly evaluable by the PyTorch reference."""
    from csts_tpu.convert.from_torch import (
        convert_csts_state_dict,
        load_pyth_checkpoint,
    )
    from csts_tpu.convert.to_torch import export_csts_state_dict, save_pyth_checkpoint

    cfg = tiny_cfg()
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(3), spec)
    params_np = jax.tree_util.tree_map(np.asarray, params)

    sd = {k: torch.from_numpy(v) for k, v in export_csts_state_dict(params_np).items()}

    # fresh oracle (the module fixture's is shared; loading would mutate it)
    oracle, _ = load_reference_csts(crop_size=CROP, num_frames=8, seed=13)
    grid = CROP // 4 // 8
    torch.manual_seed(13)
    oracle.vision_pool = torch.nn.Conv3d(768, 768, (1, grid, grid))
    oracle.audio_pool = torch.nn.Conv3d(768, 768, (1, grid, grid))
    oracle.audio_pool2 = torch.nn.Conv3d(768, 768, (1, grid, grid))
    oracle.load_state_dict(sd, strict=True)  # raises on any key/shape mismatch
    oracle.eval()

    rng = np.random.default_rng(9)
    video = rng.standard_normal((2, 3, 8, CROP, CROP), dtype=np.float32)
    audio = rng.standard_normal((2, 1, 8, CROP, CROP), dtype=np.float32)
    with torch.no_grad():
        ref = oracle([torch.from_numpy(video)], torch.from_numpy(audio)).numpy()

    out = csts_lib.csts_apply(
        params, spec,
        jnp.asarray(video.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(audio.transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=5e-4, rtol=1e-4
    )

    # .pyth file round trip through the existing from_torch ingestion
    path = str(tmp_path / "exported.pyth")
    save_pyth_checkpoint(path, params_np, epoch=7)
    back = convert_csts_state_dict(load_pyth_checkpoint(path))
    flat_a = jax.tree_util.tree_leaves_with_path(params_np)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la, np.float32), lb, err_msg=str(pa))


@pytest.mark.slow  # heavy compile; surface also covered by fast-lane tests
def test_orbax_roundtrip_sharded(tmp_path):
    """Orbax backend (utils/orbax_ckpt.py): async save of a ZeRO-1-sharded
    TrainState on the 8-device mesh, restore into a zeroed template carrying
    the same shardings — every leaf equal, the moment shards stay sharded
    (direct-to-shard restore, no host materialization), latest_step found."""
    from csts_tpu.parallel import mesh as mesh_lib
    from csts_tpu.train import step as step_lib
    from csts_tpu.utils import orbax_ckpt

    cfg = tiny_cfg()
    # reduced family member (CPU-cheap): depth 4, 16-dim, crop 32
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.AUDIO_FREQ_BINS = 32
    cfg.DATA.AUDIO_WINDOW = 32
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.DIM_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [2, 1, 2, 2], [3, 1, 2, 2]]
    spec = csts_lib.build_spec(cfg)
    state, tx = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh()
    shardings = step_lib.TrainState(
        mesh_lib.param_sharding_rules(mesh, state.params),
        mesh_lib.opt_state_sharding(mesh, state.opt_state),
        mesh_lib.replicated(mesh),
    )
    with jax.sharding.set_mesh(mesh):
        st = jax.device_put(state, shardings)
        ck = orbax_ckpt.OrbaxCheckpointer(str(tmp_path), max_to_keep=2)
        ck.save(st, step=3)
        ck.wait()
        assert ck.latest_step() == 3
        assert orbax_ckpt.has_checkpoint(str(tmp_path))
        template = jax.tree_util.tree_map(jnp.zeros_like, st)
        restored, ep = ck.restore(template)
        ck.close()
    assert ep == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sharded = [
        l for l in jax.tree_util.tree_leaves(restored.opt_state)
        if hasattr(l, "sharding") and l.ndim >= 1
        and l.sharding.shard_shape(l.shape) != l.shape
    ]
    assert sharded, "ZeRO-1 moment leaves lost their sharding through restore"


def test_orbax_elastic_topology_restore(tmp_path):
    """Elastic resume: a TrainState FSDP-sharded over dp8 restores into an
    FSDP template on a DIFFERENT topology (dp4) — orbax checkpoints store
    global arrays, so the restore resharding is free. The reference can only
    restart on the exact GPU count it saved from (DDP + torch.save)."""
    from csts_tpu.parallel import mesh as mesh_lib
    from csts_tpu.train import step as step_lib
    from csts_tpu.utils import orbax_ckpt

    cfg = tiny_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.AUDIO_FREQ_BINS = 32
    cfg.DATA.AUDIO_WINDOW = 32
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.DIM_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [2, 1, 2, 2], [3, 1, 2, 2]]
    spec = csts_lib.build_spec(cfg)
    state, _ = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(0))

    def fsdp_shardings(mesh, st):
        return step_lib.TrainState(
            mesh_lib.fsdp_param_sharding(mesh, st.params),
            mesh_lib.opt_state_sharding(mesh, st.opt_state),
            mesh_lib.replicated(mesh),
        )

    mesh8 = mesh_lib.make_mesh(num_devices=8)
    with jax.sharding.set_mesh(mesh8):
        st8 = jax.device_put(state, fsdp_shardings(mesh8, state))
        ck = orbax_ckpt.OrbaxCheckpointer(str(tmp_path))
        ck.save(st8, step=5)
        ck.wait()
        ck.close()

    mesh4 = mesh_lib.make_mesh(num_devices=4)
    with jax.sharding.set_mesh(mesh4):
        template = jax.device_put(
            jax.tree_util.tree_map(jnp.zeros_like, state),
            fsdp_shardings(mesh4, state),
        )
        ck = orbax_ckpt.OrbaxCheckpointer(str(tmp_path))
        restored, step = ck.restore(template)
        ck.close()
    assert step == 5
    for a, b in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored leaves live on the NEW 4-device mesh with its shardings
    qkv = restored.params["blocks"][0]["attn"]["qkv"]["w"]
    assert len(qkv.sharding.device_set) == 4
    assert np.prod(qkv.sharding.shard_shape(qkv.shape)) * 4 == np.prod(qkv.shape)


def test_mid_epoch_checkpoint_naming_and_recency(tmp_path):
    """Iter-tagged preemption saves sort between their epoch's neighbours:
    ..._00005.npz < ..._00005_iter_*.npz < ..._00006.npz, so get_last_checkpoint
    always returns the true latest and an epoch-boundary save supersedes the
    mid-epoch file it resumed from."""
    out = str(tmp_path)
    state = {"w": np.ones((2,), np.float32)}
    # completed epoch 4 (file 00005), then preempted during epoch 5 at iter 3
    cu.save_checkpoint(out, state, epoch=4)
    p_mid = cu.save_checkpoint(out, {"w": 2 * np.ones((2,), np.float32)},
                               epoch=4, iter_idx=3)
    assert "_iter_0000003" in p_mid
    assert cu.get_last_checkpoint(out) == p_mid
    meta = cu.checkpoint_meta(p_mid)
    assert meta["epoch"] == 4 and meta["iter"] == 3
    restored, epoch = cu.load_checkpoint(p_mid, state)
    assert epoch == 4
    np.testing.assert_array_equal(restored["w"], 2 * np.ones((2,), np.float32))
    # epoch 5 completes -> 00006 supersedes the mid-epoch file
    p_done = cu.save_checkpoint(out, state, epoch=5)
    assert cu.get_last_checkpoint(out) == p_done
    # first-epoch preemption: epoch=-1 formats as 00000 and sorts first
    p0 = cu.save_checkpoint(out, state, epoch=-1, iter_idx=1)
    assert os.path.basename(p0) == "checkpoint_epoch_00000_iter_0000001.npz"
    assert cu.get_last_checkpoint(out) == p_done


def test_inspect_checkpoint_cli(tmp_path, capsys):
    """tools/inspect_checkpoint.py names flat npz leaves via the model spec
    (jax.eval_shape, no init compute) and prints sidecar metadata + totals."""
    import importlib.util
    import json as json_lib
    import sys

    import yaml

    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.AUDIO_FREQ_BINS = cfg.DATA.AUDIO_WINDOW = 32
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MVIT.SEP_POS_EMBED = True
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.DIM_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 8, 8]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [2, 1, 2, 2], [3, 1, 2, 2]]

    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    path = cu.save_checkpoint(str(tmp_path), params, epoch=2, cfg=cfg)
    # json round-trip turns dataclass tuples into yaml-safe lists
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump(json_lib.loads(json_lib.dumps(cfg.dump()))))

    tool = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tools", "inspect_checkpoint.py")
    spec_mod = importlib.util.spec_from_file_location("inspect_ckpt", tool)
    mod = importlib.util.module_from_spec(spec_mod)
    sys.modules["inspect_ckpt"] = mod
    spec_mod.loader.exec_module(mod)
    try:
        mod.inspect_npz(path, cfg_path=str(cfg_yaml), full=True)
    finally:
        sys.modules.pop("inspect_ckpt", None)
    out = capsys.readouterr().out
    assert "epoch=2" in out
    assert "blocks" in out and "decode_block4" in out  # named via the spec
    assert "M elements" in out and "float32=" in out
    assert "WARNING" not in out  # every leaf shape matched the cfg's model


def test_average_checkpoints_cli(tmp_path):
    """tools/average_checkpoints.py: param leaves mean in fp64 then cast back,
    optimizer-state leaves taken from the last input, sidecar carried over."""
    import importlib.util
    import subprocess
    import sys

    # TrainState-like: params (a, b) + optimizer leaf (opt); flatten order is key-sorted
    s1 = {"a": np.full((2, 2), 1.0, np.float32), "b": np.full((3,), 2.0, np.float16),
          "opt": np.array([1.0, 1.0], np.float32)}
    s2 = {"a": np.full((2, 2), 3.0, np.float32), "b": np.full((3,), 4.0, np.float16),
          "opt": np.array([5.0, 5.0], np.float32)}
    p1 = cu.save_checkpoint(str(tmp_path / "r1"), s1, epoch=0)
    p2 = cu.save_checkpoint(str(tmp_path / "r2"), s2, epoch=1)

    tool = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tools", "average_checkpoints.py")
    spec_mod = importlib.util.spec_from_file_location("avg_ckpt", tool)
    mod = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(mod)

    out = str(tmp_path / "soup.npz")
    total, averaged = mod.average([p1, p2], out, n_params=2)
    assert (total, averaged) == (3, 2)
    blob = np.load(out)
    keys = sorted(blob.files)
    np.testing.assert_array_equal(blob[keys[0]], np.full((2, 2), 2.0, np.float32))
    assert blob[keys[1]].dtype == np.float16
    np.testing.assert_array_equal(blob[keys[1]], np.full((3,), 3.0, np.float16))
    np.testing.assert_array_equal(blob[keys[2]], s2["opt"])  # last ckpt, unaveraged
    meta = cu.checkpoint_meta(out)
    assert meta["epoch"] == 1 and len(meta["averaged_from"]) == 2

    # the real CLI, params-only mode (no --cfg: every leaf averaged)
    r = subprocess.run([sys.executable, tool, p1, p2, "--output", str(tmp_path / "cli.npz")],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "averaged 3/3 leaves" in r.stdout, r.stderr
