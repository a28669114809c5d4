"""End-to-end: synthetic mini-dataset → train epochs → checkpoint/resume → test.

SURVEY §4 pyramid level 4: exercises the dataset (npy decode backend, audio slicing,
forecast label math, gaze-aware transforms, heatmaps), the loader, the full training
driver, checkpointing, and the evaluation driver with streaming metrics — everything
tools/run_net.py touches, on a tiny family config.
"""

import json
import os

import numpy as np
import pytest

from csts_tpu.config import get_cfg

FRAMES_PER_CLIP = 150
FPS = 30
NUM_CLIPS = 4
RES = (40, 56)  # (H, W) source resolution
CROP = 32


def make_synthetic_dataset(root):
    """Layout mirrors the reference's on-disk structure (ego4d_avgaze.py:95-150)."""
    rng = np.random.default_rng(0)
    prefix = os.path.join(root, "clips.gaze")
    video_name = "vid001"
    os.makedirs(os.path.join(prefix, video_name))
    os.makedirs(os.path.join(root, "clips.gaze.audio_stft", video_name))
    os.makedirs(os.path.join(root, "gaze_frame_label"))
    os.makedirs(os.path.join(root, "splits"))

    rel_paths = []
    for c in range(NUM_CLIPS):
        t0, t1 = c * 5, c * 5 + 5
        clip = f"clip{c:02d}_t{t0}_t{t1}.mp4"
        rel = f"{video_name}/{clip}"
        rel_paths.append(rel)
        frames = rng.integers(0, 255, (FRAMES_PER_CLIP, *RES, 3), dtype=np.uint8)
        np.save(os.path.join(prefix, rel + ".frames.npy"), frames)
        with open(os.path.join(prefix, rel + ".meta.json"), "w") as f:
            json.dump({"fps": FPS, "duration_pts": FRAMES_PER_CLIP * 512}, f)
        stft = rng.standard_normal((256, 1000)).astype(np.float32)
        np.save(
            os.path.join(root, "clips.gaze.audio_stft", video_name, clip.replace(".mp4", ".npy")),
            stft,
        )

    total_frames = NUM_CLIPS * 5 * FPS + 10
    with open(os.path.join(root, "gaze_frame_label", f"{video_name}_frame_label.csv"), "w") as f:
        f.write("frame,x,y,type\n")
        for i in range(total_frames):
            x, y = rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7)
            gtype = 0 if i % 5 else 1  # mostly fixations
            f.write(f"{i},{x:.4f},{y:.4f},{gtype}\n")

    for split in ("train_ego4d_gaze.csv", "test_ego4d_gaze.csv"):
        with open(os.path.join(root, "splits", split), "w") as f:
            f.write("\n".join(rel_paths) + "\n")
    return prefix


def make_e2e_cfg(root, out_dir):
    cfg = get_cfg()
    cfg.DATA.PATH_PREFIX = os.path.join(root, "clips.gaze")
    cfg.DATA.PATH_TO_DATA_DIR = os.path.join(root, "splits")
    cfg.DATA.TRAIN_CROP_SIZE = CROP
    cfg.DATA.TEST_CROP_SIZE = CROP
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 8
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.DATA.TARGET_FPS = FPS
    cfg.DATA.GAUSSIAN_KERNEL = 5  # heatmaps are 8x8 at crop 32
    cfg.DATA.DECODING_BACKEND = "npy"
    cfg.DATA.AUDIO_FREQ_BINS = 32
    cfg.DATA.AUDIO_WINDOW = 32
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MVIT.SEP_POS_EMBED = True
    cfg.MVIT.DROPPATH_RATE = 0.2
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.DIM_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 8, 8]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [2, 1, 2, 2], [3, 1, 2, 2]]
    cfg.MODEL.LOSS_FUNC = "kldiv+egonce"
    cfg.MODEL.LOSS_ALPHA = 0.05
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.COSINE_END_LR = 1e-5
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.SOLVER.WEIGHT_DECAY = 0.05
    cfg.SOLVER.CLIP_GRAD_L2NORM = 1.0
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    cfg.TRAIN.DATASET = "ego4d_av_gaze_forecast"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.EVAL_PERIOD = 2
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.TEST.DATASET = "ego4d_av_gaze_forecast"
    cfg.TEST.BATCH_SIZE = 4
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.NUM_DEVICES = 4
    cfg.OUTPUT_DIR = out_dir
    cfg.LOG_PERIOD = 1
    cfg.finalize()
    return cfg


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("csts_data")
    make_synthetic_dataset(str(root))
    return str(root)


def test_dataset_getitem(synthetic_root, tmp_path):
    from csts_tpu.data.datasets import build_dataset

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    ds = build_dataset("ego4d_av_gaze_forecast", cfg, "train")
    assert len(ds) == NUM_CLIPS
    sample = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert sample["video"].shape == (8, CROP, CROP, 3)
    assert sample["audio"].shape == (8, 32, 32, 1)
    assert sample["labels"].shape == (8, 3)
    assert sample["labels_hm"].shape == (8, CROP // 4, CROP // 4)
    np.testing.assert_allclose(sample["labels_hm"].sum(axis=(1, 2)), 1.0, atol=1e-5)
    # forecast labels must come from the future: all label indices > all observed
    assert sample["meta"]["labels_index"].min() >= 0
    # test split: deterministic windows
    ds_test = build_dataset("ego4d_av_gaze_forecast", cfg, "test")
    s1 = ds_test.__getitem__(1, rng=np.random.default_rng(2))
    s2 = ds_test.__getitem__(1, rng=np.random.default_rng(3))
    np.testing.assert_array_equal(s1["video"], s2["video"])
    np.testing.assert_array_equal(s1["meta"]["labels_index"], np.linspace(86, 149, 8).astype(int) + 1 * 5 * FPS)


def test_uint8_transfer_path(synthetic_root, tmp_path):
    """DATA_LOADER.UINT8_TRANSFER ships uint8 video + fp16 audio; csts_apply's
    on-device /255+mean/std equals the host tensor_normalize path exactly in fp32
    (VERDICT r2 item 3 — 4× less h2d per clip)."""
    import jax
    import jax.numpy as jnp

    from csts_tpu.data import transform
    from csts_tpu.data.datasets import build_dataset
    from csts_tpu.models import csts as csts_lib

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    assert cfg.DATA_LOADER.UINT8_TRANSFER  # the default
    ds = build_dataset("ego4d_av_gaze_forecast", cfg, "train")
    sample = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert sample["video"].dtype == np.uint8
    assert sample["audio"].dtype == np.float16

    # device-side normalization == host tensor_normalize, bit-for-bit in fp32
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(0), spec)
    video_u8 = sample["video"][None]
    audio = sample["audio"][None].astype(np.float32)
    out_u8 = csts_lib.csts_apply(params, spec, jnp.asarray(video_u8), jnp.asarray(audio))
    video_f32 = transform.tensor_normalize(video_u8, cfg.DATA.MEAN, cfg.DATA.STD)
    out_f32 = csts_lib.csts_apply(params, spec, jnp.asarray(video_f32), jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_f32), atol=1e-6)

    # opting out restores the fp32 feed
    cfg.DATA_LOADER.UINT8_TRANSFER = False
    ds2 = build_dataset("ego4d_av_gaze_forecast", cfg, "train")
    s2 = ds2.__getitem__(0, rng=np.random.default_rng(1))
    assert s2["video"].dtype == np.float32
    assert s2["audio"].dtype == np.float32


def test_estimation_dataset(synthetic_root, tmp_path):
    from csts_tpu.data.datasets import build_dataset

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    ds = build_dataset("ego4d_av_gaze", cfg, "test")
    sample = ds.__getitem__(0, rng=np.random.default_rng(1))
    # estimation: labels at the observed frames themselves
    np.testing.assert_array_equal(sample["meta"]["labels_index"], sample["meta"]["index"])


def test_loader_batches(synthetic_root, tmp_path):
    from csts_tpu.data import loader as loader_lib
    from csts_tpu.data.datasets import build_dataset

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    ds = build_dataset("ego4d_av_gaze_forecast", cfg, "train")
    loader = loader_lib.GazeLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=0)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["video"].shape == (4, 8, CROP, CROP, 3)
    # epoch seeding: same epoch -> same order/augments; different epoch -> different
    again = list(loader)[0]
    np.testing.assert_array_equal(batches[0]["video"], again["video"])
    loader.set_epoch(1)
    other = list(loader)[0]
    assert not np.array_equal(batches[0]["video"], other["video"])


def test_loader_mid_epoch_skip(synthetic_root, tmp_path):
    """set_epoch(e, start_iter=k) reproduces the tail of the uninterrupted
    epoch bit-for-bit: shuffle is (seed, epoch)-keyed and per-sample RNG is
    absolute-position-keyed, so skipping changes nothing downstream — the
    contract mid-epoch preemption resume relies on."""
    from csts_tpu.data import loader as loader_lib
    from csts_tpu.data.datasets import build_dataset

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    ds = build_dataset("ego4d_av_gaze_forecast", cfg, "train")
    loader = loader_lib.GazeLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=0)
    loader.set_epoch(0)
    full = list(loader)
    assert len(full) == 2
    loader.set_epoch(0, start_iter=1)
    tail = list(loader)
    assert len(tail) == 1
    for k in ("video", "audio", "labels", "labels_hm", "index"):
        np.testing.assert_array_equal(full[1][k], tail[0][k])


@pytest.mark.slow
def test_mid_epoch_preemption_resume_matches_uninterrupted(synthetic_root, tmp_path):
    """SIGTERM mid-epoch (injected deterministically) → iter-tagged checkpoint →
    auto-resume continues the same epoch at the same iteration with the same
    data order and RNG streams; the final weights are bit-identical to an
    uninterrupted run. Beyond the reference: its preemption story restarts the
    epoch (train_avgaze_net.py has no signal handling at all)."""
    import jax

    from csts_tpu.train import trainer
    from csts_tpu.utils import checkpoint as cu

    def cfg_for(out):
        cfg = make_e2e_cfg(synthetic_root, out)
        cfg.TRAIN.BATCH_SIZE = 2  # 2 iters/epoch over the 4 synthetic clips
        cfg.TEST.BATCH_SIZE = 2
        cfg.NUM_DEVICES = 2
        cfg.TRAIN.EVAL_PERIOD = 10  # keep the drill to the train path
        cfg.finalize()
        return cfg

    out_a = str(tmp_path / "uninterrupted")
    os.makedirs(out_a)
    trainer.train(cfg_for(out_a))

    out_b = str(tmp_path / "preempted")
    os.makedirs(out_b)
    cfg_b = cfg_for(out_b)
    trainer._PREEMPT_AFTER_ITERS = 1
    try:
        trainer.train(cfg_b)
    finally:
        trainer._PREEMPT_AFTER_ITERS = None
    last = cu.get_last_checkpoint(out_b)
    assert "_iter_" in last, last
    meta = cu.checkpoint_meta(last)
    assert meta["epoch"] == -1 and meta["iter"] == 1

    trainer.train(cfg_b)  # auto-resume: epoch 0 from iter 1, then epoch 1

    for epoch in (0, 1):
        a = np.load(cu.checkpoint_path(out_a, epoch))
        b = np.load(cu.checkpoint_path(out_b, epoch))
        assert a.files == b.files
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"epoch {epoch}: {k}")


def test_train_and_test_end_to_end(synthetic_root, tmp_path):
    from csts_tpu.eval.tester import test as run_test
    from csts_tpu.train.trainer import train as run_train
    from csts_tpu.utils import checkpoint as cu

    out = str(tmp_path / "out")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    run_train(cfg)
    # checkpoints written each epoch
    assert cu.has_checkpoint(out)
    last = cu.get_last_checkpoint(out)
    assert "00002" in last

    # memory observability: every train_iter record carries device_mem, epoch
    # records add RAM (the reference's gpu_mem/RAM json_stats fields)
    with open(os.path.join(out, "stdout.log")) as f:
        log_text = f.read()
    iter_records = [
        json.loads(line.split("json_stats: ", 1)[1])
        for line in log_text.splitlines()
        if "json_stats: " in line and '"train_iter"' in line
    ]
    assert iter_records and all("device_mem" in r for r in iter_records)
    epoch_records = [
        json.loads(line.split("json_stats: ", 1)[1])
        for line in log_text.splitlines()
        if "json_stats: " in line and '"train_epoch"' in line
    ]
    assert epoch_records and all("RAM" in r for r in epoch_records)

    cfg.TEST.SAVE_RESULTS_PATH = "results.npz"
    # batch 3 over 4 clips: the loader wrap-pads the final batch to [3, 0, 1],
    # so rows 0/1 recur ACROSS batches — the cross-batch dedup path runs
    cfg.TEST.BATCH_SIZE = 3
    stats = run_test(cfg)
    assert stats["_type"] == "test_final"
    for k in ("f1", "recall", "precision", "auc", "threshold"):
        assert np.isfinite(stats[k]), stats
    assert 0.0 <= stats["auc"] <= 1.0

    # TEST.SAVE_RESULTS_PATH: one row per dataset row, deduped and index-sorted
    res = np.load(os.path.join(out, "results.npz"))
    assert list(res["index"]) == list(range(NUM_CLIPS))
    assert res["pred_xy"].shape[0] == NUM_CLIPS and res["pred_xy"].shape[-1] == 2
    assert res["pred_xy"].shape == res["label_xy"].shape
    assert res["gaze_type"].shape == res["pred_xy"].shape[:2]
    assert res["pred_xy"].min() >= 0.0 and res["pred_xy"].max() <= 1.0

    # batch 8 > dataset: ONE batch [0..3, 0..3] — duplicates land WITHIN the
    # batch; also a suffix-less path in a not-yet-existing subdirectory
    # (normalized to .npz, directory created up front)
    cfg.TEST.BATCH_SIZE = 8
    cfg.TEST.SAVE_RESULTS_PATH = "resdir/results_wide"
    run_test(cfg)
    res2 = np.load(os.path.join(out, "resdir", "results_wide.npz"))
    assert list(res2["index"]) == list(range(NUM_CLIPS))
    np.testing.assert_allclose(res2["label_xy"], res["label_xy"])


def test_two_view_test_pipeline(synthetic_root, tmp_path):
    """NUM_ENSEMBLE_VIEWS=2: dataset expands views, tester ensembles per clip."""
    from csts_tpu.data.datasets import build_dataset
    from csts_tpu.eval.tester import test as run_test

    out = str(tmp_path / "out2v")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    cfg.TEST.DATASET = "ego4d_av_gaze"
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TRAIN.ENABLE = False

    ds = build_dataset("ego4d_av_gaze", cfg, "test")
    assert len(ds) == NUM_CLIPS * 2
    # view 0 and view 1 of clip 0 are temporally distinct deterministic windows
    s0 = ds.__getitem__(0, rng=np.random.default_rng(0))
    s1 = ds.__getitem__(1, rng=np.random.default_rng(0))
    assert not np.array_equal(s0["meta"]["index"], s1["meta"]["index"])

    stats = run_test(cfg)
    assert stats["_type"] == "test_final"
    for k in ("f1", "recall", "precision", "auc"):
        assert np.isfinite(stats[k]), stats


@pytest.mark.slow  # heavy compile; surface also covered by fast-lane tests
def test_trainer_profile_capture(synthetic_root, tmp_path):
    """TRAIN.PROFILE_NUM_ITERS: the trainer captures a jax.profiler device
    trace of the requested iteration window to OUTPUT_DIR/profile."""
    from csts_tpu.train.trainer import train as run_train

    out = str(tmp_path / "prof")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAIN.PROFILE_START_ITER = 0
    cfg.TRAIN.PROFILE_NUM_ITERS = 1
    run_train(cfg)
    prof_dir = os.path.join(out, "profile")
    traces = [
        os.path.join(r, f)
        for r, _, fs in os.walk(prof_dir) for f in fs if f.endswith(".xplane.pb")
    ]
    assert traces, f"no trace under {prof_dir}"
    assert os.path.getsize(traces[0]) > 0


@pytest.mark.slow
def test_fsdp_trainer_e2e(synthetic_root, tmp_path):
    """SOLVER.FSDP through the real trainer: params/moments shard over the data
    axis, the epoch trains to finite losses, and the npz checkpoint gathers the
    shards back to full host arrays."""
    from csts_tpu.train.trainer import train as run_train
    from csts_tpu.utils import checkpoint as cu

    out = str(tmp_path / "fsdp")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.FSDP = True
    run_train(cfg)
    assert cu.has_checkpoint(out)
    blob = np.load(cu.get_last_checkpoint(out))
    floats = [blob[k] for k in blob.files
              if np.issubdtype(blob[k].dtype, np.floating)]
    assert floats and all(np.all(np.isfinite(w)) for w in floats)


def test_auto_resume(synthetic_root, tmp_path):
    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import step as step_lib
    from csts_tpu.utils import checkpoint as cu
    import jax

    out = str(tmp_path / "resume")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    spec = csts_lib.build_spec(cfg)
    state, tx = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(0))
    host = jax.tree_util.tree_map(np.asarray, state)
    cu.save_checkpoint(out, host, epoch=0, cfg=cfg)
    restored, start_epoch, _ = cu.load_train_checkpoint(cfg, state)
    assert start_epoch == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params["classifier"]["w"]),
        np.asarray(host.params["classifier"]["w"]),
    )


@pytest.mark.slow
def test_orbax_trainer_resume(synthetic_root, tmp_path):
    """TRAIN.CHECKPOINT_BACKEND=orbax through the real trainer, keyed by global
    iteration (2 iters/epoch here): a mid-epoch preemption save lands on step
    epoch*spe+iter and rides the async sharding-aware path; resume continues
    that epoch at that iteration; boundary saves land on epoch multiples; and
    the tester restores params from an orbax-only run (no npz is ever
    written)."""
    from csts_tpu.eval.tester import test as run_test
    from csts_tpu.train import trainer
    from csts_tpu.utils import checkpoint as cu
    from csts_tpu.utils import orbax_ckpt

    out = str(tmp_path / "orbax_resume")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    cfg.TRAIN.CHECKPOINT_BACKEND = "orbax"
    cfg.TRAIN.BATCH_SIZE = 2  # 2 iters/epoch over the 4 synthetic clips
    cfg.TEST.BATCH_SIZE = 2
    cfg.NUM_DEVICES = 2
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAIN.EVAL_PERIOD = 10
    cfg.finalize()

    # preempt after iter 1 of epoch 0 -> orbax step 0*2+1 = 1, no npz written
    trainer._PREEMPT_AFTER_ITERS = 1
    try:
        trainer.train(cfg)
    finally:
        trainer._PREEMPT_AFTER_ITERS = None
    assert orbax_ckpt.has_checkpoint(out)
    assert not cu.has_checkpoint(out)
    ck = orbax_ckpt.OrbaxCheckpointer(out)
    assert ck.latest_step() == 1
    ck.close()

    trainer.train(cfg)  # resumes epoch 0 at iter 1 -> boundary save at step 2
    ck = orbax_ckpt.OrbaxCheckpointer(out)
    assert ck.latest_step() == 2
    ck.close()

    cfg.SOLVER.MAX_EPOCH = 2
    trainer.train(cfg)  # resumes at epoch 1 (divmod(2, 2)) -> step 4
    ck = orbax_ckpt.OrbaxCheckpointer(out)
    assert ck.latest_step() == 4
    ck.close()

    stats = run_test(cfg)  # tester restores from the orbax manager
    assert stats["_type"] == "test_final"
    assert np.isfinite(stats["f1"])


def test_full_frame_sliding_window(synthetic_root, tmp_path, monkeypatch):
    from csts_tpu.data import datasets as datasets_lib, video as video_lib
    from csts_tpu.data.datasets import build_dataset

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    cfg.TEST.FULL_FRAME_TEST = True
    # construction must probe frame counts from npy/meta headers, never a decoder
    opens = []
    real_open = video_lib.open_clip
    monkeypatch.setattr(
        datasets_lib.video, "open_clip",
        lambda *a, **k: opens.append(a) or real_open(*a, **k),
    )
    ds = build_dataset("ego4d_av_gaze", cfg, "test")
    assert opens == [], "sliding-window construction opened a decoder container"
    monkeypatch.undo()
    # windows tile the clip: every frame of every clip appears in exactly one window
    per_clip = [idx for (p, idx) in ds._full_frame_inputs if p == ds._full_frame_inputs[0][0]]
    covered = sorted(int(i) for idx in per_clip for i in idx)
    # full coverage (the tail windows clamp to the last frame, so duplicates only there)
    assert set(covered) == set(range(FRAMES_PER_CLIP))
    sample = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert sample["video"].shape == (8, CROP, CROP, 3)
    stride = cfg.DATA.SAMPLING_RATE + 1
    np.testing.assert_array_equal(
        sample["meta"]["index"],
        np.minimum(np.arange(8) * stride, FRAMES_PER_CLIP - 1),
    )


def test_tester_tensor_parallel(synthetic_root, tmp_path):
    """PARALLEL.MODEL=2 through the real tester: params shard over the model
    axis (Megatron rules), metrics match the data-parallel run."""
    from csts_tpu.eval.tester import test as run_test

    out = str(tmp_path / "tp_eval")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    cfg.TRAIN.ENABLE = False
    cfg.NUM_DEVICES = 8
    stats_dp = run_test(cfg)
    cfg.PARALLEL.MODEL = 2
    stats_tp = run_test(cfg)
    for k in ("f1", "recall", "precision", "auc"):
        assert abs(stats_tp[k] - stats_dp[k]) < 1e-3, (k, stats_dp[k], stats_tp[k])


def test_visualization_runner(synthetic_root, tmp_path):
    """run_visualization: test clips → per-frame pred/label overlays (+ fusion
    attention maps) on disk — the workflow the reference ships commented out
    (test_avgaze_net.py:73-82)."""
    from csts_tpu.eval.visualize import run_visualization

    out = str(tmp_path / "visout")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    vis_dir = run_visualization(cfg, num_clips=2, attention=True)
    clip0 = os.path.join(vis_dir, "clip0000")
    frames = [f for f in os.listdir(clip0) if f.startswith("clip_f")]
    assert len(frames) == 8, sorted(os.listdir(clip0))
    assert os.listdir(os.path.join(clip0, "spatial_attn"))
    assert os.listdir(os.path.join(clip0, "temporal_attn"))
    assert os.path.isdir(os.path.join(vis_dir, "clip0001"))


def test_serving_predictor(synthetic_root, tmp_path):
    from csts_tpu.serving import GazePredictor

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    predictor = GazePredictor.from_checkpoint(cfg, None, batch_sizes=(2,))
    rng = np.random.default_rng(0)
    video = rng.standard_normal((1, 8, CROP, CROP, 3)).astype(np.float32)
    audio = rng.standard_normal((1, 8, 32, 32, 1)).astype(np.float32)
    out = predictor.predict(video, audio)
    assert out["heatmaps"].shape == (1, 8, CROP // 4, CROP // 4)
    np.testing.assert_allclose(out["heatmaps"].reshape(1, 8, -1).sum(-1), 1.0, atol=1e-4)
    assert out["gaze_xy"].shape == (1, 8, 2)
    assert (out["gaze_xy"] >= 0).all() and (out["gaze_xy"] <= 1).all()
    # raw uint8 preprocessing path
    frames_u8 = rng.integers(0, 255, (8, 40, 56, 3), dtype=np.uint8)
    prepped = predictor.preprocess_frames(frames_u8)
    assert prepped.shape == (8, CROP, CROP, 3)


def test_serving_mesh_sharded(synthetic_root, tmp_path):
    """mesh= GazePredictor: batch shards over the 8-device data axis, params
    replicate, and the SPMD forward matches the single-device predictor."""
    from csts_tpu.parallel import mesh as mesh_lib
    from csts_tpu.serving import GazePredictor

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    single = GazePredictor.from_checkpoint(cfg, None, batch_sizes=(8,))
    mesh = mesh_lib.make_mesh(8)
    sharded = GazePredictor(cfg, single.params, batch_sizes=(8,), mesh=mesh)

    rng = np.random.default_rng(3)
    video = rng.standard_normal((5, 8, CROP, CROP, 3)).astype(np.float32)
    audio = rng.standard_normal((5, 8, 32, 32, 1)).astype(np.float32)
    a = single.predict(video, audio)
    b = sharded.predict(video, audio)
    np.testing.assert_allclose(b["heatmaps"], a["heatmaps"], atol=1e-6)

    with pytest.raises(AssertionError):
        GazePredictor(cfg, single.params, batch_sizes=(2,), mesh=mesh)


def test_serving_export_roundtrip(synthetic_root, tmp_path):
    """export_compiled → from_exported: the deserialized StableHLO program must
    reproduce the live predictor bit-for-bit (same composite math), and the
    loader must not touch model/config code (serving.py from_exported)."""
    from csts_tpu.serving import GazePredictor

    cfg = make_e2e_cfg(synthetic_root, str(tmp_path))
    predictor = GazePredictor.from_checkpoint(cfg, None, batch_sizes=(2,))
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 8, CROP, CROP, 3)).astype(np.float32)
    audio = rng.standard_normal((2, 8, 32, 32, 1)).astype(np.float32)
    live = predictor.predict(video, audio)

    art = str(tmp_path / "exported")
    # the deployment artifact lowers for BOTH platforms; this host runs the cpu one
    predictor.export_compiled(art, platforms=("tpu", "cpu"))
    assert os.path.exists(os.path.join(art, "forward_b2.stablehlo"))
    assert os.path.exists(os.path.join(art, "params.npz"))

    reloaded = GazePredictor.from_exported(art)
    out = reloaded.predict(video, audio)
    np.testing.assert_allclose(out["heatmaps"], live["heatmaps"], atol=1e-6)
    np.testing.assert_array_equal(out["gaze_xy"], live["gaze_xy"])
    # uint8 preprocessing works from meta constants alone (no cfg on the host)
    assert reloaded.cfg is None
    frames_u8 = rng.integers(0, 255, (8, 40, 56, 3), dtype=np.uint8)
    assert reloaded.preprocess_frames(frames_u8).shape == (8, CROP, CROP, 3)


def make_aria_synthetic(root, n_clips=2):
    """Aria layout: clips/<vid>/<clip>_t{s}_t{e-1}.mp4, 100 frames @20fps, audio under
    clips.audio_24kHz_stft, labels <vid>.csv with 2-column offset."""
    rng = np.random.default_rng(1)
    prefix = os.path.join(root, "clips")
    vid = "aria01"
    os.makedirs(os.path.join(prefix, vid))
    os.makedirs(os.path.join(root, "clips.audio_24kHz_stft", vid))
    os.makedirs(os.path.join(root, "gaze_frame_label"), exist_ok=True)
    os.makedirs(os.path.join(root, "splits"), exist_ok=True)

    rel_paths = []
    for c in range(n_clips):
        t0 = c * 2
        clip = f"clip{c:02d}_t{t0}_t{t0 + 4}.mp4"
        rel = f"{vid}/{clip}"
        rel_paths.append(rel)
        frames = rng.integers(0, 255, (100, 40, 56, 3), dtype=np.uint8)
        np.save(os.path.join(prefix, rel + ".frames.npy"), frames)
        with open(os.path.join(prefix, rel + ".meta.json"), "w") as f:
            json.dump({"fps": 20, "duration_pts": 100 * 512}, f)
        np.save(
            os.path.join(root, "clips.audio_24kHz_stft", vid, clip.replace(".mp4", ".npy")),
            rng.standard_normal((256, 1000)).astype(np.float32),
        )
    with open(os.path.join(root, "gaze_frame_label", f"{vid}.csv"), "w") as f:
        f.write("frame,ts,x,y,type\n")  # aria label files have 2 leading columns
        for i in range(300):
            f.write(f"{i},{i/20:.3f},{rng.uniform(0.3,0.7):.4f},{rng.uniform(0.3,0.7):.4f},0\n")
    for split in ("train_aria_gaze.csv", "test_aria_gaze.csv"):
        with open(os.path.join(root, "splits", split), "w") as f:
            f.write("\n".join(rel_paths) + "\n")


def test_aria_forecast_dataset(tmp_path):
    from csts_tpu.data.datasets import build_dataset

    root = str(tmp_path / "aria")
    os.makedirs(root)
    make_aria_synthetic(root)
    cfg = make_e2e_cfg(root, str(tmp_path / "out"))
    cfg.DATA.PATH_PREFIX = os.path.join(root, "clips")
    cfg.DATA.PATH_TO_DATA_DIR = os.path.join(root, "splits")
    cfg.DATA.SAMPLING_RATE = 4
    cfg.DATA.TARGET_FPS = 20
    cfg.TEST.DATASET = "aria_av_gaze_forecast"

    ds = build_dataset("aria_av_gaze_forecast", cfg, "test")
    sample = ds.__getitem__(1, rng=np.random.default_rng(0))
    assert sample["video"].shape == (8, CROP, CROP, 3)
    # Aria protocol: observe 60/100, labels from frame 60 + SAMPLING_RATE (=64)
    # (aria_avgaze_forecast.py:227-230); clip 1 starts at t2 -> +40 global frames
    expected = np.linspace(64, 99, 8).astype(np.int64) + 2 * 20
    np.testing.assert_array_equal(sample["meta"]["labels_index"], expected)
    # observed window confined to the first 60 frames
    assert sample["meta"]["index"].max() - 2 * 20 <= 59


def test_dataset_retry_replaces_corrupt_clip(tmp_path):
    """The failure-recovery retry loop (reference ego4d_avgaze.py:213-231,
    SURVEY §5 row 3): a clip whose data is unreadable is retried, then — in
    train mode, after half the retries — replaced by a random other clip; in
    test mode it stays a hard error so eval never silently drops rows."""
    from csts_tpu.data.datasets import build_dataset

    root = str(tmp_path / "ds")
    os.makedirs(root)
    make_synthetic_dataset(root)
    cfg = make_e2e_cfg(root, str(tmp_path / "out"))

    ds = build_dataset("ego4d_av_gaze_forecast", cfg, "train")
    corrupt = ds._path_to_videos[0] + ".frames.npy"
    os.remove(corrupt)

    sample = ds.__getitem__(0, rng=np.random.default_rng(3))
    assert sample["video"].shape == (8, CROP, CROP, 3)  # replaced, not crashed
    assert sample["index"] != 0  # the returned row is the replacement clip

    ds_test = build_dataset("ego4d_av_gaze_forecast", cfg, "test")
    with pytest.raises(RuntimeError, match="Failed to fetch"):
        ds_test.__getitem__(0, rng=np.random.default_rng(3))


def test_aria_end_to_end_train_and_test(tmp_path):
    """Full train + eval loop on the ARIA forecast variant (the e2e lane is
    otherwise Ego4D-only): 20 fps clips under `clips/`, audio under the
    `clips.audio_24kHz_stft` rule, 2-column label offset, observe-60 +
    SAMPLING_RATE label gap, and the Aria adaptive-threshold grid
    (linspace(0, 0.02, 21), reference metrics.py:39) — all through the real
    trainer and tester."""
    from csts_tpu.eval.tester import test as run_test
    from csts_tpu.train import trainer

    root = str(tmp_path / "aria")
    os.makedirs(root)
    make_aria_synthetic(root, n_clips=4)
    out = str(tmp_path / "out")
    cfg = make_e2e_cfg(root, out)
    cfg.DATA.PATH_PREFIX = os.path.join(root, "clips")
    cfg.DATA.PATH_TO_DATA_DIR = os.path.join(root, "splits")
    cfg.DATA.SAMPLING_RATE = 4
    cfg.DATA.TARGET_FPS = 20
    cfg.TRAIN.DATASET = "aria_av_gaze_forecast"
    cfg.TEST.DATASET = "aria_av_gaze_forecast"
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.finalize()

    trainer.train(cfg)
    stats = run_test(cfg)
    assert stats["_type"] == "test_final"
    assert np.isfinite(stats["f1"]) and 0.0 <= stats["auc"] <= 1.0
    # the Aria threshold grid tops out at 0.02 (Ego4D's starts at 0.01)
    assert 0.0 <= stats["threshold"] <= 0.02


def test_run_net_cli(synthetic_root, tmp_path):
    """tools/run_net.py end to end: YAML + KEY VALUE overrides -> train 1 epoch +
    test, via subprocess (the reference's CLI contract, run_net.py:11-25)."""
    import subprocess
    import sys

    out_dir = str(tmp_path / "cli_out")
    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(
        f"""
TRAIN:
  ENABLE: True
  DATASET: ego4d_av_gaze_forecast
  BATCH_SIZE: 4
  EVAL_PERIOD: 5
  CHECKPOINT_PERIOD: 1
DATA:
  PATH_PREFIX: '{synthetic_root}/clips.gaze'
  PATH_TO_DATA_DIR: '{synthetic_root}/splits'
  TRAIN_CROP_SIZE: 32
  TEST_CROP_SIZE: 32
  TRAIN_JITTER_SCALES: [36, 40]
  GAUSSIAN_KERNEL: 5
  DECODING_BACKEND: npy
  AUDIO_FREQ_BINS: 32
  AUDIO_WINDOW: 32
MVIT:
  PATCH_PADDING: [1, 3, 3]
  CLS_EMBED_ON: False
  SEP_POS_EMBED: True
  DEPTH: 4
  EMBED_DIM: 16
  DIM_MUL: [[1, 2.0], [2, 2.0], [3, 2.0]]
  HEAD_MUL: [[1, 2.0], [2, 2.0], [3, 2.0]]
  POOL_KVQ_KERNEL: [3, 3, 3]
  POOL_KV_STRIDE_ADAPTIVE: [1, 8, 8]
  POOL_Q_STRIDE: [[1, 1, 2, 2], [2, 1, 2, 2], [3, 1, 2, 2]]
MODEL:
  LOSS_FUNC: kldiv+egonce
  LOSS_ALPHA: 0.05
SOLVER:
  BASE_LR: 0.001
  COSINE_END_LR: 0.00001
  MAX_EPOCH: 1
  OPTIMIZING_METHOD: adamw
  CLIP_GRAD_L2NORM: 1.0
  ZERO_WD_1D_PARAM: True
TEST:
  ENABLE: True
  DATASET: ego4d_av_gaze_forecast
  BATCH_SIZE: 4
  NUM_ENSEMBLE_VIEWS: 1
  NUM_SPATIAL_CROPS: 1
DATA_LOADER:
  NUM_WORKERS: 2
NUM_DEVICES: 1
OUTPUT_DIR: {out_dir}
LOG_PERIOD: 1
"""
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, "tools/run_net.py", "--cfg", str(cfg_yaml),
         "RNG_SEED", "7"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    log = res.stdout + res.stderr
    assert "test_final" in log, log[-2000:]
    from csts_tpu.utils import checkpoint as cu

    assert cu.has_checkpoint(out_dir)


@pytest.mark.slow
def test_train_and_test_under_parallel_axes(synthetic_root, tmp_path):
    """Trainer + tester end-to-end under cfg.PARALLEL dp2×pp2×tp2 on the
    8-device mesh: depth-6 so the encoder's identity run actually pipelines
    (parallel/pipeline.py), Megatron tp on the matmuls, dp for the batch —
    the full mesh_from_cfg path the CLI exposes (no reference counterpart;
    its runtime is DDP-only, SURVEY §2.2)."""
    from csts_tpu.eval.tester import test as run_test
    from csts_tpu.train.trainer import train as run_train
    from csts_tpu.utils import checkpoint as cu

    out = str(tmp_path / "out_pp")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    cfg.MVIT.DEPTH = 6  # blocks 4-5 form the uniform pipelined run
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.NUM_DEVICES = 8
    cfg.PARALLEL.PIPE = 2
    cfg.PARALLEL.MODEL = 2
    cfg.finalize()
    run_train(cfg)
    assert cu.has_checkpoint(out)

    stats = run_test(cfg)
    assert stats["_type"] == "test_final"
    for k in ("f1", "recall", "precision", "auc", "threshold"):
        assert np.isfinite(stats[k]), stats


@pytest.mark.slow
def test_eval_loop_metric_parity_vs_oracle(synthetic_root, tmp_path):
    """The COMPOSED eval loop vs the reference's test-loop protocol.

    Logits (golden-256) and the metric function (unit) are parity-tested
    separately; this closes the remaining seam — the loop composition. Our leg
    is the full ``eval/tester.py`` driver (padded eval batches, wrap-pad
    dedup, streaming finalize). The oracle leg replays the reference's
    ``perform_test`` protocol (tools/test_avgaze_net.py:21-93) on the same
    deterministic loader and the same jax forward: per-batch torch
    frame_softmax -> min-max rescale -> TestGazeMeter append ->
    concat-everything global adaptive_f1 finalize (slowfast/utils/
    meters.py:86-146). Final f1/recall/precision/threshold must agree to 1e-6
    (AUC is ours alone — the reference never computes it)."""
    import torch

    from reference_oracle import install_stubs

    install_stubs()
    from slowfast.utils import metrics as ref_metrics
    from slowfast.utils.meters import TestGazeMeter as RefTestGazeMeter
    from slowfast.utils.utils import frame_softmax as ref_frame_softmax

    import jax

    from csts_tpu.data import loader as loader_lib
    from csts_tpu.eval.tester import test as run_test
    from csts_tpu.models import csts as csts_lib

    out = str(tmp_path / "oracle_loop")
    os.makedirs(out)
    cfg = make_e2e_cfg(synthetic_root, out)
    cfg.TRAIN.ENABLE = False
    cfg.TEST.BATCH_SIZE = 3  # 4 clips -> final batch wrap-pads [3, 0, 1]

    # our leg: the real driver end-to-end (no checkpoint -> jax-init weights)
    stats_ours = run_test(cfg)

    # oracle leg: identical weights + loader; reference meter protocol
    spec = csts_lib.build_spec(cfg)
    params = csts_lib.csts_init(jax.random.PRNGKey(cfg.RNG_SEED), spec)
    forward = jax.jit(
        lambda p, v, a: csts_lib.csts_apply(p, spec, v, a, deterministic=True)
    )
    meter = RefTestGazeMeter(
        num_videos=NUM_CLIPS, num_clips=1, num_cls=2, overall_iters=2,
        dataset=cfg.TEST.DATASET,
    )
    seen = set()
    meter.iter_tic()
    for batch in loader_lib.construct_loader(cfg, "test"):
        # the reference torch loader emits a SHORT final batch instead of our
        # wrap-pad — drop the repeated rows to present it the same stream
        fresh = []
        for i in batch["index"]:
            fresh.append(int(i) not in seen)
            seen.add(int(i))
        fresh = np.asarray(fresh, bool)
        logits = np.asarray(forward(params, batch["video"], batch["audio"]))
        # ours: (B, T, H, W, 1) -> reference layout (B, C=1, T, H, W)
        preds_t = torch.from_numpy(
            np.transpose(logits[fresh], (0, 4, 1, 2, 3)).astype(np.float32)
        )
        preds_t = ref_frame_softmax(preds_t, temperature=2)
        flat = preds_t.view(preds_t.shape[:-2] + (-1,))
        flat = (flat - flat.min(dim=-1, keepdim=True)[0]) / (
            flat.max(dim=-1, keepdim=True)[0]
            - flat.min(dim=-1, keepdim=True)[0] + 1e-6
        )
        preds_rescale = flat.view(preds_t.shape)
        labels_hm_t = torch.from_numpy(batch["labels_hm"][fresh])
        labels_t = torch.from_numpy(batch["labels"][fresh])
        f1, recall, precision, _ = ref_metrics.adaptive_f1(
            preds_rescale, labels_hm_t, labels_t, dataset=cfg.TEST.DATASET
        )
        meter.iter_toc()
        meter.update_stats(
            f1, recall, precision,
            preds=preds_rescale, labels_hm=labels_hm_t, labels=labels_t,
        )
        meter.iter_tic()
    meter.finalize_metrics()

    assert seen == set(range(NUM_CLIPS))
    for key in ("f1", "recall", "precision", "threshold"):
        ref_val = float(meter.stats[key])
        assert abs(stats_ours[key] - ref_val) < 1e-6, (
            key, stats_ours[key], ref_val)
    assert 0.0 <= stats_ours["auc"] <= 1.0


def test_merge_host_results_dedupes_across_stripes():
    """Multi-host TEST.SAVE_RESULTS_PATH: per-host stripes are object-gathered
    and merged keeping first occurrence per dataset row (each host's stripe
    wrap-pads independently, so rows recur across hosts)."""
    from csts_tpu.eval.tester import _merge_host_results

    host0 = {"index": [0, 2, 4], "pred_xy": ["a0", "a2", "a4"]}
    host1 = {"index": [1, 3, 1], "pred_xy": ["b1", "b3", "b1dup"]}
    host2 = {"index": [5, 0], "pred_xy": ["c5", "c0dup"]}
    merged = _merge_host_results([host0, host1, host2])
    assert merged["index"] == [0, 2, 4, 1, 3, 5]
    assert merged["pred_xy"] == ["a0", "a2", "a4", "b1", "b3", "c5"]


def test_loader_wrap_and_bounded_lookahead():
    """Two loader contracts: (a) wrap-padding fills a batch even when the pad
    exceeds the dataset size (np.resize cycling, not a short batch); (b) the
    fetch look-ahead is bounded — consuming one batch of a long epoch must not
    have decoded the whole epoch (the old implementation submitted every
    batch's futures up front)."""
    import threading
    import time

    from csts_tpu.data.loader import GazeLoader

    fetched = []
    lock = threading.Lock()

    class CountingDS:
        def __len__(self):
            return 64

        def __getitem__(self, i, rng=None):
            with lock:
                fetched.append(i)
            return {"video": np.zeros((1,), np.float32), "audio": np.zeros((1,), np.float32),
                    "labels": np.zeros((1,), np.float32), "labels_hm": np.zeros((1,), np.float32),
                    "index": i}

    # (a) dataset of 3 rows, batch 8: pad of 5 > dataset size -> full cyclic batch
    class TinyDS(CountingDS):
        def __len__(self):
            return 3

    batch = next(iter(GazeLoader(TinyDS(), batch_size=8, shuffle=False, num_workers=2)))
    assert batch["index"].shape == (8,)
    np.testing.assert_array_equal(batch["index"], [0, 1, 2, 0, 1, 2, 0, 1])

    # (b) 32 batches of 2; consume one, give workers a beat, assert the
    # look-ahead stayed near the window instead of racing to all 64 samples
    with lock:
        fetched.clear()
    loader = GazeLoader(CountingDS(), batch_size=2, shuffle=False, num_workers=2)
    it = iter(loader)
    next(it)
    time.sleep(0.3)
    with lock:
        n_fetched = len(fetched)
    it.close()
    assert n_fetched <= 12, f"look-ahead fetched {n_fetched} samples — unbounded?"
