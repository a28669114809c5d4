"""Parity tests for losses, metrics, and LR schedules against the reference code."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from csts_tpu.config import get_cfg
from csts_tpu.eval import metrics as m_tpu
from csts_tpu.train import losses as l_tpu
from csts_tpu.train import lr_policy as lr_tpu

from reference_oracle import install_stubs

install_stubs()

from slowfast.models import losses as l_ref  # noqa: E402
from slowfast.utils import metrics as m_ref  # noqa: E402
from slowfast.utils import lr_policy as lr_ref  # noqa: E402
from slowfast.utils.utils import frame_softmax as fs_ref, sim_matrix as sm_ref  # noqa: E402

# the reference EgoNCE hard-codes .cuda() (losses.py:158); run it on CPU
torch.Tensor.cuda = lambda self, *a, **k: self


def test_frame_softmax_parity(rng):
    logits = rng.standard_normal((2, 1, 8, 16, 16)).astype(np.float32)
    ref = fs_ref(torch.from_numpy(logits), temperature=2).numpy()
    # ours: channels-last (B, T, H, W, 1)
    ours = np.asarray(
        l_tpu.frame_softmax(jnp.asarray(logits.transpose(0, 2, 3, 4, 1)), temperature=2)
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_sim_matrix_parity(rng):
    a = rng.standard_normal((6, 32)).astype(np.float32)
    b = rng.standard_normal((6, 32)).astype(np.float32)
    ref = sm_ref(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    ours = np.asarray(l_tpu.sim_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_kldiv_parity(rng):
    logits = rng.standard_normal((2, 1, 8, 16, 16)).astype(np.float32)
    target = rng.uniform(0, 1, (2, 8, 16, 16)).astype(np.float32)
    target /= target.sum(axis=(2, 3), keepdims=True)

    pred_ref = fs_ref(torch.from_numpy(logits), temperature=2)
    ref = l_ref.KLDiv()(pred_ref, torch.from_numpy(target)).item()

    pred_ours = l_tpu.frame_softmax(jnp.asarray(logits.transpose(0, 2, 3, 4, 1)), 2.0)
    ours = float(l_tpu.kldiv_loss(pred_ours, jnp.asarray(target)))
    assert abs(ours - ref) < 1e-5


def test_kldiv_uniform_prior_parity(rng):
    logits = rng.standard_normal((2, 1, 8, 16, 16)).astype(np.float32)
    pred_ref = fs_ref(torch.from_numpy(logits), temperature=2)
    ref = l_ref.KLDiv()(pred_ref).item()
    pred_ours = l_tpu.frame_softmax(jnp.asarray(logits.transpose(0, 2, 3, 4, 1)), 2.0)
    ours = float(l_tpu.kldiv_loss(pred_ours))
    assert abs(ours - ref) < 1e-5


def test_egonce_parity(rng):
    sim = rng.uniform(-1, 1, (8, 8)).astype(np.float32)
    ref = l_ref.EgoNCE()(torch.from_numpy(sim)).item()
    ours = float(l_tpu.egonce_loss(jnp.asarray(sim)))
    assert abs(ours - ref) < 1e-5


def test_floss_parity(rng):
    pred = rng.uniform(0.01, 0.99, (2, 8, 16, 16)).astype(np.float32)
    target = np.zeros((2, 8, 16, 16), np.float32)
    # single-peak Gaussian-ish labels
    for b in range(2):
        for t in range(8):
            y, x = rng.integers(2, 14), rng.integers(2, 14)
            target[b, t, y, x] = 1.0
    ref = l_ref.FLoss()(torch.from_numpy(pred[:, None]), torch.from_numpy(target)).item()
    ours = float(l_tpu.floss(jnp.asarray(pred), jnp.asarray(target)))
    assert abs(ours - ref) < 1e-4


@pytest.mark.parametrize("dataset", ["ego4d_av_gaze_forecast", "aria_av_gaze_forecast", "ego4d_av_gaze"])
def test_adaptive_f1_parity(rng, dataset):
    b, t, h, w = 4, 8, 16, 16
    preds = rng.uniform(0, 1, (b, t, h, w)).astype(np.float32)
    labels_hm = np.zeros((b, t, h, w), np.float32)
    labels = np.zeros((b, t, 3), np.float32)
    for i in range(b):
        for f in range(t):
            y, x = rng.integers(0, h), rng.integers(0, w)
            labels_hm[i, f, max(0, y - 1) : y + 2, max(0, x - 1) : x + 2] = 0.5
            labels[i, f, 2] = rng.integers(0, 2)  # mix fixation / saccade frames
    labels[0, 0, 2] = 0  # ensure at least one fixation frame

    ref = m_ref.adaptive_f1(
        torch.from_numpy(preds[:, None]),
        torch.from_numpy(labels_hm),
        torch.from_numpy(labels),
        dataset=dataset,
    )
    ours = m_tpu.adaptive_f1(jnp.asarray(preds), jnp.asarray(labels_hm), jnp.asarray(labels), dataset)
    for r, o in zip(ref, ours):
        assert abs(float(r) - float(o)) < 1e-5, (ref, ours)


def test_streaming_f1_equals_global(rng):
    """Streaming accumulation over batches == one global adaptive_f1 pass."""
    dataset = "ego4d_av_gaze_forecast"
    b, t, h, w = 8, 8, 16, 16
    preds = rng.uniform(0, 1, (b, t, h, w)).astype(np.float32)
    labels_hm = (rng.uniform(0, 1, (b, t, h, w)) > 0.9).astype(np.float32) * 0.5
    labels = np.zeros((b, t, 3), np.float32)
    labels[:, :, 2] = rng.integers(0, 2, (b, t))
    labels[0, 0, 2] = 0

    stream = m_tpu.StreamingF1(dataset)
    for i in range(0, b, 2):
        stream.update(preds[i : i + 2], labels_hm[i : i + 2], labels[i : i + 2])
    result = stream.finalize()

    glob = m_tpu.adaptive_f1(jnp.asarray(preds), jnp.asarray(labels_hm), jnp.asarray(labels), dataset)
    assert abs(result["f1"] - glob[0]) < 1e-5
    assert abs(result["recall"] - glob[1]) < 1e-5
    assert abs(result["precision"] - glob[2]) < 1e-5
    assert 0.0 <= result["auc"] <= 1.0


def test_test_meter_multiview_ensemble(rng):
    """TestGazeMeter(num_views=2): views of one clip are averaged before the global
    F1 — across batch boundaries, out of order, and with wrap-padded duplicates."""
    from csts_tpu.train.meters import TestGazeMeter

    dataset = "ego4d_av_gaze"
    n_clips, v, t, h, w = 4, 2, 4, 16, 16
    b = n_clips * v
    preds = rng.uniform(0, 1, (b, t, h, w)).astype(np.float32)
    labels_hm = (rng.uniform(0, 1, (n_clips, t, h, w)) > 0.9).astype(np.float32) * 0.5
    labels = np.zeros((n_clips, t, 3), np.float32)
    labels[:, :, 2] = rng.integers(0, 2, (n_clips, t))
    # views share labels (spatial-crop semantics)
    labels_hm_v = np.repeat(labels_hm, v, axis=0)
    labels_v = np.repeat(labels, v, axis=0)

    # expected: mean over views, first view's labels
    avg = preds.reshape(n_clips, v, t, h, w).mean(axis=1)
    expect = m_tpu.StreamingF1(dataset)
    expect.update(avg, labels_hm, labels)
    expected = expect.finalize()

    meter = TestGazeMeter(dataset, num_views=v)
    # shuffled sample order + a duplicate (wrap-padding) of sample 0
    order = list(rng.permutation(b)) + [0]
    for lo in range(0, len(order), 3):  # batch size 3: groups straddle batches
        idx = np.asarray(order[lo : lo + 3])
        meter.update_stats(preds[idx], labels_hm_v[idx], labels_v[idx], indices=idx)
    result = meter.finalize_metrics()

    for k in ("f1", "recall", "precision", "auc"):
        assert abs(result[k] - expected[k]) < 1e-5, (k, result, expected)

    # single-view mode (indices given) must equal the plain stream
    plain = m_tpu.StreamingF1(dataset)
    plain.update(preds, labels_hm_v, labels_v)
    m1 = TestGazeMeter(dataset, num_views=1)
    m1.update_stats(preds, labels_hm_v, labels_v, indices=np.arange(b))
    r1 = m1.finalize_metrics()
    p1 = plain.finalize()
    assert abs(r1["f1"] - p1["f1"]) < 1e-7

    # wrap-padded duplicates in single-view mode must NOT bias the stream:
    # feeding [all samples] then [samples 0..2 again] == feeding each once
    m_dup = TestGazeMeter(dataset, num_views=1)
    m_dup.update_stats(preds, labels_hm_v, labels_v, indices=np.arange(b))
    m_dup.update_stats(
        preds[:3], labels_hm_v[:3], labels_v[:3], indices=np.arange(3)
    )
    r_dup = m_dup.finalize_metrics()
    for k in ("f1", "recall", "precision", "auc"):
        assert abs(r_dup[k] - p1[k]) < 1e-7, (k, r_dup, p1)


def test_auc_perfect_and_chance(rng):
    # peak exactly at the positives -> AUC 1; uniform prediction -> ~0.5
    b, t, h, w = 1, 2, 16, 16
    labels_hm = np.zeros((b, t, h, w), np.float32)
    labels_hm[0, :, 5, 5] = 1.0
    perfect = labels_hm + rng.uniform(0, 1e-4, labels_hm.shape).astype(np.float32)
    auc, valid = m_tpu.auc_per_frame(jnp.asarray(perfect), jnp.asarray(labels_hm))
    assert np.all(np.asarray(valid) == 1)
    assert np.all(np.asarray(auc) > 0.99)


def _ref_cfg_ns():
    class NS(dict):
        __getattr__ = dict.__getitem__

    cfg = NS()
    cfg["SOLVER"] = NS(
        BASE_LR=1e-4, COSINE_END_LR=1e-6, WARMUP_START_LR=1e-6, WARMUP_EPOCHS=2.0,
        COSINE_AFTER_WARMUP=True, MAX_EPOCH=15, LR_POLICY="cosine",
        STEPS=[], LRS=[],
    )
    return cfg


def test_cosine_lr_parity():
    ref_cfg = _ref_cfg_ns()
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.COSINE_END_LR = 1e-6
    cfg.SOLVER.WARMUP_START_LR = 1e-6
    cfg.SOLVER.WARMUP_EPOCHS = 2.0
    cfg.SOLVER.COSINE_AFTER_WARMUP = True
    cfg.SOLVER.MAX_EPOCH = 15
    cfg.SOLVER.LR_POLICY = "cosine"
    for epoch in np.linspace(0, 14.99, 37):
        ref = lr_ref.get_lr_at_epoch(ref_cfg, float(epoch))
        ours = float(lr_tpu.get_lr_at_epoch(cfg.SOLVER, float(epoch)))
        assert abs(ref - ours) < 1e-10, epoch


def test_meter_records_carry_memory_fields(monkeypatch):
    """Every meter record logs device memory; epoch/final records add host RAM
    (the reference stamps gpu_mem/RAM into its json_stats, misc.py:53-75)."""
    import re

    from csts_tpu.train import meters as meters_lib
    from csts_tpu.utils import misc

    used, total = misc.cpu_mem_usage()
    assert 0.0 < used <= total
    # CPU backend has no allocator stats -> the live-buffer fallback kicks in
    # (same path a relayed TPU transport takes when memory_stats() is None).
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from csts_tpu.parallel import mesh as mesh_lib

    keep = jnp.ones((1024, 1024), jnp.float32)  # 4 MB held live
    base = misc.device_mem_usage() * 1024**3
    assert base >= keep.nbytes
    # a REPLICATED array holds a full copy on device 0 — per-device accounting
    # must credit all of nbytes, not nbytes/num_devices
    mesh = mesh_lib.make_mesh()
    rep = jax.device_put(keep + 1, NamedSharding(mesh, P()))
    assert misc.device_mem_usage() * 1024**3 >= base + rep.nbytes
    del rep

    records = []
    monkeypatch.setattr(meters_lib, "log_json_stats", records.append)

    cfg = get_cfg()
    cfg.LOG_PERIOD = 1
    cfg.SOLVER.MAX_EPOCH = 1
    m = meters_lib.TrainGazeMeter(epoch_iters=1, cfg=cfg)
    m.iter_tic()
    m.data_toc()
    m.iter_toc()
    m.update_stats(0.5, 0.5, 0.5, 0.05, 1.0, 1e-4, 4)
    m.log_iter_stats(0, 0)
    m.log_epoch_stats(0)

    it, ep = records
    assert it["_type"] == "train_iter" and ep["_type"] == "train_epoch"
    assert re.fullmatch(r"\d+\.\d\dG", it["device_mem"])
    assert "RAM" not in it  # per-iter records stay lean, like the reference
    assert re.fullmatch(r"\d+\.\d\d/\d+\.\d\dG", ep["RAM"])

    records.clear()
    tm = meters_lib.TestGazeMeter("ego4d_av_gaze")
    preds = np.full((2, 2, 8, 8), 0.5, np.float32)
    labels_hm = np.zeros((2, 2, 8, 8), np.float32)
    labels_hm[:, :, 3, 3] = 0.5
    labels = np.zeros((2, 2, 3), np.float32)
    tm.update_stats(preds, labels_hm, labels)
    final = tm.finalize_metrics()
    assert re.fullmatch(r"\d+\.\d\dG", final["device_mem"])
    assert re.fullmatch(r"\d+\.\d\d/\d+\.\d\dG", final["RAM"])
