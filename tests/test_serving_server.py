"""Online-serving tests: micro-batching dispatcher + HTTP front.

The reference has no serving surface at all (SURVEY §1); these tests pin the
new one: request/response parity with direct GazePredictor calls, actual
coalescing of concurrent requests into one device batch, shape validation,
clean shutdown, and the npz-over-HTTP protocol end to end on loopback.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from csts_tpu.config import get_cfg
from csts_tpu.serving import GazePredictor
from csts_tpu.serving_server import GazeHTTPServer, MicroBatcher

CROP = 32
FRAMES = 8


def tiny_cfg():
    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = CROP
    cfg.DATA.TEST_CROP_SIZE = CROP
    cfg.DATA.NUM_FRAMES = FRAMES
    cfg.DATA.AUDIO_FREQ_BINS = CROP
    cfg.DATA.AUDIO_WINDOW = CROP
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MVIT.SEP_POS_EMBED = True
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.DIM_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [2, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 8, 8]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [2, 1, 2, 2], [3, 1, 2, 2]]
    return cfg


@pytest.fixture(scope="module")
def predictor():
    return GazePredictor.from_checkpoint(tiny_cfg(), None, batch_sizes=(4,))


def make_clip(rng):
    video = rng.standard_normal((FRAMES, CROP, CROP, 3)).astype(np.float32)
    audio = rng.standard_normal((FRAMES, CROP, CROP, 1)).astype(np.float32)
    return video, audio


def test_batcher_parity_and_coalescing(predictor):
    """Concurrent submits return each clip's own result, identical to a direct
    batched predict, and get coalesced into fewer device batches."""
    rng = np.random.default_rng(0)
    clips = [make_clip(rng) for _ in range(8)]
    direct = predictor.predict(
        np.stack([v for v, _ in clips]), np.stack([a for _, a in clips])
    )

    batcher = MicroBatcher(predictor, max_wait_ms=200.0)
    try:
        futs = [None] * len(clips)
        barrier = threading.Barrier(len(clips))

        def worker(i):
            barrier.wait()
            futs[i] = batcher.submit(*clips[i])

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(clips))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()

    for i, res in enumerate(results):
        np.testing.assert_allclose(res["heatmaps"], direct["heatmaps"][i], atol=1e-6)
        np.testing.assert_allclose(res["gaze_xy"], direct["gaze_xy"][i], atol=1e-6)

    st = batcher.stats()
    assert st["requests"] == 8 and st["clips"] == 8
    # 8 concurrent requests into bucket-4 batches: must coalesce (not 8 batches
    # of 1) — with the generous max_wait the dispatcher fills both batches
    assert st["batches"] <= 4
    assert st["mean_batch_occupancy"] >= 2.0
    assert st["latency_p50_ms"] > 0


def test_batcher_rejects_bad_shapes(predictor):
    rng = np.random.default_rng(1)
    batcher = MicroBatcher(predictor, max_wait_ms=1.0)
    try:
        good = batcher.submit(*make_clip(rng))
        assert good.result(timeout=120)["heatmaps"].shape == (FRAMES, CROP // 4, CROP // 4)
        # batched (5-D) payloads and mismatched clip shapes both fail fast,
        # without poisoning the service
        v, a = make_clip(rng)
        with pytest.raises(ValueError):
            batcher.submit(v[None], a[None]).result(timeout=5)
        with pytest.raises(ValueError):
            batcher.submit(v[:4], a[:4]).result(timeout=5)
        again = batcher.submit(v, a)
        assert np.isfinite(again.result(timeout=120)["heatmaps"]).all()
    finally:
        batcher.close()
    with pytest.raises(RuntimeError):
        batcher.submit(v, a)


def test_predictor_serves_ema_weights(tmp_path):
    """GazePredictor.from_checkpoint(use_ema=True) loads the trailing EMA
    leaves of an SOLVER.EMA_DECAY TrainState npz."""
    import jax
    import jax.numpy as jnp

    from csts_tpu.models import csts as csts_lib
    from csts_tpu.train import step as step_lib
    from csts_tpu.utils import checkpoint as cu

    cfg = tiny_cfg()
    cfg.SOLVER.EMA_DECAY = 0.9
    spec = csts_lib.build_spec(cfg)
    state, _ = step_lib.create_train_state(cfg, spec, jax.random.PRNGKey(0))
    ema = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    state = step_lib.TrainState(state.params, state.opt_state, state.step, ema)
    host = jax.tree_util.tree_map(np.asarray, state)
    path = cu.save_checkpoint(str(tmp_path), host, epoch=0, cfg=cfg)

    pred = GazePredictor.from_checkpoint(cfg, path, use_ema=True, batch_sizes=(1,))
    np.testing.assert_array_equal(
        np.asarray(pred.params["classifier"]["w"]),
        np.asarray(state.params["classifier"]["w"]) + 1.0,
    )
    pred_raw = GazePredictor.from_checkpoint(cfg, path, batch_sizes=(1,))
    np.testing.assert_array_equal(
        np.asarray(pred_raw.params["classifier"]["w"]),
        np.asarray(state.params["classifier"]["w"]),
    )


def test_batcher_with_mesh_predictor(predictor):
    """The micro-batcher in front of the SPMD mesh predictor: requests coalesce
    into batches that shard over the 8-device data axis, answers match the
    single-device predictor — multi-chip online serving end to end."""
    import jax

    from csts_tpu.parallel import mesh as mesh_lib
    from csts_tpu.serving import GazePredictor

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = mesh_lib.make_mesh(8)
    sharded = GazePredictor(tiny_cfg(), predictor.params, batch_sizes=(8,), mesh=mesh)

    rng = np.random.default_rng(4)
    clips = [make_clip(rng) for _ in range(8)]
    direct = predictor.predict(
        np.stack([v for v, _ in clips]), np.stack([a for _, a in clips])
    )
    batcher = MicroBatcher(sharded, max_wait_ms=200.0)
    try:
        futs = [batcher.submit(*c) for c in clips]
        results = [f.result(timeout=300) for f in futs]
    finally:
        batcher.close()
    for i, res in enumerate(results):
        np.testing.assert_allclose(res["heatmaps"], direct["heatmaps"][i], atol=1e-5)


def test_http_roundtrip(predictor):
    """POST /predict (npz body) == direct predict; /healthz and /stats serve."""
    rng = np.random.default_rng(2)
    server = GazeHTTPServer(predictor, port=0, max_wait_ms=50.0).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        assert urllib.request.urlopen(f"{base}/healthz", timeout=30).read() == b"ok"

        clips = [make_clip(rng) for _ in range(3)]
        direct = predictor.predict(
            np.stack([v for v, _ in clips]), np.stack([a for _, a in clips])
        )

        responses = [None] * len(clips)

        def post(i):
            buf = io.BytesIO()
            np.savez(buf, video=clips[i][0], audio=clips[i][1])
            req = urllib.request.Request(
                f"{base}/predict", data=buf.getvalue(), method="POST",
                headers={"Content-Type": "application/octet-stream"},
            )
            responses[i] = urllib.request.urlopen(req, timeout=300).read()

        threads = [threading.Thread(target=post, args=(i,)) for i in range(len(clips))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, raw in enumerate(responses):
            out = np.load(io.BytesIO(raw))
            np.testing.assert_allclose(out["heatmaps"], direct["heatmaps"][i], atol=1e-6)
            np.testing.assert_allclose(out["gaze_xy"], direct["gaze_xy"][i], atol=1e-6)

        stats = json.loads(
            urllib.request.urlopen(f"{base}/stats", timeout=30).read()
        )
        assert stats["requests"] >= 3 and stats["errors"] == 0

        # raw uint8 camera frames: the server preprocesses with the
        # predictor's own constants before batching
        frames_u8 = rng.integers(0, 255, (FRAMES, 48, 64, 3), dtype=np.uint8)
        _, audio0 = clips[0]
        buf = io.BytesIO()
        np.savez(buf, video=frames_u8, audio=audio0)
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(), method="POST")
        out = np.load(io.BytesIO(urllib.request.urlopen(req, timeout=300).read()))
        direct_u8 = predictor.predict(
            predictor.preprocess_frames(frames_u8)[None], audio0[None]
        )
        np.testing.assert_allclose(
            out["heatmaps"], direct_u8["heatmaps"][0], atol=1e-6)

        # malformed body → 400, service stays alive
        req = urllib.request.Request(
            f"{base}/predict", data=b"not an npz", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert urllib.request.urlopen(f"{base}/healthz", timeout=30).read() == b"ok"
    finally:
        server.close()
