"""Online serving: micro-batching dispatcher + a minimal HTTP front.

The reference has no serving story at all (inference = rerunning
``tools/test_avgaze_net.py``, SURVEY §1). :mod:`csts_tpu.serving` gives offline
batched inference; this module turns it into an online service:

* :class:`MicroBatcher` — a thread-safe request queue in front of a
  :class:`~csts_tpu.serving.GazePredictor`. Incoming single-clip requests are
  coalesced into the largest batch that is ready within ``max_wait_ms``
  (continuous micro-batching: the TPU sees large static-shape batches — the only
  shape XLA serves efficiently — while callers see per-request futures). One
  dispatcher thread owns the device; requests may arrive from any thread.
* :class:`GazeHTTPServer` — a stdlib ``ThreadingHTTPServer`` speaking
  npz-over-HTTP: ``POST /predict`` with an ``.npz`` body ``{video, audio}``
  (video either preprocessed float32 (T, crop, crop, 3) or raw uint8 camera
  frames (T, H, W, 3) — the latter are center-cropped/normalized server-side
  with the predictor's constants) returns an ``.npz`` ``{heatmaps, gaze_xy}``;
  ``GET /healthz`` liveness; ``GET /stats`` JSON service counters
  (request/batch counts, mean batch occupancy, latency percentiles).

Works with any predictor exposing ``predict(video, audio) -> dict`` and
``batch_sizes`` — the live :class:`GazePredictor` or the AOT
``from_exported`` artifact loader equally.
"""

from __future__ import annotations

import collections
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeoutError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

_SENTINEL = object()


class MicroBatcher:
    """Coalesce concurrent single-clip requests into device-sized batches.

    ``submit`` returns a future immediately; a single dispatcher thread pops the
    queue, waits up to ``max_wait_ms`` for more requests (never longer than the
    first request has already waited), stacks them, and runs ONE predictor call
    for the whole group — the predictor's bucket padding takes care of partial
    batches. Under load the wait never triggers: the queue refills while the
    device computes, so consecutive batches are full (continuous batching).
    """

    def __init__(self, predictor, max_wait_ms: float = 5.0, max_queue: int = 1024):
        self._pred = predictor
        self._max_batch = max(predictor.batch_sizes)
        self._max_wait = max_wait_ms / 1e3
        self._queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "clips": 0, "errors": 0}
        self._latencies: collections.deque = collections.deque(maxlen=2048)
        # The service's clip contract. With a config-carrying predictor it is
        # fixed up front — a malformed FIRST request must not lock in wrong
        # shapes and reject every correct one after it. AOT-exported predictors
        # (cfg=None) fall back to first-request locking.
        self._shapes = None
        cfg = getattr(predictor, "cfg", None)
        if cfg is not None:
            t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TEST_CROP_SIZE
            self._shapes = (
                (t, s, s, 3),
                (t, cfg.DATA.AUDIO_FREQ_BINS, cfg.DATA.AUDIO_WINDOW, 1),
            )
        self._closed = False
        self._thread = threading.Thread(
            target=self._run, name="gaze-microbatcher", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------------ API

    def submit(self, video: np.ndarray, audio: np.ndarray) -> Future:
        """Enqueue one clip: ``video`` (T, crop, crop, 3) float32 normalized,
        ``audio`` (T, F, S, 1) float32. Resolves to {heatmaps (T, h, w),
        gaze_xy (T, 2)}. Raises ``RuntimeError`` after :meth:`close`."""
        fut: Future = Future()
        video = np.asarray(video, np.float32)
        audio = np.asarray(audio, np.float32)
        if video.ndim != 4 or audio.ndim != 4:
            fut.set_exception(
                ValueError(
                    f"expected one clip: video (T,H,W,3) and audio (T,F,S,1), "
                    f"got {video.shape} / {audio.shape}"
                )
            )
            return fut
        # the closed-check and the enqueue share the lock with close(): a
        # submit that passes the check is guaranteed to enqueue BEFORE close()
        # drains, so no accepted request can be silently dropped
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            if self._shapes is None:
                self._shapes = (video.shape, audio.shape)
            elif (video.shape, audio.shape) != self._shapes:
                fut.set_exception(
                    ValueError(
                        f"shape mismatch: this service batches {self._shapes}, "
                        f"got {(video.shape, audio.shape)}"
                    )
                )
                return fut
            self._stats["requests"] += 1
            try:
                self._queue.put_nowait((video, audio, fut, time.monotonic()))
            except queue.Full:
                self._stats["requests"] -= 1
                self._stats["errors"] += 1
                fut.set_exception(RuntimeError("request queue full"))
        return fut

    def stats(self) -> Dict[str, float]:
        with self._lock:
            out = dict(self._stats)
            lat = sorted(self._latencies)
        out["mean_batch_occupancy"] = (
            out["clips"] / out["batches"] if out["batches"] else 0.0
        )
        if lat:
            out["latency_p50_ms"] = 1e3 * lat[len(lat) // 2]
            out["latency_p99_ms"] = 1e3 * lat[min(len(lat) - 1, int(len(lat) * 0.99))]
        return out

    def close(self, timeout: float = 10.0) -> None:
        """Stop the dispatcher after draining in-flight work. Unprocessed
        queued requests fail with ``RuntimeError``."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._queue.put(_SENTINEL)
        self._thread.join(timeout=timeout)
        saw_sentinel = False
        while True:  # fail anything the dispatcher never reached
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is _SENTINEL:
                saw_sentinel = True
            else:
                item[2].set_exception(RuntimeError("MicroBatcher closed"))
        if self._thread.is_alive() and saw_sentinel:
            # the join timed out mid-predict and the drain consumed the
            # shutdown signal — re-arm it so the dispatcher exits when it
            # returns to the queue instead of blocking on get() forever
            self._queue.put(_SENTINEL)

    # ------------------------------------------------------------- dispatcher

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                return
            items = [item]
            deadline = time.monotonic() + self._max_wait
            stop = False
            while len(items) < self._max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is _SENTINEL:
                    stop = True  # serve what we have, then exit
                    break
                items.append(nxt)
            self._dispatch(items)
            if stop:
                return

    def _dispatch(self, items) -> None:
        video = np.stack([it[0] for it in items])
        audio = np.stack([it[1] for it in items])
        now = time.monotonic
        try:
            out = self._pred.predict(video, audio)
        except Exception as exc:  # noqa: BLE001 — fail the whole group
            with self._lock:
                self._stats["errors"] += len(items)
            for _, _, fut, _ in items:
                if not fut.done():
                    fut.set_exception(exc)
            return
        done = now()
        with self._lock:
            self._stats["batches"] += 1
            self._stats["clips"] += len(items)
            for _, _, _, t0 in items:
                self._latencies.append(done - t0)
        for i, (_, _, fut, _) in enumerate(items):
            fut.set_result(
                {"heatmaps": out["heatmaps"][i], "gaze_xy": out["gaze_xy"][i]}
            )


class _GazeHandler(BaseHTTPRequestHandler):
    # the server instance carries .batcher / .request_timeout (set below)
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _respond(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — http.server API
        if self.path == "/healthz":
            self._respond(200, b"ok", "text/plain")
        elif self.path == "/stats":
            body = json.dumps(self.server.batcher.stats()).encode()
            self._respond(200, body, "application/json")
        else:
            self._respond(404, b"not found", "text/plain")

    def do_POST(self):  # noqa: N802
        if self.path != "/predict":
            self._respond(404, b"not found", "text/plain")
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            blob = np.load(io.BytesIO(self.rfile.read(length)))
            video = blob["video"]
            if video.dtype == np.uint8:
                # raw camera frames (T, H, W, 3): center-crop + normalize with
                # the predictor's own constants (GazePredictor.preprocess_frames)
                video = self.server.batcher._pred.preprocess_frames(video)
        except Exception as exc:  # noqa: BLE001 — malformed request body
            self._respond(400, str(exc).encode() or b"bad request", "text/plain")
            return
        try:
            fut = self.server.batcher.submit(video, blob["audio"])
            result = fut.result(timeout=self.server.request_timeout)
        except ValueError as exc:  # shape/contract violations — the client's fault
            self._respond(400, str(exc).encode(), "text/plain")
            return
        except FuturesTimeoutError:
            self._respond(
                504,
                f"prediction did not complete within {self.server.request_timeout}s".encode(),
                "text/plain",
            )
            return
        except Exception as exc:  # noqa: BLE001 — server-side failure
            self._respond(500, str(exc).encode() or type(exc).__name__.encode(), "text/plain")
            return
        buf = io.BytesIO()
        np.savez(buf, **result)
        self._respond(200, buf.getvalue(), "application/octet-stream")


class GazeHTTPServer:
    """npz-over-HTTP gaze inference service (stdlib only, thread-per-request
    so concurrent POSTs coalesce in the :class:`MicroBatcher`)."""

    def __init__(
        self,
        predictor,
        host: str = "127.0.0.1",
        port: int = 0,
        max_wait_ms: float = 5.0,
        request_timeout: float = 60.0,
    ):
        self.batcher = MicroBatcher(predictor, max_wait_ms=max_wait_ms)
        self._httpd = ThreadingHTTPServer((host, port), _GazeHandler)
        self._httpd.daemon_threads = True
        self._httpd.batcher = self.batcher
        self._httpd.request_timeout = request_timeout
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "GazeHTTPServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="gaze-http", daemon=True
        )
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self.batcher.close()
