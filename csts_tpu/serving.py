"""Inference/serving API: load once, predict heatmaps at fixed batch shapes.

The reference has no serving story (inference = rerunning the test loop). This
provides one: a compiled-once predictor with static batch buckets (XLA-friendly),
accepting raw frames + STFT slices and returning per-frame gaze heatmaps and argmax
gaze points.

    predictor = GazePredictor.from_checkpoint(cfg, "weights.npz")  # or .pyth
    out = predictor.predict(video_u8, audio_stft)   # dicts of numpy arrays
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from csts_tpu.config import Config
from csts_tpu.data import transform
from csts_tpu.models import csts as csts_lib
from csts_tpu.train import losses
from csts_tpu.utils import checkpoint as cu


class GazePredictor:
    """Batched gaze-heatmap inference with shape bucketing."""

    def __init__(self, cfg: Config, params, batch_sizes: Sequence[int] = (1, 8)):
        self.cfg = cfg
        self.spec = csts_lib.build_spec(cfg)
        if cfg.TRAIN.MIXED_PRECISION:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                params,
            )
        self.params = params
        self.batch_sizes = sorted(batch_sizes)

        spec = self.spec

        @jax.jit
        def _forward(params, video, audio):
            logits = csts_lib.csts_apply(params, spec, video, audio, deterministic=True)
            return losses.frame_softmax(logits, temperature=2.0)

        self._forward = _forward

    @classmethod
    def from_checkpoint(
        cls, cfg: Config, checkpoint_path: Optional[str] = None, **kwargs
    ) -> "GazePredictor":
        params = csts_lib.csts_init(jax.random.PRNGKey(cfg.RNG_SEED), csts_lib.build_spec(cfg))
        if checkpoint_path:
            if checkpoint_path.endswith(".npz"):
                params = cu.load_params_npz(checkpoint_path, params)
            else:
                params = cu.load_torch_weights(checkpoint_path, params)
        return cls(cfg, params, **kwargs)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def preprocess_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        """(T, H, W, 3) uint8 -> normalized center-cropped (T, crop, crop, 3)."""
        size = self.cfg.DATA.TEST_CROP_SIZE
        dummy_gaze = np.full((frames_u8.shape[0], 3), 0.5)
        out, _ = transform.spatial_sampling_fused(
            frames_u8, dummy_gaze, spatial_idx=1, min_scale=size, max_scale=size,
            crop_size=size, random_horizontal_flip=False, rng=None,
            mean=self.cfg.DATA.MEAN, std=self.cfg.DATA.STD,
        )
        return out

    def predict(self, video: np.ndarray, audio: np.ndarray) -> Dict[str, np.ndarray]:
        """``video``: (B, T, crop, crop, 3) normalized float32 (or (T,...) for one
        clip); ``audio``: matching (B, T, F, S, 1). Returns heatmaps (B, T, h, w)
        and gaze_xy (B, T, 2) normalized argmax points."""
        if video.ndim == 4:
            video = video[None]
            audio = audio[None] if audio.ndim == 4 else audio
        n = video.shape[0]
        bucket = self._bucket(n)
        if n < bucket:
            pad = bucket - n
            video = np.concatenate([video, np.repeat(video[-1:], pad, 0)])
            audio = np.concatenate([audio, np.repeat(audio[-1:], pad, 0)])
        probs = np.asarray(
            self._forward(self.params, jnp.asarray(video), jnp.asarray(audio))
        )[:n, ..., 0]
        b, t, h, w = probs.shape
        flat = probs.reshape(b, t, h * w)
        idx = np.argmax(flat, axis=-1)
        gaze_xy = np.stack(
            [(idx % w + 0.5) / w, (idx // w + 0.5) / h], axis=-1
        ).astype(np.float32)
        return {"heatmaps": probs, "gaze_xy": gaze_xy}
