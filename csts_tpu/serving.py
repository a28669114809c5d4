"""Inference/serving API: load once, predict heatmaps at fixed batch shapes.

The reference has no serving story (inference = rerunning the test loop). This
provides one: a compiled-once predictor with static batch buckets (XLA-friendly),
accepting raw frames + STFT slices and returning per-frame gaze heatmaps and argmax
gaze points.

    predictor = GazePredictor.from_checkpoint(cfg, "weights.npz")  # or .pyth
    out = predictor.predict(video_u8, audio_stft)   # dicts of numpy arrays

For deployment, :meth:`GazePredictor.export_compiled` AOT-serializes the
per-bucket forwards via ``jax.export`` (StableHLO); a serving host reloads with
:meth:`GazePredictor.from_exported` — no model Python, no tracing, no torch.
"""

from __future__ import annotations

import json
import os
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

    def __init__(self, cfg: Config, params, batch_sizes: Sequence[int] = (1, 8),
                 mesh=None):
        """``mesh``: optional `jax.sharding.Mesh` with a data axis — inference
        batches shard over it (params replicated, one SPMD forward across all
        chips). Every bucket must divide by the data-axis size."""
        self.cfg = cfg
        self.spec = csts_lib.build_spec(cfg)
        if cfg.TRAIN.MIXED_PRECISION:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                params,
            )
        self.batch_sizes = sorted(batch_sizes)
        self.mesh = mesh
        self._crop = cfg.DATA.TEST_CROP_SIZE
        self._mean = cfg.DATA.MEAN
        self._std = cfg.DATA.STD

        spec = self.spec

        def _fwd(params, video, audio):
            logits = csts_lib.csts_apply(params, spec, video, audio, deterministic=True)
            return losses.frame_softmax(logits, temperature=2.0)

        if mesh is None:
            self._forward = jax.jit(_fwd)
        else:
            from csts_tpu.parallel import mesh as mesh_lib

            dp = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                              if a == mesh_lib.DATA_AXIS]))
            bad = [b for b in self.batch_sizes if b % dp]
            assert not bad, f"batch buckets {bad} do not divide the {dp}-way data axis"
            params = jax.device_put(params, mesh_lib.replicated(mesh))
            self._forward = jax.jit(
                _fwd,
                in_shardings=(
                    mesh_lib.replicated(mesh),
                    mesh_lib.batch_sharding(mesh),
                    mesh_lib.batch_sharding(mesh),
                ),
            )
        self.params = params

    @classmethod
    def from_checkpoint(
        cls, cfg: Config, checkpoint_path: Optional[str] = None,
        use_ema: bool = False, **kwargs
    ) -> "GazePredictor":
        """``use_ema``: serve the Polyak-averaged weights of an
        ``SOLVER.EMA_DECAY`` training run (the npz must be a full TrainState
        checkpoint saved with EMA on)."""
        params = csts_lib.csts_init(jax.random.PRNGKey(cfg.RNG_SEED), csts_lib.build_spec(cfg))
        if checkpoint_path:
            if checkpoint_path.endswith(".npz"):
                if use_ema:
                    from csts_tpu.train import step as step_lib

                    assert cfg.SOLVER.EMA_DECAY > 0, (
                        "use_ema requires SOLVER.EMA_DECAY > 0 in the config "
                        "(the TrainState template must carry the ema leaves)"
                    )
                    template, _ = step_lib.create_train_state(
                        cfg, csts_lib.build_spec(cfg), jax.random.PRNGKey(cfg.RNG_SEED)
                    )
                    state, _ = cu.load_checkpoint(checkpoint_path, template)
                    params = state.ema
                else:
                    params = cu.load_params_npz(checkpoint_path, params)
            else:
                assert not use_ema, "use_ema needs a framework TrainState .npz"
                params = cu.load_torch_weights(checkpoint_path, params)
        return cls(cfg, params, **kwargs)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def preprocess_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        """(T, H, W, 3) uint8 -> normalized center-cropped (T, crop, crop, 3)."""
        size = self._crop
        dummy_gaze = np.full((frames_u8.shape[0], 3), 0.5)
        out, _ = transform.spatial_sampling_fused(
            frames_u8, dummy_gaze, spatial_idx=1, min_scale=size, max_scale=size,
            crop_size=size, random_horizontal_flip=False, rng=None,
            mean=self._mean, std=self._std,
        )
        return out

    # ------------------------------------------------------------------
    # AOT export / import (jax.export — StableHLO serialization)
    # ------------------------------------------------------------------

    def export_compiled(self, path: str, platforms: Sequence[str] = ("tpu", "cpu")):
        """AOT-serialize this predictor into a self-contained artifact directory.

        Writes one ``jax.export`` StableHLO program per batch bucket (traced with
        flat-leaf-list params so the loader needs no pytree definition), the
        weights (positional ``leaf_NNNNN`` npz, the framework's checkpoint leaf
        order), and a meta.json with shapes + preprocessing constants. The export
        traces the composite (golden-parity-tested) attention path so one
        artifact lowers for every requested platform; serving hosts reload with
        :meth:`from_exported` without importing the model or config code.
        """
        from jax import export as jexport

        from csts_tpu.kernels import attention as ka

        os.makedirs(path, exist_ok=True)
        t = self.cfg.DATA.NUM_FRAMES
        s = self.cfg.DATA.TEST_CROP_SIZE
        fbins = self.cfg.DATA.AUDIO_FREQ_BINS
        win = self.cfg.DATA.AUDIO_WINDOW
        leaves, treedef = jax.tree_util.tree_flatten(self.params)
        spec = self.spec

        @jax.jit
        def _forward_flat(leaves, video, audio):
            params = jax.tree_util.tree_unflatten(treedef, leaves)
            logits = csts_lib.csts_apply(params, spec, video, audio, deterministic=True)
            return losses.frame_softmax(logits, temperature=2.0)

        leaf_structs = [jax.ShapeDtypeStruct(np.shape(l), l.dtype) for l in leaves]
        was_enabled = ka.enabled()
        ka.set_enabled(False)
        try:
            for b in self.batch_sizes:
                exp = jexport.export(_forward_flat, platforms=tuple(platforms))(
                    leaf_structs,
                    jax.ShapeDtypeStruct((b, t, s, s, 3), jnp.float32),
                    jax.ShapeDtypeStruct((b, t, fbins, win, 1), jnp.float32),
                )
                with open(os.path.join(path, f"forward_b{b}.stablehlo"), "wb") as f:
                    f.write(exp.serialize())
        finally:
            ka.set_enabled(was_enabled)
        np.savez(
            os.path.join(path, "params.npz"),
            **{f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)},
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "batch_sizes": list(self.batch_sizes),
                    "num_frames": t,
                    "crop_size": s,
                    "audio_freq_bins": fbins,
                    "audio_window": win,
                    "mean": list(self._mean),
                    "std": list(self._std),
                    "platforms": list(platforms),
                },
                f,
            )

    @classmethod
    def from_exported(cls, path: str) -> "GazePredictor":
        """Load an :meth:`export_compiled` artifact — no model/config code runs."""
        from jax import export as jexport

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        blob = np.load(os.path.join(path, "params.npz"))
        leaves = [jnp.asarray(blob[k]) for k in sorted(blob.files)]
        programs = {}
        for b in meta["batch_sizes"]:
            with open(os.path.join(path, f"forward_b{b}.stablehlo"), "rb") as f:
                programs[b] = jexport.deserialize(f.read())

        obj = cls.__new__(cls)
        obj.cfg = None
        obj.spec = None
        obj.params = leaves
        obj.batch_sizes = sorted(meta["batch_sizes"])
        obj._crop = meta["crop_size"]
        obj._mean = meta["mean"]
        obj._std = meta["std"]
        obj._forward = lambda params, video, audio: programs[video.shape[0]].call(
            params, video, audio
        )
        return obj

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
