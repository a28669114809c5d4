"""Export csts_tpu param pytrees back into reference PyTorch state dicts.

The exact inverse of :mod:`csts_tpu.convert.from_torch`: takes the channels-last
param tree this framework trains (npz checkpoints, `utils/checkpoint.py`) and
emits a state dict in the reference's module naming
(``slowfast/models/custom_multimodal_builder.py``) and weight layout, so models
trained here can be evaluated or fine-tuned with the original PyTorch code —
the migration story in both directions.

Layout inversions (see from_torch.py:7-11 for the forward direction):

* Linear   w (in, out)          -> (out, in)              [transpose]
* Conv3d   w (kT,kH,kW, I/g, O) -> (O, I/g, kT,kH,kW)     [transpose(4,3,0,1,2)]
* ConvT3d  w (kT,kH,kW, O/g, I) -> (I, O/g, kT,kH,kW)     [same transpose]
* scale/bias                    -> LayerNorm weight/bias

Validated by a full round-trip parity test (`tests/test_checkpoint.py`): params
from ``csts_init`` are exported, loaded into the reference CSTS with
``load_state_dict(strict=True)``, and both forwards must agree to fp32 parity.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _linear(out: Dict, prefix: str, p: Mapping) -> None:
    out[f"{prefix}.weight"] = _np(p["w"]).T.copy()
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"]).copy()


def _conv(out: Dict, prefix: str, p: Mapping) -> None:
    out[f"{prefix}.weight"] = _np(p["w"]).transpose(4, 3, 0, 1, 2).copy()
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"]).copy()


def _conv_w(out: Dict, prefix: str, w) -> None:
    out[f"{prefix}.weight"] = _np(w).transpose(4, 3, 0, 1, 2).copy()


def _norm(out: Dict, prefix: str, p: Mapping) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"]).copy()
    out[f"{prefix}.bias"] = _np(p["bias"]).copy()


def _attention(out: Dict, prefix: str, p: Mapping, upsample: bool = False) -> None:
    _linear(out, f"{prefix}.qkv", p["qkv"])
    _linear(out, f"{prefix}.proj", p["proj"])
    q_name = "upsample_q" if upsample else "pool_q"
    if "pool_q" in p:
        _conv_w(out, f"{prefix}.{q_name}", p["pool_q"])
        _norm(out, f"{prefix}.norm_q", p["norm_q"])
    if "pool_k" in p:
        _conv_w(out, f"{prefix}.pool_k", p["pool_k"])
        _norm(out, f"{prefix}.norm_k", p["norm_k"])
        _conv_w(out, f"{prefix}.pool_v", p["pool_v"])
        _norm(out, f"{prefix}.norm_v", p["norm_v"])


def _block(out: Dict, prefix: str, p: Mapping, upsample: bool = False) -> None:
    _norm(out, f"{prefix}.norm1", p["norm1"])
    _attention(out, f"{prefix}.attn", p["attn"], upsample=upsample)
    _norm(out, f"{prefix}.norm2", p["norm2"])
    _linear(out, f"{prefix}.mlp.fc1", p["mlp"]["fc1"])
    _linear(out, f"{prefix}.mlp.fc2", p["mlp"]["fc2"])
    if "proj" in p:
        _linear(out, f"{prefix}.proj", p["proj"])


def export_csts_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    """csts_tpu param tree (jax/numpy leaves) -> reference-layout state dict.

    Components absent from the tree are simply omitted, mirroring
    ``convert_csts_state_dict``'s tolerance of partial checkpoints.
    """
    out: Dict[str, np.ndarray] = {}
    if "patch_embed" in params:
        _conv(out, "patch_embed.proj", params["patch_embed"])
    if "patch_embed_audio" in params:
        _conv(out, "patch_embed_audio.proj", params["patch_embed_audio"])
    for name in (
        "pos_embed_spatial",
        "pos_embed_temporal",
        "pos_embed_spatial_audio",
        "pos_embed_temporal_audio",
        "pos_embed",
        "pos_embed_audio",
    ):
        if name in params:
            out[name] = _np(params[name]).copy()

    for i, blk in enumerate(params.get("blocks", [])):
        _block(out, f"blocks.{i}", blk)
    for i, blk in enumerate(params.get("blocks_audio", [])):
        _block(out, f"blocks_audio.{i}", blk)

    for name in ("vision_proj", "audio_proj"):
        if name in params:
            _linear(out, name, params[name])
    for name in ("vision_pool", "audio_pool", "audio_pool2"):
        if name in params:
            _conv(out, name, params[name])

    if "spatial_fusion" in params:
        _block(out, "spatial_fusion", params["spatial_fusion"])
    if "temporal_fusion" in params:
        _block(out, "temporal_fusion", params["temporal_fusion"])
    for i in range(1, 5):
        if f"decode_block{i}" in params:
            _block(out, f"decode_block{i}", params[f"decode_block{i}"], upsample=True)
    if "classifier" in params:
        _conv(out, "classifier", params["classifier"])
    return {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in out.items()}


def save_pyth_checkpoint(path: str, params: Mapping, epoch: int = 0) -> None:
    """Write a reference-compatible ``.pyth`` checkpoint — the
    ``{"epoch", "model_state"}`` subset of the reference's blob
    (``slowfast/utils/checkpoint.py:130-135``; ``optimizer_state``/``cfg`` are
    only consulted on resume) readable by its ``load_checkpoint`` for eval."""
    import torch

    sd = {k: torch.from_numpy(v) for k, v in export_csts_state_dict(params).items()}
    torch.save({"epoch": epoch, "model_state": sd}, path)
