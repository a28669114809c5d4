"""Convert reference PyTorch CSTS checkpoints into csts_tpu param pytrees.

Handles the reference's state-dict layout (``custom_multimodal_builder.py`` module
names, fused-qkv Linear layout ``attention.py:88``) and emits the channels-last
weight layout the ops library expects:

* Linear   (out, in)            -> w (in, out)             [transpose]
* Conv3d   (O, I/g, kT,kH,kW)   -> w (kT,kH,kW, I/g, O)    [transpose(2,3,4,1,0)]
* ConvT3d  (I, O/g, kT,kH,kW)   -> w (kT,kH,kW, O/g, I)    [same transpose; the op
                                   flips spatially at apply time]
* LayerNorm weight/bias         -> scale/bias

Also provides the K400-pretrain positional-embedding interpolation
(``checkpoint.py:327-335``) used when fine-tuning from MViT-B 16x4 224² weights on
256² inputs.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

try:  # torch is only needed when actually reading .pyth files
    import torch
except ImportError:  # pragma: no cover
    torch = None


def _np(x) -> np.ndarray:
    if torch is not None and isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: Mapping, prefix: str) -> dict:
    p = {"w": _np(sd[f"{prefix}.weight"]).T.copy()}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"]).copy()
    return p


def _conv(sd: Mapping, prefix: str) -> dict:
    p = {"w": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0).copy()}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"]).copy()
    return p


def _conv_w(sd: Mapping, prefix: str) -> np.ndarray:
    return _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0).copy()


def _norm(sd: Mapping, prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]).copy(),
        "bias": _np(sd[f"{prefix}.bias"]).copy(),
    }


def _attention(sd: Mapping, prefix: str, upsample: bool = False) -> dict:
    p = {
        "qkv": _linear(sd, f"{prefix}.qkv"),
        "proj": _linear(sd, f"{prefix}.proj"),
    }
    q_name = "upsample_q" if upsample else "pool_q"
    if f"{prefix}.{q_name}.weight" in sd:
        p["pool_q"] = _conv_w(sd, f"{prefix}.{q_name}")
        p["norm_q"] = _norm(sd, f"{prefix}.norm_q")
    if f"{prefix}.pool_k.weight" in sd:
        p["pool_k"] = _conv_w(sd, f"{prefix}.pool_k")
        p["norm_k"] = _norm(sd, f"{prefix}.norm_k")
        p["pool_v"] = _conv_w(sd, f"{prefix}.pool_v")
        p["norm_v"] = _norm(sd, f"{prefix}.norm_v")
    return p


def _block(sd: Mapping, prefix: str, upsample: bool = False) -> dict:
    p = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn": _attention(sd, f"{prefix}.attn", upsample=upsample),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }
    if f"{prefix}.proj.weight" in sd:
        p["proj"] = _linear(sd, f"{prefix}.proj")
    return p


def convert_csts_state_dict(sd: Mapping, num_video_blocks: int = 16, num_audio_blocks: int = 4) -> Dict:
    """Full CSTS state-dict -> csts_tpu param tree (numpy leaves)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    p: Dict = {}
    # components are converted only when present — partial checkpoints (e.g. the
    # audio-branch-only merge, video-only K400 pretrain) are valid inputs
    if "patch_embed.proj.weight" in sd:
        p["patch_embed"] = _conv(sd, "patch_embed.proj")
    if "patch_embed_audio.proj.weight" in sd:
        p["patch_embed_audio"] = _conv(sd, "patch_embed_audio.proj")
    for name in (
        "pos_embed_spatial",
        "pos_embed_temporal",
        "pos_embed_spatial_audio",
        "pos_embed_temporal_audio",
    ):
        if name in sd:
            p[name] = _np(sd[name]).copy()
    if "pos_embed" in sd:
        p["pos_embed"] = _np(sd["pos_embed"]).copy()
        p["pos_embed_audio"] = _np(sd["pos_embed_audio"]).copy()

    if num_video_blocks > 0:
        p["blocks"] = [_block(sd, f"blocks.{i}") for i in range(num_video_blocks)]
    if num_audio_blocks > 0:
        p["blocks_audio"] = [_block(sd, f"blocks_audio.{i}") for i in range(num_audio_blocks)]

    for name in ("vision_proj", "audio_proj"):
        if f"{name}.weight" in sd:
            p[name] = _linear(sd, name)
    for name in ("vision_pool", "audio_pool", "audio_pool2"):
        if f"{name}.weight" in sd:
            p[name] = _conv(sd, name)

    if "temporal_fusion.norm1.weight" in sd:
        p["temporal_fusion"] = _block(sd, "temporal_fusion")
    if "spatial_fusion.norm1.weight" in sd:
        p["spatial_fusion"] = _block(sd, "spatial_fusion")
    for i in range(1, 5):
        if f"decode_block{i}.norm1.weight" in sd:
            p[f"decode_block{i}"] = _block(sd, f"decode_block{i}", upsample=True)
    if "classifier.weight" in sd:
        p["classifier"] = _conv(sd, "classifier")
    return p


def interpolate_pos_embed(pos_embed: np.ndarray, target_len: int) -> np.ndarray:
    """Bilinear-style 1D interpolation of a (1, L, C) positional embedding to a new
    token count — the reference's shape-mismatch rule (``checkpoint.py:327-335``,
    which calls ``F.interpolate(..., mode='linear')`` over the token axis)."""
    if pos_embed.shape[1] == target_len:
        return pos_embed
    _, src_len, dim = pos_embed.shape
    # torch F.interpolate(mode='linear', align_corners=False): half-pixel centers
    x_tgt = (np.arange(target_len) + 0.5) * (src_len / target_len) - 0.5
    x_tgt = np.clip(x_tgt, 0, src_len - 1)
    lo = np.floor(x_tgt).astype(int)
    hi = np.minimum(lo + 1, src_len - 1)
    frac = (x_tgt - lo)[:, None]
    out = pos_embed[0, lo] * (1 - frac) + pos_embed[0, hi] * frac
    return out[None].astype(pos_embed.dtype)


def load_pyth_checkpoint(path: str) -> Dict:
    """Read a reference ``.pyth`` checkpoint file and return its model state dict."""
    if torch is None:
        raise RuntimeError("torch is required to read .pyth checkpoints")
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state", blob)
    return {k: _np(v) for k, v in sd.items()}
