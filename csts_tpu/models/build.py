"""Model registry + builder (reference: ``slowfast/models/build.py:9-47``).

Models register a builder returning ``(spec, init_fn, apply_fn)`` — the functional
triplet that replaces the reference's nn.Module. Device placement/replication is the
caller's job (parallel.mesh), not the builder's (the reference's ``.cuda()`` + DDP
wrap happens here in torch-land).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

from csts_tpu.config import Config
from csts_tpu.utils.registry import Registry

MODEL_REGISTRY = Registry("MODEL")


def build_model(cfg: Config) -> Tuple[Any, Callable, Callable]:
    """Instantiate by MODEL.MODEL_NAME. Returns (spec, init_fn, apply_fn)."""
    return MODEL_REGISTRY.get(cfg.MODEL.MODEL_NAME)(cfg)


@MODEL_REGISTRY.register("CSTS")
def _build_csts(cfg: Config):
    from csts_tpu.models import csts as csts_lib

    spec = csts_lib.build_spec(cfg)

    def init_fn(key, dtype=None):
        import jax.numpy as jnp

        return csts_lib.csts_init(key, spec, dtype or jnp.float32)

    def apply_fn(params, video, audio, **kwargs):
        return csts_lib.csts_apply(params, spec, video, audio, **kwargs)

    return spec, init_fn, apply_fn
