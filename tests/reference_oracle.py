"""Load the PyTorch reference model from /root/reference as a CPU test oracle.

The reference depends on packages absent from this image (fvcore, iopath, fairscale,
ipdb, simplejson). We inject minimal stubs for exactly the symbols the model-definition
files touch, then import the reference modules in place (read-only; nothing is copied).
Used only by parity tests — the framework itself has zero dependency on this.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def install_stubs() -> None:
    # ipdb (imported by slowfast.models.build)
    _stub_module("ipdb").set_trace = lambda: None

    # fvcore.common.registry.Registry
    fvcore = _stub_module("fvcore")
    fvcore_common = _stub_module("fvcore.common")
    fvcore_registry = _stub_module("fvcore.common.registry")

    class Registry:
        def __init__(self, name):
            self._name = name
            self._obj_map = {}

        def register(self, obj=None):
            def deco(o):
                self._obj_map[o.__name__] = o
                return o

            return deco(obj) if obj is not None else deco

        def get(self, name):
            return self._obj_map[name]

    fvcore_registry.Registry = Registry
    fvcore_common.registry = fvcore_registry
    fvcore.common = fvcore_common

    # iopath pathmgr (slowfast.utils.env)
    iopath = _stub_module("iopath")
    iopath_common = _stub_module("iopath.common")
    iopath_fileio = _stub_module("iopath.common.file_io")

    class _PathManager:
        @staticmethod
        def get(key=None):
            return _PathManager()

        def register_handler(self, *a, **k):
            pass

    iopath_fileio.PathManagerFactory = _PathManager
    iopath_common.file_io = iopath_fileio
    iopath.common = iopath_common

    # fairscale checkpoint_wrapper (unused when ACT_CHECKPOINT=False)
    fairscale = _stub_module("fairscale")
    fairscale_nn = _stub_module("fairscale.nn")
    fairscale_ckpt = _stub_module("fairscale.nn.checkpoint")
    fairscale_ckpt.checkpoint_wrapper = lambda m, *a, **k: m
    fairscale_nn.checkpoint = fairscale_ckpt
    fairscale.nn = fairscale_nn

    _stub_module("simplejson").dumps = __import__("json").dumps

    # Pre-register the slowfast packages with __path__ into the reference tree so
    # submodule imports resolve WITHOUT executing slowfast/__init__.py (which calls
    # env.setup_environment and drags in the full dependency chain).
    # PyAV stub — dataset modules import it at module level; tests never open videos
    if "av" not in sys.modules or not hasattr(sys.modules.get("av"), "__version__"):
        av_mod = _stub_module("av")
        av_mod.__version__ = "0.0-stub"
        av_mod.open = None

    # tqdm stub (progress bars in dataset constructors)
    tqdm_mod = _stub_module("tqdm")
    tqdm_mod.tqdm = lambda x, *a, **k: x

    # torchvision stub — decoder.py imports torchvision.io for its (unused here)
    # torchvision backend; datasets import torchvision.transforms for RandAug paths
    tv = _stub_module("torchvision")
    tv_io = _stub_module("torchvision.io")
    tv_tr = _stub_module("torchvision.transforms")
    tv_tr.__path__ = []  # mark as package so submodule stubs resolve
    tv_tr_f = _stub_module("torchvision.transforms.functional")
    tv_tr.ToPILImage = object
    tv_tr.ToTensor = object
    tv_tr.functional = tv_tr_f
    tv.io = tv_io
    tv.transforms = tv_tr

    for pkg, path in [
        ("slowfast", f"{REFERENCE_ROOT}/slowfast"),
        ("slowfast.models", f"{REFERENCE_ROOT}/slowfast/models"),
        ("slowfast.utils", f"{REFERENCE_ROOT}/slowfast/utils"),
        ("slowfast.config", f"{REFERENCE_ROOT}/slowfast/config"),
        ("slowfast.datasets", f"{REFERENCE_ROOT}/slowfast/datasets"),
    ]:
        mod = _stub_module(pkg)
        mod.__path__ = [path]

    # slowfast.utils.env stub (iopath pathmgr consumer)
    env = _stub_module("slowfast.utils.env")
    env.pathmgr = _PathManager()
    env.checkpoint_pathmgr = _PathManager()
    env.setup_environment = lambda: None

    # slowfast.utils.logging stub (model files only call get_logger; meters
    # additionally call log_json_stats per record)
    import logging as _pylogging

    sf_logging = _stub_module("slowfast.utils.logging")
    sf_logging.get_logger = _pylogging.getLogger
    sf_logging.setup_logging = lambda *a, **k: None
    sf_logging.log_json_stats = lambda *a, **k: None

    # fvcore.common.timer.Timer (slowfast/utils/meters.py) — minimal
    # perf_counter-based equivalent of the fvcore API the meters touch
    import time as _time

    fvcore_timer = _stub_module("fvcore.common.timer")

    class _Timer:
        def __init__(self):
            self.reset()

        def reset(self):
            self._start = _time.perf_counter()
            self._total = 0.0
            self._paused = False

        def pause(self):
            if not self._paused:
                self._total += _time.perf_counter() - self._start
                self._paused = True

        def resume(self):
            self._start = _time.perf_counter()
            self._paused = False

        def seconds(self):
            if self._paused:
                return self._total
            return self._total + (_time.perf_counter() - self._start)

    fvcore_timer.Timer = _Timer
    fvcore_common.timer = fvcore_timer

    # slowfast.utils.misc stub — the real module drags psutil/matplotlib/
    # fvcore.nn; the meters only touch its memory reporters
    sf_misc = _stub_module("slowfast.utils.misc")
    sf_misc.gpu_mem_usage = lambda: 0.0
    sf_misc.cpu_mem_usage = lambda: (0.0, 0.0)


_REF_CFG = None


def reference_cfg():
    """A CfgNode-alike namespace with the CSTS Ego4D forecast configuration."""

    class NS(dict):
        __getattr__ = dict.__getitem__

        def __setattr__(self, k, v):
            self[k] = v

    cfg = NS()
    cfg.DATA = NS(
        TRAIN_CROP_SIZE=256, TEST_CROP_SIZE=256, NUM_FRAMES=8, INPUT_CHANNEL_NUM=[3]
    )
    cfg.MVIT = NS(
        POOL_FIRST=False, PATCH_2D=False,
        PATCH_KERNEL=[3, 7, 7], PATCH_STRIDE=[2, 4, 4], PATCH_PADDING=[1, 3, 3],
        EMBED_DIM=96, NUM_HEADS=1, MLP_RATIO=4.0, QKV_BIAS=True,
        DROPOUT_RATE=0.0, DEPTH=16, DROPPATH_RATE=0.2, MODE="conv",
        CLS_EMBED_ON=False, SEP_POS_EMBED=True, NORM="layernorm",
        DIM_MUL=[[1, 2.0], [3, 2.0], [14, 2.0]], HEAD_MUL=[[1, 2.0], [3, 2.0], [14, 2.0]],
        POOL_KVQ_KERNEL=[3, 3, 3], POOL_KV_STRIDE_ADAPTIVE=[1, 8, 8],
        POOL_KV_STRIDE=None,
        POOL_Q_STRIDE=[[1, 1, 2, 2], [3, 1, 2, 2], [14, 1, 2, 2]],
        ZERO_DECAY_POS_CLS=False, NORM_STEM=False, SPATIAL_AUDIO_ATTN=False,
        AUDIO_BRANCH_ON=True,
    )
    cfg.MODEL = NS(
        NUM_CLASSES=400, ACT_CHECKPOINT=False, LOSS_FUNC="kldiv+egonce", LOSS_ALPHA=0.05
    )
    return cfg


def load_reference_csts(crop_size=256, num_frames=8, loss_func="kldiv+egonce", seed=0):
    """Instantiate the reference CSTS (CPU, eval mode) with the shipped architecture."""
    install_stubs()
    import torch

    from slowfast.models.custom_multimodal_builder import CSTS  # noqa: E402

    cfg = reference_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = crop_size
    cfg.DATA.TEST_CROP_SIZE = crop_size
    cfg.DATA.NUM_FRAMES = num_frames
    cfg.MODEL.LOSS_FUNC = loss_func
    torch.manual_seed(seed)
    model = CSTS(cfg)
    model.eval()
    return model, cfg


def load_reference_blocks():
    """Import the reference block classes for module-level parity tests."""
    install_stubs()
    from slowfast.models.attention import (  # noqa: E402
        MultiScaleBlock,
        MultiScaleDecoderBlock,
    )
    from slowfast.models.av_attention import SpatialBlock, TemporalBlock  # noqa: E402

    return MultiScaleBlock, MultiScaleDecoderBlock, SpatialBlock, TemporalBlock
