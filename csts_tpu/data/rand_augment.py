"""RandAugment + RandomErasing (reference: ``slowfast/datasets/rand_augment.py``
(timm-style, 533 LoC) and ``random_erasing.py`` (180 LoC), both gated on
``AUG.ENABLE`` which the shipped CSTS configs leave off).

Compact functional re-implementation over PIL with an explicit
``np.random.Generator`` — the standard 15-op policy with magnitude scaling and
optional magnitude-std jitter, applied identically to every frame of a clip (video
augmentation must be temporally consistent)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_FILL = (128, 128, 128)
_MAX_LEVEL = 10.0


def _randomly_negate(v: float, rng) -> float:
    return -v if rng.uniform() > 0.5 else v


def _rotate(img, level, rng):
    deg = _randomly_negate((level / _MAX_LEVEL) * 30.0, rng)
    return img.rotate(deg, fillcolor=_FILL)


def _shear_x(img, level, rng):
    v = _randomly_negate((level / _MAX_LEVEL) * 0.3, rng)
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0), fillcolor=_FILL)


def _shear_y(img, level, rng):
    v = _randomly_negate((level / _MAX_LEVEL) * 0.3, rng)
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0), fillcolor=_FILL)


def _translate_x(img, level, rng):
    v = _randomly_negate((level / _MAX_LEVEL) * 0.45, rng) * img.size[0]
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0), fillcolor=_FILL)


def _translate_y(img, level, rng):
    v = _randomly_negate((level / _MAX_LEVEL) * 0.45, rng) * img.size[1]
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v), fillcolor=_FILL)


def _posterize(img, level, rng):
    bits = max(1, 4 - int((level / _MAX_LEVEL) * 4))
    return ImageOps.posterize(img, bits)


def _solarize(img, level, rng):
    thresh = 256 - int((level / _MAX_LEVEL) * 256)
    return ImageOps.solarize(img, thresh)


def _solarize_add(img, level, rng):
    add = int((level / _MAX_LEVEL) * 110)
    arr = np.asarray(img).astype(np.int32)
    arr = np.where(arr < 128, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _enhance(cls):
    def op(img, level, rng):
        factor = 1.0 + _randomly_negate((level / _MAX_LEVEL) * 0.9, rng)
        return cls(img).enhance(factor)

    return op


_OPS = {
    "AutoContrast": lambda img, level, rng: ImageOps.autocontrast(img),
    "Equalize": lambda img, level, rng: ImageOps.equalize(img),
    "Invert": lambda img, level, rng: ImageOps.invert(img),
    "Rotate": _rotate,
    "Posterize": _posterize,
    "Solarize": _solarize,
    "SolarizeAdd": _solarize_add,
    "Color": _enhance(ImageEnhance.Color),
    "Contrast": _enhance(ImageEnhance.Contrast),
    "Brightness": _enhance(ImageEnhance.Brightness),
    "Sharpness": _enhance(ImageEnhance.Sharpness),
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x,
    "TranslateY": _translate_y,
}


def parse_policy(auto_augment: str) -> Tuple[int, float, float]:
    """Parse a timm-style spec like ``rand-m9-n2-mstd0.5`` -> (num_ops, magnitude, mstd)."""
    num_ops, magnitude, mstd = 2, 9.0, 0.0
    for tok in auto_augment.split("-")[1:]:
        if tok.startswith("mstd"):
            mstd = float(tok[4:])
        elif tok.startswith("m"):
            magnitude = float(tok[1:])
        elif tok.startswith("n"):
            num_ops = int(tok[1:])
        elif tok.startswith("inc"):
            pass  # increasing-severity variant: magnitudes already scale linearly here
    return num_ops, magnitude, mstd


def rand_augment_clip(
    frames: np.ndarray, auto_augment: str, rng: np.random.Generator
) -> np.ndarray:
    """Apply one sampled RandAugment policy to all frames of a clip.

    ``frames``: uint8 (T, H, W, 3). The SAME ops/magnitudes/signs apply to every
    frame (temporal consistency), which the reference achieves by building one
    transform for the clip (ego4d_avgaze_forecast.py:347-356).
    """
    num_ops, magnitude, mstd = parse_policy(auto_augment)
    names = list(_OPS)
    chosen = [names[int(i)] for i in rng.integers(0, len(names), num_ops)]
    # pre-sample per-op randomness so every frame transforms identically
    levels = []
    for _ in chosen:
        level = magnitude
        if mstd > 0:
            level = float(np.clip(rng.normal(magnitude, mstd), 0, _MAX_LEVEL))
        levels.append(level)
    signs = [float(rng.uniform()) for _ in chosen]

    class _FrozenRng:
        """Replays one pre-sampled uniform — keeps sign choices frame-invariant."""

        def __init__(self, value: float):
            self._value = value

        def uniform(self, *a, **k):
            return self._value

    out = np.empty_like(frames)
    for t in range(frames.shape[0]):
        img = Image.fromarray(frames[t])
        for name, level, sign in zip(chosen, levels, signs):
            img = _OPS[name](img, level, _FrozenRng(sign))
        out[t] = np.asarray(img)
    return out


def random_erasing_clip(
    frames: np.ndarray,
    rng: np.random.Generator,
    prob: float = 0.25,
    area_range: Tuple[float, float] = (0.02, 1 / 3),
    aspect_range: Tuple[float, float] = (0.3, 10 / 3),
    max_count: int = 1,
) -> np.ndarray:
    """Cube-consistent RandomErasing (reference random_erasing.py, 'pixel' mode):
    the same region is erased in every frame, filled with per-pixel noise."""
    if rng.uniform() >= prob:
        return frames
    t, h, w, c = frames.shape
    out = frames.copy()
    count = 1 if max_count <= 1 else int(rng.integers(1, max_count + 1))
    for _ in range(count):
        for _attempt in range(10):
            area = h * w * rng.uniform(*area_range) / count
            log_ratio = (np.log(aspect_range[0]), np.log(aspect_range[1]))
            ratio = float(np.exp(rng.uniform(*log_ratio)))
            eh = int(round(np.sqrt(area * ratio)))
            ew = int(round(np.sqrt(area / ratio)))
            if eh < h and ew < w:
                y0 = int(rng.integers(0, h - eh))
                x0 = int(rng.integers(0, w - ew))
                noise = rng.normal(0, 1, (eh, ew, c))
                if frames.dtype == np.uint8:
                    noise = np.clip(noise * 64 + 128, 0, 255).astype(np.uint8)
                out[:, y0 : y0 + eh, x0 : x0 + ew] = noise
                break
    return out
