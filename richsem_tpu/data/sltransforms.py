"""Photometric ("SLT") augmentation ops.

Capability parity with the reference's strong-augmentation photometric ops
(datasets/sltransform.py:14-249: AdjustBrightness, AdjustContrast,
LightingNoise channel permutation, RandomSelectMulti composition) — numpy/
cv2 implementations over the same Record dicts as
:mod:`richsem_tpu.data.transforms`. Boxes are untouched by all of these.
"""

from __future__ import annotations

import random
from typing import Callable, Sequence

import numpy as np

from richsem_tpu.data.transforms import Record

_PERMS = [
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)
]


def adjust_brightness(r: Record, factor: float) -> Record:
    r = dict(r)
    img = r["image"].astype(np.float32) * factor
    r["image"] = np.clip(img, 0, 255).astype(r["image"].dtype)
    return r


def adjust_contrast(r: Record, factor: float) -> Record:
    r = dict(r)
    img = r["image"].astype(np.float32)
    mean = img.mean(axis=(0, 1), keepdims=True)
    img = mean + (img - mean) * factor
    r["image"] = np.clip(img, 0, 255).astype(r["image"].dtype)
    return r


def lighting_noise(r: Record, rng: random.Random) -> Record:
    """Random RGB channel permutation (sltransform.py LightingNoise)."""
    r = dict(r)
    perm = _PERMS[rng.randrange(len(_PERMS))]
    r["image"] = np.ascontiguousarray(r["image"][:, :, perm])
    return r


def random_photometric(
    r: Record,
    rng: random.Random,
    brightness_range=(0.7, 1.3),
    contrast_range=(0.7, 1.3),
    prob: float = 0.5,
) -> Record:
    """RandomSelectMulti-style: each op applies independently with ``prob``."""
    if rng.random() < prob:
        r = adjust_brightness(r, rng.uniform(*brightness_range))
    if rng.random() < prob:
        r = adjust_contrast(r, rng.uniform(*contrast_range))
    if rng.random() < prob:
        r = lighting_noise(r, rng)
    return r
