"""Box-aware augmentation pipeline (numpy/cv2, host-side).

Capability parity with the reference aug primitives
(datasets/transforms.py:32-283) and the train/val recipes
(datasets/coco.py:529-696):

  train: HFlip(0.5) → RandomSelect( multi-scale resize 480–800 @ max 1333
         | resize{400,500,600} → RandomSizeCrop(384,600) → multi-scale
         resize ) → Normalize (ImageNet stats, boxes → normalized cxcywh)
  val:   resize 800 @ max 1333 → Normalize

Records are plain dicts of numpy arrays:
  ``image`` HWC uint8 · ``boxes`` [N,4] xyxy float32 (absolute px) ·
  ``labels`` [N] int64 · ``area`` [N] · ``iscrowd`` [N] · ``orig_size``
  (h, w) · ``size`` (h, w after aug).

PIL's bilinear resampling is replaced by cv2 (``INTER_LINEAR`` /
``INTER_AREA`` for downscale) — faster C path, numerically equivalent for
training purposes.
"""

from __future__ import annotations

import random
from typing import Callable, List, Optional, Sequence, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

Record = dict


# ----------------------------------------------------------------------
# primitives
# ----------------------------------------------------------------------
def hflip(r: Record) -> Record:
    r = dict(r)
    h, w = r["image"].shape[:2]
    r["image"] = np.ascontiguousarray(r["image"][:, ::-1])
    if len(r["boxes"]):
        b = r["boxes"].copy()
        b[:, [0, 2]] = w - b[:, [2, 0]]
        r["boxes"] = b
    return r


def _target_hw(h: int, w: int, size: int, max_size: Optional[int]) -> Tuple[int, int]:
    """Shortest-side resize with max cap (transforms.py:95-115 semantics)."""
    if max_size is not None:
        mn, mx = float(min(h, w)), float(max(h, w))
        if mx / mn * size > max_size:
            size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return oh, ow


def resize(r: Record, size: int, max_size: Optional[int] = None) -> Record:
    r = dict(r)
    h, w = r["image"].shape[:2]
    nh, nw = _target_hw(h, w, size, max_size)
    if (nh, nw) != (h, w):
        interp = cv2.INTER_AREA if nh < h else cv2.INTER_LINEAR
        r["image"] = cv2.resize(r["image"], (nw, nh), interpolation=interp)
    rw, rh = nw / w, nh / h
    if len(r["boxes"]):
        r["boxes"] = r["boxes"] * np.array([rw, rh, rw, rh], np.float32)
    if "area" in r:
        r["area"] = r["area"] * (rw * rh)
    r["size"] = (nh, nw)
    return r


def crop(r: Record, top: int, left: int, ch: int, cw: int) -> Record:
    """Crop + clamp boxes + drop degenerate (transforms.py:32-73)."""
    r = dict(r)
    r["image"] = np.ascontiguousarray(r["image"][top : top + ch, left : left + cw])
    r["size"] = (ch, cw)
    if len(r["boxes"]):
        b = r["boxes"] - np.array([left, top, left, top], np.float32)
        b[:, 0::2] = b[:, 0::2].clip(0, cw)
        b[:, 1::2] = b[:, 1::2].clip(0, ch)
        keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
        r["boxes"] = b[keep]
        for f in ("labels", "area", "iscrowd"):
            if f in r:
                r[f] = r[f][keep]
        r["area"] = (
            (r["boxes"][:, 2] - r["boxes"][:, 0])
            * (r["boxes"][:, 3] - r["boxes"][:, 1])
        )
    return r


def random_size_crop(r: Record, min_size: int, max_size: int, rng: random.Random) -> Record:
    h, w = r["image"].shape[:2]
    # clamp so small images stay valid (reference assumes shortest side ≥
    # min_size by recipe construction)
    cw = rng.randint(min(min_size, w), max(min(w, max_size), min(min_size, w)))
    ch = rng.randint(min(min_size, h), max(min(h, max_size), min(min_size, h)))
    top = rng.randint(0, h - ch)
    left = rng.randint(0, w - cw)
    return crop(r, top, left, ch, cw)


def normalize(r: Record) -> Record:
    """uint8 HWC → float32 normalized; boxes → normalized cxcywh."""
    r = dict(r)
    img = r["image"].astype(np.float32) / 255.0
    r["image"] = (img - IMAGENET_MEAN) / IMAGENET_STD
    h, w = img.shape[:2]
    if len(r["boxes"]):
        b = r["boxes"].astype(np.float32)
        cxcywh = np.stack(
            [
                (b[:, 0] + b[:, 2]) / 2,
                (b[:, 1] + b[:, 3]) / 2,
                b[:, 2] - b[:, 0],
                b[:, 3] - b[:, 1],
            ],
            axis=1,
        )
        r["boxes"] = cxcywh / np.array([w, h, w, h], np.float32)
    r["size"] = (h, w)
    return r


# ----------------------------------------------------------------------
# recipes
# ----------------------------------------------------------------------
def make_train_transform(
    scales: Sequence[int],
    max_size: int,
    scales2_resize: Sequence[int],
    scales2_crop: Tuple[int, int],
) -> Callable[[Record, random.Random], Record]:
    def tf(r: Record, rng: random.Random) -> Record:
        if rng.random() < 0.5:
            r = hflip(r)
        if rng.random() < 0.5:
            r = resize(r, rng.choice(list(scales)), max_size)
        else:
            r = resize(r, rng.choice(list(scales2_resize)))
            r = random_size_crop(r, scales2_crop[0], scales2_crop[1], rng)
            r = resize(r, rng.choice(list(scales)), max_size)
        return normalize(r)

    return tf


def make_eval_transform(scales: Sequence[int], max_size: int) -> Callable[[Record], Record]:
    size = max(scales)

    def tf(r: Record) -> Record:
        return normalize(resize(r, size, max_size))

    return tf
