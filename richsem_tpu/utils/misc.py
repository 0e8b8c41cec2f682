"""Small numeric helpers shared across the framework.

Parity notes: ``inverse_sigmoid`` mirrors the reference ``util/misc.py:605-609``
(clamped logit); ``pad_to_multiple``/``batch_images`` replace the reference's
``NestedTensor``/``nested_tensor_from_tensor_list`` (util/misc.py:286-458) —
on TPU we represent a padded batch as a plain ``(images[B,H,W,3],
pad_mask[B,H,W])`` pair with H, W rounded up to a size divisibility, so the
whole batch is a static-shaped array suitable for jit.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Gradient-safe L2 normalize.

    ``x / (jnp.linalg.norm(x) + eps)`` has a NaN *gradient* at x == 0
    (0/0 inside the sqrt VJP) — and zero vectors do occur (e.g. the
    encoder-output memory is zeroed at invalid proposals). ``sqrt(Σx²+eps²)``
    keeps both the value and the gradient finite everywhere.
    """
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps * eps)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, min=eps)
    x2 = jnp.clip(1.0 - x, min=eps)
    return jnp.log(x1) - jnp.log(x2)


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def pad_to_multiple(h: int, w: int, divisibility: int = 32) -> Tuple[int, int]:
    return round_up(h, divisibility), round_up(w, divisibility)


def batch_images(
    images: Sequence[np.ndarray],
    size_divisibility: int = 32,
    target_hw: Tuple[int, int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a list of HWC float images to a common (H, W); returns (batch, mask).

    ``mask[b, y, x]`` is True on *padding* (matching the reference's
    NestedTensor convention, util/misc.py:400-428). When ``target_hw`` is
    given the batch pads to that fixed canvas (static-shape bucketing for
    TPU); images larger than the canvas are an error.
    """
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    if target_hw is not None:
        th, tw = target_hw
        if max_h > th or max_w > tw:
            raise ValueError(f"image ({max_h},{max_w}) exceeds canvas {target_hw}")
        max_h, max_w = th, tw
    else:
        max_h, max_w = pad_to_multiple(max_h, max_w, size_divisibility)

    batch = np.zeros((len(images), max_h, max_w, images[0].shape[2]), np.float32)
    mask = np.ones((len(images), max_h, max_w), bool)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        batch[i, :h, :w] = im
        mask[i, :h, :w] = False
    return batch, mask


def downsample_mask(mask: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Downsample a [B,H,W] bool padding mask to stride-s resolution.

    Mirrors the reference's per-level interpolation of the padding mask
    (models/richsem/backbone.py:83-92): a coarse cell is padding only if the
    corresponding fine region is entirely padding.
    """
    b, h, w = mask.shape
    hh, ww = h // stride, w // stride
    m = mask[:, : hh * stride, : ww * stride]
    m = m.reshape(b, hh, stride, ww, stride)
    return m.all(axis=(2, 4))


def resize_mask(mask: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of a [B,H,W] bool mask to (h, w).

    Mirrors the reference's per-level mask production
    (``F.interpolate(mask.float(), size=feat_hw)`` → bool, nearest mode;
    backbone.py:83-92 and richsem.py:606-607): sample index
    ``floor(i * H / h)``.
    """
    b, h0, w0 = mask.shape
    h, w = hw
    ys = jnp.floor(jnp.arange(h) * (h0 / h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w) * (w0 / w)).astype(jnp.int32)
    return mask[:, ys][:, :, xs]


def valid_ratios(mask: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W] padding mask → [B,2] (w_ratio, h_ratio) of valid content.

    Mirrors deformable_transformer.py:253-260 (get_valid_ratio).
    """
    not_mask = ~mask
    valid_h = not_mask[:, :, 0].sum(axis=1)
    valid_w = not_mask[:, 0, :].sum(axis=1)
    h = mask.shape[1]
    w = mask.shape[2]
    return jnp.stack(
        [valid_w.astype(jnp.float32) / w, valid_h.astype(jnp.float32) / h], axis=-1
    )
