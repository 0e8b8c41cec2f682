"""Box coordinate utilities (JAX).

Capability parity with the reference's ``util/box_ops.py:9-138`` (cxcywh/xyxy
conversions, pairwise and elementwise IoU/GIoU, masks→boxes), re-written for
jit: no data-dependent asserts — degenerate boxes are handled by clamping the
denominators instead (the reference asserts ``(x2>=x1).all()``, which cannot
run under jit).

All functions take ``[..., 4]`` arrays and broadcast over leading dims.
Pairwise variants take ``[N, 4]`` × ``[M, 4]`` → ``[N, M]`` and should be
``jax.vmap``-ed over a batch axis.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, ``[..., 4] -> [...]``; negative extents clamp to 0."""
    w = jnp.clip(b[..., 2] - b[..., 0], min=0)
    h = jnp.clip(b[..., 3] - b[..., 1], min=0)
    return w * h


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes. ``[N,4] × [M,4] -> ([N,M] iou, [N,M] union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / (union + _EPS), union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes, ``[N,4] × [M,4] -> [N,M]``."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    enclose = wh[..., 0] * wh[..., 1]
    return iou - (enclose - union) / (enclose + _EPS)


def box_iou_elementwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU of xyxy boxes, ``[...,4] × [...,4] -> ([...], [...])``."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / (union + _EPS), union


def generalized_box_iou_elementwise(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise GIoU of xyxy boxes, ``[...,4] × [...,4] -> [...]``."""
    iou, union = box_iou_elementwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    enclose = wh[..., 0] * wh[..., 1]
    return iou - (enclose - union) / (enclose + _EPS)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """``[N, H, W]`` binary masks → ``[N, 4]`` xyxy boxes (zeros if empty)."""
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    big = jnp.float32(1e8)
    any_ = m.sum(axis=(1, 2)) > 0
    x_min = jnp.where(m > 0, xs, big).min(axis=(1, 2))
    y_min = jnp.where(m > 0, ys, big).min(axis=(1, 2))
    x_max = jnp.where(m > 0, xs, -big).max(axis=(1, 2)) + 1
    y_max = jnp.where(m > 0, ys, -big).max(axis=(1, 2)) + 1
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_[:, None], boxes, jnp.zeros_like(boxes))
