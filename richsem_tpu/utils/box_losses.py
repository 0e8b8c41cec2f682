"""CIoU / DIoU box losses.

Capability parity with the reference's ``util/box_loss.py:7-112`` (present
but unused by the active LVIS configs — kept for the full capability
surface). Elementwise over ``[..., 4]`` xyxy boxes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from richsem_tpu.utils.boxes import box_iou_elementwise

_EPS = 1e-7


def diou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """1 − IoU + center-distance²/diagonal² (elementwise)."""
    iou, _ = box_iou_elementwise(boxes1, boxes2)
    c1 = (boxes1[..., :2] + boxes1[..., 2:]) * 0.5
    c2 = (boxes2[..., :2] + boxes2[..., 2:]) * 0.5
    rho2 = ((c1 - c2) ** 2).sum(-1)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    diag2 = ((rb - lt) ** 2).sum(-1) + _EPS
    return 1.0 - iou + rho2 / diag2


def ciou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """DIoU + aspect-ratio consistency term."""
    iou, _ = box_iou_elementwise(boxes1, boxes2)
    d = diou_loss(boxes1, boxes2)
    w1 = jnp.clip(boxes1[..., 2] - boxes1[..., 0], min=_EPS)
    h1 = jnp.clip(boxes1[..., 3] - boxes1[..., 1], min=_EPS)
    w2 = jnp.clip(boxes2[..., 2] - boxes2[..., 0], min=_EPS)
    h2 = jnp.clip(boxes2[..., 3] - boxes2[..., 1], min=_EPS)
    v = (4.0 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = v / jnp.clip(1.0 - iou + v, min=_EPS)
    return d + jnp.where(iou >= 0.5, alpha * v, 0.0)
