"""Greedy NMS on device (static shapes).

The reference calls torchvision's CUDA ``nms`` inside PostProcess when
``nms_iou_threshold > 0`` (models/richsem/richsem.py:1340-1348, off by
default: baseline_4scale.py:95 sets −1). TPU version: a fixed-iteration
greedy sweep over the score-sorted boxes producing a keep *mask* instead of
a dynamically-sized index list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from richsem_tpu.utils.boxes import box_iou


def nms_mask(
    boxes: jnp.ndarray,  # [N, 4] xyxy
    scores: jnp.ndarray,  # [N]
    iou_threshold: float,
) -> jnp.ndarray:
    """→ keep mask [N] bool. Boxes must NOT be pre-sorted; ties broken by
    score order like torchvision."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    iou, _ = box_iou(boxes_sorted, boxes_sorted)

    def body(i, keep):
        # suppress j>i overlapping i, but only if i itself is kept
        suppress = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & keep[i]
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep
