"""PostProcess: model outputs → top-k scored boxes in image coordinates.

Parity with the reference ``PostProcess`` (models/richsem/richsem.py:1309-1367):
sigmoid over all (query, class) pairs, flat top-``num_select`` (300), label
= idx mod C, box = idx div C, cxcywh→xyxy, scale to the original image size.
Optional greedy NMS zeroes suppressed detections' scores instead of dropping
them (static shapes); evaluators sort by score so the result is identical.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from richsem_tpu.ops.nms import nms_mask
from richsem_tpu.utils.boxes import box_cxcywh_to_xyxy


def postprocess(
    pred_logits: jnp.ndarray,  # [B, nq, C]
    pred_boxes: jnp.ndarray,  # [B, nq, 4] normalized cxcywh
    target_sizes: jnp.ndarray,  # [B, 2] (h, w) original image sizes
    num_select: int = 300,
    nms_iou_threshold: float = -1.0,
    not_to_xyxy: bool = False,
) -> Dict[str, jnp.ndarray]:
    b, nq, c = pred_logits.shape
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32)).reshape(b, nq * c)
    scores, idx = jax.lax.top_k(prob, num_select)  # [B, K]
    labels = idx % c
    qidx = idx // c
    boxes = pred_boxes.astype(jnp.float32)
    if not not_to_xyxy:
        boxes = box_cxcywh_to_xyxy(boxes)
    boxes = jnp.take_along_axis(boxes, qidx[..., None], axis=1)  # [B, K, 4]
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=-1).astype(jnp.float32)[:, None, :]
    boxes = boxes * scale
    if nms_iou_threshold > 0:
        keep = jax.vmap(nms_mask, in_axes=(0, 0, None))(
            boxes, scores, nms_iou_threshold
        )
        scores = jnp.where(keep, scores, -1.0)
    return {"scores": scores, "labels": labels, "boxes": boxes}
