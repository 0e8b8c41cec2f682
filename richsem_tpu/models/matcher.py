"""Set-prediction matchers — batched, on-device.

Capability parity with the reference matchers (models/richsem/matcher.py):

* ``hungarian_match`` — the ``HungarianMatcher`` (matcher.py:21-78): focal
  class cost + L1 box cost + GIoU cost, solved exactly. The reference moves
  every cost matrix to the CPU and runs scipy per image (matcher.py:73-78 —
  SURVEY.md hot-loop #3, a device→host sync 7× per step). Here the cost is
  a padded ``[B, G, nq]`` tensor and the assignment is the on-device auction
  solver (:mod:`richsem_tpu.ops.lap`), inside jit.
* ``minsum_match`` — ``SimpleMinsumMatcher`` (matcher.py:81-158): per-GT
  row-argmin, collisions allowed.
* matcher_type='HungarianMatcherCPU' (scipy host-callback) is kept as the
  oracle path for tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from richsem_tpu.ops.lap import (
    batched_min_cost_assignment,
    greedy_assignment,
    scipy_assignment_callback,
)
from richsem_tpu.utils import boxes as box_ops


def match_cost_matrix(
    pred_logits: jnp.ndarray,  # [B, nq, C]
    pred_boxes: jnp.ndarray,  # [B, nq, 4] cxcywh
    gt_labels: jnp.ndarray,  # [B, G]
    gt_boxes: jnp.ndarray,  # [B, G, 4] cxcywh
    gt_valid: jnp.ndarray,  # [B, G]
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Cost ``[B, G, nq]`` (GT rows × query columns). Invalid rows get 0."""
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    # focal-style class cost at each gt's label (matcher.py:49-56)
    neg = (1 - focal_alpha) * prob**gamma * (-jnp.log(1 - prob + 1e-8))
    pos = focal_alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    cls_cost_all = pos - neg  # [B, nq, C]
    safe_labels = jnp.clip(gt_labels, 0)
    cls = jnp.take_along_axis(
        cls_cost_all.transpose(0, 2, 1), safe_labels[..., None], axis=1
    )  # [B, G, nq]

    l1 = jnp.abs(
        gt_boxes[:, :, None, :].astype(jnp.float32)
        - pred_boxes[:, None, :, :].astype(jnp.float32)
    ).sum(-1)
    giou = jax.vmap(box_ops.generalized_box_iou)(
        box_ops.box_cxcywh_to_xyxy(gt_boxes.astype(jnp.float32)),
        box_ops.box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32)),
    )  # [B, G, nq]
    cost = cost_class * cls + cost_bbox * l1 + cost_giou * (-giou)
    cost = jnp.nan_to_num(cost, nan=0.0, posinf=0.0, neginf=0.0)
    return jnp.where(gt_valid[..., None], cost, 0.0)


@functools.partial(jax.jit, static_argnames=("matcher_type",))
def match(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
    matcher_type: str = "HungarianMatcher",
) -> jnp.ndarray:
    """→ ``col [B, G]``: query index matched to each GT (−1 for invalid)."""
    cost = match_cost_matrix(
        pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid,
        cost_class, cost_bbox, cost_giou, focal_alpha,
    )
    if matcher_type == "HungarianMatcher":
        return batched_min_cost_assignment(cost, gt_valid)
    if matcher_type == "SimpleMinsumMatcher":
        return greedy_assignment(cost, gt_valid)
    if matcher_type == "HungarianMatcherCPU":
        return scipy_assignment_callback(cost, gt_valid)
    raise ValueError(f"unknown matcher_type {matcher_type!r}")
