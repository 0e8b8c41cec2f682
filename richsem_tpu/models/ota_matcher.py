"""simOTA matcher (static-shaped).

Capability parity with the reference ``OptMatcher``
(models/richsem/matcher.py:161-315): many-to-one dynamic-k assignment —
per GT, ``k = clamp(Σ top-10 IoU, 1)`` lowest-cost queries are selected;
query conflicts resolve to the min-cost GT; the in-box/in-center priors add
large cost offsets exactly as the reference does.

Static-shape redesign: the per-GT python top-k loop becomes a rank-vs-k
mask over a single top-10; the reference's unmatched-GT repair ``while``
loop becomes one fixup round (argmin over still-free queries) — GTs left
unmatched by the repair are dropped from the loss via the −1 sentinel, an
edge the reference only hits when GTs outnumber usable queries.

Output layout: ``gt_of_query [B, nq]`` (−1 = unmatched/background) —
many-to-one, unlike the Hungarian ``col [B, G]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from richsem_tpu.utils import boxes as box_ops


def _in_boxes_info(pred_boxes, gt_xyxy, gt_cxcywh, expanded_strides=32.0):
    """(matcher.py:242-273): anchor-center-in-gt and in-fixed-center masks."""
    cx = pred_boxes[:, 0:1]
    cy = pred_boxes[:, 1:2]
    in_box = (
        (cx > gt_xyxy[None, :, 0])
        & (cx < gt_xyxy[None, :, 2])
        & (cy > gt_xyxy[None, :, 1])
        & (cy < gt_xyxy[None, :, 3])
    )  # [nq, G]
    r = 2.5 / expanded_strides
    in_center = (
        (cx > gt_cxcywh[None, :, 0] - r)
        & (cx < gt_cxcywh[None, :, 0] + r)
        & (cy > gt_cxcywh[None, :, 1] - r)
        & (cy < gt_cxcywh[None, :, 1] + r)
    )
    fg = in_box.any(1) | in_center.any(1)  # [nq]
    return fg, in_box & in_center


def ota_match_single(
    pred_logits: jnp.ndarray,  # [nq, C]
    pred_boxes: jnp.ndarray,  # [nq, 4] cxcywh
    gt_labels: jnp.ndarray,  # [G]
    gt_boxes: jnp.ndarray,  # [G, 4] cxcywh
    gt_valid: jnp.ndarray,  # [G]
    cost_giou_weight: float = 3.0,
    n_candidate_k: int = 10,
    focal_alpha: float = 0.25,
) -> jnp.ndarray:
    nq = pred_logits.shape[0]
    g = gt_labels.shape[0]
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    neg = (1 - focal_alpha) * prob**2 * (-jnp.log(1 - prob + 1e-8))
    pos = focal_alpha * (1 - prob) ** 2 * (-jnp.log(prob + 1e-8))
    cls_cost = (pos - neg)[:, jnp.clip(gt_labels, 0)]  # [nq, G]

    gt_xyxy = box_ops.box_cxcywh_to_xyxy(gt_boxes.astype(jnp.float32))
    pred_xyxy = box_ops.box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32))
    giou = box_ops.generalized_box_iou(pred_xyxy, gt_xyxy)  # [nq, G]
    iou, _ = box_ops.box_iou(pred_xyxy, gt_xyxy)

    fg, in_both = _in_boxes_info(pred_boxes.astype(jnp.float32), gt_xyxy, gt_boxes)
    cost = cls_cost - cost_giou_weight * giou + 100.0 * (~in_both)
    cost = cost + jnp.where(fg, 0.0, 10000.0)[:, None]
    cost = jnp.where(gt_valid[None, :], cost, 1e9)

    # dynamic k per gt: clamp(int(Σ top-10 ious), 1)
    topk_iou = jax.lax.top_k(iou.T, n_candidate_k)[0]  # [G, 10]
    dyn_k = jnp.clip(topk_iou.sum(-1).astype(jnp.int32), 1, n_candidate_k)

    # per gt: mark its top-`dyn_k` lowest-cost queries
    neg_cost_t = -cost.T  # [G, nq]
    topv, topi = jax.lax.top_k(neg_cost_t, n_candidate_k)  # best (lowest cost)
    rank = jnp.arange(n_candidate_k)[None, :]
    sel = rank < dyn_k[:, None]  # [G, 10]
    matching = jnp.zeros((g, nq), bool)
    gidx = jnp.broadcast_to(jnp.arange(g)[:, None], topi.shape)
    matching = matching.at[gidx, topi].max(sel)
    matching = matching & gt_valid[:, None]

    # resolve query conflicts: keep min-cost gt per query
    conflict = matching.sum(0) > 1
    best_gt = jnp.argmin(cost, axis=1)  # [nq]
    onehot_best = jax.nn.one_hot(best_gt, g, dtype=bool).T  # [G, nq]
    matching = jnp.where(conflict[None, :], matching & onehot_best, matching)

    # one repair round for unmatched gts: argmin over still-free queries
    free_q = matching.sum(0) == 0
    unmatched = gt_valid & (matching.sum(1) == 0)
    repair_cost = jnp.where(free_q[None, :], cost.T, 1e18)  # [G, nq]
    repair_q = jnp.argmin(repair_cost, axis=1)
    matching = matching.at[jnp.arange(g), repair_q].max(unmatched)

    # layout: gt index per query (−1 background); conflicts resolved above
    gt_of_query = jnp.where(
        matching.any(0), jnp.argmax(matching, axis=0), -1
    ).astype(jnp.int32)
    return gt_of_query


def ota_match(pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid, **kw):
    """Batched simOTA → ``gt_of_query [B, nq]``."""
    return jax.vmap(lambda l_, b_, gl, gb, gv: ota_match_single(l_, b_, gl, gb, gv, **kw))(
        pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid
    )
