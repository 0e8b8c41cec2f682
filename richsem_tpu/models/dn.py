"""Contrastive denoising (CDN) query construction — static-shaped, on-device.

Capability parity with the reference's ``prepare_for_cdn``
(models/richsem/dn_components.py:11-193), redesigned for jit:

The reference sizes its DN tensors dynamically — group count
``g = dn_number // max_gt`` and pad ``2·g·max_gt`` change per batch
(dn_components.py:27-39). Here the pad is the static worst case
``2 · dn_number`` slots and the *same* group arithmetic lives in the data:
slot ``s`` belongs to group ``s // (2m)`` (``m`` = batch max GT count, a
traced scalar), is negative if ``s % (2m) >= m``, and maps to GT
``s % m``; slots past ``2·m·g`` are inactive (label −1, masked out of
attention and loss). Shapes never change; only mask contents do.

Noise parity (dn_components.py:58-90):
  * label flip: probability ``label_noise_ratio/2`` to a uniform class;
  * box noise in xyxy corner space: each corner moves by
    ``±U · (w/2, h/2) · box_noise_scale`` with ``U ∈ [0,1)`` for positives
    and ``U ∈ [1,2)`` for negatives, then clamp to [0,1] and back to cxcywh.

Attention-mask parity (dn_components.py:157-179), in *attend=True*
convention: matching queries never see DN; DN groups never see each other;
DN may see matching queries.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from richsem_tpu.utils.misc import inverse_sigmoid


def prepare_cdn(
    gt_labels: jnp.ndarray,  # [B, G] int32
    gt_boxes: jnp.ndarray,  # [B, G, 4] normalized cxcywh
    gt_valid: jnp.ndarray,  # [B, G] bool
    rng: jax.Array,
    dn_number: int = 100,
    label_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
    num_classes: int = 1204,
    num_queries: int = 900,
    check_pos_dn: bool = False,
    group_mode: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (dn_labels [B,P], dn_boxes_unsig [B,P,4], attn_mask [B,QT,QT],
    dn_meta) with P = 2·dn_number (budget) or 4·dn_number·G (group mode),
    QT = P + num_queries.

    ``group_mode`` implements the reference's dn_number<50 branch
    (dn_components.py:27-39): after its internal ×2, a value < 100 is used
    DIRECTLY as the group count — groups = 2·dn_number independent of the
    batch GT count, active slots = groups·2·m (dynamic in m), padded here
    to the static worst case groups·2·G. The default budget branch
    (dn_number ≥ 50 ⇒ groups = dn_number // m) is what every shipped
    recipe uses (dn_number=100).

    dn_meta: ``match_gt [B,P]`` (gt index for active *positive* slots, else
    −1), ``slot_active [B,P]``, ``num_groups`` (traced scalar, the
    normalization factor for DN losses — criterion parity richsem.py:1164).
    """
    b, g_slots = gt_labels.shape
    pad = (2 * 2 * dn_number * g_slots) if group_mode else (2 * dn_number)

    counts = gt_valid.sum(axis=1)  # [B]
    m = jnp.maximum(counts.max(), 1)  # batch max GT
    if group_mode:
        # empty batch edge: the reference collapses to one group
        groups = jnp.where(counts.max() == 0, 1, 2 * dn_number)
    else:
        groups = jnp.clip(dn_number // m, 1, dn_number)  # dyn scalar

    slot = jnp.arange(pad)
    group_id = slot // (2 * m)  # [P]
    within = slot % (2 * m)
    is_neg = within >= m
    gt_idx = within % m  # [P]
    active = (group_id < groups)[None, :] & (gt_idx[None, :] < counts[:, None])

    # gather per-slot gt labels/boxes (clipped; inactive masked later)
    safe_idx = jnp.clip(gt_idx, 0, g_slots - 1)
    labels = gt_labels[:, safe_idx]  # [B, P]
    boxes = gt_boxes[:, safe_idx]  # [B, P, 4]

    k_flip, k_new, k_sign, k_part = jax.random.split(rng, 4)

    # ---- label noise -------------------------------------------------
    flip = jax.random.uniform(k_flip, (b, pad)) < (label_noise_ratio * 0.5)
    new_label = jax.random.randint(k_new, (b, pad), 0, num_classes)
    noised_labels = jnp.where(flip, new_label, labels)
    dn_labels = jnp.where(active, noised_labels, -1)

    # ---- box noise (xyxy corner space) -------------------------------
    cxcy, wh = boxes[..., :2], boxes[..., 2:]
    xyxy = jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)
    half = jnp.concatenate([wh / 2, wh / 2], axis=-1)
    sign = jax.random.randint(k_sign, (b, pad, 4), 0, 2).astype(jnp.float32) * 2 - 1
    part = jax.random.uniform(k_part, (b, pad, 4))
    part = part + is_neg[None, :, None].astype(jnp.float32)  # negatives: [1,2)
    if check_pos_dn:
        # halve the positive noise until each noised positive's best-IoU gt
        # is its own gt — fixed 5 tries (dn_components.py:91-119)
        from richsem_tpu.utils.boxes import box_iou

        gt_xyxy = jnp.concatenate(
            [gt_boxes[..., :2] - gt_boxes[..., 2:] / 2,
             gt_boxes[..., :2] + gt_boxes[..., 2:] / 2], axis=-1)

        def one_try(_, part):
            cand = jnp.clip(xyxy + sign * part * half * box_noise_scale, 0, 1)
            iou = jax.vmap(lambda a, g_: box_iou(a, g_)[0])(cand, gt_xyxy)
            iou = jnp.where(gt_valid[:, None, :], iou, -1.0)  # [B, P, G]
            best = jnp.argmax(iou, axis=-1)
            need = (best != jnp.clip(gt_idx, 0, g_slots - 1)[None, :]) & (
                active & ~is_neg[None, :]
            )
            return jnp.where(need[..., None], part * 0.5, part)

        part = jax.lax.fori_loop(0, 5, one_try, part)
    noised = xyxy + sign * part * half * box_noise_scale
    noised = jnp.clip(noised, 0.0, 1.0)
    cxcy_n = (noised[..., :2] + noised[..., 2:]) / 2
    wh_n = noised[..., 2:] - noised[..., :2]
    dn_boxes = jnp.concatenate([cxcy_n, wh_n], axis=-1)
    dn_boxes_unsig = inverse_sigmoid(dn_boxes)
    dn_boxes_unsig = jnp.where(active[..., None], dn_boxes_unsig, 0.0)

    # ---- attention mask (True = may attend) --------------------------
    qt = pad + num_queries
    is_dn = jnp.arange(qt) < pad
    same_group = group_id[:, None] == group_id[None, :]  # [P, P]
    mask = jnp.ones((qt, qt), bool)
    # matching → dn blocked
    mask = mask & ~(~is_dn[:, None] & is_dn[None, :])
    # dn → dn: same group only
    dn_block = jnp.zeros((qt, qt), bool).at[:pad, :pad].set(~same_group)
    mask = mask & ~dn_block
    attn_mask = jnp.broadcast_to(mask[None], (b, qt, qt))

    match_gt = jnp.where(active & ~is_neg[None, :], gt_idx[None, :], -1)
    # slots belonging to an in-use group: supervised (as background unless a
    # positive), even when their content is zero padding — parity with the
    # reference's batch-uniform pad (dn_components.py:66, richsem.py:1155+)
    slot_in_use = jnp.broadcast_to((group_id < groups)[None, :], (b, pad))
    dn_meta = {
        "match_gt": match_gt,
        "slot_active": active,
        "slot_in_use": slot_in_use,
        "num_groups": groups,
    }
    return dn_labels, dn_boxes_unsig, attn_mask, dn_meta
