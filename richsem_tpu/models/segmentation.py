"""Instance segmentation heads (vestigial in the reference, ``masks=False``).

Capability parity with models/richsem/segmentation.py:20-367: the
``DETRsegm`` pattern — per-query multi-head attention maps over the C5
feature (``MHAttentionMap``, :244-280) feeding an FPN-style small conv mask
head (``MaskHeadSmallConv``, :171-241) that upsamples through C4/C3
adapters to stride-8 per-query masks — plus the focal+dice mask losses and
``PostProcessSegm`` resize/threshold (:300-330).

TPU-first notes: NHWC; the per-query mask head runs with queries folded
into the batch axis (static shapes); GroupNorm(8) like the reference.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MHAttentionMap(nn.Module):
    """Per-query spatial attention maps (2-D softmax over the feature)."""

    hidden_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, queries: jnp.ndarray, feature: jnp.ndarray,
                 pad_mask=None) -> jnp.ndarray:
        """queries [B, Q, C], feature [B, H, W, C] → [B, Q, heads, H, W]."""
        b, q_n, _ = queries.shape
        _, h, w, _ = feature.shape
        hd = self.hidden_dim // self.num_heads
        q = nn.Dense(self.hidden_dim, name="q_proj")(queries)
        k = nn.Conv(self.hidden_dim, (1, 1), name="k_proj")(feature)
        q = q.reshape(b, q_n, self.num_heads, hd)
        k = k.reshape(b, h * w, self.num_heads, hd)
        logits = jnp.einsum("bqnd,bsnd->bqns", q, k) * (hd**-0.5)
        if pad_mask is not None:
            logits = jnp.where(
                pad_mask.reshape(b, 1, 1, h * w), -1e9, logits
            )
        attn = jax.nn.softmax(logits, axis=-1)
        return attn.reshape(b, q_n, self.num_heads, h, w)


def _upsample_like(x: jnp.ndarray, ref_hw: Tuple[int, int]) -> jnp.ndarray:
    b = x.shape[0]
    return jax.image.resize(
        x, (b, ref_hw[0], ref_hw[1], x.shape[-1]), method="nearest"
    )


class MaskHeadSmallConv(nn.Module):
    """FPN-style conv mask head: (C5-proj ++ attn maps) ↑ C4 ↑ C3 → 1ch."""

    hidden_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(
        self,
        attn_maps: jnp.ndarray,  # [B, Q, heads, H5, W5]
        c5: jnp.ndarray,  # [B, H5, W5, C]
        c4: jnp.ndarray,  # [B, H4, W4, C]
        c3: jnp.ndarray,  # [B, H3, W3, C]
    ) -> jnp.ndarray:
        """→ mask logits [B, Q, H3, W3] (stride 8)."""
        b, q_n, heads, h5, w5 = attn_maps.shape
        d = self.hidden_dim

        def block(x, ch, name):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, name=f"{name}_conv")(x)
            x = nn.GroupNorm(num_groups=min(8, ch), name=f"{name}_gn")(x)
            return nn.relu(x)

        # fold queries into batch: [B*Q, H5, W5, C + heads]
        c5_p = block(c5, d, "lay1")  # [B, H5, W5, d]
        c5_q = jnp.broadcast_to(
            c5_p[:, None], (b, q_n, h5, w5, d)
        ).reshape(b * q_n, h5, w5, d)
        am = attn_maps.transpose(0, 1, 3, 4, 2).reshape(b * q_n, h5, w5, heads)
        x = jnp.concatenate([c5_q, am], axis=-1)
        x = block(x, d, "lay2")
        # ↑ to C4
        a4 = nn.Conv(d // 2, (1, 1), name="adapter4")(c4)
        x = block(x, d // 2, "lay3")
        x = _upsample_like(x, c4.shape[1:3])
        x = x + jnp.broadcast_to(
            a4[:, None], (b, q_n) + a4.shape[1:]
        ).reshape(b * q_n, *a4.shape[1:])
        # ↑ to C3
        a3 = nn.Conv(d // 4, (1, 1), name="adapter3")(c3)
        x = block(x, d // 4, "lay4")
        x = _upsample_like(x, c3.shape[1:3])
        x = x + jnp.broadcast_to(
            a3[:, None], (b, q_n) + a3.shape[1:]
        ).reshape(b * q_n, *a3.shape[1:])
        x = block(x, d // 8, "lay5")
        out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, name="out_conv")(x)
        return out[..., 0].reshape(b, q_n, c3.shape[1], c3.shape[2])


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, valid: jnp.ndarray,
              num_boxes) -> jnp.ndarray:
    """logits/targets [N, H, W]; valid [N] — (segmentation.py dice parity)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(logits.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    num = 2.0 * (p * t).sum(-1)
    den = p.sum(-1) + t.sum(-1)
    loss = 1.0 - (num + 1.0) / (den + 1.0)
    return (loss * valid.astype(jnp.float32)).sum() / num_boxes


def mask_focal_loss(logits, targets, valid, num_boxes, alpha=0.25, gamma=2.0):
    lg = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    ce = jnp.clip(lg, 0) - lg * t + jnp.log1p(jnp.exp(-jnp.abs(lg)))
    p = jax.nn.sigmoid(lg)
    p_t = p * t + (1 - p) * (1 - t)
    a_t = alpha * t + (1 - alpha) * (1 - t)
    loss = (a_t * ce * (1 - p_t) ** gamma).mean(axis=(-2, -1))
    return (loss * valid.astype(jnp.float32)).sum() / num_boxes


def loss_masks(
    pred_masks: jnp.ndarray,  # [B, Q, Hm, Wm]
    col: jnp.ndarray,  # [B, G] matched query per gt
    gt_masks: jnp.ndarray,  # [B, G, Hm, Wm]
    gt_valid: jnp.ndarray,  # [B, G]
    num_boxes,
):
    """Matched-query mask losses (criterion loss_masks, richsem.py:1073-1100)."""
    b, g = col.shape
    sel = jnp.take_along_axis(
        pred_masks, jnp.clip(col, 0)[:, :, None, None], axis=1
    )  # [B, G, Hm, Wm]
    m = (gt_valid & (col >= 0)).reshape(-1)
    sel = sel.reshape(b * g, *sel.shape[2:])
    tgt = gt_masks.reshape(b * g, *gt_masks.shape[2:])
    return {
        "loss_mask": mask_focal_loss(sel, tgt, m, num_boxes),
        "loss_dice": dice_loss(sel, tgt, m, num_boxes),
    }


def postprocess_segm(
    mask_logits: jnp.ndarray,  # [B, K, Hm, Wm] (selected queries)
    target_sizes: jnp.ndarray,  # [B, 2] (h, w)
    canvas_hw: Tuple[int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """→ binary masks at the padded-canvas scale, upsampled ×8
    (PostProcessSegm parity; final per-image crop/resize to orig size is a
    host-side numpy step since sizes vary)."""
    b, k, hm, wm = mask_logits.shape
    up = jax.image.resize(
        mask_logits, (b, k, canvas_hw[0], canvas_hw[1]), method="bilinear"
    )
    return jax.nn.sigmoid(up) > threshold
