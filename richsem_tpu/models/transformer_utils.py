"""Pure functions for the deformable transformer data flow.

Parity targets (all static-shaped, jit-friendly):
  * ``flatten_levels`` — level flatten + level embedding add
    (deformable_transformer.py:287-311).
  * ``encoder_reference_points`` — per-pixel reference points scaled by
    valid ratios (deformable_transformer.py:514-528).
  * ``gen_encoder_output_proposals`` — grid anchors (wh = 0.05·2^lvl),
    unsigmoid, invalid→masked (models/richsem/utils.py:10-65). The
    reference marks invalid proposals with +inf; under jit we use a large
    finite sentinel plus an explicit validity mask so downstream top-k and
    sigmoids stay NaN-free.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

_INVALID_LOGIT = 1e6


def flatten_levels(
    srcs: Sequence[jnp.ndarray],  # [B, H, W, C] per level
    masks: Sequence[jnp.ndarray],  # [B, H, W] True=pad
    pos_embeds: Sequence[jnp.ndarray],  # [B, H, W, C]
    level_embed: jnp.ndarray,  # [L, C]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[Tuple[int, int], ...]]:
    """→ (src_flat [B,S,C], mask_flat [B,S], pos_flat [B,S,C], shapes)."""
    src_flat, mask_flat, pos_flat, shapes = [], [], [], []
    for lvl, (src, mask, pos) in enumerate(zip(srcs, masks, pos_embeds)):
        b, h, w, c = src.shape
        shapes.append((h, w))
        src_flat.append(src.reshape(b, h * w, c))
        mask_flat.append(mask.reshape(b, h * w))
        pos_flat.append(pos.reshape(b, h * w, c) + level_embed[lvl][None, None, :])
    return (
        jnp.concatenate(src_flat, axis=1),
        jnp.concatenate(mask_flat, axis=1),
        jnp.concatenate(pos_flat, axis=1),
        tuple(shapes),
    )


def encoder_reference_points(
    spatial_shapes: Sequence[Tuple[int, int]],
    valid_ratios: jnp.ndarray,  # [B, L, 2] (w_ratio, h_ratio)
) -> jnp.ndarray:
    """→ [B, S, L, 2] normalized (x, y) refs for every encoder token."""
    refs: List[jnp.ndarray] = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ry = jnp.broadcast_to(ry, (h, w)).reshape(-1)
        rx = jnp.broadcast_to(rx, (h, w)).reshape(-1)
        # normalize by the *valid* extent of this level
        ry = ry[None, :] / (valid_ratios[:, None, lvl, 1] * h)
        rx = rx[None, :] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([rx, ry], axis=-1))  # [B, hw, 2]
    ref = jnp.concatenate(refs, axis=1)  # [B, S, 2]
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]


def gen_encoder_output_proposals(
    memory: jnp.ndarray,  # [B, S, C]
    mask_flat: jnp.ndarray,  # [B, S] True=pad
    spatial_shapes: Sequence[Tuple[int, int]],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (output_memory [B,S,C], output_proposals [B,S,4] unsigmoid,
    proposal_valid [B,S] bool).

    Anchor grid per level with wh = 0.05·2^lvl, coordinates normalized by
    the valid extent; proposals outside (0.01, 0.99) or on padding are
    invalid — their memory is zeroed and their unsigmoid coords set to a
    large sentinel (reference uses +inf; a finite sentinel keeps sigmoid/
    top-k NaN-free under jit).
    """
    b, s, _ = memory.shape
    proposals = []
    cur = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        level_mask = mask_flat[:, cur : cur + h * w].reshape(b, h, w)
        valid_h = jnp.sum(~level_mask[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~level_mask[:, 0, :], axis=1).astype(jnp.float32)
        gy = jnp.arange(h, dtype=jnp.float32)[:, None]
        gx = jnp.arange(w, dtype=jnp.float32)[None, :]
        gy = jnp.broadcast_to(gy, (h, w))
        gx = jnp.broadcast_to(gx, (h, w))
        grid = jnp.stack([gx, gy], -1)[None]  # [1, h, w, 2]
        scale = jnp.stack([valid_w, valid_h], -1).reshape(b, 1, 1, 2)
        grid = (grid + 0.5) / scale
        wh = jnp.full_like(grid, 0.05 * (2.0**lvl))
        proposals.append(jnp.concatenate([grid, wh], -1).reshape(b, h * w, 4))
        cur += h * w
    props = jnp.concatenate(proposals, axis=1)  # [B, S, 4] in (0,1)-ish
    in_range = ((props > 0.01) & (props < 0.99)).all(-1)
    valid = in_range & ~mask_flat
    props_unsig = jnp.log(props / jnp.clip(1.0 - props, min=1e-9))
    props_unsig = jnp.where(valid[..., None], props_unsig, _INVALID_LOGIT)
    out_memory = jnp.where(valid[..., None], memory, 0.0)
    return out_memory, props_unsig, valid
