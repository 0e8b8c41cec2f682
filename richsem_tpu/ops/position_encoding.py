"""Sinusoidal position embeddings.

Parity with the reference's ``PositionEmbeddingSineHW``
(models/richsem/position_encoding.py:46-93): cumsum-of-valid-pixels
coordinates normalized to ``scale`` (2π), separate H/W temperatures (the LVIS
recipe uses 20/20, config baseline_4scale.py:32-33), interleaved sin/cos
pairs, channels ordered (y-features, x-features). Output is channel-last
``[B, H, W, 2*num_pos_feats]`` (TPU layout) instead of the reference's NCHW.

Also provides ``gen_sineembed_for_position`` for decoder reference-point
query embeddings (reference models/richsem/utils.py:142-168).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _interleaved_sincos(x: jnp.ndarray, temperature: float, num_feats: int) -> jnp.ndarray:
    """``[...]`` coords → ``[..., num_feats]`` interleaved (sin, cos) pairs.

    Pair k uses divisor ``temperature ** (2k / num_feats)`` — equivalent to
    the reference's ``temp ** (2 * (i // 2) / num_feats)`` then
    stack(sin(even), cos(odd)).
    """
    k = jnp.arange(num_feats // 2, dtype=jnp.float32)
    div = temperature ** (2.0 * k / num_feats)
    angles = x[..., None] / div  # [..., num_feats//2]
    return jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1).reshape(
        *x.shape, num_feats
    )


def sine_position_embedding(
    mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature_h: float = 20.0,
    temperature_w: float = 20.0,
    normalize: bool = True,
    scale: float = 2.0 * math.pi,
) -> jnp.ndarray:
    """Padding-mask-aware sine embedding; ``mask[B,H,W]`` True on padding."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    pos_y = _interleaved_sincos(y_embed, temperature_h, num_pos_feats)
    pos_x = _interleaved_sincos(x_embed, temperature_w, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def gen_sineembed_for_position(pos: jnp.ndarray, num_feats: int = 128) -> jnp.ndarray:
    """Reference-point → query position embedding.

    ``pos`` is ``[..., 2]`` (x, y in [0,1]) or ``[..., 4]`` (x, y, w, h).
    Returns ``[..., 2*num_feats]`` (y-emb ++ x-emb) for 2-d inputs and
    ``[..., 4*num_feats//... ]`` — concretely (y, x, w, h) embeddings of
    ``num_feats`` each for 4-d inputs, matching reference utils.py:142-168
    (temperature 10000, scale 2π).
    """
    scale = 2.0 * math.pi
    x = _interleaved_sincos(pos[..., 0] * scale, 10000.0, num_feats)
    y = _interleaved_sincos(pos[..., 1] * scale, 10000.0, num_feats)
    if pos.shape[-1] == 2:
        return jnp.concatenate([y, x], axis=-1)
    if pos.shape[-1] == 4:
        w = _interleaved_sincos(pos[..., 2] * scale, 10000.0, num_feats)
        h = _interleaved_sincos(pos[..., 3] * scale, 10000.0, num_feats)
        return jnp.concatenate([y, x, w, h], axis=-1)
    raise ValueError(f"pos last dim must be 2 or 4, got {pos.shape[-1]}")
