"""RoIAlign for the CLIP-teacher distillation path.

Capability parity with the reference's use of detectron2's native ROIAlign
(``models/richsem/richsem.py:25, 865-879``: ``ROIAlign(output_size,
spatial_scale, sampling_ratio=0, aligned=True)`` cropping the CLIP spatial
feature map per box), rebuilt TPU-first: a fully-vectorized bilinear sampler
over a static per-image box tensor — no CUDA, no dynamic shapes, jit-able,
differentiable through XLA's gather.

Semantics (detectron2 ``aligned=True``):
  * box coords are scaled by ``spatial_scale`` then shifted by −0.5 so
    sampling is pixel-center aligned; no bin-size clamp;
  * each output bin averages a ``sampling_ratio × sampling_ratio`` grid of
    bilinear samples at bin-interior fractions (i+0.5)/n;
  * out-of-bounds taps contribute zero.

One deliberate departure: detectron2's ``sampling_ratio=0`` adapts the grid
to ``ceil(roi_extent / output_size)`` per box — a data-dependent shape that
cannot be jitted. Here ``sampling_ratio`` is a static int (default 2);
numerics agree with adaptive sampling to within the bilinear smoothing of
the feature map.
"""

from __future__ import annotations

import jax.numpy as jnp


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Crop-and-resize boxes from a feature map.

    Args:
      features: ``[B, H, W, C]`` feature map (channel-last).
      boxes: ``[B, R, 4]`` xyxy boxes in input-image coordinates.
      output_size: output bins per side.
      spatial_scale: multiply box coords by this to enter feature coords.
      sampling_ratio: static bilinear samples per bin per side.

    Returns:
      ``[B, R, output_size, output_size, C]``.
    """
    b, h, w, c = features.shape
    _, r, _ = boxes.shape
    n = sampling_ratio
    o = output_size

    boxes = boxes.astype(jnp.float32) * spatial_scale
    start_x = boxes[..., 0] - 0.5  # [B, R]
    start_y = boxes[..., 1] - 0.5
    bin_w = (boxes[..., 2] - boxes[..., 0]) / o
    bin_h = (boxes[..., 3] - boxes[..., 1]) / o

    # positions along one axis, in bin units: bin index + interior fraction
    frac = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    bins = jnp.arange(o, dtype=jnp.float32)
    grid = (bins[:, None] + frac[None, :]).reshape(o * n)  # [o*n]

    sx = start_x[..., None] + bin_w[..., None] * grid  # [B, R, o*n]
    sy = start_y[..., None] + bin_h[..., None] * grid

    out = _bilinear_grid_sample(features, sy, sx)  # [B, R, o*n, o*n, C]
    out = out.reshape(b, r, o, n, o, n, c).mean(axis=(3, 5))
    return out.astype(features.dtype)


def _bilinear_grid_sample(
    features: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """Sample ``features[B,H,W,C]`` at the outer grid of ``y × x`` coords.

    ``y``/``x`` are ``[B, R, G]`` pixel coordinates; the result is the full
    grid ``[B, R, Gy, Gx, C]`` (float32), zero outside bounds.
    """
    b, h, w, c = features.shape
    bsz, r, g = y.shape
    yy = jnp.broadcast_to(y[..., :, None], (bsz, r, g, x.shape[-1]))
    xx = jnp.broadcast_to(x[..., None, :], (bsz, r, g, x.shape[-1]))

    feats = features.astype(jnp.float32).reshape(b, h * w, c)

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    dy = yy - y0
    dx = xx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    acc = jnp.zeros(yy.shape + (c,), jnp.float32)
    for cy, wy in ((y0i, 1 - dy), (y0i + 1, dy)):
        for cx, wx in ((x0i, 1 - dx), (x0i + 1, dx)):
            valid = (cy >= 0) & (cy < h) & (cx >= 0) & (cx < w)
            idx = jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
            tap = jnp.take_along_axis(
                feats, idx.reshape(bsz, -1)[:, :, None], axis=1
            ).reshape(*yy.shape, c)
            wgt = jnp.where(valid, wy * wx, 0.0)
            acc = acc + tap * wgt[..., None]
    return acc
