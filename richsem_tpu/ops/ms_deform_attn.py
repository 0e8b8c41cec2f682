"""Multi-scale deformable attention — the framework's hottest op.

Capability parity with the reference's CUDA extension
(``models/richsem/ops/src/cuda/ms_deform_im2col_cuda.cuh:33-300`` forward,
``:301-922`` backward; python surface ``ops/modules/ms_deform_attn.py`` and
``ops/functions/ms_deform_attn_func.py``), rebuilt TPU-first:

* ``ms_deform_attn`` — a fully-vectorized XLA implementation. The CUDA
  kernel's one-thread-per-(batch, query, head, channel) bilinear loop becomes
  a batched embedding-style gather: all four bilinear taps for every
  (query, level, point) are gathered from the flattened value table in one
  ``take_along_axis`` per level, then combined on the VPU with the bilinear
  and attention weights. XLA differentiates it (gather → scatter-add), so no
  hand-written backward is needed; this also serves as the correctness oracle
  for the Pallas kernel.
* ``ms_deform_attn_reference_np`` — an independent, slow, float64 numpy
  oracle (direct loops) mirroring the role of the reference's
  ``ms_deform_attn_core_pytorch`` grid_sample fallback
  (``ops/functions/ms_deform_attn_func.py:41-61``) in its kernel-parity test
  (``ops/test.py``).

Sampling semantics (parity with the CUDA ``ms_deform_attn_im2col_bilinear``):
locations are normalized to [0, 1] over the *padded* level extent; the pixel
coordinate is ``loc * size - 0.5`` (grid_sample ``align_corners=False``), and
out-of-bounds taps contribute zero (``padding_mode='zeros'``).

Shapes (B batch, S = Σ HᵢWᵢ tokens, M heads, D head dim, Q queries,
L levels, P points):
  value                [B, S, M, D]
  spatial_shapes       static tuple ((H₀,W₀), ..., (H_{L-1},W_{L-1}))
  sampling_locations   [B, Q, M, L, P, 2]   (x, y) in [0, 1]
  attention_weights    [B, Q, M, L, P]      (already softmax-normalized)
  output               [B, Q, M*D]
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _level_contribution(
    value_l: jnp.ndarray,  # [B*M, H*W, D]
    loc: jnp.ndarray,  # [B, Q, M, P, 2]
    attn: jnp.ndarray,  # [B, Q, M, P]
    h: int,
    w: int,
) -> jnp.ndarray:
    """Gather + bilinear-combine one level. Returns [B*M, Q, D] (f32)."""
    b, q, m, p, _ = loc.shape
    # bf16 inputs accumulate in f32; f64 (x64 test mode) stays f64.
    compute_dtype = jnp.promote_types(value_l.dtype, jnp.float32)

    x = loc[..., 0].astype(compute_dtype) * w - 0.5
    y = loc[..., 1].astype(compute_dtype) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Four taps: (y0,x0), (y0,x1), (y1,x0), (y1,x1) with standard bilinear
    # weights; invalid (out-of-range) taps get weight 0 => zero padding.
    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=-1)  # [B,Q,M,P,4]
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=-1)
    wts = jnp.stack(
        [(1 - dy) * (1 - dx), (1 - dy) * dx, dy * (1 - dx), dy * dx], axis=-1
    )
    valid = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    wts = jnp.where(valid, wts, 0.0)
    idx = jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)  # [B,Q,M,P,4]

    # Fold the attention weight in before the contraction.
    wts = wts * attn.astype(compute_dtype)[..., None]

    # [B,Q,M,P,4] -> [B*M, Q*P*4]
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(b * m, q * p * 4)
    wts = wts.transpose(0, 2, 1, 3, 4).reshape(b * m, q, p * 4)

    gathered = jnp.take_along_axis(value_l, idx[:, :, None], axis=1)
    gathered = gathered.reshape(b * m, q, p * 4, value_l.shape[-1])
    return jnp.einsum(
        "nqk,nqkd->nqd", wts, gathered.astype(compute_dtype)
    )


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention core (see module docstring)."""
    b, s, m, d = value.shape
    _, q, _, n_levels, p, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if sum(h * w for h, w in spatial_shapes) != s:
        raise ValueError(
            f"spatial_shapes {spatial_shapes} do not sum to token count {s}"
        )
    if len(spatial_shapes) != n_levels:
        raise ValueError("level count mismatch")

    out = jnp.zeros((b * m, q, d), jnp.promote_types(value.dtype, jnp.float32))
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = (
            value[:, start : start + h * w]
            .transpose(0, 2, 1, 3)
            .reshape(b * m, h * w, d)
        )
        out = out + _level_contribution(
            value_l,
            sampling_locations[:, :, :, lvl],
            attention_weights[:, :, :, lvl],
            h,
            w,
        )
        start += h * w
    # [B*M, Q, D] -> [B, Q, M*D]
    out = out.reshape(b, m, q, d).transpose(0, 2, 1, 3).reshape(b, q, m * d)
    return out.astype(value.dtype)


def compute_sampling_locations(
    reference_points: jnp.ndarray,
    sampling_offsets: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    n_points: int,
) -> jnp.ndarray:
    """Turn reference points + learned offsets into normalized sample locations.

    Mirrors the reference's module-level math
    (ops/modules/ms_deform_attn.py:102-111):
      * 2-d reference points (normalized (x, y) per level): offsets are in
        *pixels* of each level, normalized by (W_l, H_l);
      * 4-d reference boxes (cx, cy, w, h): offsets are in units of half the
        box extent divided by the point count.

    reference_points: [B, Q, L, 2 or 4]; sampling_offsets: [B, Q, M, L, P, 2].
    """
    if reference_points.shape[-1] == 2:
        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=sampling_offsets.dtype
        )  # [L, 2] as (x, y) extents
        return (
            reference_points[:, :, None, :, None, :]
            + sampling_offsets / normalizer[None, None, None, :, None, :]
        )
    if reference_points.shape[-1] == 4:
        ref = reference_points[:, :, None, :, None, :]
        return ref[..., :2] + sampling_offsets / n_points * ref[..., 2:] * 0.5
    raise ValueError(
        f"reference_points last dim must be 2 or 4, got {reference_points.shape[-1]}"
    )


def ms_deform_attn_reference_np(
    value: np.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: np.ndarray,
    attention_weights: np.ndarray,
) -> np.ndarray:
    """Slow float64 loop oracle; independent of the XLA implementation."""
    value = np.asarray(value, np.float64)
    sampling_locations = np.asarray(sampling_locations, np.float64)
    attention_weights = np.asarray(attention_weights, np.float64)
    b, s, m, d = value.shape
    _, q, _, n_levels, p, _ = sampling_locations.shape
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]
    out = np.zeros((b, q, m, d), np.float64)
    for bi in range(b):
        for qi in range(q):
            for mi in range(m):
                acc = np.zeros(d, np.float64)
                for li, (h, w) in enumerate(spatial_shapes):
                    vmap_l = value[bi, starts[li] : starts[li] + h * w, mi]
                    vmap_l = vmap_l.reshape(h, w, d)
                    for pi in range(p):
                        lx, ly = sampling_locations[bi, qi, mi, li, pi]
                        aw = attention_weights[bi, qi, mi, li, pi]
                        x = lx * w - 0.5
                        y = ly * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        dx, dy = x - x0, y - y0
                        for cy, wy in ((y0, 1 - dy), (y0 + 1, dy)):
                            for cx, wx in ((x0, 1 - dx), (x0 + 1, dx)):
                                if 0 <= cy < h and 0 <= cx < w:
                                    acc += aw * wy * wx * vmap_l[cy, cx]
                out[bi, qi, mi] = acc
    return out.reshape(b, q, m * d)


def ms_deform_attn_dense_oracle(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Differentiable jnp oracle built from a dense one-hot contraction.

    O(Q·S) memory — only for tiny test shapes. Used to cross-check gradients
    of the gather-based implementation (the role of gradcheck vs the CUDA
    kernel in the reference's ops/test.py:63-86).
    """
    b, s, m, d = value.shape
    _, q, _, n_levels, p, _ = sampling_locations.shape
    out = jnp.zeros((b, q, m, d), jnp.float32)
    start = 0
    for li, (h, w) in enumerate(spatial_shapes):
        v = value[:, start : start + h * w].astype(jnp.float32)  # [B,hw,M,D]
        loc = sampling_locations[:, :, :, li].astype(jnp.float32)
        aw = attention_weights[:, :, :, li].astype(jnp.float32)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        gy = jnp.arange(h, dtype=jnp.float32)
        gx = jnp.arange(w, dtype=jnp.float32)
        # hat-function bilinear basis against the full grid: [B,Q,M,P,h]/[...,w]
        wy = jnp.clip(1.0 - jnp.abs(y[..., None] - gy), 0.0, 1.0)
        wx = jnp.clip(1.0 - jnp.abs(x[..., None] - gx), 0.0, 1.0)
        basis = wy[..., :, None] * wx[..., None, :]  # [B,Q,M,P,h,w]
        basis = basis.reshape(*basis.shape[:-2], h * w) * aw[..., None]
        out = out + jnp.einsum("bqmps,bsmd->bqmd", basis, v)
        start += h * w
    return out.reshape(b, q, m * d).astype(value.dtype)
