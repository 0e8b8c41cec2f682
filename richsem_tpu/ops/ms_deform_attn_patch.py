"""Exact msda via 2x2-patch gathers — one XLA gather per level.

Reformulates the reference CUDA sampler
(models/richsem/ops/src/cuda/ms_deform_im2col_cuda.cuh:33-85: four separate
bilinear taps per point) TPU-first: the four taps of a point always form a
2x2 pixel patch, so ONE gather with slice sizes (1, 2, 2, D) at the clipped
patch origin fetches all of them — 4x fewer gather rows and 4x wider
contiguous slices than the row-per-tap formulation in
:mod:`richsem_tpu.ops.ms_deform_attn`, which is what XLA:TPU gather
throughput scales with.

Weights are evaluated as hat functions at the *actually gathered* rows /
columns (origin clipped to [0, h-2] x [0, w-2]), which reproduces exact
zero-padded bilinear sampling for every location, including out-of-bounds
taps: a hat vanishes for any pixel ≥1 away, so clip shifts never introduce
spurious weight.

Backward is a custom VJP: the value grad is ONE 2x2-patch scatter-add per
level in the value's own dtype (XLA:TPU f32 scatter is ~7x slower than
bf16); loc/attn grads reuse the forward's gathered patches analytically.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3),
    collapsed_slice_dims=(0,),
    start_index_map=(0, 1, 2),
)
_SCATTER_DNUMS = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1, 2, 3),
    inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0, 1, 2),
)


def _level_geometry(loc_l, h, w):
    """loc_l [B, Q, M, P, 2] → (starts [B,Q,M,P,2] int32 clipped patch
    origin (y, x), y/x pixel coords f32)."""
    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5
    sy = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
    sx = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    return sy, sx, y, x


def _hats(coord, start):
    """hat weights at rows (start, start+1): [..., 2]; exact zero-padded
    bilinear for any coord incl. out-of-bounds (hats vanish ≥1 px away)."""
    s = start.astype(jnp.float32)
    return jnp.stack(
        [
            jnp.maximum(1.0 - jnp.abs(coord - s), 0.0),
            jnp.maximum(1.0 - jnp.abs(coord - (s + 1.0)), 0.0),
        ],
        axis=-1,
    )


def _dhats(coord, start):
    """d(hat)/d(coord) at rows (start, start+1)."""
    s = start.astype(jnp.float32)
    d0 = coord - s
    d1 = coord - (s + 1.0)
    return jnp.stack(
        [
            jnp.where(jnp.abs(d0) < 1.0, -jnp.sign(d0), 0.0),
            jnp.where(jnp.abs(d1) < 1.0, -jnp.sign(d1), 0.0),
        ],
        axis=-1,
    )


def _gather_starts(sy, sx, b, m, q, p):
    """[B,Q,M,P] origin pair → gather start indices [B·M·Q·P, 3] = (n, y, x)
    with n = b·M + m (operand batch row)."""
    n_idx = (
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None] * m
        + jnp.arange(m, dtype=jnp.int32)[None, None, :, None]
    )
    n_idx = jnp.broadcast_to(n_idx, (b, q, m, p))
    starts = jnp.stack([n_idx, sy, sx], axis=-1)  # [B, Q, M, P, 3]
    return starts.transpose(0, 2, 1, 3, 4).reshape(-1, 3)


def _value_images(value, spatial_shapes):
    """value [B, S, M, D] → per-level [B·M, H, W, D] (bf16-friendly layout:
    D on lanes, W on sublanes)."""
    b, _, m, d = value.shape
    imgs = []
    start = 0
    for h, w in spatial_shapes:
        img = value[:, start : start + h * w]  # [B, hw, M, D]
        img = img.transpose(0, 2, 1, 3).reshape(b * m, h, w, d)
        imgs.append(img)
        start += h * w
    return imgs


_VJP_CACHE = {}


def _core(spatial_shapes: Tuple[Tuple[int, int], ...]):
    if spatial_shapes in _VJP_CACHE:
        return _VJP_CACHE[spatial_shapes]

    n_levels = len(spatial_shapes)

    def _fwd_impl(value, sampling_locations, attention_weights):
        b, s, m, d = value.shape
        q, _, _, p, _ = sampling_locations.shape[1:]
        imgs = _value_images(value, spatial_shapes)
        out = jnp.zeros((b * m, q, d), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            sy, sx, y, x = _level_geometry(
                sampling_locations[:, :, :, lvl], h, w
            )
            starts = _gather_starts(sy, sx, b, m, q, p)
            patches = jax.lax.gather(
                imgs[lvl], starts, _GATHER_DNUMS, (1, 2, 2, d)
            )  # [B·M·Q·P, 2, 2, D]
            hy = _hats(y, sy)  # [B, Q, M, P, 2]
            hx = _hats(x, sx)
            wp = (
                hy[..., :, None]
                * hx[..., None, :]
                * attention_weights[:, :, :, lvl].astype(jnp.float32)[
                    ..., None, None
                ]
            )  # [B, Q, M, P, 2, 2]
            wp = wp.transpose(0, 2, 1, 3, 4, 5).reshape(b * m * q * p, 2, 2)
            contrib = (wp[..., None] * patches.astype(jnp.float32)).sum((1, 2))
            out = out + contrib.reshape(b * m, q, p, d).sum(2)
        out = out.reshape(b, m, q, d).transpose(0, 2, 1, 3)
        return out.reshape(b, q, m * d).astype(value.dtype)

    @jax.custom_vjp
    def core(value, sampling_locations, attention_weights):
        return _fwd_impl(value, sampling_locations, attention_weights)

    def fwd(value, sampling_locations, attention_weights):
        return core(value, sampling_locations, attention_weights), (
            value,
            sampling_locations,
            attention_weights,
        )

    def bwd(res, g):
        value, sampling_locations, attention_weights = res
        b, s, m, d = value.shape
        q, _, _, p, _ = sampling_locations.shape[1:]
        imgs = _value_images(value, spatial_shapes)
        g_n = (
            g.reshape(b, q, m, d).transpose(0, 2, 1, 3).reshape(b * m, q, d)
        ).astype(jnp.float32)
        dval_parts = []
        dloc_parts = []
        dattn_parts = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            sy, sx, y, x = _level_geometry(
                sampling_locations[:, :, :, lvl], h, w
            )
            starts = _gather_starts(sy, sx, b, m, q, p)
            hy = _hats(y, sy)
            hx = _hats(x, sx)
            aw = attention_weights[:, :, :, lvl].astype(jnp.float32)

            # --- value grad: 2x2-patch scatter-add in value dtype ---------
            wp = hy[..., :, None] * hx[..., None, :] * aw[..., None, None]
            wp_n = wp.transpose(0, 2, 1, 3, 4, 5).reshape(b * m, q, p, 2, 2)
            payload = (
                wp_n[..., None] * g_n[:, :, None, None, None, :]
            ).astype(value.dtype)
            dimg = jax.lax.scatter_add(
                jnp.zeros((b * m, h, w, d), value.dtype),
                starts,
                payload.reshape(b * m * q * p, 2, 2, d),
                _SCATTER_DNUMS,
            )
            dval_parts.append(
                dimg.reshape(b, m, h * w, d).transpose(0, 2, 1, 3)
            )

            # --- loc/attn grads: re-gather + analytic hats ----------------
            patches = jax.lax.gather(
                imgs[lvl], starts, _GATHER_DNUMS, (1, 2, 2, d)
            ).astype(jnp.float32)
            # <g, patch> per tap: [B·M·Q·P, 2, 2]
            gp = jnp.einsum(
                "nijd,nd->nij",
                patches.reshape(b * m, q * p, 2, 2, d).reshape(-1, 2, 2, d),
                jnp.repeat(g_n.reshape(b * m * q, d), p, axis=0),
            )
            gp = gp.reshape(b, m, q, p, 2, 2).transpose(0, 2, 1, 3, 4, 5)
            hyhx = hy[..., :, None] * hx[..., None, :]
            dattn_parts.append((gp * hyhx).sum((-1, -2)))  # [B, Q, M, P]
            dhy = _dhats(y, sy)
            dhx = _dhats(x, sx)
            gy = (gp * (dhy[..., :, None] * hx[..., None, :])).sum((-1, -2))
            gx = (gp * (hy[..., :, None] * dhx[..., None, :])).sum((-1, -2))
            dloc_parts.append(
                jnp.stack([gx * aw * w, gy * aw * h], axis=-1)
            )  # [B, Q, M, P, 2]

        grad_value = jnp.concatenate(dval_parts, axis=1)
        grad_loc = jnp.stack(dloc_parts, axis=3).astype(
            sampling_locations.dtype
        )
        grad_attn = jnp.stack(dattn_parts, axis=3).astype(
            attention_weights.dtype
        )
        return grad_value, grad_loc, grad_attn

    core.defvjp(fwd, bwd)
    _VJP_CACHE[spatial_shapes] = core
    return core


def ms_deform_attn_patch(
    value: jnp.ndarray,  # [B, S, M, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Q, M, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Q, M, L, P]
) -> jnp.ndarray:
    """Exact multi-scale deformable attention via 2x2-patch gathers."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if sum(h * w for h, w in spatial_shapes) != value.shape[1]:
        raise ValueError("spatial_shapes do not sum to token count")
    return _core(spatial_shapes)(
        value, sampling_locations, attention_weights
    )
