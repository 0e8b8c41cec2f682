"""Tiled (windowed) multi-scale deformable attention — the MXU fast path.

The gather formulation (:mod:`richsem_tpu.ops.ms_deform_attn`) is exact but
memory-latency-bound on TPU: its backward is a ~27M-row scatter-add
(~0.5 s/layer at production scale). This module re-derives the *encoder*
self-attention case — where queries ARE the multi-scale grid positions and
reference points sit at the query's own location
(deformable_transformer.py:514-528) — as dense windowed contractions:

  * the query pyramid is tiled by ONE tile grid shared across levels:
    level ``a`` uses tile ``(qh·Ha/H0, qw·Wa/W0)``, so every level has the
    same ``(H0/qh)×(W0/qw)`` tiles and the stride into value level ``v`` is
    level-independent: ``s_v = (qh·Hv/H0, qw·Wv/W0)``;
  * each tile reads one static window ``(s_v + 2·margin, …)`` of every
    value level, extracted with stride-aligned reshapes (no gathers, no
    giant conv-patch filters);
  * bilinear sampling becomes a dense *hat-function basis* over window
    rows/columns contracted on the MXU:
        out[k] = Σ_{y,x} (a_k[y]·b_k[x]) · V[y, x]
    — exactly zero-padded bilinear interpolation for every sample that
    lands inside its tile's window;
  * forward AND backward are reshapes + einsums — no gather, no scatter.

Semantics vs the exact op: a sample farther than ``margin`` pixels (at the
value level) outside its tile's footprint reads zeros, exactly like the
reference's zero padding outside the image. Learned offsets are initialized
≤ 4 px (ops/modules/ms_deform_attn.py:63-70) and stay local in trained
DETRs (cf. the DEFA/QUILL locality analyses), so ``margin=8``–16 keeps the
paths numerically identical in practice; equality is asserted against the
exact oracle in tests/test_msda_tiled.py.

Requirements (``tiled_supported``; callers fall back to the exact path
otherwise): all per-level tile sizes and strides are positive integers —
guaranteed by canvases divisible by 64 (configs/richsem/base_data_aug.py).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def _plan(spatial_shapes, tile):
    """→ (per-level tile sizes [(qh_a, qw_a)], per-level strides
    [(sy_v, sx_v)], tile grid (ty, tx)) or None if not integral.

    The grid ceil-divides level 0; levels pad to full tiles with zero-weight
    queries (cropped from the output)."""
    qh0, qw0 = tile
    h0, w0 = spatial_shapes[0]
    ty, tx = math.ceil(h0 / qh0), math.ceil(w0 / qw0)
    tiles, strides = [], []
    for h, w in spatial_shapes:
        qh = qh0 * h / h0
        qw = qw0 * w / w0
        if qh < 1 or qw < 1 or qh != int(qh) or qw != int(qw):
            return None
        tiles.append((int(qh), int(qw)))
        strides.append((int(qh), int(qw)))  # stride into level v == its tile
    return tiles, strides, (ty, tx)


def tiled_supported(
    spatial_shapes: Sequence[Tuple[int, int]], tile: Tuple[int, int] = (16, 16)
) -> bool:
    return _plan(tuple(spatial_shapes), tile) is not None


def _extract_windows(img, sy, sx, wy, wx, ty, tx, margin):
    """``[B, H, W, C]`` → windows ``[B, ty, tx, wy, wx, C]`` where window
    (i, j) covers rows ``[i·sy − margin, i·sy − margin + wy)`` (zero padded),
    built from ⌈wy/sy⌉+⌈wx/sx⌉ stride-aligned reshapes — no gathers."""
    b, h, w, c = img.shape
    ky = math.ceil(wy / sy)
    kx = math.ceil(wx / sx)
    pad_top = margin
    pad_bot = max(0, (ty - 1 + ky) * sy - margin - h + sy)
    pad_l = margin
    pad_r = max(0, (tx - 1 + kx) * sx - margin - w + sx)
    p = jnp.pad(img, ((0, 0), (pad_top, pad_bot), (pad_l, pad_r), (0, 0)))
    hp = p.shape[1]
    # y axis: chunks k cover rows [k·sy + i·sy, ...) per tile i
    chunks = [
        p[:, k * sy : k * sy + ty * sy].reshape(b, ty, sy, p.shape[2], c)
        for k in range(ky)
    ]
    wins_y = jnp.concatenate(chunks, axis=2)[:, :, :wy]  # [B, ty, wy, Wp, C]
    # x axis on the result
    wp = wins_y.shape[3]
    chunks = [
        wins_y[:, :, :, k * sx : k * sx + tx * sx].reshape(
            b, ty, wy, tx, sx, c
        )
        for k in range(kx)
    ]
    wins = jnp.concatenate(chunks, axis=4)[:, :, :, :, :wx]
    return wins.transpose(0, 1, 3, 2, 4, 5)  # [B, ty, tx, wy, wx, C]


def _hat_basis(rel: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """window-relative coords ``[...]`` → hat weights ``[..., n]``.

    hat(r, i) = max(0, 1 − |r − i|): reproduces two-tap bilinear weights
    in-range and vanishes outside the window."""
    grid = jnp.arange(n, dtype=rel.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., None] - grid)).astype(dtype)


def ms_deform_attn_tiled(
    value: jnp.ndarray,  # [B, S, M, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Q=S, M, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Q=S, M, L, P]
    tile: Tuple[int, int] = (16, 16),
    margin: int = 8,
) -> jnp.ndarray:
    b, s, m, d = value.shape
    _, q, _, n_levels, p, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if q != s:
        raise ValueError("tiled path requires encoder self-attention (Q == S)")
    plan = _plan(spatial_shapes, tile)
    if plan is None:
        raise ValueError(
            f"tiled msda unsupported for {spatial_shapes} with tile {tile}; "
            "check tiled_supported() first"
        )
    tiles, strides, (ty, tx) = plan
    n_tiles = ty * tx
    compute_dtype = value.dtype if value.dtype == jnp.bfloat16 else jnp.float32

    starts = []
    acc = 0
    for h, w in spatial_shapes:
        starts.append(acc)
        acc += h * w

    # ---- per-value-level windows (shared by all query levels) ----------
    windows = []
    for v, (hv, wv) in enumerate(spatial_shapes):
        sy, sx = strides[v]
        wy, wx = sy + 2 * margin, sx + 2 * margin
        img = value[:, starts[v] : starts[v] + hv * wv].reshape(
            b, hv, wv, m * d
        )
        win = _extract_windows(
            img.astype(compute_dtype), sy, sx, wy, wx, ty, tx, margin
        )
        windows.append(
            win.reshape(b, n_tiles, wy, wx, m, d)
            .transpose(0, 1, 4, 2, 3, 5)
            .reshape(b, n_tiles, m, wy * wx, d)
        )

    # ---- per-query-level contraction ------------------------------------
    outputs = []
    for a, (ha, wa) in enumerate(spatial_shapes):
        qh, qw = tiles[a]
        nq_t = qh * qw
        pad_h = ty * qh - ha
        pad_w = tx * qw - wa
        loc_a = sampling_locations[:, starts[a] : starts[a] + ha * wa]
        aw_a = attention_weights[:, starts[a] : starts[a] + ha * wa]
        loc_a = loc_a.reshape(b, ha, wa, m, n_levels, p, 2)
        aw_a = aw_a.reshape(b, ha, wa, m, n_levels, p)
        if pad_h or pad_w:
            # padded tail queries carry zero attention → contribute nothing
            loc_a = jnp.pad(
                loc_a, ((0, 0), (0, pad_h), (0, pad_w)) + ((0, 0),) * 4
            )
            aw_a = jnp.pad(
                aw_a, ((0, 0), (0, pad_h), (0, pad_w)) + ((0, 0),) * 3
            )
        loc_a = (
            loc_a.reshape(b, ty, qh, tx, qw, m, n_levels, p, 2)
            .transpose(0, 1, 3, 5, 2, 4, 6, 7, 8)
            .reshape(b, n_tiles, m, nq_t, n_levels, p, 2)
        )
        aw_a = (
            aw_a.reshape(b, ty, qh, tx, qw, m, n_levels, p)
            .transpose(0, 1, 3, 5, 2, 4, 6, 7)
            .reshape(b, n_tiles, m, nq_t, n_levels, p)
        )

        # one dense bilinear basis per value level, SUMMED over the P
        # sampling points up front (the output sums over P anyway) — 4×
        # smaller basis and matmul; then all levels concatenate into one
        # batched MXU contraction per query level.
        bases = []
        for v, (hv, wv) in enumerate(spatial_shapes):
            sy, sx = strides[v]
            wy, wx = sy + 2 * margin, sx + 2 * margin
            x_px = loc_a[..., v, :, 0].astype(jnp.float32) * wv - 0.5
            y_px = loc_a[..., v, :, 1].astype(jnp.float32) * hv - 0.5
            oy = (jnp.arange(ty) * sy - margin).astype(jnp.float32)
            ox = (jnp.arange(tx) * sx - margin).astype(jnp.float32)
            origin_y = jnp.repeat(oy, tx)[None, :, None, None, None]
            origin_x = jnp.tile(ox, ty)[None, :, None, None, None]
            y_rel = y_px - origin_y  # [B, T, M, QK, P]
            x_rel = x_px - origin_x
            awv = aw_a[..., v, :].astype(compute_dtype)
            ay = _hat_basis(y_rel, wy, compute_dtype) * awv[..., None]
            ax = _hat_basis(x_rel, wx, compute_dtype)
            # broadcast-multiply then P-sum on the VPU (tiny per-k matmuls
            # are poison for the MXU). NOTE: an unrolled P-loop accumulation
            # wins 2× in isolation (tools/bench_basis.py) but LOSES in-model
            # (bench 2.41 → 2.23) — XLA fuses the P-sum into the windows
            # contraction here; don't re-try it.
            basis = (ay[..., :, None] * ax[..., None, :]).sum(-3)
            basis = basis.reshape(b, n_tiles, m, nq_t, wy * wx)
            bases.append(basis)
        basis_all = jnp.concatenate(bases, axis=-1)
        win_all = jnp.concatenate(windows, axis=3)  # [B,T,M,Σwin,D]
        acc_out = jnp.einsum(
            "btmks,btmsd->btmkd", basis_all, win_all,
            preferred_element_type=compute_dtype,
        )

        out_a = (
            acc_out.reshape(b, ty, tx, m, qh, qw, d)
            .transpose(0, 1, 4, 2, 5, 3, 6)
            .reshape(b, ty * qh, tx * qw, m * d)
        )
        outputs.append(out_a[:, :ha, :wa].reshape(b, ha * wa, m * d))

    return jnp.concatenate(outputs, axis=1).astype(value.dtype)
