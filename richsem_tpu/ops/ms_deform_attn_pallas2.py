"""Fused Pallas TPU kernel v2 for tiled multi-scale deformable attention.

Same windowed hat-basis mathematics as
:mod:`richsem_tpu.ops.ms_deform_attn_tiled` (which itself re-derives the
reference CUDA sampler, models/richsem/ops/src/cuda/
ms_deform_im2col_cuda.cuh:237-922, as dense windowed contractions), fused so
the [K, Σwin] basis never exists outside VMEM. Replaces the round-2 kernel
(ms_deform_attn_pallas.py), which lost to the XLA composition for two
measured reasons: per-row window DMAs (~100 µs/cell of issue overhead) and
per-(query-level, value-level) small-array hat math on the VPU
(v5e VPU ≈ 0.9 Tops/s — 200× weaker than the MXU; tools/bench_pallas_cal.py).

v2 layout rules (every one load-bearing, calibrated on v5e):

  * grid = (B, T): one cell per (batch, tile); ALL query levels of a tile
    are folded into one K = Σ_a qh_a·qw_a row block, so each cell runs
    exactly 4 (value-level) basis builds + 4 deep matmuls;
  * windows are extracted by XLA (stride-aligned reshapes, zero gathers)
    and streamed per cell through BlockSpec pipelining — no manual DMAs;
  * the basis is built TRANSPOSED, [M, wy, wxp, K] with the queries K on
    the 128-lane axis: the bilinear outer product is then two FREE
    broadcasts (hy along the sublane axis, hx along a leading axis) and
    one fused multiply-add per (point, element) — the VPU floor;
  * window x-extents are padded to 16 so (wy, wxp) merge into the matmul
    depth with no sublane↔lane retiling (padded columns carry zero value
    and provably zero hat weight);
  * every contraction is a single batched-over-heads dot_general with
    depth ≥ 224 and 352 output lanes.

Semantics: identical to ms_deform_attn_tiled — exact zero-padded bilinear
for every sample within ``margin`` of its tile, zeros beyond (impossible
when the model clamps offsets; models/layers.py clamp_offsets).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richsem_tpu.ops.ms_deform_attn_tiled import _extract_windows, _plan

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geometry(spatial_shapes, tile, margin):
    plan = _plan(tuple(spatial_shapes), tile)
    if plan is None:
        raise ValueError(f"unsupported shapes {spatial_shapes} for tile {tile}")
    tiles, strides, (ty, tx) = plan
    windows = []
    for sy, sx in strides:
        wy = sy + 2 * margin
        # pad the x-extent to the f32 sublane tile so the (wy, wxp) →
        # matmul-depth merge is layout-free (the merge happens on the f32
        # basis BEFORE any bf16 cast — see _fwd_kernel); padded columns hold
        # zero value and (for in-window samples) exactly zero hat weight.
        # %8 instead of %16 cuts the level-1 window 32 → 24 (−8% VPU work).
        wxp = _round_up(sx + 2 * margin, 8)
        if (wy * wxp) % 16:
            # a bf16 cast of the merged [m, wy·wxp, k] basis needs the
            # sublane dim %16; wy is even for every production margin, so
            # this only triggers on odd-margin debug configs
            wxp = _round_up(sx + 2 * margin, 16)
        windows.append((wy, wxp))
    k_tot = sum(qh * qw for qh, qw in tiles)
    return tiles, strides, windows, ty, tx, k_tot


# ---------------------------------------------------------------------------
# XLA-side preparation
# ---------------------------------------------------------------------------
def _prep_windows(value, spatial_shapes, strides, windows, ty, tx, margin,
                  compute_dtype):
    """value [B, S, M, D] → per-level window flats [B, T, M, D, wy·wxp]."""
    b, _, m, d = value.shape
    outs = []
    start = 0
    for v, (hv, wv) in enumerate(spatial_shapes):
        sy, sx = strides[v]
        wy, wxp = windows[v]
        wx = sx + 2 * margin
        img = value[:, start : start + hv * wv].reshape(b, hv, wv, m * d)
        win = _extract_windows(
            img.astype(compute_dtype), sy, sx, wy, wx, ty, tx, margin
        )  # [B, ty, tx, wy, wx, M·D]
        if wxp != wx:
            win = jnp.pad(
                win, ((0, 0),) * 4 + ((0, wxp - wx), (0, 0))
            )
        win = win.reshape(b, ty * tx, wy, wxp, m, d)
        win = win.transpose(0, 1, 4, 5, 2, 3).reshape(
            b, ty * tx, m, d, wy * wxp
        )
        outs.append(win)
        start += hv * wv
    return outs


def _fold_windows(dwin, spatial_shapes, strides, windows, ty, tx, margin,
                  v, out_dtype):
    """Adjoint of ``_prep_windows`` for one level: [B, T, M, D, wy·wxp] →
    [B, Hv·Wv, M, D] via shifted strided adds (scatter-free)."""
    hv, wv = spatial_shapes[v]
    sy, sx = strides[v]
    wy, wxp = windows[v]
    wx = sx + 2 * margin
    b, t, m, d, _ = dwin.shape
    dwin = dwin.reshape(b, ty, tx, m, d, wy, wxp).transpose(
        0, 1, 2, 5, 6, 3, 4
    )  # [B, ty, tx, wy, wxp, M, D]
    dwin = dwin[:, :, :, :, :wx]
    ky = math.ceil(wy / sy)
    kx = math.ceil(wx / sx)
    # x-axis fold: window col c of tile tj lands at padded col tj·sx + c
    # (padded by `margin` on the left); fold extent (tx+kx−1)·sx always
    # covers the crop [margin, margin+wv) since (kx−1)·sx ≥ 2·margin
    pad_wx = kx * sx - wx
    if pad_wx:
        dwin = jnp.pad(dwin, ((0, 0),) * 4 + ((0, pad_wx), (0, 0), (0, 0)))
    dwin = dwin.reshape(b, ty, tx, wy, kx, sx, m, d)
    acc_x = jnp.zeros((b, ty, tx + kx - 1, wy, sx, m, d), dwin.dtype)
    for k in range(kx):
        acc_x = acc_x.at[:, :, k : k + tx].add(dwin[:, :, :, :, k])
    wp = (tx + kx - 1) * sx
    acc_x = acc_x.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
        b, ty, wy, wp, m, d
    )
    pad_wy = ky * sy - wy
    if pad_wy:
        acc_x = jnp.pad(
            acc_x, ((0, 0),) * 2 + ((0, pad_wy),) + ((0, 0),) * 3
        )
    acc_x = acc_x.reshape(b, ty, ky, sy, wp, m, d)
    acc_y = jnp.zeros((b, ty + ky - 1, sy, wp, m, d), acc_x.dtype)
    for k in range(ky):
        acc_y = acc_y.at[:, k : k + ty].add(acc_x[:, :, k])
    acc_y = acc_y.reshape(b, (ty + ky - 1) * sy, wp, m, d)
    img = acc_y[:, margin : margin + hv, margin : margin + wv]
    return img.reshape(b, hv * wv, m, d).astype(out_dtype)


def _prep_queries(loc, aw, spatial_shapes, tiles, strides, windows, ty, tx,
                  margin, k_pad):
    """loc [B,S,M,L,P,2] f32, aw [B,S,M,L,P] →
    yrel/xrel/aww [B, T, M, L·P, K_pad] f32 (K on lanes; window-relative
    pixel coords; padded queries carry zero attention)."""
    b = loc.shape[0]
    m = loc.shape[2]
    n_lvl = len(spatial_shapes)
    p = loc.shape[4]
    t = ty * tx

    def split(x, trailing):
        # [B, S, M, tr] → [B, T, M, K_tot, tr], concatenating query levels
        parts = []
        start = 0
        for a, (ha, wa) in enumerate(spatial_shapes):
            qh, qw = tiles[a]
            blk = x[:, start : start + ha * wa].reshape(
                b, ha, wa, m, trailing
            )
            blk = jnp.pad(
                blk,
                ((0, 0), (0, ty * qh - ha), (0, tx * qw - wa), (0, 0), (0, 0)),
            )
            blk = blk.reshape(b, ty, qh, tx, qw, m, trailing).transpose(
                0, 1, 3, 5, 2, 4, 6
            ).reshape(b, t, m, qh * qw, trailing)
            parts.append(blk)
            start += ha * wa
        return jnp.concatenate(parts, axis=3)  # [B, T, M, K_tot, tr]

    loc_s = split(
        loc.astype(jnp.float32).reshape(*loc.shape[:3], n_lvl * p * 2),
        n_lvl * p * 2,
    ).reshape(b, t, m, -1, n_lvl, p, 2)
    aw_s = split(
        aw.astype(jnp.float32).reshape(*aw.shape[:3], n_lvl * p), n_lvl * p
    ).reshape(b, t, m, -1, n_lvl, p)
    k_tot = loc_s.shape[3]
    if k_pad != k_tot:
        loc_s = jnp.pad(
            loc_s, ((0, 0),) * 3 + ((0, k_pad - k_tot),) + ((0, 0),) * 3
        )
        aw_s = jnp.pad(
            aw_s, ((0, 0),) * 3 + ((0, k_pad - k_tot),) + ((0, 0),) * 2
        )

    ti = jnp.arange(ty * tx) // tx  # [T]
    tj = jnp.arange(ty * tx) % tx
    yrel_l, xrel_l = [], []
    for v, (hv, wv) in enumerate(spatial_shapes):
        sy, sx = strides[v]
        oy = (ti * sy - margin).astype(jnp.float32)[None, :, None, None]
        ox = (tj * sx - margin).astype(jnp.float32)[None, :, None, None]
        yrel_l.append(loc_s[..., v, :, 1] * hv - 0.5 - oy[..., None] * 1.0)
        xrel_l.append(loc_s[..., v, :, 0] * wv - 0.5 - ox[..., None] * 1.0)
    yrel = jnp.stack(yrel_l, axis=4)  # [B, T, M, K, L, P]
    xrel = jnp.stack(xrel_l, axis=4)
    # → [B, T, M, L·P, K] (K on lanes)
    to_lanes = lambda x: x.transpose(0, 1, 2, 4, 5, 3).reshape(
        b, t, m, n_lvl * p, k_pad
    )
    return to_lanes(yrel), to_lanes(xrel), to_lanes(aw_s)


def _merge_out(out_t, spatial_shapes, tiles, ty, tx, m, d):
    """[B, T, M, D, K_pad] → [B, S, M·D]."""
    b, t = out_t.shape[:2]
    parts = []
    start = 0
    for a, (ha, wa) in enumerate(spatial_shapes):
        qh, qw = tiles[a]
        k_a = qh * qw
        blk = out_t[:, :, :, :, start : start + k_a]
        blk = blk.reshape(b, ty, tx, m, d, qh, qw).transpose(
            0, 1, 5, 2, 6, 3, 4
        ).reshape(b, ty * qh, tx * qw, m * d)
        parts.append(blk[:, :ha, :wa].reshape(b, ha * wa, m * d))
        start += k_a
    return jnp.concatenate(parts, axis=1)


def _split_grads(dq, spatial_shapes, tiles, ty, tx, n_lvl, p, per_lane):
    """[B, T, M, L·P·per_lane, K_pad] → [B, S, M, L, P(, per_lane)]."""
    b, t, m = dq.shape[:3]
    parts = []
    start = 0
    outs = []
    for a, (ha, wa) in enumerate(spatial_shapes):
        qh, qw = tiles[a]
        k_a = qh * qw
        blk = dq[:, :, :, :, start : start + k_a]
        blk = blk.reshape(b, ty, tx, m, per_lane, n_lvl, p, qh, qw)
        blk = blk.transpose(0, 1, 7, 2, 8, 3, 5, 6, 4).reshape(
            b, ty * qh, tx * qw, m, n_lvl, p, per_lane
        )
        blk = blk[:, :ha, :wa].reshape(b, ha * wa, m, n_lvl, p, per_lane)
        outs.append(blk)
        start += k_a
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _iota_col(n):
    """grid coordinates as [1, n, 1] f32 (sublane axis).

    Mosaic requires integer iota; build int32 then convert.
    """
    return jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1).astype(jnp.float32)


def _fwd_kernel(windows, n_lvl, p_pts, cdt, *refs):
    win_refs = refs[:n_lvl]
    yr_ref, xr_ref, aw_ref, out_ref = refs[n_lvl : n_lvl + 4]
    m, lp, k = yr_ref.shape[2:]
    d = win_refs[0].shape[3]
    yr = yr_ref[0, 0]
    xr = xr_ref[0, 0]
    aw = aw_ref[0, 0]
    acc = jnp.zeros((m, d, k), jnp.float32)
    for v, (wy, wxp) in enumerate(windows):
        gy = _iota_col(wy)
        gx = _iota_col(wxp)
        # two independent accumulators: the naive p-loop serializes four
        # full-size FMAs on one register chain; pairing them halves the
        # loop-carried dependency depth for the VPU scheduler
        basis0 = basis1 = None
        for p in range(p_pts):
            i = v * p_pts + p
            yv = yr[:, i, :][:, None, :]  # [M, 1, K]
            xv = xr[:, i, :][:, None, :]
            av = aw[:, i, :][:, None, :]
            hyw = jnp.maximum(0.0, av - av * jnp.abs(yv - gy))  # [M, wy, K]
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(xv - gx))  # [M, wxp, K]
            term = hyw[:, :, None, :] * hx[:, None, :, :]  # [M, wy, wxp, K]
            if p % 2 == 0:
                basis0 = term if basis0 is None else basis0 + term
            else:
                basis1 = term if basis1 is None else basis1 + term
        basis = basis0 if basis1 is None else basis0 + basis1
        # reshape in f32 (sublane tile 8 — wxp is padded %8), THEN cast:
        # casting first would force wxp %16 and redundant level-1 columns
        basis = basis.reshape(m, wy * wxp, k).astype(cdt)
        win = win_refs[v][0, 0].astype(cdt)  # [M, D, S]
        acc = acc + jax.lax.dot_general(
            win, basis,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    out_ref[...] = acc[None, None]


def _bwd_kernel(windows, n_lvl, p_pts, cdt, *refs):
    win_refs = refs[:n_lvl]
    yr_ref, xr_ref, aw_ref, g_ref = refs[n_lvl : n_lvl + 4]
    dwin_refs = refs[n_lvl + 4 : 2 * n_lvl + 4]
    dq_ref = refs[2 * n_lvl + 4]  # [1, 1, M, 3·L·P, K] — (dy, dx, daw)
    m, lp, k = yr_ref.shape[2:]
    yr = yr_ref[0, 0]
    xr = xr_ref[0, 0]
    aw = aw_ref[0, 0]
    g = g_ref[0, 0].astype(cdt)  # [M, D, K]
    for v, (wy, wxp) in enumerate(windows):
        gy = _iota_col(wy)
        gx = _iota_col(wxp)
        win = win_refs[v][0, 0].astype(cdt)  # [M, D, S]
        d_basis = jax.lax.dot_general(
            win, g,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [M, S, K]
        d_basis4 = d_basis.reshape(m, wy, wxp, k)
        basis0 = basis1 = None  # paired accumulators (see _fwd_kernel)
        for p in range(p_pts):
            i = v * p_pts + p
            yv = yr[:, i, :][:, None, :]
            xv = xr[:, i, :][:, None, :]
            av = aw[:, i, :][:, None, :]
            dy_ = yv - gy
            dx_ = xv - gx
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy_))  # [M, wy, K]
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx_))  # [M, wxp, K]
            dhy = jnp.where(jnp.abs(dy_) < 1.0, -jnp.sign(dy_), 0.0)
            dhx = jnp.where(jnp.abs(dx_) < 1.0, -jnp.sign(dx_), 0.0)
            # Both big reductions run over the LEADING wy axis (axis=1):
            #   V_p[m, x, k]  = Σ_y  hy·d_basis
            #   S2_p[m, x, k] = Σ_y dhy·d_basis
            # and every query grad follows from them with [M, wxp, K]-sized
            # ops — the old formulation's U_p = Σ_x hx·d_basis reduced over
            # the SUBLANE axis, which Mosaic materializes as a full-size
            # product + cross-sublane reduce (an extra traversal of the
            # [M, wy, wxp, K] tensor per point; the kernel is VMEM-traffic
            # bound, see tools/bench_vpu_model.py):
            #   d_aw = Σ_x hx·V_p        (= Σ_yx hy·hx·db)
            #   d_x  = a·Σ_x dhx·V_p
            #   d_y  = a·Σ_x hx·S2_p     (= a·Σ_yx dhy·hx·db)
            v_p = (hy[:, :, None, :] * d_basis4).sum(axis=1)  # [M, wxp, K]
            s2_p = (dhy[:, :, None, :] * d_basis4).sum(axis=1)
            d_aw_p = (hx * v_p).sum(axis=1)  # [M, K]
            d_y_p = (hx * s2_p).sum(axis=1) * aw[:, i, :]
            d_x_p = (dhx * v_p).sum(axis=1) * aw[:, i, :]
            dq_ref[0, 0, :, 0 * lp + i, :] = d_y_p
            dq_ref[0, 0, :, 1 * lp + i, :] = d_x_p
            dq_ref[0, 0, :, 2 * lp + i, :] = d_aw_p
            hyw = hy * av
            term = hyw[:, :, None, :] * hx[:, None, :, :]
            if p % 2 == 0:
                basis0 = term if basis0 is None else basis0 + term
            else:
                basis1 = term if basis1 is None else basis1 + term
        basis = basis0 if basis1 is None else basis0 + basis1
        basis = basis.reshape(m, wy * wxp, k).astype(cdt)
        dwin_refs[v][...] = jax.lax.dot_general(
            g, basis,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dwin_refs[v].dtype)[None, None]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------
def _cell_spec(shape_tail):
    return pl.BlockSpec(
        (1, 1) + shape_tail,
        lambda bb, tt: (bb, tt) + (0,) * len(shape_tail),
        memory_space=pltpu.VMEM,
    )


def _fwd_pallas2(value, spatial_shapes, loc, aw, tile, margin):
    b, s, m, d = value.shape
    p_pts = loc.shape[4]
    n_lvl = len(spatial_shapes)
    tiles, strides, windows, ty, tx, k_tot = _geometry(
        spatial_shapes, tile, margin
    )
    t = ty * tx
    k_pad = _round_up(k_tot, 8)
    cdt = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    wins = _prep_windows(value, spatial_shapes, strides, windows, ty, tx,
                         margin, cdt)
    yrel, xrel, aww = _prep_queries(
        loc, aw, spatial_shapes, tiles, strides, windows, ty, tx, margin,
        k_pad,
    )
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, tuple(windows), n_lvl, p_pts, cdt),
        grid=(b, t),
        in_specs=(
            [_cell_spec((m, d, wy * wxp)) for wy, wxp in windows]
            + [_cell_spec((m, n_lvl * p_pts, k_pad))] * 3
        ),
        out_specs=_cell_spec((m, d, k_pad)),
        out_shape=jax.ShapeDtypeStruct((b, t, m, d, k_pad), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(*wins, yrel, xrel, aww)
    return _merge_out(
        out_t, spatial_shapes, tiles, ty, tx, m, d
    ).astype(value.dtype)


def _bwd_pallas2(value, spatial_shapes, loc, aw, tile, margin, g):
    b, s, m, d = value.shape
    p_pts = loc.shape[4]
    n_lvl = len(spatial_shapes)
    tiles, strides, windows, ty, tx, k_tot = _geometry(
        spatial_shapes, tile, margin
    )
    t = ty * tx
    k_pad = _round_up(k_tot, 8)
    cdt = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    wins = _prep_windows(value, spatial_shapes, strides, windows, ty, tx,
                         margin, cdt)
    yrel, xrel, aww = _prep_queries(
        loc, aw, spatial_shapes, tiles, strides, windows, ty, tx, margin,
        k_pad,
    )
    # g [B, S, M·D] → [B, T, M, D, K_pad] (transposed, K on lanes)
    g_t = _prep_g(g, spatial_shapes, tiles, ty, tx, m, d, k_pad)

    lp = n_lvl * p_pts
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tuple(windows), n_lvl, p_pts, cdt),
        grid=(b, t),
        in_specs=(
            [_cell_spec((m, d, wy * wxp)) for wy, wxp in windows]
            + [_cell_spec((m, lp, k_pad))] * 3
            + [_cell_spec((m, d, k_pad))]
        ),
        out_specs=(
            [_cell_spec((m, d, wy * wxp)) for wy, wxp in windows]
            + [_cell_spec((m, 3 * lp, k_pad))]
        ),
        out_shape=(
            [
                jax.ShapeDtypeStruct((b, t, m, d, wy * wxp), cdt)
                for wy, wxp in windows
            ]
            + [jax.ShapeDtypeStruct((b, t, m, 3 * lp, k_pad), jnp.float32)]
        ),
        compiler_params=_COMPILER_PARAMS,
    )(*wins, yrel, xrel, aww, g_t)
    dwins = outs[:n_lvl]
    dq = outs[n_lvl]

    d_value = jnp.concatenate(
        [
            _fold_windows(dwins[v], spatial_shapes, strides, windows, ty, tx,
                          margin, v, jnp.float32)
            for v in range(n_lvl)
        ],
        axis=1,
    ).astype(value.dtype)

    dq_s = _split_grads(
        dq, spatial_shapes, tiles, ty, tx, n_lvl, p_pts, 3
    )  # [B, S, M, L, P, 3] = (dy, dx, daw) in window-rel pixel units
    scale_h = jnp.asarray(
        [float(h) for h, _ in spatial_shapes], jnp.float32
    )[None, None, None, :, None]
    scale_w = jnp.asarray(
        [float(w) for _, w in spatial_shapes], jnp.float32
    )[None, None, None, :, None]
    d_loc = jnp.stack(
        [dq_s[..., 1] * scale_w, dq_s[..., 0] * scale_h], axis=-1
    ).astype(loc.dtype)
    d_aw = dq_s[..., 2].astype(aw.dtype)
    return d_value, d_loc, d_aw


def _prep_g(g, spatial_shapes, tiles, ty, tx, m, d, k_pad):
    """upstream grad [B, S, M·D] → [B, T, M, D, K_pad]."""
    b = g.shape[0]
    parts = []
    start = 0
    for a, (ha, wa) in enumerate(spatial_shapes):
        qh, qw = tiles[a]
        blk = g[:, start : start + ha * wa].reshape(b, ha, wa, m, d)
        blk = jnp.pad(
            blk,
            ((0, 0), (0, ty * qh - ha), (0, tx * qw - wa), (0, 0), (0, 0)),
        )
        blk = blk.reshape(b, ty, qh, tx, qw, m, d).transpose(
            0, 1, 3, 5, 6, 2, 4
        ).reshape(b, ty * tx, m, d, qh * qw)
        parts.append(blk)
        start += ha * wa
    g_t = jnp.concatenate(parts, axis=4)
    k_tot = g_t.shape[4]
    if k_pad != k_tot:
        g_t = jnp.pad(g_t, ((0, 0),) * 4 + ((0, k_pad - k_tot),))
    return g_t.astype(jnp.float32)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------
_CACHE = {}


def _core(spatial_shapes: Tuple[Tuple[int, int], ...], tile, margin):
    key = (spatial_shapes, tile, margin)
    if key in _CACHE:
        return _CACHE[key]

    @jax.custom_vjp
    def core(value, loc, aw):
        return _fwd_pallas2(value, spatial_shapes, loc, aw, tile, margin)

    def fwd(value, loc, aw):
        return core(value, loc, aw), (value, loc, aw)

    def bwd(res, g):
        value, loc, aw = res
        return _bwd_pallas2(value, spatial_shapes, loc, aw, tile, margin, g)

    core.defvjp(fwd, bwd)
    _CACHE[key] = core
    return core


def ms_deform_attn_pallas2(
    value: jnp.ndarray,  # [B, S, M, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Q=S, M, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Q=S, M, L, P]
    tile: Tuple[int, int] = (16, 16),
    margin: int = 8,
) -> jnp.ndarray:
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if sampling_locations.shape[1] != value.shape[1]:
        raise ValueError("pallas2 tiled path requires Q == S")
    return _core(spatial_shapes, tuple(tile), int(margin))(
        value, sampling_locations, attention_weights
    )
