"""Fused Pallas TPU kernel for tiled multi-scale deformable attention.

Replaces the XLA composition in :mod:`richsem_tpu.ops.ms_deform_attn_tiled`
(same mathematics — windowed hat-basis bilinear sampling; see that module's
docstring and the reference CUDA kernel both stand in for,
models/richsem/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-922) with one
fused kernel per layer that never materializes window or basis tensors in
HBM:

  grid = (B, ty, tx); per grid cell the kernel
    1. obtains each value level either as a per-tile window (row-wise DMAs
       from HBM — slicing both spatial dims in one DMA faults the v5e
       worker, and bf16 sublane tiling wants 8-aligned x-extents) or, for
       the small coarse levels whose strides are < 8, as a whole-level VMEM
       block (which makes their sampling EXACT — no margin truncation);
    2. builds the P-summed hat-function basis over the flattened window
       lanes (VPU) — the tap axis lives entirely on lanes so no
       sublane↔lane reshapes occur;
    3. contracts basis × window per head on the MXU;
    4. writes the [M, qh·qw, D] output block.

Backward (custom VJP) mirrors it: recompute hats, ``g·winᵀ`` → d_basis,
VPU-reduce to d_aw / d_loc, ``basisᵀ·g`` → window grads. Windowed levels
emit per-tile window grads that a scatter-free shifted-add fold
(:func:`fold_windows`) accumulates in XLA; whole-level levels accumulate
their value grad across grid steps directly in a revisited output block.

Layout notes (Mosaic-friendly): head axis M leads in every block; value is
pre-transposed to [B, M, Hp, Wp, 128] per level (lane dim padded to the
128 tile — memref_slice requires it; the MXU pads N to 128 regardless so
the matmul cost is unchanged); loc lanes are ordered (coord, level, point)
so every level/component slice is lane-contiguous.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richsem_tpu.ops.ms_deform_attn_tiled import _plan

_LANE = 128


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------
def _geometry(spatial_shapes, tile, margin):
    plan = _plan(tuple(spatial_shapes), tile)
    if plan is None:
        raise ValueError(f"unsupported shapes {spatial_shapes} for tile {tile}")
    tiles, strides, (ty, tx) = plan
    windows = []
    windowed = []
    for (sy, sx), (hv, wv) in zip(strides, spatial_shapes):
        wy, wx = sy + 2 * margin, sx + 2 * margin
        # row-DMA windows need 8-aligned x starts/extents (sublane tiling)
        # AND must actually be smaller than the level; else whole level
        ok = sx % 8 == 0 and wx % 8 == 0 and wy < hv and wx < wv
        windowed.append(ok)
        windows.append((wy, wx) if ok else (hv, wv))
    return tiles, strides, windows, windowed, ty, tx


def _pad_value_levels(value, spatial_shapes, strides, windowed, ty, tx, margin):
    """value [B, S, M, D] → per-level [B, M, Hp, Wp, 128·k].

    Windowed levels pad spatially by ``margin`` (so window starts are never
    negative); whole levels stay unpadded. All levels pad lanes to 128."""
    b, _, m_heads, d = value.shape
    dp = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    out = []
    start = 0
    for v, (hv, wv) in enumerate(spatial_shapes):
        sy, sx = strides[v]
        img = value[:, start : start + hv * wv].reshape(b, hv, wv, m_heads, d)
        img = img.transpose(0, 3, 1, 2, 4)
        if windowed[v]:
            hp = ty * sy + 2 * margin
            wp = tx * sx + 2 * margin
            img = jnp.pad(
                img,
                ((0, 0), (0, 0), (margin, hp - margin - hv),
                 (margin, wp - margin - wv), (0, dp - d)),
            )
        else:
            img = jnp.pad(img, ((0, 0),) * 4 + ((0, dp - d),))
        out.append(img)
        start += hv * wv
    return out


def _split_queries(x, spatial_shapes, tiles, ty, tx, trailing):
    """x [B, S, M, *trailing] → per-level [B, M, T, qh·qw, prod(tr)]."""
    b = x.shape[0]
    m_heads = x.shape[2]
    tr = int(math.prod(trailing))
    x = x.reshape(b, x.shape[1], m_heads, tr)
    out = []
    start = 0
    for a, (ha, wa) in enumerate(spatial_shapes):
        qh, qw = tiles[a]
        blk = x[:, start : start + ha * wa].reshape(b, ha, wa, m_heads, tr)
        blk = blk.transpose(0, 3, 1, 2, 4)
        blk = jnp.pad(
            blk,
            ((0, 0), (0, 0), (0, ty * qh - ha), (0, tx * qw - wa), (0, 0)),
        )
        blk = blk.reshape(b, m_heads, ty, qh, tx, qw, tr).transpose(
            0, 1, 2, 4, 3, 5, 6
        ).reshape(b, m_heads, ty * tx, qh * qw, tr)
        out.append(blk)
        start += ha * wa
    return out


def _merge_queries(blocks, spatial_shapes, tiles, ty, tx, trailing):
    """per-level [B, M, T, qh·qw, prod(tr)] → [B, S, M, *trailing]."""
    parts = []
    for a, (ha, wa) in enumerate(spatial_shapes):
        qh, qw = tiles[a]
        blk = blocks[a]
        b, m_heads = blk.shape[:2]
        blk = blk.reshape(b, m_heads, ty, tx, qh, qw, -1).transpose(
            0, 1, 2, 4, 3, 5, 6
        ).reshape(b, m_heads, ty * qh, tx * qw, -1)
        blk = blk[:, :, :ha, :wa]
        blk = blk.transpose(0, 2, 3, 1, 4).reshape(
            b, ha * wa, m_heads, *trailing
        )
        parts.append(blk)
    return jnp.concatenate(parts, axis=1)


def fold_windows(dwin, sy, sx, wy, wx, ty, tx, hp, wp):
    """Per-tile window grads [B, M, ty, tx, wy, wx, D] → padded image grad
    [B, M, Hp, Wp, D]: the scatter-free adjoint of window extraction
    (⌈wy/sy⌉ + ⌈wx/sx⌉ shifted strided adds)."""
    b, m_heads, _, _, _, _, d = dwin.shape
    ky = math.ceil(wy / sy)
    kx = math.ceil(wx / sx)
    pad_wx = kx * sx - wx
    if pad_wx:
        dwin = jnp.pad(dwin, ((0, 0),) * 5 + ((0, pad_wx), (0, 0)))
    dwin = dwin.reshape(b, m_heads, ty, tx, wy, kx, sx, d)
    acc_x = jnp.zeros((b, m_heads, ty, tx + kx - 1, wy, sx, d), dwin.dtype)
    for k in range(kx):
        acc_x = acc_x.at[:, :, :, k : k + tx].add(dwin[:, :, :, :, :, k])
    acc_x = acc_x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        b, m_heads, ty, wy, (tx + kx - 1) * sx, d
    )[:, :, :, :, :wp]
    pad_wy = ky * sy - wy
    if pad_wy:
        acc_x = jnp.pad(acc_x, ((0, 0),) * 3 + ((0, pad_wy), (0, 0), (0, 0)))
    acc_x = acc_x.reshape(b, m_heads, ty, ky, sy, wp, d)
    acc_y = jnp.zeros((b, m_heads, ty + ky - 1, sy, wp, d), acc_x.dtype)
    for k in range(ky):
        acc_y = acc_y.at[:, :, k : k + ty].add(acc_x[:, :, :, k])
    return acc_y.reshape(b, m_heads, (ty + ky - 1) * sy, wp, d)[:, :, :hp]


# ---------------------------------------------------------------------------
# in-kernel math
# ---------------------------------------------------------------------------
def _axis_grid(shape_prefix, n):
    """integer coords 0..n-1 broadcast onto lanes of ``shape_prefix+(n,)``."""
    nd = len(shape_prefix)
    return jax.lax.broadcasted_iota(
        jnp.int32, tuple(shape_prefix) + (n,), nd
    ).astype(jnp.float32)


def _hat1(rel, grid):
    return jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., None] - grid))


def _dhat1(rel, grid):
    diff = rel[..., None] - grid
    return jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0)


def _expanders(wy, wx, dtype):
    """Fixed 0/1 matrices broadcasting per-axis vectors onto the
    flattened (y, x) window lanes: Ey[y, s] = [y == s // wx],
    Ex[x, s] = [x == s mod wx]. A row-vector × E matmul replaces the
    flat-lane hat evaluation — MXU instead of VPU."""
    s_i = jax.lax.broadcasted_iota(jnp.int32, (wy, wy * wx), 1)
    y_i = jax.lax.broadcasted_iota(jnp.int32, (wy, wy * wx), 0)
    ey = (s_i // wx == y_i).astype(dtype)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (wx, wy * wx), 1)
    x_i = jax.lax.broadcasted_iota(jnp.int32, (wx, wy * wx), 0)
    ex = (s_i - (s_i // wx) * wx == x_i).astype(dtype)
    return ey, ex


def _expand(vec, e_mat):
    """[M, K, n] × [n, S] → [M, K, S] (reshaped 2-D MXU matmul)."""
    m, k, n = vec.shape
    out = jax.lax.dot_general(
        vec.reshape(m * k, n), e_mat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(m, k, e_mat.shape[1]).astype(vec.dtype)


def _expand_t(lane_vec, e_mat):
    """[M, K, S] × [n, S]ᵀ → [M, K, n]: contract the window lanes."""
    m, k, s_w = lane_vec.shape
    out = jax.lax.dot_general(
        lane_vec.reshape(m * k, s_w), e_mat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(m, k, e_mat.shape[0]).astype(lane_vec.dtype)


def _pick(x, axis, i):
    return jax.lax.index_in_dim(x, i, axis, keepdims=False)


def _lanes(x, start, size):
    return jax.lax.slice_in_dim(x, start, start + size, axis=x.ndim - 1)


def _rel_coords(loc_flat, v, n_lvl, p_pts, hv, wv, origin_y, origin_x):
    """loc lanes (c, v, p) → region-relative pixel coords [M, K, P]."""
    x = _lanes(loc_flat, (0 * n_lvl + v) * p_pts, p_pts)
    y = _lanes(loc_flat, (1 * n_lvl + v) * p_pts, p_pts)
    x_rel = x * wv - 0.5 - origin_x
    y_rel = y * hv - 0.5 - origin_y
    return x_rel, y_rel


def _basis_sum(aw_v, y_rel, x_rel, wy, wx, p_pts, dtype):
    """Σ_p aw·hat_y·hat_x over the flattened region → [M, K, wy·wx].

    Per-axis hats are [M, K, P, w]-small (VPU); their broadcast onto the
    wy·wx window lanes rides the MXU via the fixed 0/1 expanders."""
    m_heads, k = aw_v.shape[:2]
    gy = _axis_grid((m_heads, k, p_pts), wy)
    gx = _axis_grid((m_heads, k, p_pts), wx)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(y_rel[..., None] - gy))
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(x_rel[..., None] - gx))
    hyw = (hy * aw_v[..., None]).astype(dtype)  # [M, K, P, wy]
    hx = hx.astype(dtype)
    ey, ex = _expanders(wy, wx, dtype)
    basis = jnp.zeros((m_heads, k, wy * wx), dtype)
    for p in range(p_pts):
        ry = _expand(_pick(hyw, 2, p), ey)
        rx = _expand(_pick(hx, 2, p), ex)
        basis = basis + ry * rx
    return basis


def _window_origins(strides, windowed, margin, ti, tj):
    """Per-level (origin_y, origin_x) of the fetched region in ORIGINAL
    level coordinates (whole levels have origin 0)."""
    outs = []
    for v, (sy, sx) in enumerate(strides):
        if windowed[v]:
            outs.append((
                (ti * sy - margin).astype(jnp.float32),
                (tj * sx - margin).astype(jnp.float32),
            ))
        else:
            outs.append((jnp.float32(0.0), jnp.float32(0.0)))
    return outs


def _window_dmas(val_refs, win_refs, sems, strides, windows, windowed,
                 cell_g, slot, ty, tx):
    """The row-wise window DMA set for linear grid cell ``cell_g`` into
    double-buffer ``slot`` (one DMA per row — slicing both spatial dims in
    one DMA faults the v5e worker).  Same arguments reconstruct the same
    descriptors, so callers .start() at issue time and .wait() one grid
    step later (double-buffered prefetch: cell c computes from slot c%2
    while cell c+1 streams into slot (c+1)%2)."""
    bb = cell_g // (ty * tx)
    rem = cell_g - bb * (ty * tx)
    ti = rem // tx
    tj = rem - ti * tx
    dmas = []
    for v in range(len(strides)):
        if not windowed[v]:
            continue
        sy, sx = strides[v]
        wy, wx = windows[v]
        for y in range(wy):
            dmas.append(pltpu.make_async_copy(
                val_refs[v].at[bb, :, ti * sy + y, pl.ds(tj * sx, wx), :],
                win_refs[v].at[slot, :, y],
                sems.at[slot, v, y],
            ))
    return dmas


def _prefetch_windows(val_refs, win_refs, sems, strides, windows, windowed,
                      b, ti, tj, ty, tx, n_cells):
    """Issue/await the double-buffered window streams for the current grid
    cell; returns the VMEM slot holding its windows."""
    if not any(windowed):
        return 0
    g = (b * ty + ti) * tx + tj
    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for dma in _window_dmas(val_refs, win_refs, sems, strides, windows,
                                windowed, 0, 0, ty, tx):
            dma.start()

    @pl.when(g + 1 < n_cells)
    def _():
        for dma in _window_dmas(val_refs, win_refs, sems, strides, windows,
                                windowed, g + 1, jax.lax.rem(g + 1, 2),
                                ty, tx):
            dma.start()

    for dma in _window_dmas(val_refs, win_refs, sems, strides, windows,
                            windowed, g, slot, ty, tx):
        dma.wait()
    return slot


def _region_value(win_refs, val_refs, windowed, v, m_heads, wy, wx, slot):
    """→ the level-v value region as [M, wy·wx, 128] (VMEM)."""
    if windowed[v]:
        dp = win_refs[v].shape[-1]
        return win_refs[v][slot].reshape(m_heads, wy * wx, dp)
    blk = val_refs[v][...]  # [1, M, Hv, Wv, 128]
    dp = blk.shape[-1]
    return blk.reshape(m_heads, wy * wx, dp)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(spatial_shapes, tiles, strides, windows, windowed, margin,
                p_pts, out_dtype, *refs):
    n_lvl = len(spatial_shapes)
    val_refs = refs[:n_lvl]
    loc_refs = refs[n_lvl : 2 * n_lvl]
    aw_refs = refs[2 * n_lvl : 3 * n_lvl]
    out_refs = refs[3 * n_lvl : 4 * n_lvl]
    win_refs = refs[4 * n_lvl : 5 * n_lvl]
    sems = refs[5 * n_lvl]

    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    ty = pl.num_programs(1)
    tx = pl.num_programs(2)
    n_cells = pl.num_programs(0) * ty * tx
    cdt = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32

    slot = _prefetch_windows(val_refs, win_refs, sems, strides, windows,
                             windowed, b, ti, tj, ty, tx, n_cells)
    origins = _window_origins(strides, windowed, margin, ti, tj)

    for a in range(n_lvl):
        qh, qw = tiles[a]
        k = qh * qw
        m_heads = loc_refs[a].shape[1]
        d = out_refs[a].shape[-1]
        loc = loc_refs[a][...].reshape(m_heads, k, 2 * n_lvl * p_pts)
        aww = aw_refs[a][...].reshape(m_heads, k, n_lvl * p_pts)
        acc = jnp.zeros((m_heads, k, _LANE), jnp.float32)
        for v in range(n_lvl):
            hv, wv = spatial_shapes[v]
            wy, wx = windows[v]
            oy, ox = origins[v]
            x_rel, y_rel = _rel_coords(loc, v, n_lvl, p_pts, hv, wv, oy, ox)
            basis = _basis_sum(
                _lanes(aww, v * p_pts, p_pts), y_rel, x_rel, wy, wx,
                p_pts, cdt,
            )
            win = _region_value(win_refs, val_refs, windowed, v, m_heads,
                                wy, wx, slot)
            acc = acc + jax.lax.dot_general(
                basis, win.astype(cdt),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        out_refs[a][...] = jax.lax.slice_in_dim(
            acc, 0, d, axis=2
        ).astype(out_dtype).reshape(1, m_heads, 1, k, d)


def _fwd_pallas(value, spatial_shapes, loc, aw, tile, margin):
    b, s, m_heads, d = value.shape
    p_pts = loc.shape[4]
    tiles, strides, windows, windowed, ty, tx = _geometry(
        spatial_shapes, tile, margin
    )
    n_lvl = len(spatial_shapes)

    vals = _pad_value_levels(value, spatial_shapes, strides, windowed, ty, tx,
                             margin)
    loc_cvp = loc.astype(jnp.float32).transpose(0, 1, 2, 5, 3, 4)
    locs = _split_queries(loc_cvp, spatial_shapes, tiles, ty, tx,
                          (2, n_lvl, p_pts))
    aws = _split_queries(aw.astype(jnp.float32), spatial_shapes, tiles, ty, tx,
                         (n_lvl, p_pts))

    def q_spec(k, tr):
        return pl.BlockSpec(
            (1, m_heads, 1, k, tr),
            lambda bb, i, j: (bb, 0, i * tx + j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def val_spec(v):
        if windowed[v]:
            return pl.BlockSpec(memory_space=pltpu.HBM)
        bshape = (1,) + vals[v].shape[1:]
        return pl.BlockSpec(
            bshape, lambda bb, i, j: (bb, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, tuple(spatial_shapes), tuple(tiles), tuple(strides),
            tuple(windows), tuple(windowed), margin, p_pts, value.dtype,
        ),
        grid=(b, ty, tx),
        in_specs=(
            [val_spec(v) for v in range(n_lvl)]
            + [q_spec(qh * qw, n_lvl * p_pts * 2) for qh, qw in tiles]
            + [q_spec(qh * qw, n_lvl * p_pts) for qh, qw in tiles]
        ),
        out_specs=[q_spec(qh * qw, d) for qh, qw in tiles],
        out_shape=[
            jax.ShapeDtypeStruct((b, m_heads, ty * tx, qh * qw, d),
                                 value.dtype)
            for qh, qw in tiles
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (2, m_heads, wy, wx, _LANE) if windowed[v] else (1, 1, 1, 1, 1),
                value.dtype,
            )
            for v, (wy, wx) in enumerate(windows)
        ] + [pltpu.SemaphoreType.DMA((2, n_lvl, max(wy for wy, _ in windows)))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*vals, *locs, *aws)
    merged = _merge_queries(outs, spatial_shapes, tiles, ty, tx, (d,))
    return merged.reshape(b, s, m_heads * d).astype(value.dtype)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
def _bwd_kernel(spatial_shapes, tiles, strides, windows, windowed, margin,
                p_pts, *refs):
    n_lvl = len(spatial_shapes)
    val_refs = refs[:n_lvl]
    loc_refs = refs[n_lvl : 2 * n_lvl]
    aw_refs = refs[2 * n_lvl : 3 * n_lvl]
    g_refs = refs[3 * n_lvl : 4 * n_lvl]
    dloc_refs = refs[4 * n_lvl : 5 * n_lvl]
    daw_refs = refs[5 * n_lvl : 6 * n_lvl]
    dval_refs = refs[6 * n_lvl : 7 * n_lvl]
    win_refs = refs[7 * n_lvl : 8 * n_lvl]
    sems = refs[8 * n_lvl]

    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    ty = pl.num_programs(1)
    tx = pl.num_programs(2)
    n_cells = pl.num_programs(0) * ty * tx
    first_tile = jnp.logical_and(ti == 0, tj == 0)
    d_out = g_refs[0].shape[-1]
    cdt = jnp.bfloat16 if win_refs[0].dtype == jnp.bfloat16 else jnp.float32

    slot = _prefetch_windows(val_refs, win_refs, sems, strides, windows,
                             windowed, b, ti, tj, ty, tx, n_cells)
    origins = _window_origins(strides, windowed, margin, ti, tj)

    # whole-level value-grad blocks are revisited across every (ti, tj) of a
    # batch element — zero them on its first tile
    for v in range(n_lvl):
        if not windowed[v]:
            @pl.when(first_tile)
            def _(v=v):
                dval_refs[v][...] = jnp.zeros(dval_refs[v].shape, dval_refs[v].dtype)

    dwin_accs = {
        v: jnp.zeros(
            (win_refs[v].shape[1], windows[v][0] * windows[v][1], d_out),
            jnp.float32,
        )
        for v in range(n_lvl)
        if windowed[v]
    }

    for a in range(n_lvl):
        qh, qw = tiles[a]
        k = qh * qw
        m_heads = loc_refs[a].shape[1]
        loc = loc_refs[a][...].reshape(m_heads, k, 2 * n_lvl * p_pts)
        aww = aw_refs[a][...].reshape(m_heads, k, n_lvl * p_pts)
        g = g_refs[a][...].reshape(m_heads, k, d_out).astype(cdt)
        dloc_cs = {0: [], 1: []}
        daw_vs = []
        for v in range(n_lvl):
            hv, wv = spatial_shapes[v]
            wy, wx = windows[v]
            oy, ox = origins[v]
            x_rel, y_rel = _rel_coords(loc, v, n_lvl, p_pts, hv, wv, oy, ox)
            aw_v = _lanes(aww, v * p_pts, p_pts)
            win = jax.lax.slice_in_dim(
                _region_value(win_refs, val_refs, windowed, v, m_heads,
                              wy, wx, slot),
                0, d_out, axis=2,
            ).astype(cdt)

            d_basis = jax.lax.dot_general(
                g, win,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(cdt)  # [M, K, wy·wx]

            basis = _basis_sum(aw_v, y_rel, x_rel, wy, wx, p_pts, cdt)
            dwin_v = jax.lax.dot_general(
                basis, g,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [M, wy·wx, D]
            if windowed[v]:
                dwin_accs[v] = dwin_accs[v] + dwin_v
            else:
                dval_refs[v][...] += dwin_v.reshape(
                    1, m_heads, hv, wv, d_out
                ).astype(dval_refs[v].dtype)

            # reductions via transposed expanders (MXU): contract the
            # window lanes down to per-axis vectors, finish on tiny arrays
            gy = _axis_grid((m_heads, k, p_pts), wy)
            gx = _axis_grid((m_heads, k, p_pts), wx)
            hy = _hat1(y_rel, gy).astype(cdt)  # [M, K, P, wy]
            hx = _hat1(x_rel, gx).astype(cdt)
            dhy = _dhat1(y_rel, gy).astype(cdt)
            dhx = _dhat1(x_rel, gx).astype(cdt)
            ey, ex = _expanders(wy, wx, cdt)
            daw_ps, dx_ps, dy_ps = [], [], []
            for p in range(p_pts):
                ry = _expand(_pick(hy, 2, p), ey)   # [M, K, S]
                rx = _expand(_pick(hx, 2, p), ex)
                awp = _pick(aw_v, 2, p)
                t = _expand_t(rx * d_basis, ey)      # [M, K, wy]
                u = _expand_t(ry * d_basis, ex)      # [M, K, wx]
                daw_ps.append(
                    (t.astype(jnp.float32) * _pick(hy, 2, p)).sum(-1)
                )
                dy_ps.append(
                    (t.astype(jnp.float32) * _pick(dhy, 2, p)).sum(-1)
                    * awp * hv
                )
                dx_ps.append(
                    (u.astype(jnp.float32) * _pick(dhx, 2, p)).sum(-1)
                    * awp * wv
                )
            daw_vs.append(
                jnp.concatenate([x[..., None] for x in daw_ps], -1)
            )
            dloc_cs[0].append(
                jnp.concatenate([x[..., None] for x in dx_ps], -1)
            )
            dloc_cs[1].append(
                jnp.concatenate([x[..., None] for x in dy_ps], -1)
            )
        dloc = jnp.concatenate(dloc_cs[0] + dloc_cs[1], -1)  # (c, v, p) lanes
        daw = jnp.concatenate(daw_vs, -1)
        dloc_refs[a][...] = dloc.astype(jnp.float32).reshape(
            1, m_heads, 1, k, n_lvl * p_pts * 2
        )
        daw_refs[a][...] = daw.astype(jnp.float32).reshape(
            1, m_heads, 1, k, n_lvl * p_pts
        )

    for v in range(n_lvl):
        if windowed[v]:
            dval_refs[v][...] = dwin_accs[v].astype(dval_refs[v].dtype)[
                None, None
            ]


def _bwd_pallas(value, spatial_shapes, loc, aw, tile, margin, g):
    b, s, m_heads, d = value.shape
    p_pts = loc.shape[4]
    tiles, strides, windows, windowed, ty, tx = _geometry(
        spatial_shapes, tile, margin
    )
    n_lvl = len(spatial_shapes)

    vals = _pad_value_levels(value, spatial_shapes, strides, windowed, ty, tx,
                             margin)
    loc_cvp = loc.astype(jnp.float32).transpose(0, 1, 2, 5, 3, 4)
    locs = _split_queries(loc_cvp, spatial_shapes, tiles, ty, tx,
                          (2, n_lvl, p_pts))
    aws = _split_queries(aw.astype(jnp.float32), spatial_shapes, tiles, ty, tx,
                         (n_lvl, p_pts))
    gs = _split_queries(g.reshape(b, s, m_heads, d), spatial_shapes, tiles,
                        ty, tx, (d,))

    def q_spec(k, tr):
        return pl.BlockSpec(
            (1, m_heads, 1, k, tr),
            lambda bb, i, j: (bb, 0, i * tx + j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def val_spec(v):
        if windowed[v]:
            return pl.BlockSpec(memory_space=pltpu.HBM)
        bshape = (1,) + vals[v].shape[1:]
        return pl.BlockSpec(
            bshape, lambda bb, i, j: (bb, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def dval_spec(v):
        wy, wx = windows[v]
        if windowed[v]:
            return pl.BlockSpec(
                (1, 1, m_heads, wy * wx, d),
                lambda bb, i, j: (bb, i * tx + j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        hv, wv = spatial_shapes[v]
        return pl.BlockSpec(
            (1, m_heads, hv, wv, d),
            lambda bb, i, j: (bb, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def dval_shape(v):
        wy, wx = windows[v]
        if windowed[v]:
            return jax.ShapeDtypeStruct(
                (b, ty * tx, m_heads, wy * wx, d), jnp.float32
            )
        hv, wv = spatial_shapes[v]
        return jax.ShapeDtypeStruct((b, m_heads, hv, wv, d), jnp.float32)

    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, tuple(spatial_shapes), tuple(tiles), tuple(strides),
            tuple(windows), tuple(windowed), margin, p_pts,
        ),
        grid=(b, ty, tx),
        in_specs=(
            [val_spec(v) for v in range(n_lvl)]
            + [q_spec(qh * qw, n_lvl * p_pts * 2) for qh, qw in tiles]
            + [q_spec(qh * qw, n_lvl * p_pts) for qh, qw in tiles]
            + [q_spec(qh * qw, d) for qh, qw in tiles]
        ),
        out_specs=(
            [q_spec(qh * qw, n_lvl * p_pts * 2) for qh, qw in tiles]
            + [q_spec(qh * qw, n_lvl * p_pts) for qh, qw in tiles]
            + [dval_spec(v) for v in range(n_lvl)]
        ),
        out_shape=(
            [
                jax.ShapeDtypeStruct(
                    (b, m_heads, ty * tx, qh * qw, n_lvl * p_pts * 2),
                    jnp.float32,
                )
                for qh, qw in tiles
            ]
            + [
                jax.ShapeDtypeStruct(
                    (b, m_heads, ty * tx, qh * qw, n_lvl * p_pts), jnp.float32
                )
                for qh, qw in tiles
            ]
            + [dval_shape(v) for v in range(n_lvl)]
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, m_heads, wy, wx, _LANE) if windowed[v] else (1, 1, 1, 1, 1),
                value.dtype,
            )
            for v, (wy, wx) in enumerate(windows)
        ] + [pltpu.SemaphoreType.DMA((2, n_lvl, max(wy for wy, _ in windows)))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*vals, *locs, *aws, *gs)

    dlocs = outs[:n_lvl]
    daws = outs[n_lvl : 2 * n_lvl]
    dvals = outs[2 * n_lvl :]

    d_loc = _merge_queries(
        dlocs, spatial_shapes, tiles, ty, tx, (2, n_lvl, p_pts)
    ).transpose(0, 1, 2, 4, 5, 3).astype(loc.dtype)
    d_aw = _merge_queries(
        daws, spatial_shapes, tiles, ty, tx, (n_lvl, p_pts)
    ).astype(aw.dtype)

    d_val_parts = []
    for v, (hv, wv) in enumerate(spatial_shapes):
        if windowed[v]:
            sy, sx = strides[v]
            wy, wx = windows[v]
            hp = ty * sy + 2 * margin
            wp = tx * sx + 2 * margin
            dw = dvals[v].reshape(b, ty, tx, m_heads, wy, wx, d).transpose(
                0, 3, 1, 2, 4, 5, 6
            )
            folded = fold_windows(dw, sy, sx, wy, wx, ty, tx, hp, wp)
            folded = folded[:, :, margin : margin + hv, margin : margin + wv]
        else:
            folded = dvals[v]
        d_val_parts.append(
            folded.transpose(0, 2, 3, 1, 4).reshape(b, hv * wv, m_heads, d)
        )
    d_value = jnp.concatenate(d_val_parts, axis=1).astype(value.dtype)
    return d_value, d_loc, d_aw


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
        return _fwd_pallas(value, spatial_shapes, loc, aw, tile, margin)

    def fwd(value, loc, aw):
        return core(value, loc, aw), (value, loc, aw)

    def bwd(res, g):
        value, loc, aw = res
        return _bwd_pallas(value, spatial_shapes, loc, aw, tile, margin, g)

    core.defvjp(fwd, bwd)
    _CACHE[key] = core
    return core


def ms_deform_attn_tiled_pallas(
    value: jnp.ndarray,  # [B, S, M, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Q=S, M, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Q=S, M, L, P]
    tile: Tuple[int, int] = (16, 16),
    margin: int = 8,
) -> jnp.ndarray:
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if sampling_locations.shape[1] != value.shape[1]:
        raise ValueError("pallas tiled path requires Q == S")
    return _core(spatial_shapes, tuple(tile), int(margin))(
        value, sampling_locations, attention_weights
    )
