"""Separable-matmul multi-scale deformable attention — the decoder fast path.

The exact gather formulation (:mod:`richsem_tpu.ops.ms_deform_attn`) is
row-latency-bound on TPU: at production decoder shapes (Q=1100) its forward
issues ~1.1M gather rows and runs at <1% of HBM bandwidth; its backward is a
scatter-add of the same rows. This module reformulates the reference sampler
(models/richsem/ops/src/cuda/ms_deform_im2col_cuda.cuh:33-85) as dense
*separable* interpolation so the work rides the MXU:

    out[q] = Σ_p aw_p · hy_pᵀ · V · hx_p

with hat-function vectors hy ∈ R^{Hv}, hx ∈ R^{Wv} over the FULL level grid
(hat(r, i) = max(0, 1 − |r − i|) — exactly two nonzero taps in-range, and
exact zero-padded bilinear everywhere, including out-of-bounds samples: a
hat vanishes for any pixel ≥ 1 away). Same mathematics as the dense one-hot
oracle (`ms_deform_attn_dense_oracle`), factorized per axis.

TPU layout rules this implementation obeys (learned from traces — a naive
einsum/reshape version spends 80% of its time in physical retiling and
per-row microdots):

  * every intermediate keeps ≥ 1024 useful lanes: the stage-1 output
    ``R[n, q·p, Hv·D]`` packs (y, d) on lanes y-major, never reshaped;
  * the x/y contractions that depend on the query on BOTH sides (no matmul
    form) are expressed as full-lane VPU multiplies whose reduction is a
    matmul against a constant 0/1 matrix (``tile(eye(D), (Hv, 1))``) — the
    MXU does the strided lane reduction that Mosaic/VPU cannot;
  * per-query hat values over the packed (y, d) lanes are evaluated
    directly against the repeated grid ``j // D`` — a broadcast VPU
    formula, not a repeat/reshape of a [.., Hv, D] tensor;
  * the wide axis (W for landscape canvases) is contracted first, so the
    packed intermediate carries the narrow axis: R lanes = Hv·D.

Cost at production decoder shapes (B2, Q1100, M8, D32, 4 levels): ~0.5 TFLOP
of well-shaped bf16 matmul + ~1.5 GB of intermediate traffic ≈ 3-4 ms fwd
(the gather: 9 ms); backward is 4 matmuls of the same shape family ≈ 2× fwd
(the gather/scatter: 29 ms).

Not for the encoder: there Q = S ≈ 25k makes R ~11 GB per level — the
windowed tiled/Pallas kernels cover that case.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _level_views_t(value, spatial_shapes):
    """value [B, S, M, D] → per-level [B·M, Wv, Hv·D] (x-contractable,
    (y, d) lane-packed y-major)."""
    b, _, m, d = value.shape
    out = []
    start = 0
    for h, w in spatial_shapes:
        img = value[:, start : start + h * w].reshape(b, h, w, m, d)
        img = img.transpose(0, 3, 2, 1, 4).reshape(b * m, w, h * d)
        out.append(img)
        start += h * w
    return out


def _geom(loc, spatial_shapes, lvl):
    """loc [B,Q,M,L,P,2] → per-level pixel coords y, x as [B·M, Q·P] f32."""
    h, w = spatial_shapes[lvl]
    ll = loc[:, :, :, lvl].astype(jnp.float32)  # [B, Q, M, P, 2]
    x = ll[..., 0] * w - 0.5
    y = ll[..., 1] * h - 0.5
    b, q, m, p = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(b * m, q * p)
    y = y.transpose(0, 2, 1, 3).reshape(b * m, q * p)
    return y, x


def _hats(coord, n, dtype):
    """coord [...] pixel coords → hat weights [..., n] over grid 0..n-1."""
    grid = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - grid)).astype(
        dtype
    )


def _dhats(coord, n, dtype):
    grid = jnp.arange(n, dtype=jnp.float32)
    diff = coord[..., None] - grid
    return jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0).astype(dtype)


def _hats_rep(coord, n, d, dtype):
    """hat weights against the y-major repeated grid: [..., n·d] where lane
    j carries hat(coord, j // d) — full-lane-width VPU formula."""
    grid = (np.arange(n * d) // d).astype(np.float32)
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(coord[..., None] - jnp.asarray(grid))
    ).astype(dtype)


def _dhats_rep(coord, n, d, dtype):
    grid = (np.arange(n * d) // d).astype(np.float32)
    diff = coord[..., None] - jnp.asarray(grid)
    return jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0).astype(dtype)


def _red(n, d, dtype):
    """[n·d, d] 0/1 lane-reduction matrix: RED[y·d + i, j] = (i == j)."""
    return jnp.asarray(np.tile(np.eye(d, dtype=np.float32), (n, 1)), dtype)


def _bmm(a, b_, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b_,
        dimension_numbers=(contract, batch),
        preferred_element_type=jnp.float32,
    )


_VJP_CACHE = {}

# Per-chunk budget for the packed intermediate R[B·M, rows, Hv·D]. At the
# shipped bs2 decoder shapes R is ~480 MB — one chunk, identical program to
# the unchunked version. Larger batches split the Q·P rows with a lax.scan
# so the decoder's fwd+bwd temps stay bounded instead of scaling linearly
# with batch (bs4 unchunked OOMs the chip: seven ~1 GB R buffers live across
# the backward; a plain unrolled chunk loop doesn't help — XLA interleaves
# the chunks and keeps them all live — the scan's sequential buffer reuse
# is the point).
_CHUNK_BUDGET_BYTES = 512 * 1024 * 1024


def _num_chunks(bm: int, qp: int, hd_max: int, itemsize: int) -> int:
    bytes_full = bm * qp * hd_max * itemsize
    nch = min(qp, max(1, -(-bytes_full // _CHUNK_BUDGET_BYTES)))
    while qp % nch:  # need an even row split; qp = Q·P has small factors
        nch += 1
    return nch


def _core(spatial_shapes: Tuple[Tuple[int, int], ...]):
    if spatial_shapes in _VJP_CACHE:
        return _VJP_CACHE[spatial_shapes]

    n_levels = len(spatial_shapes)

    def _aw_rows(aw, v):
        b, q, m, _, p = aw.shape
        awv = aw[:, :, :, v].astype(jnp.float32)  # [B, Q, M, P]
        return awv.transpose(0, 2, 1, 3).reshape(b * m, q * p)

    def _fwd_chunk(imgs, ys, xs, awrs_c, d, cdt):
        """One row-chunk: per-level [BM, ck] coords/weights → [BM, ck, D]."""
        bm, ck = ys[0].shape
        out = jnp.zeros((bm, ck, d), jnp.float32)
        for v, (h, w) in enumerate(spatial_shapes):
            hxw = _hats(xs[v], w, cdt) * awrs_c[v][..., None].astype(cdt)
            r = _bmm(hxw, imgs[v], ((2,), (1,))).astype(cdt)
            hy_rep = _hats_rep(ys[v], h, d, cdt)
            out = out + _bmm(
                (r * hy_rep).astype(cdt), _red(h, d, cdt), ((2,), (0,)),
                batch=((), ()),
            )
        return out

    def _stack_chunks(rows_per_level, nch, ck):
        """per-level [BM, QP] → per-level [nch, BM, ck] (scan xs layout)."""
        return [
            r.reshape(r.shape[0], nch, ck).transpose(1, 0, 2)
            for r in rows_per_level
        ]

    def _fwd_impl(value, loc, aw):
        b, s, m, d = value.shape
        q, p = loc.shape[1], loc.shape[4]
        cdt = value.dtype if value.dtype == jnp.bfloat16 else jnp.float32
        imgs = [im.astype(cdt) for im in _level_views_t(value, spatial_shapes)]
        qp = q * p
        hd_max = max(h for h, _ in spatial_shapes) * d
        nch = _num_chunks(b * m, qp, hd_max, jnp.dtype(cdt).itemsize)
        ck = qp // nch
        geoms = [_geom(loc, spatial_shapes, v) for v in range(n_levels)]
        ys = [g[0] for g in geoms]
        xs = [g[1] for g in geoms]
        awrs = [_aw_rows(aw, v) for v in range(n_levels)]
        if nch == 1:
            out = _fwd_chunk(imgs, ys, xs, awrs, d, cdt)
        else:
            xs_stack = (
                _stack_chunks(ys, nch, ck),
                _stack_chunks(xs, nch, ck),
                _stack_chunks(awrs, nch, ck),
            )
            out = jax.lax.map(
                lambda c: _fwd_chunk(imgs, c[0], c[1], c[2], d, cdt),
                xs_stack,
            )  # [nch, BM, ck, D]
            out = out.transpose(1, 0, 2, 3).reshape(b * m, qp, d)
        out = out.reshape(b, m, q, p, d).sum(3).transpose(0, 2, 1, 3)
        return out.reshape(b, q, m * d).astype(value.dtype)

    @jax.custom_vjp
    def core(value, loc, aw):
        return _fwd_impl(value, loc, aw)

    def fwd(value, loc, aw):
        return core(value, loc, aw), (value, loc, aw)

    def _bwd_chunk(imgs, ys, xs, awrs_c, gr, d, cdt):
        """One row-chunk of the backward.

        Returns (per-level dimg [BM, Wv, H·D] f32 to accumulate,
        per-level daw/dx/dy rows [BM, ck] f32)."""
        dimgs, daw_levels, dx_levels, dy_levels = [], [], [], []
        for v, (h, w) in enumerate(spatial_shapes):
            y, x, awr = ys[v], xs[v], awrs_c[v]
            hx = _hats(x, w, cdt)
            hxw = hx * awr[..., None].astype(cdt)
            img = imgs[v]
            r = _bmm(hxw, img, ((2,), (1,))).astype(cdt)  # [BM, ck, H·D]
            hy_rep = _hats_rep(y, h, d, cdt)
            # lane-expand g over y via the transposed reduction matmul
            g_rep = _bmm(
                gr, _red(h, d, cdt), ((2,), (1,)), batch=((), ())
            ).astype(cdt)  # [BM, ck, H·D]
            # d_y: Σ_j g_rep·R·dhat_rep (VPU fusion + lane reduce)
            dy_levels.append(
                (
                    g_rep.astype(jnp.float32)
                    * r.astype(jnp.float32)
                    * _dhats_rep(y, h, d, jnp.float32)
                ).sum(-1)
                * h
            )
            d_r = (g_rep * hy_rep).astype(cdt)
            # d_hx' = d_R · imgᵀ ; then split into d_aw / d_x
            d_hxw = _bmm(d_r, img, ((2,), (2,)))  # [BM, ck, Wv] f32
            daw_levels.append((d_hxw * hx.astype(jnp.float32)).sum(-1))
            dx_levels.append(
                (d_hxw * _dhats(x, w, jnp.float32)).sum(-1) * awr * w
            )
            # d_img = hx'ᵀ · d_R (accumulated over row chunks)
            dimgs.append(_bmm(hxw, d_r, ((1,), (1,))))  # [BM, Wv, H·D] f32
        return dimgs, daw_levels, dx_levels, dy_levels

    def bwd(res, g):
        value, loc, aw = res
        b, s, m, d = value.shape
        q, p = loc.shape[1], loc.shape[4]
        cdt = value.dtype if value.dtype == jnp.bfloat16 else jnp.float32
        imgs = [im.astype(cdt) for im in _level_views_t(value, spatial_shapes)]
        qp = q * p
        hd_max = max(h for h, _ in spatial_shapes) * d
        nch = _num_chunks(b * m, qp, hd_max, jnp.dtype(cdt).itemsize)
        ck = qp // nch
        # upstream grad broadcast over P (rows dim — layout-cheap)
        g_rows = (
            g.reshape(b, q, m, d).transpose(0, 2, 1, 3)[:, :, :, None, :]
        )  # [B, M, Q, 1, D]
        g_rows = jnp.broadcast_to(g_rows, (b, m, q, p, d)).reshape(
            b * m, q * p, d
        ).astype(cdt)
        geoms = [_geom(loc, spatial_shapes, v) for v in range(n_levels)]
        ys = [gm[0] for gm in geoms]
        xs = [gm[1] for gm in geoms]
        awrs = [_aw_rows(aw, v) for v in range(n_levels)]

        if nch == 1:
            dimg_levels, daw_l, dx_l, dy_l = _bwd_chunk(
                imgs, ys, xs, awrs, g_rows, d, cdt
            )
            daw_rows = [x_[None] for x_ in daw_l]
            dx_rows = [x_[None] for x_ in dx_l]
            dy_rows = [x_[None] for x_ in dy_l]
        else:
            xs_stack = (
                _stack_chunks(ys, nch, ck),
                _stack_chunks(xs, nch, ck),
                _stack_chunks(awrs, nch, ck),
                g_rows.reshape(b * m, nch, ck, d).transpose(1, 0, 2, 3),
            )

            def body(carry, c):
                dimgs, daw_l, dx_l, dy_l = _bwd_chunk(
                    imgs, c[0], c[1], c[2], c[3], d, cdt
                )
                carry = [ci + di for ci, di in zip(carry, dimgs)]
                return carry, (daw_l, dx_l, dy_l)

            carry0 = [
                jnp.zeros((b * m, w, h * d), jnp.float32)
                for h, w in spatial_shapes
            ]
            dimg_levels, (daw_rows, dx_rows, dy_rows) = jax.lax.scan(
                body, carry0, xs_stack
            )  # rows: per-level [nch, BM, ck]

        dval_parts = []
        for v, (h, w) in enumerate(spatial_shapes):
            dimg = dimg_levels[v].reshape(b, m, w, h, d).transpose(
                0, 3, 2, 1, 4
            )
            dval_parts.append(dimg.reshape(b, h * w, m, d))
        grad_value = jnp.concatenate(dval_parts, axis=1).astype(value.dtype)

        def cat_rows(per_level):
            # per-level [nch, BM, ck] → [BM, QP, L]
            levels = [
                t.transpose(1, 0, 2).reshape(b * m, qp) for t in per_level
            ]
            return jnp.stack(levels, axis=2)

        def unpack(t):  # [BM, QP, L] → [B, Q, M, L, P]
            return (
                t.reshape(b, m, q, p, n_levels)
                .transpose(0, 2, 1, 4, 3)
            )

        grad_aw = unpack(cat_rows(daw_rows)).astype(aw.dtype)
        grad_loc = jnp.stack(
            [unpack(cat_rows(dx_rows)), unpack(cat_rows(dy_rows))],
            axis=-1,
        ).astype(loc.dtype)
        return grad_value, grad_loc, grad_aw

    core.defvjp(fwd, bwd)
    _VJP_CACHE[spatial_shapes] = core
    return core


def ms_deform_attn_sep(
    value: jnp.ndarray,  # [B, S, M, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Q, M, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Q, M, L, P]
) -> jnp.ndarray:
    """Exact msda via separable hat-basis matmuls (see module docstring)."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if sum(h * w for h, w in spatial_shapes) != value.shape[1]:
        raise ValueError("spatial_shapes do not sum to token count")
    return _core(spatial_shapes)(
        value, sampling_locations, attention_weights
    )
