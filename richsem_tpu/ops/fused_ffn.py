"""Fused encoder-layer tail: residual+LN1 -> FFN -> residual+LN2, one kernel.

The encoder's non-msda work (~54 ms/step, CEILING.md §1) is dominated by
HBM traffic on [B·S, 256] f32 stream tensors and the [B·S, 2048] FFN hidden
activation (~205 MB bf16 per layer, written+read in the forward and read
again in the backward). XLA cannot fuse across the two FFN matmuls, so the
hidden always round-trips HBM. This Pallas kernel computes the whole tail

    u1 = src + attn_out            (f32 stream)
    x  = LN1(u1)                   (f32 stats, scale/bias)
    h1 = relu(x@W1 + b1)           (compute dtype, e.g. bf16)
    h2 = h1@W2 + b2
    y  = LN2(x + h2)

per 512-token block entirely in VMEM: the hidden exists only on-chip. The
backward recomputes h1 and both LN stats per block (MXU FLOPs are cheap;
HBM is not) and accumulates the weight grads across the sequential grid.

Numerics mirror the flax composition exactly: matmuls in ``cdt`` with f32
accumulation then cast (flax Dense dtype semantics), bias adds in ``cdt``,
LN stats in f32 via mean/mean-of-squares (flax ``_compute_stats``).

Reference identity: deformable_transformer.py:595-607 (encoder layer FFN
with pre-add LayerNorms; dropout=0 in every shipped recipe).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_TK = 1024  # tokens per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_fwd(u, scale, bias, eps):
    """flax LayerNorm math in f32: returns (y, mean, rstd, xhat)."""
    mean = u.mean(axis=-1, keepdims=True)
    var = (u * u).mean(axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (u - mean) * rstd
    return xhat * scale + bias, mean, rstd, xhat


def _ln_bwd(dy, xhat, rstd, scale):
    """du for y = xhat*scale + bias; also returns (dscale, dbias) sums."""
    dxh = dy * scale
    du = rstd * (
        dxh
        - dxh.mean(axis=-1, keepdims=True)
        - xhat * (dxh * xhat).mean(axis=-1, keepdims=True)
    )
    return du, (dy * xhat).sum(axis=0, keepdims=True), dy.sum(
        axis=0, keepdims=True
    )


def _mm(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ffn_fwd_block(x, w1, b1, w2, b2, cdt):
    """x f32 [tk, d] -> (h1 cdt [tk, f], h2 f32 [tk, d]); flax Dense order."""
    xc = x.astype(cdt)
    h1 = jnp.maximum(_mm(xc, w1).astype(cdt) + b1, 0)
    h2 = _mm(h1, w2).astype(cdt) + b2
    return h1, h2.astype(jnp.float32)


def _fwd_kernel(eps, cdt, src_ref, attn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                s1_ref, sb1_ref, s2_ref, sb2_ref, out_ref):
    u1 = src_ref[...] + attn_ref[...]
    x, _, _, _ = _ln_fwd(u1, s1_ref[...], sb1_ref[...], eps)
    _, h2 = _ffn_fwd_block(
        x, w1_ref[...], b1_ref[...], w2_ref[...], b2_ref[...], cdt
    )
    y, _, _, _ = _ln_fwd(x + h2, s2_ref[...], sb2_ref[...], eps)
    out_ref[...] = y


def _bwd_kernel(eps, cdt, src_ref, attn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                s1_ref, sb1_ref, s2_ref, sb2_ref, dy_ref,
                du1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                ds1_ref, dsb1_ref, ds2_ref, dsb2_ref):
    first = pl.program_id(0) == 0
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    # ---- recompute forward state for this block ----------------------
    u1 = src_ref[...] + attn_ref[...]
    x, _, rstd1, xhat1 = _ln_fwd(u1, s1_ref[...], sb1_ref[...], eps)
    h1, h2 = _ffn_fwd_block(x, w1, b1_ref[...], w2, b2_ref[...], cdt)
    u2 = x + h2
    mean2 = u2.mean(axis=-1, keepdims=True)
    var2 = (u2 * u2).mean(axis=-1, keepdims=True) - mean2 * mean2
    rstd2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = (u2 - mean2) * rstd2
    # ---- LN2 backward -------------------------------------------------
    dy = dy_ref[...]
    du2, ds2, dsb2 = _ln_bwd(dy, xhat2, rstd2, s2_ref[...])
    # ---- FFN backward (cdt matmuls, f32 accumulation) ----------------
    du2c = du2.astype(cdt)
    db2 = du2.sum(axis=0, keepdims=True)
    # relu mask: compare in f32 — Mosaic has no packed-bf16 cmpf
    relu_mask = (h1.astype(jnp.float32) > 0.0).astype(cdt)
    dh1 = _mm(du2c, w2, ((1,), (1,))).astype(cdt) * relu_mask  # [tk, f]
    db1 = dh1.astype(jnp.float32).sum(axis=0, keepdims=True)
    dx_ffn = _mm(dh1, w1, ((1,), (1,)))  # [tk, d] f32
    dw1 = _mm(x.astype(cdt), dh1, ((0,), (0,)))  # [d, f] f32
    dw2 = _mm(h1, du2c, ((0,), (0,)))  # [f, d] f32
    dx = du2 + dx_ffn
    # ---- LN1 backward -------------------------------------------------
    du1, ds1, dsb1 = _ln_bwd(dx, xhat1, rstd1, s1_ref[...])
    du1_ref[...] = du1

    @pl.when(first)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        ds1_ref[...] = ds1
        dsb1_ref[...] = dsb1
        ds2_ref[...] = ds2
        dsb2_ref[...] = dsb2

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw1_ref[...] = dw1_ref[...] + dw1
        db1_ref[...] = db1_ref[...] + db1
        dw2_ref[...] = dw2_ref[...] + dw2
        db2_ref[...] = db2_ref[...] + db2
        ds1_ref[...] = ds1_ref[...] + ds1
        dsb1_ref[...] = dsb1_ref[...] + dsb1
        ds2_ref[...] = ds2_ref[...] + ds2
        dsb2_ref[...] = dsb2_ref[...] + dsb2


def _row_spec(tk, d):
    return pl.BlockSpec((tk, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(*shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def _pad_rows(x, n_pad):
    if n_pad == 0:
        return x
    return jnp.pad(x, ((0, n_pad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_encoder_tail(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2,
                       eps: float, cdt):
    """y = LN2(x + FFN(x)), x = LN1(src + attn_out); see module docstring.

    src/attn_out: [N, d] float32. w1 [d, f], w2 [f, d]; LN params [d].
    """
    return _fwd_impl(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2,
                     eps, cdt)


def _args(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2, cdt, n_pad):
    d = src.shape[1]
    f = w1.shape[1]
    return (
        _pad_rows(src, n_pad), _pad_rows(attn_out, n_pad),
        w1.astype(cdt), b1.astype(cdt).reshape(1, f),
        w2.astype(cdt), b2.astype(cdt).reshape(1, d),
        s1.astype(jnp.float32).reshape(1, d),
        sb1.astype(jnp.float32).reshape(1, d),
        s2.astype(jnp.float32).reshape(1, d),
        sb2.astype(jnp.float32).reshape(1, d),
    )


def _specs(tk, d, f):
    return [
        _row_spec(tk, d), _row_spec(tk, d),
        _full_spec(d, f), _full_spec(1, f),
        _full_spec(f, d), _full_spec(1, d),
        _full_spec(1, d), _full_spec(1, d),
        _full_spec(1, d), _full_spec(1, d),
    ]


def _fwd_impl(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2, eps, cdt):
    n, d = src.shape
    f = w1.shape[1]
    n_pad = (-n) % _TK
    np_ = n + n_pad
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps, cdt),
        grid=(np_ // _TK,),
        in_specs=_specs(_TK, d, f),
        out_specs=_row_spec(_TK, d),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*_args(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2, cdt, n_pad))
    return out[:n]


def _vjp_fwd(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2, eps, cdt):
    y = _fwd_impl(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2, eps, cdt)
    return y, (src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2)


def _vjp_bwd(eps, cdt, res, dy):
    src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2 = res
    n, d = src.shape
    f = w1.shape[1]
    n_pad = (-n) % _TK
    np_ = n + n_pad
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps, cdt),
        grid=(np_ // _TK,),
        in_specs=_specs(_TK, d, f) + [_row_spec(_TK, d)],
        out_specs=[
            _row_spec(_TK, d),
            _full_spec(d, f), _full_spec(1, f),
            _full_spec(f, d), _full_spec(1, d),
            _full_spec(1, d), _full_spec(1, d),
            _full_spec(1, d), _full_spec(1, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d), jnp.float32),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*_args(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2, cdt, n_pad),
      _pad_rows(dy.astype(jnp.float32), n_pad))
    du1, dw1, db1, dw2, db2, ds1, dsb1, ds2, dsb2 = outs
    du1 = du1[:n]
    return (
        du1, du1,
        dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
        ds1[0].astype(s1.dtype), dsb1[0].astype(sb1.dtype),
        ds2[0].astype(s2.dtype), dsb2[0].astype(sb2.dtype),
    )


fused_encoder_tail.defvjp(_vjp_fwd, _vjp_bwd)


def xla_encoder_tail(src, attn_out, w1, b1, w2, b2, s1, sb1, s2, sb2,
                     eps: float, cdt) -> jnp.ndarray:
    """Reference XLA composition with IDENTICAL math (fallback + oracle)."""
    u1 = src + attn_out
    x, _, _, _ = _ln_fwd(
        u1, s1.astype(jnp.float32), sb1.astype(jnp.float32), eps
    )
    xc = x.astype(cdt)
    h1 = jnp.maximum(
        _mm(xc, w1.astype(cdt)).astype(cdt) + b1.astype(cdt), 0
    )
    h2 = (_mm(h1, w2.astype(cdt)).astype(cdt) + b2.astype(cdt)).astype(
        jnp.float32
    )
    y, _, _, _ = _ln_fwd(
        x + h2, s2.astype(jnp.float32), sb2.astype(jnp.float32), eps
    )
    return y
