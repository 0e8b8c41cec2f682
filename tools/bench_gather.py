"""Microbenchmark: msda core formulations on the real TPU.

Compares, at production encoder/decoder shapes (bs2, 896x1344 → 4-scale
pyramid, M=8, D=32, L=4, P=4):

  * flat  — the shipped exact gather (one jnp.take of [B·M·S, D] rows)
  * patch — 2x2xD-slice gather: one XLA gather per level with slice sizes
    (2, 2, D) at clipped tap origins + hat-function weights (exact
    zero-padded bilinear, 4x fewer gather rows, 4x wider slices)
  * tiled — the XLA windowed MXU path (encoder only)
  * pallas — the fused Pallas kernel (encoder only)

All timings chain N iterations inside one jit (axon tunnel costs ~50-60 ms
per dispatched program; see ROADMAP.md engineering notes).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.ops.ms_deform_attn import ms_deform_attn
from richsem_tpu.ops.ms_deform_attn_patch import ms_deform_attn_patch

B, H, W = 2, 896, 1344
M, D, L, P = 8, 32, 4, 4
SHAPES = tuple((H // s, W // s) for s in (8, 16, 32, 64))
S = sum(h * w for h, w in SHAPES)


def chain(op, value, loc, aw, n=8):
    """time op by chaining n data-dependent calls inside one jit."""

    def body(_, v):
        o = op(v, SHAPES, loc, aw)
        # cheap data dependence: perturb value by a scalar from the output
        return v * (1.0 + 1e-12 * o[0, 0, 0].astype(v.dtype))

    f = jax.jit(lambda v: jax.lax.fori_loop(0, n, body, v))
    r = f(value)
    r.block_until_ready()
    t0 = time.time()
    r = f(value)
    r.block_until_ready()
    return (time.time() - t0) / n


def chain_bwd(op, value, loc, aw, n=8):
    def loss(v, l, a):
        return op(v, SHAPES, l, a).astype(jnp.float32).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))

    def body(_, carry):
        v, l, a = carry
        gv, gl, ga = g(v, l, a)
        eps = 1e-12
        return (
            v * (1.0 + eps * gv[0, 0, 0, 0].astype(v.dtype)),
            l * (1.0 + eps * gl[0, 0, 0, 0, 0, 0]),
            a * (1.0 + eps * ga[0, 0, 0, 0, 0]),
        )

    f = jax.jit(lambda v, l, a: jax.lax.fori_loop(0, n, body, (v, l, a)))
    r = f(value, loc, aw)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(value, loc, aw)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.normal(size=(B, S, M, D)), jnp.bfloat16)

    def mk_qs(q):
        loc = jnp.asarray(rng.uniform(0.02, 0.98, (B, q, M, L, P, 2)), jnp.float32)
        aw = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(B, q, M, L * P)), jnp.float32), -1
        ).reshape(B, q, M, L, P)
        return loc, aw

    results = {}

    def rec(name, ms):
        results[name] = ms
        print(f"{name:34s} {ms*1e3:8.2f} ms", flush=True)

    for tag, q in (("dec", 1100), ("enc", S)):
        loc, aw = mk_qs(q)
        which = sys.argv[1:] or ["flat", "patch"]
        if "flat" in which:
            rec(f"{tag}_flat_fwd", chain(ms_deform_attn, val, loc, aw))
            rec(f"{tag}_flat_fwdbwd", chain_bwd(ms_deform_attn, val, loc, aw))
        if "patch" in which:
            rec(f"{tag}_patch_fwd", chain(ms_deform_attn_patch, val, loc, aw))
            rec(f"{tag}_patch_fwdbwd", chain_bwd(ms_deform_attn_patch, val, loc, aw))
        if tag == "dec" and "sep" in which:
            from richsem_tpu.ops.ms_deform_attn_sep import ms_deform_attn_sep

            rec("dec_sep_fwd", chain(ms_deform_attn_sep, val, loc, aw))
            rec("dec_sep_fwdbwd", chain_bwd(ms_deform_attn_sep, val, loc, aw))
        if tag == "enc" and "tiled" in which:
            from richsem_tpu.ops.ms_deform_attn_tiled import ms_deform_attn_tiled

            rec("enc_tiled_fwd", chain(ms_deform_attn_tiled, val, loc, aw))
            rec("enc_tiled_fwdbwd", chain_bwd(ms_deform_attn_tiled, val, loc, aw))
        if tag == "enc" and "pallas" in which:
            # v1 retired round 5; pallas2 is the windowed Mosaic kernel
            from richsem_tpu.ops.ms_deform_attn_pallas2 import (
                ms_deform_attn_pallas2 as ms_deform_attn_tiled_pallas,
            )

            rec("enc_pallas_fwd", chain(ms_deform_attn_tiled_pallas, val, loc, aw))
            rec(
                "enc_pallas_fwdbwd",
                chain_bwd(ms_deform_attn_tiled_pallas, val, loc, aw),
            )


if __name__ == "__main__":
    main()
