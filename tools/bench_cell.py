"""Calibrate the msda-v2 per-cell inner loop on the real TPU.

The candidate per-cell program (tile 16, margin 6, level-0 shapes):
  hats:   hy/hx [MK, P, w] from rel coords                (VPU, small)
  outer:  basis4 [MK, P, wy, wx] = hy[...,None]*hx[...,None,:]  (broadcast mult)
  psum:   basis [MK, wy, wx] = basis4.sum(-3)
  dot:    out[m] = basis[m-rows] x win[m]   (2-dim contraction)

Questions answered:
  1. is the broadcast outer product ~1 op/elem in Mosaic (like XLA)?
  2. does dot_general with 2 contracting dims lower efficiently?
  3. what does the whole cell cost fwd?  (x154 cells = per-layer fwd)
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

M, K, P, D = 8, 352, 4, 32
MK = M * K
# margin-6 windows, tile (16,16)
WINDOWS = ((28, 28), (20, 20), (16, 16), (14, 14))


def timeit(fn, *args, n=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / n


def cell_kernel(reps, mode, yr_ref, xr_ref, aw_ref, *rest):
    win_refs = rest[: len(WINDOWS)]
    o_ref = rest[len(WINDOWS)]
    yr = yr_ref[...]
    xr = xr_ref[...]
    aw = aw_ref[...]

    def one_pass(it, carry):
        it = it.astype(jnp.float32)
        acc = jnp.zeros((M, K, D), jnp.float32)
        for v, (wy, wx) in enumerate(WINDOWS):
            gy = jax.lax.broadcasted_iota(jnp.float32, (1, 1, wy), 2)
            gx = jax.lax.broadcasted_iota(jnp.float32, (1, 1, wx), 2)
            yv = yr[:, v * P : (v + 1) * P, None] + it
            xv = xr[:, v * P : (v + 1) * P, None]
            av = aw[:, v * P : (v + 1) * P, None]
            hy = jnp.maximum(0.0, av - av * jnp.abs(yv - gy))  # [MK,P,wy]
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(xv - gx))      # [MK,P,wx]
            prod = hy[..., None] * hx[..., None, :]            # [MK,P,wy,wx]
            basis = prod.sum(axis=1)                            # [MK,wy,wx]
            basis = basis.astype(jnp.bfloat16)
            w = win_refs[v][...]
            if mode == "2d":
                b4 = basis.reshape(M, K, wy, wx)
                acc = acc + jax.lax.dot_general(
                    b4, w,
                    dimension_numbers=(((2, 3), (2, 3)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [M, K, D]
            else:
                b2 = basis.reshape(M, K, wy * wx)
                w2 = w.reshape(M, D, wy * wx)
                acc = acc + jax.lax.dot_general(
                    b2, w2,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
        return carry + acc

    out = jax.lax.fori_loop(
        0, reps, one_pass, jnp.zeros((M, K, D), jnp.float32)
    )
    o_ref[...] = out


def run_cell(mode, reps=64):
    rng = np.random.default_rng(0)
    yr = jnp.asarray(rng.uniform(2, 20, (MK, 4 * P)), jnp.float32)
    xr = jnp.asarray(rng.uniform(2, 20, (MK, 4 * P)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (MK, 4 * P)), jnp.float32)
    wins = [
        jnp.asarray(rng.normal(size=(M, D, wy, wx)), jnp.bfloat16)
        for wy, wx in WINDOWS
    ]
    f = jax.jit(lambda yr, xr, aw, *w: pl.pallas_call(
        functools.partial(cell_kernel, reps, mode),
        out_shape=jax.ShapeDtypeStruct((M, K, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(WINDOWS)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=CP,
    )(yr, xr, aw, *w))
    try:
        dt = timeit(f, yr, xr, aw, *wins, n=10)
        per_cell = dt / reps
        print(f"cell fwd ({mode}): {per_cell*1e6:8.2f} us/cell -> {per_cell*154*1e3:6.2f} ms/layer-fwd (154 cells)")
    except Exception as e:  # noqa: BLE001
        print(f"cell fwd ({mode}): FAILED {type(e).__name__}: {str(e)[:300]}")


def check_repeat_semantics():
    x = jnp.asarray(np.arange(8)[None].repeat(8, 0), jnp.float32)  # [8,8]
    def kern(x_ref, o_ref):
        o_ref[...] = pltpu.repeat(x_ref[...], 2, axis=1)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=CP,
    )(x)
    print("pltpu.repeat row:", np.asarray(out)[0].astype(int).tolist())


def main():
    print(jax.devices())
    check_repeat_semantics()
    run_cell("2d")
    run_cell("flat")


if __name__ == "__main__":
    main()
