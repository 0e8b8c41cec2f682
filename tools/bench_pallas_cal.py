"""Calibrate Pallas v5e primitives for the msda v2 kernel design.

Measures (real TPU, chained dispatch):
  1. VPU elementwise throughput (f32 and bf16) at kernel-realistic shapes
  2. MXU matmul throughput at the windowed-contraction shapes
  3. per-grid-cell issue overhead (empty-ish kernel, many cells)
  4. the full per-cell basis-build + contract inner loop, isolated
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / n


ROWS, S = 768, 1664  # ~ (M*K, Σwin) at tile (8,8): 8*96=768, 1589→1664


def vpu_kernel(reps, x_ref, y_ref, o_ref):
    x = x_ref[...]
    y = y_ref[...]
    def body(i, acc):
        # hat-flavoured chain: sub, abs, 1-, max, mul, add = 6 ops
        d = x - (y + i.astype(x.dtype))
        h = jnp.maximum(0.0, 1.0 - jnp.abs(d))
        return acc + h * y
    o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))


def run_vpu(dtype, reps=512):
    x = jnp.ones((ROWS, S), dtype)
    y = jnp.full((ROWS, S), 0.5, dtype)
    f = jax.jit(lambda x, y: pl.pallas_call(
        lambda a, b, o: vpu_kernel(reps, a, b, o),
        out_shape=jax.ShapeDtypeStruct((ROWS, S), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=CP,
    )(x, y))
    dt = timeit(f, x, y)
    ops = ROWS * S * reps * 6
    print(f"VPU {dtype.__name__:9s}: {dt*1e6:8.1f} us  -> {ops/dt/1e12:6.2f} Tops/s")


def run_mxu(k_rows, s_, d_, dtype, reps=512):
    a = jnp.ones((k_rows, s_), dtype)
    b = jnp.ones((s_, d_), dtype)
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        def body(i, acc):
            return acc + jax.lax.dot_general(
                a + i.astype(a.dtype), b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros((k_rows, d_), jnp.float32))
    f = jax.jit(lambda a, b: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k_rows, d_), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=CP,
    )(a, b))
    dt = timeit(f, a, b)
    fl = 2 * k_rows * s_ * d_ * reps
    print(f"MXU [{k_rows}x{s_}]x[{s_}x{d_}] {dtype.__name__:9s}: {dt*1e6:8.1f} us -> {fl/dt/1e12:6.2f} TF/s")


def run_grid_overhead(n_cells):
    x = jnp.ones((n_cells, 8, 128), jnp.float32)
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        grid=(n_cells,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, 8, 128), jnp.float32),
        compiler_params=CP,
    )(x))
    dt = timeit(f, x)
    print(f"grid overhead {n_cells} cells: {dt*1e6:8.1f} us -> {dt/n_cells*1e9:7.1f} ns/cell")


def run_repeat(dtype):
    # pltpu.repeat viability: [ROWS, 32] -> [ROWS, 32*52]
    wy, wx = 32, 52
    x = jnp.ones((ROWS, wy), dtype)
    def kern(x_ref, o_ref):
        x = x_ref[...]
        def body(i, acc):
            return acc + pltpu.repeat(x + i.astype(x.dtype), wx, axis=1)
        o_ref[...] = jax.lax.fori_loop(0, 256, body, jnp.zeros((ROWS, wy * wx), x.dtype))
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ROWS, wy * wx), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=CP,
    )(x))
    try:
        dt = timeit(f, x)
        print(f"pltpu.repeat {dtype.__name__}: {dt/256*1e6:8.2f} us/rep for {ROWS}x{wy}->{ROWS}x{wy*wx}")
    except Exception as e:  # noqa: BLE001
        print(f"pltpu.repeat {dtype.__name__}: FAILED ({type(e).__name__}: {e})")


def main():
    print(jax.devices())
    run_vpu(jnp.float32)
    run_vpu(jnp.bfloat16)
    run_mxu(768, 1664, 128, jnp.bfloat16)
    run_mxu(768, 1664, 32, jnp.bfloat16)
    run_mxu(96, 1664, 32, jnp.bfloat16)
    run_mxu(96, 1664, 128, jnp.bfloat16)
    run_grid_overhead(4096)
    run_grid_overhead(16384)
    run_repeat(jnp.float32)
    run_repeat(jnp.bfloat16)


if __name__ == "__main__":
    main()
