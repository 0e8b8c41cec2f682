"""Probe Mosaic's elementwise cost model on v5e (kernel design input).

Times tiny Pallas kernels over basis-build-sized f32 arrays to separate
ALU rate from per-op materialization (VMEM round-trip) cost:

  chain-N   : y = x0 op x1 op ... op xN   (N ops, N+? array traversals)
  fma-loop  : acc = sum of P broadcasted outer products (the pallas2
              basis-build inner loop, isolated)
  chunked   : same FMA loop but manually chunked over 128-lane K tiles so
              intermediates stay register-resident

If chain-N scales with N at ~bytes/s = const, ops are materialized (VMEM
round trips dominate) and chunking the basis build should pay; if chain-N
is much cheaper per op than chain-1, Mosaic already fuses.
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

# level-0 basis-build shape at tile 16 margin 6: [M, wy, wxp, K]
M, WY, WXP, K = 8, 28, 32, 384
T = 154  # grid cells per layer (B=2)


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.time() - t0) / n


def spec():
    return pl.BlockSpec(
        (1, M, WY, WXP, K), lambda t: (t, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )


def chain_kernel(n_ops, x_ref, o_ref):
    x = x_ref[0]
    acc = x
    for _ in range(n_ops):
        acc = acc + x
    o_ref[...] = acc[None]


def fma_kernel(p_pts, two_acc, hy_ref, hx_ref, o_ref):
    hy = hy_ref[0]  # [M, WY, P·K]
    hx = hx_ref[0]  # [M, WXP, P·K]
    acc0 = acc1 = None
    for p in range(p_pts):
        hy_p = hy[:, :, p * K : (p + 1) * K][:, :, None, :]
        hx_p = hx[:, :, p * K : (p + 1) * K][:, None, :, :]
        a = hy_p * hx_p
        if two_acc and p % 2:
            acc1 = a if acc1 is None else acc1 + a
        else:
            acc0 = a if acc0 is None else acc0 + a
    o_ref[...] = (acc0 if acc1 is None else acc0 + acc1)[None]


def fma_chunk_kernel(p_pts, hy_ref, hx_ref, o_ref):
    hy = hy_ref[0]
    hx = hx_ref[0]
    for kc in range(K // 128):
        sl = slice(kc * 128, (kc + 1) * 128)
        acc = None
        for p in range(p_pts):
            psl = slice(p * K + kc * 128, p * K + kc * 128 + 128)
            a = hy[:, :, psl][:, :, None, :] * hx[:, :, psl][:, None, :, :]
            acc = a if acc is None else acc + a
        o_ref[0, :, :, :, sl] = acc


def run(kern, in_shapes, extra=()):
    outs = jax.ShapeDtypeStruct((T, M, WY, WXP, K), jnp.float32)
    f = pl.pallas_call(
        functools.partial(kern, *extra),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1,) + s[1:], lambda t: (t,) + (0,) * (len(s) - 1),
                         memory_space=pltpu.VMEM)
            for s in in_shapes
        ],
        out_specs=spec(),
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )
    rng = np.random.default_rng(0)
    args = [
        jnp.asarray(rng.normal(size=s), jnp.float32) for s in in_shapes
    ]
    return jax.jit(lambda *a: f(*a).sum()), args


def main():
    elems = T * M * WY * WXP * K
    print(f"array: {elems/1e6:.1f}M elems, {elems*4/1e6:.0f} MB total")
    big = (T, M, WY, WXP, K)
    for n_ops in (1, 2, 4, 8):
        f, args = run(functools.partial(chain_kernel), [big], extra=(n_ops,))
        dt = timeit(f, *args)
        print(f"chain-{n_ops}:   {dt*1e3:7.2f} ms  "
              f"{n_ops*elems/dt/1e12:6.2f} Tops/s  "
              f"{(2+n_ops)*elems*4/dt/1e12:5.2f} TB/s-if-materialized")
    for p in (1, 2, 4):
        f, args = run(fma_kernel, [(T, M, WY, 4 * K), (T, M, WXP, 4 * K)],
                      extra=(p, False))
        dt = timeit(f, *args)
        ops = (2 * p - 1) * elems
        print(f"fma-{p}:     {dt*1e3:7.2f} ms  {ops/dt/1e12:6.2f} Tops/s")
    f, args = run(fma_kernel, [(T, M, WY, 4 * K), (T, M, WXP, 4 * K)],
                  extra=(4, True))
    print(f"fma-4-2acc: {timeit(f, *args)*1e3:7.2f} ms")
    f, args = run(fma_chunk_kernel, [(T, M, WY, 4 * K), (T, M, WXP, 4 * K)],
                  extra=(4,))
    print(f"fma-4-chunk:{timeit(f, *args)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
