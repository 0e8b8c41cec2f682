"""A/B the decoder msda implementations at production shapes on the real TPU.

Usage: python tools/bench_msda_dec.py [sep|sep_pallas|gather ...]

Times fwd and fwd+bwd of ONE decoder layer's sampling core at the flagship
shape (bs2, 896x1344 pyramid, Q=1100 (900 matching + 200 DN), M8 D32 L4 P4,
bf16 values), chained so the axon dispatch floor is amortized.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 2, 896, 1344
M, D, L, P = 8, 32, 4, 4
Q = 1100


def timeit_async(fn, x, n=20, warmup=2):
    """Dispatch n async calls, block once (axon: per-call blocking reads
    floor at the ~38 ms tunnel RTT; dispatch is ~1.7 ms and overlaps)."""
    for _ in range(warmup):
        out = fn(x)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(x)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / n


def main():
    impls = sys.argv[1:] or ["sep", "sep_pallas"]
    shapes = tuple(
        (H // s, W // s) for s in (8, 16, 32, 64)
    )
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.normal(size=(B, S, M, D)), jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (B, Q, M, L, P, 2)), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, Q, M, L * P)), jnp.float32), -1
    ).reshape(B, Q, M, L, P)

    def get(impl):
        if impl == "sep":
            from richsem_tpu.ops.ms_deform_attn_sep import ms_deform_attn_sep

            return lambda v: ms_deform_attn_sep(v, shapes, loc, aw)
        if impl == "sep_pallas":
            from richsem_tpu.ops.ms_deform_attn_sep_pallas import (
                ms_deform_attn_sep_pallas,
            )

            return lambda v: ms_deform_attn_sep_pallas(v, shapes, loc, aw)
        if impl == "gather":
            from richsem_tpu.ops.ms_deform_attn import ms_deform_attn

            return lambda v: ms_deform_attn(v, shapes, loc, aw)
        raise SystemExit(f"unknown impl {impl}")

    for impl in impls:
        core = get(impl)
        fwd = jax.jit(lambda v: core(v).astype(jnp.float32).sum())
        t_f = timeit_async(fwd, val)
        # sin() makes the cotangent depend on the output — a plain .sum()
        # hands the backward an all-ones cotangent that XLA constant-folds
        # (measured fwd+bwd < fwd)
        bwd = jax.jit(
            lambda v: jax.grad(
                lambda v_: jnp.sin(core(v_).astype(jnp.float32)).sum()
            )(v).astype(jnp.float32).sum()
        )
        t_fb = timeit_async(bwd, val)
        print(
            f"{impl:12s} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_fb*1e3:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
