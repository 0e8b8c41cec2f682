"""Microbenchmark: hat-basis construction variants for the tiled msda.

The tiled encoder path builds, per (query-tile, head), the P-summed
bilinear basis  basis[k, y·x] = Σ_p aw·hat_y ⊗ hat_x  and contracts it
with the level windows on the MXU. ROADMAP r2 profiling blamed the VPU
outer product + its HBM spill for most of the 31 ms/layer forward. This
tool times the isolated variants at production shapes so the chosen
formulation is measured, not guessed:

  a) current: broadcast-multiply then ``.sum(-3)`` over P
  b) unrolled P-loop accumulation (no [P, wy, wx] intermediate)
  c) einsum ``...py,...px->...yx``
  d) basis + window contraction fused in one jit (what the model runs)

Timings are chained over ``iters`` jit executions with a blocking scalar
read at the end (axon-tunnel honest timing).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# production geometry: canvas 896x1344, strides 8/16/32/64, tile (16,16),
# margin 8 -> levels (112,168)(56,84)(28,42)(14,21), T=77, K=340, Σwin=2324
B, T, M, P = 2, 77, 8, 4
D = 32
WINDOWS = [(32, 32), (24, 24), (20, 20), (18, 18)]
KS = [256, 64, 16, 4]


def _inputs(key):
    ks = jax.random.split(key, 4)
    ay = {}
    ax = {}
    for v, (wy, wx) in enumerate(WINDOWS):
        for a, k in enumerate(KS):
            ay[(a, v)] = jax.random.uniform(ks[0], (B, T, M, k, P, wy), jnp.bfloat16)
            ax[(a, v)] = jax.random.uniform(ks[1], (B, T, M, k, P, wx), jnp.bfloat16)
    win = jax.random.uniform(ks[2], (B, T, M, sum(wy * wx for wy, wx in WINDOWS), D), jnp.bfloat16)
    return ay, ax, win


def basis_sum(ay, ax):
    out = []
    for a, k in enumerate(KS):
        per_v = []
        for v, (wy, wx) in enumerate(WINDOWS):
            b = (ay[(a, v)][..., :, None] * ax[(a, v)][..., None, :]).sum(-3)
            per_v.append(b.reshape(B, T, M, k, wy * wx))
        out.append(jnp.concatenate(per_v, -1))
    return out


def basis_loop(ay, ax):
    out = []
    for a, k in enumerate(KS):
        per_v = []
        for v, (wy, wx) in enumerate(WINDOWS):
            acc = None
            for p in range(P):
                t = ay[(a, v)][..., p, :, None] * ax[(a, v)][..., p, None, :]
                acc = t if acc is None else acc + t
            per_v.append(acc.reshape(B, T, M, k, wy * wx))
        out.append(jnp.concatenate(per_v, -1))
    return out


def basis_einsum(ay, ax):
    out = []
    for a, k in enumerate(KS):
        per_v = []
        for v, (wy, wx) in enumerate(WINDOWS):
            b = jnp.einsum("btmkpy,btmkpx->btmkyx", ay[(a, v)], ax[(a, v)])
            per_v.append(b.reshape(B, T, M, k, wy * wx))
        out.append(jnp.concatenate(per_v, -1))
    return out


def full(builder):
    def f(ay, ax, win):
        bases = builder(ay, ax)
        outs = []
        for a, basis in enumerate(bases):
            outs.append(
                jnp.einsum(
                    "btmks,btmsd->btmkd", basis, win,
                    preferred_element_type=jnp.bfloat16,
                )
            )
        return sum(o.sum() for o in outs)

    return f


def timeit(fn, args, iters=20):
    jitted = jax.jit(fn)
    r = jitted(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    t0 = time.time()
    for _ in range(iters):
        r = jitted(*args)
    _ = float(jax.tree.leaves(r)[0].reshape(-1)[0])
    return (time.time() - t0) / iters * 1e3


def main():
    ay, ax, win = _inputs(jax.random.PRNGKey(0))
    just = lambda b: (lambda ay_, ax_: sum(x.sum() for x in b(ay_, ax_)))
    for name, fn, args in [
        ("basis sum(-3) alone", just(basis_sum), (ay, ax)),
        ("basis P-loop alone", just(basis_loop), (ay, ax)),
        ("basis einsum alone", just(basis_einsum), (ay, ax)),
        ("full sum(-3)", full(basis_sum), (ay, ax, win)),
        ("full P-loop", full(basis_loop), (ay, ax, win)),
        ("full einsum", full(basis_einsum), (ay, ax, win)),
    ]:
        print(f"{name:24s} {timeit(fn, args):8.2f} ms")


if __name__ == "__main__":
    main()
