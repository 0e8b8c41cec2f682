"""A/B the encoder msda kernels at production shapes on the real TPU.

Usage: python tools/bench_msda.py [tiled|pallas|pallas2 ...] [--margin N]

Times fwd and fwd+bwd of ONE encoder layer's sampling core at the flagship
shape (bs2, 896x1344 pyramid, M8 D32 L4 P4, bf16 values), chained over many
steps so the axon dispatch floor (~1.7 ms/program) is amortized.
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
MARGIN = 6
TILE = (16, 16)


def timeit_chain(fn, state, n=10, warmup=1):
    for _ in range(warmup):
        out = fn(state)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(out if isinstance(out, type(state)) else state)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / n


def main():
    args = sys.argv[1:]
    margin = MARGIN
    tile = TILE
    if "--margin" in args:
        i = args.index("--margin")
        margin = int(args[i + 1])
        del args[i : i + 2]
    if "--tile" in args:
        i = args.index("--tile")
        tile = tuple(int(x) for x in args[i + 1].split(","))
        del args[i : i + 2]
    impls = args or ["tiled", "pallas2"]

    shapes = tuple(
        (H // s, W // s) for s in (8, 16, 32, 64)
    )
    s_tot = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.normal(size=(B, s_tot, M, D)), jnp.bfloat16)

    from richsem_tpu.models.transformer_utils import encoder_reference_points
    from richsem_tpu.ops.ms_deform_attn import compute_sampling_locations

    vr = jnp.ones((B, L, 2), jnp.float32)
    refs = encoder_reference_points(shapes, vr)
    bound = margin - 0.5
    offs = jnp.asarray(
        rng.uniform(-bound, bound, (B, s_tot, M, L, P, 2)), jnp.float32
    )
    loc = compute_sampling_locations(refs, offs, shapes, P)
    aw = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, s_tot, M, L * P)), jnp.float32), -1
    ).reshape(B, s_tot, M, L, P)

    def get_fn(impl):
        if impl == "tiled":
            from richsem_tpu.ops.ms_deform_attn_tiled import (
                ms_deform_attn_tiled,
            )

            core = jax.checkpoint(
                lambda v, l, a: ms_deform_attn_tiled(
                    v, shapes, l, a, tile=tile, margin=margin
                )
            )
            return core
        # 'pallas' (v1) retired round 5 — superseded by pallas2
        from richsem_tpu.ops.ms_deform_attn_pallas2 import (
            ms_deform_attn_pallas2,
        )

        return lambda v, l, a: ms_deform_attn_pallas2(
            v, shapes, l, a, tile=tile, margin=margin
        )

    ref_out = None
    for impl in impls:
        fn = get_fn(impl)
        fwd = jax.jit(lambda v: fn(v, loc, aw).astype(jnp.float32).sum())
        try:
            dt = timeit_chain(lambda _: fwd(val), val)
            print(f"{impl:8s} tile={tile} margin={margin} fwd:     {dt*1e3:7.2f} ms/layer")
        except Exception as e:  # noqa: BLE001
            print(f"{impl:8s} fwd FAILED {type(e).__name__}: {str(e)[:200]}")
            continue

        def loss(v, l, a):
            return (fn(v, l, a).astype(jnp.float32) ** 2).sum()

        bwd = jax.jit(
            lambda v: jax.tree.map(
                lambda x: x.astype(jnp.float32).sum(),
                jax.grad(loss, argnums=(0, 1, 2))(v, loc, aw),
            )
        )
        try:
            dt = timeit_chain(lambda _: bwd(val), val)
            print(f"{impl:8s} tile={tile} margin={margin} fwd+bwd: {dt*1e3:7.2f} ms/layer")
        except Exception as e:  # noqa: BLE001
            print(f"{impl:8s} bwd FAILED {type(e).__name__}: {str(e)[:200]}")

        out = jax.jit(lambda v: fn(v, loc, aw))(val)
        if ref_out is None:
            ref_out = np.asarray(out, np.float32)
        else:
            diff = np.abs(np.asarray(out, np.float32) - ref_out).max()
            print(f"{impl:8s} max|out - {impls[0]}| = {diff:.4g}")


if __name__ == "__main__":
    main()
