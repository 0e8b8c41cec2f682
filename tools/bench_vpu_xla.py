"""Independent VPU-rate cross-check via XLA (VERDICT r4 #8).

CEILING.md's load-bearing 0.9 Tops/s VPU calibration comes from one Pallas
probe (tools/bench_pallas_cal.py). This measures the SAME hat-flavoured
6-op elementwise chain at the same basis-build-like shape, but lowered by
XLA (jit + fori_loop, no Pallas) — a second, independent toolchain path to
the same VPU. If both agree, the CEILING floors stand; if not, the gap is
a toolchain artifact, not a hardware rate.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ROWS, S = 768, 1664  # match bench_pallas_cal.py ROWS/S
REPS = 64
OPS_PER_REP = 6  # sub, add, abs, 1-, max, mul (hat chain) + fma add


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(ROWS, S)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(ROWS, S)), jnp.float32)

    @jax.jit
    def chain(x, y):
        # UNROLLED so XLA fuses the whole chain into one elementwise kernel
        # (a fori_loop body round-trips HBM every iteration and measures
        # streaming bandwidth instead: 0.25 "Tops/s" = 500 GB/s, recorded
        # in the first version of this probe)
        acc = jnp.zeros_like(x)
        for i in range(REPS):
            d = x - (y + jnp.float32(i))
            h = jnp.maximum(0.0, 1.0 - jnp.abs(d))
            acc = acc + h * y
        return acc

    out = chain(x, y)
    _ = float(jnp.asarray(out).ravel()[0])
    n = 30
    t0 = time.time()
    for _ in range(n):
        out = chain(x, y)
    _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / n
    total_ops = ROWS * S * REPS * OPS_PER_REP
    print(json.dumps({
        "probe": "xla_elementwise_hat_chain",
        "shape": [ROWS, S], "reps": REPS,
        "ms": round(dt * 1e3, 3),
        "tops_per_sec": round(total_ops / dt / 1e12, 3),
    }))


if __name__ == "__main__":
    main()
