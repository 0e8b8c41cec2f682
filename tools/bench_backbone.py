"""Standalone fwd/fwd+bwd timing of the R50 backbone at production shapes.

Avoids profile_step.py's CLIP-init compile so the two conv programs fit in
one tunnel session; params come from eval_shape (timings are value-free).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 2, 896, 1344


def timeit(fn, *args, n=20, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / n


def main():
    from richsem_tpu.models.resnet import ResNet

    rng_np = np.random.default_rng(0)
    images = jnp.asarray(
        rng_np.uniform(-1, 1, (B, H, W, 3)), jnp.bfloat16
    )
    bb = ResNet(block_counts=(3, 4, 6, 3), return_strides=(8, 16, 32),
                dtype=jnp.bfloat16)
    shapes = jax.eval_shape(bb.init, jax.random.PRNGKey(0), images)
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    fwd = jax.jit(lambda p: bb.apply(p, images)[0])
    print(f"backbone_fwd       {timeit(fwd, params)*1e3:9.1f} ms", flush=True)

    bwd = jax.jit(lambda p: jax.grad(
        lambda q: sum(x.astype(jnp.float32).sum() for x in bb.apply(q, images))
    )(p)["params"]["stem_conv"]["kernel"])
    print(f"backbone_fwd_bwd   {timeit(bwd, params)*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
