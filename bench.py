"""Benchmark: RichSem-DINO R50 4-scale training-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference publishes no throughput (BASELINE.md). The
comparison point is the commonly-reported DINO-4scale R50 training rate on
A100 (~55 min/epoch on 8×A100 for COCO-117k ⇒ ≈4.4 images/s/GPU);
``vs_baseline`` is the multiple of that A100 rate achieved per TPU chip.
The project north star is ≥3.0.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

A100_IMAGES_PER_SEC = 4.4

# Production recipe shapes (configs/richsem/dino_4scale_lvis.py): batch 2
# per chip, landscape canvas bucket, 1204 classes, 900 queries, DN 100.
BATCH = 2
CANVAS = (896, 1344)
MAX_GT = 60  # matcher-relevant pad; LVIS p95


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from richsem_tpu.config import Config
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.train.engine import create_train_state, make_train_step
    from richsem_tpu.train.optim import build_optimizer

    cfg = Config.fromfile("configs/richsem/dino_4scale_lvis.py")
    cfg.compute_dtype = "bfloat16"
    cfg.use_checkpoint = True
    model = DINO(DINOConfig.from_config(cfg))

    h, w = CANVAS
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(rng_np.uniform(-1, 1, (BATCH, h, w, 3)), jnp.float32)
    pad_mask_np = np.ones((BATCH, h, w), bool)
    pad_mask_np[:, : h - 96, : w - 120] = False
    batch = {
        "images": images,
        "pad_mask": jnp.asarray(pad_mask_np),
        "labels": jnp.asarray(rng_np.integers(0, 1203, (BATCH, MAX_GT)), jnp.int32),
        "boxes": jnp.asarray(
            np.clip(rng_np.uniform(0.1, 0.7, (BATCH, MAX_GT, 4)), 0.02, 0.9),
            jnp.float32,
        ),
        "valid": jnp.asarray(rng_np.uniform(size=(BATCH, MAX_GT)) > 0.5),
        "is_extra": jnp.zeros((BATCH,), bool),
    }

    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"], train=False
    )
    tx = build_optimizer(params, cfg, steps_per_epoch=1000)
    state = create_train_state(params, tx)
    train_step = make_train_step(model, cfg, tx)

    rng = jax.random.PRNGKey(1)
    # compile + warmup. NOTE: over the axon tunnel, block_until_ready on a
    # remote array can return before the program finishes — a blocking
    # scalar read (float()) is the only honest completion barrier.
    state, metrics = train_step(state, batch, rng)
    _ = float(metrics["loss"])
    n = 10
    t0 = time.time()
    for i in range(n):
        state, metrics = train_step(state, batch, jax.random.fold_in(rng, i))
    _ = float(metrics["loss"])
    dt = (time.time() - t0) / n
    ips = BATCH / dt

    print(
        json.dumps(
            {
                "metric": "train images/sec/chip (DINO-R50 4-scale LVIS, bs2, 896x1344, bf16)",
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / A100_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
