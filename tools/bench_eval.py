"""Eval-path throughput on one chip (VERDICT r3 #4).

Times the full jitted inference step — flagship model forward (open-vocab
text classifier) + PostProcess top-``num_select`` selection — at the
production eval canvas (shortest-side-800 @ max 1333 → 896×1344 bucket,
configs/richsem/base_data_aug.py:18) and batch size 2, mirroring the
reference eval loop (/root/reference/engine.py:149-330: model(samples) +
PostProcess per batch).

Prints ONE JSON line: eval images/sec/chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = int(os.environ.get("BENCH_EVAL_BATCH", "2"))
CANVAS = (896, 1344)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from richsem_tpu.config import Config
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.train.engine import make_eval_step

    cfg = Config.fromfile("configs/richsem/richsem_4scale_lvis.py")
    cfg.compute_dtype = "bfloat16"
    model = DINO(DINOConfig.from_config(cfg))

    h, w = CANVAS
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(rng_np.uniform(-1, 1, (BATCH, h, w, 3)), jnp.float32)
    pad_mask_np = np.ones((BATCH, h, w), bool)
    pad_mask_np[:, : h - 96, : w - 120] = False
    batch = {
        "images": images,
        "pad_mask": jnp.asarray(pad_mask_np),
        "orig_size": jnp.asarray([[640, 480]] * BATCH, jnp.int32),
    }
    text_embed = jnp.asarray(
        rng_np.normal(size=(cfg.num_classes, 1024)), jnp.float32
    )
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        text_embed=text_embed, train=False,
    )
    eval_step = make_eval_step(model, cfg)

    results = eval_step(params, batch, text_embed)
    _ = float(jnp.asarray(results["scores"]).ravel()[0])  # tunnel barrier
    n = 20
    t0 = time.time()
    for _ in range(n):
        results = eval_step(params, batch, text_embed)
    _ = float(jnp.asarray(results["scores"]).ravel()[0])
    dt = (time.time() - t0) / n
    print(
        json.dumps(
            {
                "metric": "eval images/sec/chip (RichSem-R50 4-scale "
                          f"flagship fwd + postprocess top-{cfg.num_select}, "
                          f"bs{BATCH}, 896x1344 eval bucket, bf16)",
                "value": round(BATCH / dt, 3),
                "unit": "images/sec/chip",
                "ms_per_batch": round(dt * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
