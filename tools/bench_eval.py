"""Eval-path throughput on one chip (VERDICT r3 #4).

Times the full jitted inference step — flagship model forward (open-vocab
text classifier) + PostProcess top-``num_select`` selection — at the
production eval canvas (shortest-side-800 @ max 1333 → 896×1344 bucket,
configs/richsem/base_data_aug.py:18) and batch size 2, mirroring the
reference eval loop (/root/reference/engine.py:149-330: model(samples) +
PostProcess per batch).

Prints ONE JSON line: eval images/sec/chip.

``--sweep`` (VERDICT r4 #5) instead prints an operating curve: one JSON
line per (batch, canvas) over bs {1,2,4,8} at the landscape eval bucket
plus bs2 portrait — the deploy-point table for CEILING.md §7.3.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = int(os.environ.get("BENCH_EVAL_BATCH", "2"))
CANVAS = (896, 1344)


def bench_point(batch_size, canvas, cfg, model, text_embed, eval_step):
    import jax
    import jax.numpy as jnp
    import numpy as np

    h, w = canvas
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(
        rng_np.uniform(-1, 1, (batch_size, h, w, 3)), jnp.float32
    )
    pad_mask_np = np.ones((batch_size, h, w), bool)
    pad_mask_np[:, : h - 96, : w - 120] = False
    batch = {
        "images": images,
        "pad_mask": jnp.asarray(pad_mask_np),
        "orig_size": jnp.asarray([[640, 480]] * batch_size, jnp.int32),
    }
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        text_embed=text_embed, train=False,
    )
    results = eval_step(params, batch, text_embed)
    _ = float(jnp.asarray(results["scores"]).ravel()[0])  # tunnel barrier
    n = 20
    t0 = time.time()
    for _ in range(n):
        results = eval_step(params, batch, text_embed)
    _ = float(jnp.asarray(results["scores"]).ravel()[0])
    dt = (time.time() - t0) / n
    return batch_size / dt, dt


def main() -> None:
    import jax.numpy as jnp
    import numpy as np

    from richsem_tpu.config import Config
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.train.engine import make_eval_step

    cfg = Config.fromfile("configs/richsem/richsem_4scale_lvis.py")
    cfg.compute_dtype = "bfloat16"
    model = DINO(DINOConfig.from_config(cfg))
    rng_np = np.random.default_rng(0)
    text_embed = jnp.asarray(
        rng_np.normal(size=(cfg.num_classes, 1024)), jnp.float32
    )
    eval_step = make_eval_step(model, cfg)

    if "--sweep" in sys.argv:
        points = [(1, CANVAS), (2, CANVAS), (4, CANVAS), (8, CANVAS),
                  (2, (1344, 896))]
        for bs, canvas in points:
            try:
                ips, dt = bench_point(bs, canvas, cfg, model, text_embed,
                                      eval_step)
            except Exception as e:  # OOM at large bs: record, keep going
                print(json.dumps({"batch": bs, "canvas": list(canvas),
                                  "error": type(e).__name__}), flush=True)
                continue
            print(json.dumps({
                "batch": bs, "canvas": list(canvas),
                "images_per_sec": round(ips, 3),
                "ms_per_image": round(dt * 1e3 / bs, 1),
                "ms_per_batch": round(dt * 1e3, 1),
            }), flush=True)
        return

    ips, dt = bench_point(BATCH, CANVAS, cfg, model, text_embed, eval_step)
    print(
        json.dumps(
            {
                "metric": "eval images/sec/chip (RichSem-R50 4-scale "
                          f"flagship fwd + postprocess top-{cfg.num_select}, "
                          f"bs{BATCH}, 896x1344 eval bucket, bf16)",
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "ms_per_batch": round(dt * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
