"""Capture the REAL matcher cost matrices from the flagship bench step.

Replicates bench.py's setup (random-weight model, synthetic batch), runs a
few train steps so the weights are in the same early-training regime the
bench measures, then runs the train-mode forward and dumps the cost matrix
of every matched loss set (final + 5 aux + interm) to an .npz for offline
auction-iteration analysis (ROADMAP "valid-density cost").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from richsem_tpu.config import Config
    from richsem_tpu.models.clip import CLIP, CLIPConfig
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.models.matcher import match_cost_matrix
    from richsem_tpu.train.engine import create_train_state, make_train_step
    from richsem_tpu.train.optim import build_optimizer

    cfg = Config.fromfile("configs/richsem/richsem_4scale_lvis.py")
    cfg.compute_dtype = "bfloat16"
    model = DINO(DINOConfig.from_config(cfg))

    batch_n, (h, w) = 2, (896, 1344)
    max_gt = 300
    valid_n = int(os.environ.get("CAP_VALID", "150"))
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(rng_np.uniform(-1, 1, (batch_n, h, w, 3)), jnp.float32)
    pad_mask_np = np.ones((batch_n, h, w), bool)
    pad_mask_np[:, : h - 96, : w - 120] = False
    batch = {
        "images": images,
        "pad_mask": jnp.asarray(pad_mask_np),
        "labels": jnp.asarray(rng_np.integers(0, 1203, (batch_n, max_gt)), jnp.int32),
        "boxes": jnp.asarray(
            np.clip(rng_np.uniform(0.1, 0.7, (batch_n, max_gt, 4)), 0.02, 0.9),
            jnp.float32,
        ),
        "valid": jnp.asarray(np.arange(max_gt)[None] < valid_n).repeat(batch_n, 0),
        "size": jnp.asarray([[h - 96, w - 120]] * batch_n, jnp.int32),
        "is_extra": jnp.zeros((batch_n,), bool),
    }

    clip_model = CLIP(dataclasses.replace(CLIPConfig.rn50(), dtype=jnp.bfloat16))
    clip_params = jax.jit(clip_model.init)(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    text_embed = jnp.asarray(rng_np.normal(size=(cfg.num_classes, 1024)), jnp.float32)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        text_embed=text_embed, train=False,
    )
    tx = build_optimizer(params, cfg, steps_per_epoch=1000)
    state = create_train_state(params, tx)
    train_step = make_train_step(model, cfg, tx, clip_model=clip_model)

    rng = jax.random.PRNGKey(1)
    n_steps = int(os.environ.get("CAP_STEPS", "5"))
    for _ in range(n_steps):
        state, metrics = train_step(state, batch, rng, text_embed, clip_params)
    print("loss after", n_steps, "steps:", float(metrics["loss"]))

    # train-mode forward (no DN inputs -> matched sets only; the DN branch
    # uses fabricated indices, not the matcher)
    outputs = jax.jit(
        lambda p: model.apply(
            p, batch["images"], batch["pad_mask"], text_embed=text_embed,
            train=True,
        )
    )(state.params)

    sets = {"final": (outputs["pred_logits"], outputs["pred_boxes"])}
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        sets[f"aux{i}"] = (aux["pred_logits"], aux["pred_boxes"])
    if "interm_outputs" in outputs:
        interm = outputs["interm_outputs"]
        sets["interm"] = (interm["pred_logits"], interm["pred_boxes"])

    dump = {}
    for name, (lg, bx) in sets.items():
        cost = match_cost_matrix(
            lg, bx, batch["labels"], batch["boxes"], batch["valid"]
        )
        dump[name] = np.asarray(cost, np.float32)
    dump["valid"] = np.asarray(batch["valid"])
    out = os.environ.get("CAP_OUT", "/tmp/match_costs.npz")
    np.savez_compressed(out, **dump)
    print("dumped", list(dump), "to", out)


if __name__ == "__main__":
    main()
