"""Pod-scaling evidence (VERDICT r4 #3): measure, don't assert.

Two artifacts behind CEILING.md §6's "DP scales linearly" claim:

1. **Collective inventory** — the FULL flagship train step (production
   params: hidden 256, 6+6 layers, 1204 classes, R50 backbone, CLIP-RN50
   teacher; reduced canvas so CPU compile stays sane) is jitted over an
   8-device GSPMD 'data' mesh; the post-SPMD-partitioner HLO is scanned
   for every collective op, with byte counts. Expected shape: ONE fused
   gradient all-reduce over the parameter tree + scalar psums for the
   loss metrics and num_boxes sync (the reference's analogous surface:
   DDP bucketed allreduce, /root/reference/main.py:204-206,
   util/misc.py:139-163, richsem.py:1145-1147).

2. **Weak scaling** — the dryrun-tiny semantic-branch step at mesh=1 vs
   mesh=8 with fixed per-device batch on the virtual CPU mesh. CPU wall
   time is noisy, but a large ratio would catch accidental resharding /
   all-gather regressions that the inventory might miss.

Run: python tools/collective_inventory.py [--weak-scaling-only]
Writes one JSON line per artifact.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

N_DEV = 8
os.environ["JAX_PLATFORMS"] = "cpu"
xf = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (
        xf + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLL_RE = re.compile(
    r"=\s+(\([^)]*\)|\S+)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start)?\("
)


def _shape_bytes(spec: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(spec):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def collective_inventory():
    from richsem_tpu.config import Config
    from richsem_tpu.models.clip import CLIP, CLIPConfig
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated,
    )
    from richsem_tpu.train.engine import create_train_state, make_train_step
    from richsem_tpu.train.optim import build_optimizer

    cfg = Config.fromfile("configs/richsem/richsem_4scale_lvis.py")
    cfg.compute_dtype = "float32"  # CPU mesh; dtype doesn't change topology
    model = DINO(DINOConfig.from_config(cfg))
    import dataclasses

    clip_model = CLIP(CLIPConfig.rn50())
    clip_params = jax.jit(clip_model.init)(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    rng_np = np.random.default_rng(0)
    text_embed = jnp.asarray(
        rng_np.normal(size=(cfg.num_classes, 1024)), jnp.float32
    )
    # reduced canvas for CPU compile budget, but S = Σ HᵢWᵢ = 2040 ≥ 900
    # so the two-stage top-k keeps its production semantics
    b, h, w, g = N_DEV, 256, 384, 8
    images = jnp.zeros((b, h, w, 3), jnp.float32)
    pad_mask = jnp.zeros((b, h, w), bool)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images, pad_mask, text_embed=text_embed,
        train=False,
    )
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(params)
    )
    tx = build_optimizer(params, cfg, steps_per_epoch=1000)
    state = create_train_state(params, tx, use_ema=cfg.use_ema)
    batch = {
        "images": images,
        "pad_mask": pad_mask,
        "labels": jnp.zeros((b, g), jnp.int32),
        "boxes": jnp.full((b, g, 4), 0.4, jnp.float32),
        "valid": jnp.ones((b, g), bool),
        "size": jnp.asarray([[h, w]] * b, jnp.int32),
        "is_extra": jnp.zeros((b,), bool),
    }

    mesh = make_mesh(data=N_DEV, model=1)
    with jax.set_mesh(mesh):
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
        state = jax.device_put(state, rep)
        text_dev = jax.device_put(text_embed, rep)
        clip_dev = jax.device_put(clip_params, rep)
        step = make_train_step(model, cfg, tx, clip_model=clip_model)
        t0 = time.time()
        lowered = jax.jit(
            step, donate_argnums=(0,)
        ).lower(state, batch, jax.random.PRNGKey(1), text_dev, clip_dev)
        compiled = lowered.compile()
        compile_s = time.time() - t0

    hlo = compiled.as_text()
    inventory = {}
    total_bytes = 0
    for m in _COLL_RE.finditer(hlo):
        spec, kind, started = m.group(1), m.group(2), m.group(3)
        if started:
            continue  # count -start ops via their -done twin only once
        nbytes = _shape_bytes(spec)
        key = kind
        inventory.setdefault(key, {"count": 0, "bytes": 0})
        inventory[key]["count"] += 1
        inventory[key]["bytes"] += nbytes
        total_bytes += nbytes
    print(json.dumps({
        "artifact": "collective_inventory",
        "mesh": [N_DEV, 1], "canvas": [h, w],
        "n_params": n_params,
        "param_bytes_f32": n_params * 4,
        "collectives": inventory,
        "total_collective_bytes": total_bytes,
        "compile_seconds": round(compile_s, 1),
    }), flush=True)
    return inventory


def weak_scaling():
    """Tiny semantic-branch step: per-device bs=1, mesh 1 vs 8."""
    import __graft_entry__ as ge

    from richsem_tpu.models.clip import CLIP, CLIPConfig
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated,
    )
    from richsem_tpu.train.engine import create_train_state, make_train_step
    from richsem_tpu.train.optim import build_optimizer

    results = {}
    for n in (1, N_DEV):
        cfg = ge._tiny_cfg_dict(
            use_language=True, use_visual_distill=True, use_ema=True,
            clip_embed_dim=64, clip_model="tiny-rn",
        )
        model = DINO(DINOConfig.from_config(cfg))
        clip_model = CLIP(CLIPConfig(
            name="tiny-rn", embed_dim=64, vision_layers=(1, 1, 1, 1),
            vision_width=16, vision_heads=8, image_resolution=64,
            context_length=8, vocab_size=64, transformer_width=16,
            transformer_heads=2, transformer_layers=1,
        ))
        clip_params = jax.jit(clip_model.init)(
            jax.random.PRNGKey(2),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((1, 8), jnp.int32),
        )
        rng_np = np.random.default_rng(0)
        text_embed = jnp.asarray(
            rng_np.normal(size=(cfg.num_classes, 64)), jnp.float32
        )
        b, h, w, g = n, 64, 64, 6
        images = jnp.zeros((b, h, w, 3), jnp.float32)
        pad_mask = jnp.zeros((b, h, w), bool)
        params = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), images, pad_mask, text_embed=text_embed,
            train=False,
        )
        tx = build_optimizer(params, cfg, steps_per_epoch=10)
        state = create_train_state(params, tx, use_ema=True)
        batch = {
            "images": jnp.asarray(
                rng_np.uniform(-1, 1, (b, h, w, 3)), jnp.float32
            ),
            "pad_mask": pad_mask,
            "labels": jnp.asarray(rng_np.integers(0, 24, (b, g)), jnp.int32),
            "boxes": jnp.asarray(
                np.clip(rng_np.uniform(0.2, 0.6, (b, g, 4)), 0.05, 0.95),
                jnp.float32,
            ),
            "valid": jnp.ones((b, g), bool),
            "size": jnp.asarray([[h, w]] * b, jnp.int32),
            "is_extra": jnp.zeros((b,), bool),
        }
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        with jax.set_mesh(mesh):
            bs_shard = batch_sharding(mesh)
            rep = replicated(mesh)
            batch = {k: jax.device_put(v, bs_shard) for k, v in batch.items()}
            state = jax.device_put(state, rep)
            text_dev = jax.device_put(text_embed, rep)
            clip_dev = jax.device_put(clip_params, rep)
            step = make_train_step(model, cfg, tx, clip_model=clip_model)
            state, metrics = step(
                state, batch, jax.random.PRNGKey(1), text_dev, clip_dev
            )
            _ = float(metrics["loss"])  # compile + warm
            reps = 5
            t0 = time.time()
            for _i in range(reps):
                state, metrics = step(
                    state, batch, jax.random.PRNGKey(1), text_dev, clip_dev
                )
            _ = float(metrics["loss"])
            results[n] = (time.time() - t0) / reps
    ratio = results[N_DEV] / results[1]
    print(json.dumps({
        "artifact": "weak_scaling_cpu_mesh",
        "per_device_batch": 1,
        "step_ms": {str(k): round(v * 1e3, 1) for k, v in results.items()},
        "time_ratio_8_over_1": round(ratio, 3),
        "note": "virtual CPU mesh; catches resharding regressions, not ICI "
                "bandwidth — a ratio near 1 plus the collective inventory "
                "is the linear-DP evidence",
    }), flush=True)


if __name__ == "__main__":
    if "--weak-scaling-only" not in sys.argv:
        collective_inventory()
    weak_scaling()
