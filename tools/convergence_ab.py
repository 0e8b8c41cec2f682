"""Convergence A/B harness for the deliberate TPU-first deviations
(VERDICT r4 #4): same synthetic overfit task, deviation on/off, compare
weighted-loss curves + final localization/classification terms.

Pairs:
  clamp   — exact gather encoder msda (reference math) vs windowed pallas2
            with the ±(margin-0.5) offset clamp          [TPU]
  stream  — enc_stream_bf16 off vs on                    [TPU]
  matcher — exact scipy Hungarian vs on-device auction   [CPU: axon has no
            host callbacks; convergence doesn't need the chip]

Task: overfit 2 fixed synthetic batches (bs2, 512x512 canvas — a clean
power-of-two pyramid so the windowed kernels are eligible) with the
flagship semantic branch (open-vocab + distill + DN + fed) for N steps.
Identical init/params/data/rng across the arms of a pair; only the knob
differs. Prints one JSON line per arm with the sampled loss curve and the
final per-term values; verdicts go to ROADMAP.md.

Usage: python tools/convergence_ab.py clamp|stream|matcher [steps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

PAIR = sys.argv[1] if len(sys.argv) > 1 else "clamp"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 150

if PAIR == "matcher":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if PAIR == "matcher":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def build(cfg_over):
    import __graft_entry__ as ge

    from richsem_tpu.models.clip import CLIP, CLIPConfig
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.train.engine import create_train_state, make_train_step
    from richsem_tpu.train.optim import build_optimizer

    base = dict(
        num_classes=60, dn_labelbook_size=60, hidden_dim=128, nheads=8,
        enc_layers=3, dec_layers=3, num_queries=60, dim_feedforward=512,
        use_language=True, use_visual_distill=True, clip_embed_dim=64,
        clip_model="tiny-rn", fed_num_sample_cats=20, dn_number=20,
        compute_dtype="bfloat16", distill_max_boxes=12,
        lr=2e-4, num_select=30,
    )
    base.update(cfg_over)
    cfg = ge._tiny_cfg_dict(**base)
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
    b, h, w, g = 2, 512, 512, 20
    batches = []
    for k in range(2):
        r = np.random.default_rng(100 + k)
        batches.append({
            "images": jnp.asarray(r.uniform(-1, 1, (b, h, w, 3)), jnp.float32),
            "pad_mask": jnp.zeros((b, h, w), bool),
            "labels": jnp.asarray(r.integers(0, 60, (b, g)), jnp.int32),
            "boxes": jnp.asarray(
                np.clip(
                    np.concatenate([
                        r.uniform(0.2, 0.8, (b, g, 2)),
                        r.uniform(0.08, 0.3, (b, g, 2)),
                    ], -1), 0.02, 0.95,
                ), jnp.float32,
            ),
            "valid": jnp.asarray(np.arange(g)[None] < 12).repeat(b, 0),
            "size": jnp.asarray([[h, w]] * b, jnp.int32),
            "is_extra": jnp.zeros((b,), bool),
        })
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batches[0]["images"], batches[0]["pad_mask"],
        text_embed=text_embed, train=False,
    )
    tx = build_optimizer(params, cfg, steps_per_epoch=10_000)
    state = create_train_state(params, tx)
    step = make_train_step(model, cfg, tx, clip_model=clip_model)
    return state, step, batches, text_embed, clip_params


def run_arm(name, cfg_over):
    state, step, batches, text_embed, clip_params = build(cfg_over)
    rng = jax.random.PRNGKey(7)
    curve = []
    final = {}
    for i in range(STEPS):
        state, metrics = step(
            state, batches[i % len(batches)], rng, text_embed, clip_params
        )
        if i % 10 == 0 or i == STEPS - 1:
            curve.append(round(float(metrics["loss"]), 4))
        if i == STEPS - 1:
            for k in ("loss", "loss_ce", "loss_giou", "loss_bbox",
                      "loss_distill"):
                if k in metrics:
                    final[k] = round(float(metrics[k]), 4)
    print(json.dumps({
        "pair": PAIR, "arm": name, "steps": STEPS, "cfg": cfg_over,
        "loss_curve_every10": curve, "final": final,
    }), flush=True)
    return curve


PAIRS = {
    "clamp": [
        ("exact_gather", dict(msda_impl="gather", msda_clamp_offsets=False)),
        ("pallas2_clamped", dict(msda_impl="pallas2",
                                 msda_clamp_offsets=True, msda_margin=8)),
    ],
    "stream": [
        ("stream_f32", dict(msda_impl="pallas2", enc_stream_bf16=False)),
        ("stream_bf16", dict(msda_impl="pallas2", enc_stream_bf16=True)),
    ],
    "matcher": [
        ("scipy_exact", dict(matcher_type="HungarianMatcherCPU",
                             compute_dtype="float32")),
        ("auction", dict(matcher_type="HungarianMatcher",
                         compute_dtype="float32")),
    ],
}


def main():
    curves = {}
    for name, over in PAIRS[PAIR]:
        curves[name] = run_arm(name, over)
    (a_name, a), (b_name, b) = curves.items()
    rel_final = abs(a[-1] - b[-1]) / max(abs(a[-1]), 1e-6)
    print(json.dumps({
        "pair": PAIR,
        "final_losses": {a_name: a[-1], b_name: b[-1]},
        "rel_final_gap": round(rel_final, 4),
        "both_converged": bool(a[-1] < a[0] * 0.7 and b[-1] < b[0] * 0.7),
    }), flush=True)


if __name__ == "__main__":
    main()
