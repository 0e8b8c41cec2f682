"""Component-level timing of the flagship train step on the real TPU.

Times separate jitted programs at production shapes (bs2, 896x1344, bf16)
so the per-step budget in ROADMAP.md is measured, not estimated. All
timings use blocking scalar reads (axon tunnel gotcha).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 2
H, W = 896, 1344
MAX_GT = int(os.environ.get("PROFILE_MAX_GT", "60"))


def timeit(fn, *args, n=20, warmup=1):
    """Dispatch ``n`` async calls, block ONCE at the end: over the axon
    tunnel a blocking read costs ~38 ms RTT, so per-iteration blocking
    (the round-2 version) floors every measurement at the RTT. Dispatch
    is ~1.7 ms/program and overlaps device compute."""
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / n


def main():
    from richsem_tpu.config import Config
    from richsem_tpu.models.clip import CLIP, CLIPConfig
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.train.engine import create_train_state, make_train_step
    from richsem_tpu.train.optim import build_optimizer

    cfg = Config.fromfile("configs/richsem/richsem_4scale_lvis.py")
    cfg.compute_dtype = "bfloat16"
    # match bench.py: layer-level remat is net-negative now that the msda
    # core checkpoints itself
    cfg.use_checkpoint = False
    dcfg = DINOConfig.from_config(cfg)
    model = DINO(dcfg)

    rng_np = np.random.default_rng(0)
    images = jnp.asarray(rng_np.uniform(-1, 1, (BATCH, H, W, 3)), jnp.float32)
    pad_mask = jnp.zeros((BATCH, H, W), bool)
    batch = {
        "images": images,
        "pad_mask": pad_mask,
        "labels": jnp.asarray(rng_np.integers(0, 1203, (BATCH, MAX_GT)), jnp.int32),
        "boxes": jnp.asarray(
            np.clip(rng_np.uniform(0.1, 0.7, (BATCH, MAX_GT, 4)), 0.02, 0.9),
            jnp.float32,
        ),
        "valid": jnp.asarray(np.arange(MAX_GT)[None] < int(os.environ.get("PROFILE_VALID", "30"))).repeat(BATCH, 0),
        "size": jnp.asarray([[H, W]] * BATCH, jnp.int32),
        "is_extra": jnp.zeros((BATCH,), bool),
    }

    import dataclasses

    clip_model = CLIP(dataclasses.replace(CLIPConfig.rn50(), dtype=jnp.bfloat16))
    clip_params = jax.jit(clip_model.init)(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    text_embed = jnp.asarray(rng_np.normal(size=(cfg.num_classes, 1024)), jnp.float32)
    # shapes-only init: component timings don't depend on param values and
    # the flagship init compile costs minutes over the axon tunnel
    shapes = jax.eval_shape(
        lambda r: model.init(r, images, pad_mask, text_embed=text_embed,
                             train=False),
        jax.random.PRNGKey(0),
    )
    params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes
    )

    report = {}

    def rec(name, val):
        report[name] = val
        print(f"{name:36s} {val*1e3:9.1f} ms", flush=True)

    # --sections model,teacher,backbone,opt,msda (default: all)
    sections = {"model", "teacher", "backbone", "msda"}
    for i, a in enumerate(sys.argv):
        if a == "--sections":
            sections = set(sys.argv[i + 1].split(","))
    if "--opt" in sys.argv:
        sections.add("opt")

    def want(name):
        return name in sections

    if want("gap"):
        # decompose full_step − model_fwd_bwd: the real loss_fn (teacher +
        # DN + criterion + monitor) under value_and_grad, with and without
        # the sown-monitor mutable path
        from richsem_tpu.train.engine import make_loss_fn

        def grad_prog(cfg_):
            lf = make_loss_fn(model, cfg_, clip_model=clip_model)
            vg = jax.value_and_grad(lf, has_aux=True)

            import optax as _optax

            # donate + return params so the program fits in HBM like the
            # real train step does (its state is donated too); the caller
            # must rebind params across calls.
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(params, rng):
                (total, _), grads = vg(
                    params, batch, rng, text_embed, clip_params
                )
                # global_norm consumes EVERY grad leaf — without it XLA
                # DCEs all param-grad outer products (level_embed-only
                # readback measured 352 ms vs the true full backward)
                return params, total, _optax.global_norm(grads)

            return run

        # donate the ORIGINAL params (no spare copy): the program itself
        # peaks near the HBM limit, and a second 200 MB params tree on the
        # client tipped it into a runtime ResourceExhausted
        run = grad_prog(cfg)
        keys = [
            jax.random.fold_in(jax.random.PRNGKey(1), i) for i in range(6)
        ]
        p, total, gn = run(params, keys[5])  # compile
        params = None
        _ = float(total)
        t0 = time.time()
        n = 5
        for i in range(n):
            p, total, gn = run(p, keys[i])
        _ = float(total) + float(gn)
        rec("loss_grad_all (shipped cfg)", (time.time() - t0) / n)
        params = p
        del run

    if "--full" in sys.argv:
        tx = build_optimizer(params, cfg, steps_per_epoch=1000)
        state = create_train_state(jax.tree.map(jnp.copy, params), tx)
        step = make_train_step(model, cfg, tx, clip_model=clip_model)

        def full(state):
            s, m = step(state, batch, jax.random.PRNGKey(1), text_embed, clip_params)
            return s, m["loss"]

        state, _ = full(state)  # compile
        _ = float(_)
        t0 = time.time()
        n = 5
        for i in range(n):
            state, l = full(state)
            _ = float(l)
        rec("full_step", (time.time() - t0) / n)

    if want("model"):
        # ---- model fwd only (no teacher) -----------------------------------
        fwd = jax.jit(lambda p: model.apply(
            p, images, pad_mask, text_embed=text_embed, train=False
        )["pred_logits"])
        rec("model_fwd", timeit(fwd, params))

        # ---- model fwd+bwd (loss = sum of outputs; no teacher/criterion) --
        def loss_fn(p):
            o = model.apply(p, images, pad_mask, text_embed=text_embed, train=False)
            return (
                o["pred_logits"].astype(jnp.float32).sum()
                + o["pred_boxes"].sum()
                + sum(a["pred_logits"].astype(jnp.float32).sum() for a in o["aux_outputs"])
            )
        bwd = jax.jit(lambda p: jax.grad(loss_fn)(p)["params"]["level_embed"])
        rec("model_fwd_bwd", timeit(bwd, params))

    if want("teacher"):
        # ---- teacher: whole-image spatial fwd ------------------------------
        from richsem_tpu.models.clip_align import (
            clip_spatial_features,
            clip_teacher_box_targets,
        )

        teacher_sp = jax.jit(lambda: clip_spatial_features(clip_model, clip_params, images))
        rec("teacher_spatial", timeit(teacher_sp))

        # ---- teacher: spatial + RoI attnpool targets -----------------------
        teacher_full = jax.jit(lambda: clip_teacher_box_targets(
            clip_model, clip_params, images, batch["boxes"],
            batch["size"].astype(jnp.float32), text_embed,
            clip_params["params"]["logit_scale"], valid=batch["valid"],
            max_boxes=cfg.distill_max_boxes,
        )[1])
        rec("teacher_spatial_plus_roi", timeit(teacher_full))

    if want("backbone"):
        # ---- backbone fwd / fwd+bwd ----------------------------------------
        from richsem_tpu.models.resnet import ResNet

        bb = ResNet(block_counts=(3, 4, 6, 3), return_strides=(8, 16, 32),
                    dtype=jnp.bfloat16)
        bb_params = jax.jit(bb.init)(jax.random.PRNGKey(0), images)
        bb_fwd = jax.jit(lambda p: bb.apply(p, images.astype(jnp.bfloat16))[0])
        rec("backbone_fwd", timeit(bb_fwd, bb_params))
        bb_bwd = jax.jit(lambda p: jax.grad(
            lambda q: sum(x.astype(jnp.float32).sum() for x in bb.apply(q, images.astype(jnp.bfloat16)))
        )(p)["params"]["stem_conv"]["kernel"])
        rec("backbone_fwd_bwd", timeit(bb_bwd, bb_params))

    # ---- optimizer/criterion/CDN isolation ---------------------------------
    if want("opt"):
        from richsem_tpu.models.criterion import (
            expand_dn_targets,
            set_criterion,
        )
        from richsem_tpu.models.dn import prepare_cdn

        tx = build_optimizer(params, cfg, steps_per_epoch=1000)
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)

        @jax.jit
        def opt_only(grads, opt_state, params):
            updates, new_opt = tx.update(grads, opt_state, params)
            import optax as _optax

            new_params = _optax.apply_updates(params, updates)
            return new_params, new_opt

        rec("optimizer_update_only", timeit(opt_only, grads, opt_state, params))

        @jax.jit
        def cdn_only(rng):
            return prepare_cdn(
                batch["labels"], batch["boxes"], batch["valid"], rng,
                dn_number=cfg.dn_number,
                label_noise_ratio=cfg.dn_label_noise_ratio,
                box_noise_scale=cfg.dn_box_noise_scale,
                num_classes=cfg.num_classes,
                num_queries=cfg.num_queries,
                check_pos_dn=cfg.check_pos_dn,
            )[0]

        rec("prepare_cdn_only", timeit(cdn_only, jax.random.PRNGKey(0)))

        # criterion fwd+bwd at flagship layout: 7 sets (6 dec + enc) + DN
        B, Q, C = BATCH, cfg.num_queries, cfg.num_classes
        rng2 = np.random.default_rng(1)
        mk = lambda *s: jnp.asarray(rng2.normal(size=s), jnp.float32)
        n_aux = cfg.dec_layers - 1

        def build_outputs(scale):
            out = {
                "pred_logits": mk(B, Q, C) * scale,
                "pred_boxes": jax.nn.sigmoid(mk(B, Q, 4)),
            }
            out["aux_outputs"] = [
                {"pred_logits": mk(B, Q, C) * scale,
                 "pred_boxes": jax.nn.sigmoid(mk(B, Q, 4))}
                for _ in range(n_aux)
            ]
            out["interm_outputs"] = {
                "pred_logits": mk(B, Q, C) * scale,
                "pred_boxes": jax.nn.sigmoid(mk(B, Q, 4)),
            }
            return out

        targets = {
            "labels": batch["labels"],
            "boxes": batch["boxes"],
            "valid": batch["valid"],
        }

        @jax.jit
        def crit_fwd_bwd(scale):
            def f(scale):
                outputs = build_outputs(scale)
                losses = set_criterion(
                    outputs, targets, jax.random.PRNGKey(0),
                    num_classes=C,
                    focal_alpha=cfg.focal_alpha,
                    cost_class=cfg.set_cost_class,
                    cost_bbox=cfg.set_cost_bbox,
                    cost_giou=cfg.set_cost_giou,
                    matcher_type=cfg.matcher_type,
                    use_fed_loss=cfg.use_fed_loss,
                    fed_num_sample_cats=cfg.fed_num_sample_cats,
                )
                return sum(
                    v for k, v in losses.items()
                    if k.startswith("loss_")
                )
            return jax.grad(f)(scale)

        rec("criterion_fwdbwd_7sets", timeit(crit_fwd_bwd, jnp.float32(1.0)))

    if not want("msda"):
        if "full_step" in report:
            print(f"\nimg/s/chip: {BATCH/report['full_step']:.2f}")
        return

    # ---- single encoder msda layer at production shape ---------------------
    shapes = ((H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32), (H // 64, W // 64))
    S = sum(h * w for h, w in shapes)
    m_, d_ = 8, 32
    val = jnp.asarray(rng_np.normal(size=(BATCH, S, m_, d_)), jnp.bfloat16)
    loc = jnp.asarray(rng_np.uniform(0.05, 0.95, (BATCH, S, m_, 4, 4, 2)), jnp.float32)
    aw = jax.nn.softmax(jnp.asarray(rng_np.normal(size=(BATCH, S, m_, 4, 4)), jnp.float32).reshape(BATCH, S, m_, 16), -1).reshape(BATCH, S, m_, 4, 4)

    from richsem_tpu.ops.ms_deform_attn import ms_deform_attn
    from richsem_tpu.ops.ms_deform_attn_tiled import ms_deform_attn_tiled

    tiled_fwd = jax.jit(lambda v: ms_deform_attn_tiled(v, shapes, loc, aw))
    rec("msda_tiled_fwd_1layer", timeit(tiled_fwd, val))
    tiled_bwd = jax.jit(lambda v: jax.grad(
        lambda v_: ms_deform_attn_tiled(v_, shapes, loc, aw).astype(jnp.float32).sum()
    )(v).astype(jnp.float32).sum())
    rec("msda_tiled_fwdbwd_1layer", timeit(tiled_bwd, val))

    # decoder-style gather msda: 1100 queries (900 + 200 dn)
    QD = 1100
    loc_d = jnp.asarray(rng_np.uniform(0.05, 0.95, (BATCH, QD, m_, 4, 4, 2)), jnp.float32)
    aw_d = jax.nn.softmax(jnp.asarray(rng_np.normal(size=(BATCH, QD, m_, 16)), jnp.float32), -1).reshape(BATCH, QD, m_, 4, 4)
    dec_fwd = jax.jit(lambda v: ms_deform_attn(v, shapes, loc_d, aw_d))
    rec("msda_gather_dec_fwd_1layer", timeit(dec_fwd, val))
    dec_bwd = jax.jit(lambda v: jax.grad(
        lambda v_: ms_deform_attn(v_, shapes, loc_d, aw_d).astype(jnp.float32).sum()
    )(v).astype(jnp.float32).sum())
    rec("msda_gather_dec_fwdbwd_1layer", timeit(dec_bwd, val))

    # encoder gather msda for comparison
    enc_g_fwd = jax.jit(lambda v: ms_deform_attn(v, shapes, loc, aw))
    rec("msda_gather_enc_fwd_1layer", timeit(enc_g_fwd, val))

    if "full_step" in report:
        print(f"\nimg/s/chip: {BATCH/report['full_step']:.2f}")


if __name__ == "__main__":
    main()
