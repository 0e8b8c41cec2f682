"""Train/eval step construction — the jitted heart of the framework.

Capability parity with the reference engine (engine.py:22-146
``train_one_epoch`` body, :149-330 ``evaluate`` step) redesigned as pure
jitted functions over static-shaped batches:

* one ``train_step(state, batch, rng)`` fuses CDN construction, the model
  forward, on-device Hungarian matching, the full loss matrix, gradient,
  clip and optimizer update into a single XLA program — no per-step host
  round trips (the reference syncs to host for scipy matching and loss
  logging every step);
* extra-data loss masking (engine.py:62-79): ``batch["is_extra"]``
  multiplies the bbox/giou/label weights per the ``mask_bbox/mask_giou/
  mask_labels`` knobs;
* the NaN guard (engine.py:93-96) is a jnp.isfinite flag in the metrics —
  the host loop decides whether to abort;
* EMA (util/utils.py:375-400): decay-0.9997 shadow params updated inside
  the same jit;
* losses are returned already globally meaningful (GSPMD), replacing
  ``reduce_dict`` (util/misc.py:139-163).

Batch layout (all static shapes; produced by richsem_tpu/data):
  images [B,H,W,3] f32 · pad_mask [B,H,W] bool · labels [B,G] i32 ·
  boxes [B,G,4] f32 (normalized cxcywh) · valid [B,G] bool ·
  size [B,2] (valid h,w in canvas) · orig_size [B,2] · is_extra [B] bool ·
  optional clip targets (stage 6).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from richsem_tpu.models.criterion import (
    build_weight_dict,
    expand_dn_targets,
    set_criterion,
    weighted_loss,
)
from richsem_tpu.models.dn import prepare_cdn
from richsem_tpu.models.postprocess import postprocess


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(params, tx, use_ema: bool = False) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
    )


def make_loss_fn(model, cfg, clip_model=None):
    """Builds the pure ``loss_fn(params, batch, rng, text_embed,
    clip_params) -> (total, losses)`` used by :func:`make_train_step` —
    exposed separately so tools (tools/profile_step.py) can time the
    loss+grad program in isolation from the optimizer/metrics epilogue."""
    weight_dict = build_weight_dict(cfg)
    use_dn = cfg.use_dn and cfg.dn_number > 0
    distill_type = cfg.distill_type if cfg.use_visual_distill else ""
    use_teacher = cfg.use_visual_distill and clip_model is not None
    use_clip_query = getattr(cfg, "use_clip_visual_query", False)
    distill_aux = getattr(cfg, "distill_aux_layers", False)
    # scalar-per-layer sow; measured free at production shapes (bench r3) —
    # on by default so kernel-truncation drift is always visible
    monitor_offsets = getattr(cfg, "monitor_msda_offsets", False)
    if distill_aux and getattr(cfg, "clip_distill_objective", "gt") != "gt":
        # per-aux-layer teacher RoI rescoring of predicted boxes is a 6×
        # teacher-cost path the reference only exercises with 'gt'
        raise NotImplementedError(
            "distill_aux_layers requires clip_distill_objective='gt'"
        )

    def loss_fn(params, batch, rng, text_embed, clip_params):
        rng_dn, rng_crit = jax.random.split(rng)
        clip_spatial = None
        if use_teacher:
            from richsem_tpu.models.clip_align import (
                clip_pseudo_labels,
                clip_spatial_features,
                clip_teacher_box_targets,
            )

            # one teacher forward over the whole image per step; both the
            # distill RoIs and (optionally) the clip-query path crop it
            # (richsem.py:614-629 computes it once as self.clip_features)
            clip_spatial = clip_spatial_features(
                clip_model, clip_params, batch["images"]
            )
            clip_embed, clip_logits, clip_valid = clip_teacher_box_targets(
                clip_model, clip_params, batch["images"], batch["boxes"],
                batch["size"].astype(jnp.float32), text_embed,
                clip_params["params"]["logit_scale"],
                valid=batch["valid"],
                max_boxes=getattr(cfg, "distill_max_boxes", 100),
                spatial=clip_spatial,
            )
            batch = dict(batch, clip_logits=clip_logits,
                         clip_embed=clip_embed, clip_valid=clip_valid)
            if cfg.use_imagenet_pusedo_labels and "is_extra" in batch:
                # teacher-rescored weak labels for extra data
                # (richsem.py:631-670): every above-threshold (box, class)
                # pair becomes a supervised slot, runner-up classes filling
                # the padded free gt slots
                from richsem_tpu.models.clip_align import (
                    clip_pseudo_labels_multi,
                )

                pl, pb, keep, slot = clip_pseudo_labels_multi(
                    clip_logits, batch["boxes"], batch["valid"],
                    cfg.clip_pusedo_th,
                    expand_topk=getattr(cfg, "clip_pusedo_topk", 4),
                )
                extra = batch["is_extra"][:, None]
                batch["labels"] = jnp.where(extra, pl, batch["labels"])
                batch["boxes"] = jnp.where(
                    extra[..., None], pb, batch["boxes"]
                )
                batch["valid"] = jnp.where(extra, keep, batch["valid"])
                # keep the per-slot teacher targets aligned with the
                # permuted (expanded) slots on extra rows
                for key in ("clip_logits", "clip_embed"):
                    sel = jnp.take_along_axis(
                        batch[key], slot[..., None], axis=1
                    )
                    batch[key] = jnp.where(
                        extra[..., None], sel, batch[key]
                    )
                sel_cv = jnp.take_along_axis(batch["clip_valid"], slot, axis=1)
                batch["clip_valid"] = jnp.where(
                    extra, sel_cv, batch["clip_valid"]
                )
        dn_args = {}
        dn_meta = None
        if use_dn:
            # dn_number < 50 selects the reference's group-count semantics
            # (dn_components.py:27-39) unless tests force the budget branch
            dn_group_mode = (
                0 < cfg.dn_number < 50
                and not getattr(cfg, "dn_force_budget", False)
            )
            dn_labels, dn_boxes_unsig, dn_attn, dn_meta = prepare_cdn(
                batch["labels"], batch["boxes"], batch["valid"], rng_dn,
                dn_number=cfg.dn_number,
                label_noise_ratio=cfg.dn_label_noise_ratio,
                box_noise_scale=cfg.dn_box_noise_scale,
                num_classes=cfg.num_classes,
                num_queries=cfg.num_queries,
                check_pos_dn=cfg.check_pos_dn,
                group_mode=dn_group_mode,
            )
            dn_args = dict(
                dn_labels=dn_labels,
                dn_boxes_unsig=dn_boxes_unsig,
                dn_attn_mask=dn_attn,
            )
        apply_kw = dict(
            text_embed=text_embed, train=True,
            clip_features=clip_spatial if use_clip_query else None,
        )
        offset_monitor = None
        if monitor_offsets:
            outputs, mut = model.apply(
                params, batch["images"], batch["pad_mask"],
                mutable=["intermediates"], **apply_kw, **dn_args,
            )
            # kernel-truncation monitor (sown by MSDeformAttn, tiled path)
            sown = [
                v
                for path, v in jax.tree_util.tree_flatten_with_path(
                    mut.get("intermediates", {})
                )[0]
                if "offset_beyond_margin" in jax.tree_util.keystr(path)
            ]
            if sown:
                offset_monitor = jnp.stack(sown).mean()
        else:
            outputs = model.apply(
                params, batch["images"], batch["pad_mask"],
                **apply_kw, **dn_args,
            )
        if use_teacher and cfg.clip_distill_objective in ("pred", "pred_all"):
            # teacher rescoring of the *predicted* boxes
            # (set_distill_outputs pred path, richsem.py:492-519)
            _, pred_tgt_logits, _ = clip_teacher_box_targets(
                clip_model, clip_params, batch["images"],
                jax.lax.stop_gradient(outputs["pred_boxes"]),
                batch["size"].astype(jnp.float32), text_embed,
                clip_params["params"]["logit_scale"],
                spatial=clip_spatial,
            )
            outputs["teacher_clip_logits"] = pred_tgt_logits
        targets = {
            "labels": batch["labels"],
            "boxes": batch["boxes"],
            "valid": batch["valid"],
        }
        if "masks" in batch:
            targets["masks"] = batch["masks"]
        if "clip_logits" in batch:
            targets["clip_logits"] = batch["clip_logits"]
        if "clip_embed" in batch:
            targets["clip_embed"] = batch["clip_embed"]
        if "clip_valid" in batch:
            targets["clip_valid"] = batch["clip_valid"]
        if dn_meta is not None:
            dn_meta = expand_dn_targets(
                batch["labels"], batch["boxes"], batch["valid"], dn_meta,
                dn_labels.shape[1],
                gt_clip_logits=batch.get("clip_logits"),
                gt_clip_valid=batch.get("clip_valid"),
            )
        losses = set_criterion(
            outputs, targets, rng_crit,
            num_classes=cfg.num_classes,
            focal_alpha=cfg.focal_alpha,
            cost_class=cfg.set_cost_class,
            cost_bbox=cfg.set_cost_bbox,
            cost_giou=cfg.set_cost_giou,
            matcher_type=cfg.matcher_type,
            use_fed_loss=cfg.use_fed_loss,
            fed_num_sample_cats=cfg.fed_num_sample_cats,
            fed_weight=batch.get("fed_weight"),
            use_fed_on_kd=getattr(cfg, "use_fed_on_kd", False),
            distill_type=distill_type,
            clip_distill_objective=getattr(cfg, "clip_distill_objective", "gt"),
            use_dynamic_distill_weight=cfg.use_dynamic_distill_weight,
            dn_meta=dn_meta,
            enc_cls_agn=getattr(cfg, "enc_cls_agn", False),
            distill_aux_layers=distill_aux,
        )
        # extra-data loss masking (engine.py:62-79): when the whole
        # (sub-loader) batch is weak-label data, selected loss families are
        # zeroed according to config.
        weight_mask = None
        is_extra = batch.get("is_extra")
        if is_extra is not None:
            extra = is_extra.any().astype(jnp.float32)
            keep = 1.0 - extra
            weight_mask = {}
            if cfg.mask_bbox:
                weight_mask["loss_bbox"] = keep
                weight_mask["loss_xy"] = keep
                weight_mask["loss_hw"] = keep
            if cfg.mask_giou:
                weight_mask["loss_giou"] = keep
            if cfg.mask_labels:
                weight_mask["loss_ce"] = keep
        total = weighted_loss(losses, weight_dict, weight_mask)
        if offset_monitor is not None:
            losses["offset_beyond_margin"] = offset_monitor
        return total, losses

    return loss_fn


def make_train_step(model, cfg, tx, clip_model=None):
    """Builds the jitted train step. ``model`` is the DINO module; ``cfg``
    the merged config; ``tx`` the optax transformation; ``clip_model`` the
    frozen teacher module (its params arrive per call)."""
    loss_fn = make_loss_fn(model, cfg, clip_model=clip_model)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array,
        text_embed: Optional[jnp.ndarray] = None,
        clip_params: Optional[Any] = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # fold the step counter in HERE rather than on the host: a host-side
        # fold_in/split is a second tiny device program per step, and over
        # the axon tunnel each program launch costs ~50 ms. Callers pass the
        # same base rng every step; state.step makes the stream advance
        # (and makes resume deterministic in the step index).
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, text_embed, clip_params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            d = cfg.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: e * d + (1.0 - d) * p, new_ema, new_params
            )
        # the fused optimizer already computed the pre-clip global norm —
        # reading it back avoids a second full pass over every grad leaf
        gnorm = getattr(new_opt, "gnorm", None)
        metrics = {
            "loss": total,
            "grad_norm": gnorm if gnorm is not None
            else optax.global_norm(grads),
            "finite": jnp.isfinite(total),
        }
        metrics.update(
            {k: v for k, v in losses.items()
             if k in ("loss_ce", "loss_bbox", "loss_giou", "loss_ce_dn",
                      "loss_distill", "class_error", "cardinality_error",
                      "offset_beyond_margin")}
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg, clip_model=None):
    """Inference forward + PostProcess (engine.py:173-227 equivalent).

    When ``use_clip_visual_query`` is on, the reference applies
    box2clip_query at inference too (richsem.py:692) — so the eval step
    computes the teacher spatial map and threads it through, keeping the
    content-query path identical between train and eval."""
    use_clip_query = getattr(cfg, "use_clip_visual_query", False)
    if use_clip_query and clip_model is None:
        raise ValueError(
            "use_clip_visual_query eval needs the CLIP teacher at inference "
            "(pass clip_model to make_eval_step)"
        )

    @jax.jit
    def eval_step(params, batch, text_embed=None, clip_params=None):
        clip_spatial = None
        if use_clip_query:
            from richsem_tpu.models.clip_align import clip_spatial_features

            clip_spatial = clip_spatial_features(
                clip_model, clip_params, batch["images"]
            )
        outputs = model.apply(
            params, batch["images"], batch["pad_mask"],
            text_embed=text_embed, clip_features=clip_spatial, train=False,
        )
        results = postprocess(
            outputs["pred_logits"], outputs["pred_boxes"],
            batch["orig_size"].astype(jnp.float32),
            num_select=cfg.num_select,
            nms_iou_threshold=cfg.nms_iou_threshold,
        )
        return results

    return eval_step
