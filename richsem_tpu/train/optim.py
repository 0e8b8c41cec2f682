"""Optimizer assembly: param groups, AdamW, LR schedules, freezing.

Capability parity:
  * param groups — ``get_param_dict`` 'default' (util/get_param_dicts.py:15-
    30): backbone at ``lr_backbone``, everything else at ``lr``; the
    'ddetr_in_mmdet' variant's 0.1× multiplier for sampling_offsets /
    reference_points heads is exposed via ``lr_linear_proj_mult``.
  * freezing — the reference freezes stem+layer1 via requires_grad
    (backbone.py:63-80) unless a 21k checkpoint initializes the backbone;
    FrozenBatchNorm statistics and the CLIP logit_scale never train
    (richsem.py:92-95). Here freezing is an optimizer *mask* (zero LR
    scale), keeping the model functional.
  * schedules — StepLR at ``lr_drop`` epochs, MultiStepLR over
    ``lr_drop_list``, OneCycle (main.py:299-304).
  * grad clip 0.1 (engine.py:103-113) lives in the chain.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def lr_scale_tree(params: Any, cfg) -> Any:
    """Per-leaf LR multipliers implementing groups + freezing."""
    backbone_mult = cfg.lr_backbone / cfg.lr if cfg.lr > 0 else 0.0
    proj_mult = (
        cfg.lr_linear_proj_mult
        if getattr(cfg, "param_dict_type", "default") == "ddetr_in_mmdet"
        else 1.0
    )
    freeze_early = not getattr(cfg, "resnet_pretrain_path", "")

    def scale(path, leaf):
        p = _path_str(path)
        # frozen-BN parameters (scale/bias/mean/var) never train
        if any(seg in p for seg in ("_bn/", "stem_bn/", "downsample_bn/")):
            return 0.0
        if p.endswith("logit_scale"):
            return 0.0
        if "backbone/" in p:
            if freeze_early and any(
                seg in p for seg in ("stem_", "layer1_")
            ):
                return 0.0
            return backbone_mult
        if any(seg in p for seg in ("sampling_offsets", "reference_points")):
            return proj_mult
        return 1.0

    return jax.tree_util.tree_map_with_path(scale, params)


def make_lr_schedule(cfg, steps_per_epoch: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Epoch-granular schedules matching the reference (main.py:299-304)."""
    base = cfg.lr
    if getattr(cfg, "onecyclelr", False):
        total = cfg.epochs * steps_per_epoch
        return optax.cosine_onecycle_schedule(
            transition_steps=total, peak_value=base, pct_start=0.2
        )
    if getattr(cfg, "multi_step_lr", False):
        drops = list(cfg.lr_drop_list)

        def sched(step):
            epoch = step // steps_per_epoch
            factor = jnp.ones((), jnp.float32)
            for d in drops:
                factor = factor * jnp.where(epoch >= d, 0.1, 1.0)
            return base * factor

        return sched

    def sched(step):
        epoch = step // steps_per_epoch
        return base * jnp.where(epoch >= cfg.lr_drop, 0.1, 1.0)

    return sched


def build_optimizer(
    params: Any, cfg, steps_per_epoch: int
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    scales = lr_scale_tree(params, cfg)
    trainable_mask = jax.tree.map(lambda s: s > 0, scales)

    def scale_updates() -> optax.GradientTransformation:
        def init_fn(params):
            return optax.EmptyState()

        def update_fn(updates, state, params=None):
            return jax.tree.map(lambda u, s: u * s, updates, scales), state

        return optax.GradientTransformation(init_fn, update_fn)

    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_max_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(cfg.weight_decay, mask=trainable_mask),
        scale_updates(),
        optax.scale_by_learning_rate(schedule),
    )


def global_norm(tree: Any) -> jnp.ndarray:
    return optax.global_norm(tree)
