"""Full RichSem path: CLIP-text classifier + visual distillation train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _tiny_cfg_dict
from richsem_tpu.models.clip.model import CLIP, CLIPConfig
from richsem_tpu.models.dino import DINO, DINOConfig
from richsem_tpu.train.engine import create_train_state, make_train_step
from richsem_tpu.train.optim import build_optimizer

TINY_CLIP = CLIPConfig(
    embed_dim=16, vision_layers=(1, 1, 1, 1), vision_width=8, vision_heads=4,
    image_resolution=64, vocab_size=64, transformer_width=16,
    transformer_heads=2, transformer_layers=1, context_length=8,
)


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg_dict(
        use_language=True, use_visual_distill=True, distill_type="clip_logits",
        num_classes=6, dn_labelbook_size=6, dn_number=4, num_queries=10,
        hidden_dim=32, nheads=4, enc_layers=1, dec_layers=2,
        dim_feedforward=64, use_fed_loss=True, fed_num_sample_cats=4,
    )
    dcfg = DINOConfig.from_config(cfg)
    dcfg = type(dcfg)(**{**dcfg.__dict__, "clip_embed_dim": 16})
    model = DINO(dcfg)
    clip_model = CLIP(TINY_CLIP)
    rng = jax.random.PRNGKey(0)
    clip_params = clip_model.init(
        rng, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 8), jnp.int32)
    )
    text_embed = jnp.asarray(
        np.random.default_rng(0).normal(size=(6, 16)), jnp.float32
    )
    images = jnp.zeros((2, 64, 64, 3))
    mask = jnp.zeros((2, 64, 64), bool)
    params = jax.jit(model.init, static_argnames=("train",))(
        rng, images, mask, text_embed=text_embed, train=False
    )
    return cfg, model, params, clip_model, clip_params, text_embed


def _batch(rng):
    b, h, w, g = 2, 64, 64, 5
    return {
        "images": jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)), jnp.float32),
        "pad_mask": jnp.zeros((b, h, w), bool),
        "labels": jnp.asarray(rng.integers(0, 6, (b, g)), jnp.int32),
        "boxes": jnp.asarray(
            np.clip(rng.uniform(0.2, 0.6, (b, g, 4)), 0.05, 0.9), jnp.float32
        ),
        "valid": jnp.asarray(rng.uniform(size=(b, g)) > 0.3),
        "size": jnp.asarray([[h, w], [h - 10, w - 6]], jnp.int32),
        "is_extra": jnp.zeros((b,), bool),
    }


def test_language_head_forward(setup):
    cfg, model, params, clip_model, clip_params, text_embed = setup
    out = model.apply(
        params, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64), bool),
        text_embed=text_embed, train=False,
    )
    assert out["pred_logits"].shape == (1, 10, 6)
    assert bool(jnp.isfinite(out["pred_logits"]).all())


def test_distill_train_step(setup):
    cfg, model, params, clip_model, clip_params, text_embed = setup
    # train_step donates its state — give it a private copy so the shared
    # fixture params stay alive for the other tests
    tx = build_optimizer(params, cfg, steps_per_epoch=10)
    state = create_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_train_step(model, cfg, tx, clip_model=clip_model)
    batch = _batch(np.random.default_rng(0))
    state, metrics = step(state, batch, jax.random.PRNGKey(1), text_embed, clip_params)
    m = jax.device_get(metrics)
    assert bool(m["finite"])
    assert "loss_distill" in m and np.isfinite(m["loss_distill"])
    assert m["loss_distill"] > 0


def test_distill_grads_reach_clip_proj(setup):
    cfg, model, params, clip_model, clip_params, text_embed = setup
    from richsem_tpu.models.clip_align import clip_teacher_box_targets
    from richsem_tpu.models.criterion import set_criterion

    batch = _batch(np.random.default_rng(1))
    emb, logits, _ = clip_teacher_box_targets(
        clip_model, clip_params, batch["images"], batch["boxes"],
        batch["size"].astype(jnp.float32), text_embed,
        clip_params["params"]["logit_scale"],
    )

    def loss(p):
        out = model.apply(
            p, batch["images"], batch["pad_mask"], text_embed=text_embed,
            train=False,
        )
        targets = {
            "labels": batch["labels"], "boxes": batch["boxes"],
            "valid": batch["valid"], "clip_logits": logits,
        }
        losses = set_criterion(
            out, targets, jax.random.PRNGKey(0), num_classes=6,
            distill_type="clip_logits",
        )
        return losses["loss_distill"]

    g = jax.grad(loss)(params)
    gnorm = float(
        jnp.sqrt(
            sum(jnp.sum(x**2) for x in jax.tree.leaves(
                g["params"]["clip_visual_proj"]
            ))
        )
    )
    assert gnorm > 0, "distill loss must reach clip_visual_proj"


def test_logit_scale_frozen_in_optimizer(setup):
    cfg, model, params, clip_model, clip_params, text_embed = setup
    from richsem_tpu.train.optim import lr_scale_tree

    scales = lr_scale_tree(params, cfg)
    flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(scales)[0]
    }
    ls_keys = [k for k in flat if "logit_scale" in k]
    assert ls_keys and all(flat[k] == 0.0 for k in ls_keys)


def test_pseudo_label_multi_expansion():
    """richsem.py:631-670 parity: an extra image whose teacher puts TWO
    classes above threshold on one gt box yields TWO supervised slots (same
    box, both classes), runner-ups filling padded free gt slots."""
    from richsem_tpu.models.clip_align import clip_pseudo_labels_multi

    b, g, c = 1, 4, 6
    logits = np.full((b, g, c), -20.0, np.float32)
    # slot 0: classes 2 and 4 both above threshold (argmax = 2)
    logits[0, 0, 2] = 5.0
    logits[0, 0, 4] = 4.5
    # slot 1: single confident class 1
    logits[0, 1, 1] = 8.0
    valid = np.array([[True, True, False, False]])
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[0, 0] = [0.3, 0.3, 0.2, 0.2]
    boxes[0, 1] = [0.7, 0.7, 0.1, 0.1]
    labels, out_boxes, keep, slot = jax.tree.map(
        np.asarray,
        clip_pseudo_labels_multi(
            jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(valid),
            threshold=0.05,
        ),
    )
    kept = [
        (int(labels[0, i]), tuple(out_boxes[0, i]), int(slot[0, i]))
        for i in range(g) if keep[0, i]
    ]
    assert len(kept) == 3
    # both above-threshold classes of slot 0 are supervised, on slot 0's box
    cls_for_box0 = sorted(l for l, bx, s in kept if s == 0)
    assert cls_for_box0 == [2, 4]
    assert all(bx == tuple(boxes[0, 0]) for l, bx, s in kept if s == 0)
    # slot 1 keeps its single label
    assert [(l, s) for l, bx, s in kept if s == 1] == [(1, 1)]
    # argmaxes outrank runner-ups: slots 0..1 of the output are the argmaxes
    assert sorted(int(labels[0, i]) for i in range(2)) == [1, 2]


def test_pseudo_label_multi_below_threshold_dropped():
    from richsem_tpu.models.clip_align import clip_pseudo_labels_multi

    logits = np.full((1, 3, 5), 0.0, np.float32)  # uniform: p = 0.2 each
    valid = np.array([[True, True, True]])
    boxes = np.zeros((1, 3, 4), np.float32)
    labels, out_boxes, keep, slot = clip_pseudo_labels_multi(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(valid),
        threshold=0.5,
    )
    assert not bool(np.asarray(keep).any())
