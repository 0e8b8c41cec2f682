"""Criterion tests: matcher behavior, loss values, fed sampling, weights."""

import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.config import Config
from richsem_tpu.models.criterion import (
    build_weight_dict,
    expand_dn_targets,
    fed_loss_classes,
    loss_boxes,
    loss_labels,
    set_criterion,
    weighted_loss,
)
from richsem_tpu.models.matcher import match

C = 7
NQ = 12
G = 5


def _toy_outputs(rng, b=2):
    logits = rng.standard_normal((b, NQ, C)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, (b, NQ, 4)).astype(np.float32)
    return {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
    }


def _toy_targets(b=2):
    labels = np.zeros((b, G), np.int32)
    labels[:, :2] = [[1, 2], [3, 4]][:b]
    boxes = np.full((b, G, 4), 0.5, np.float32)
    boxes[0, 0] = [0.3, 0.3, 0.2, 0.2]
    boxes[0, 1] = [0.7, 0.7, 0.1, 0.1]
    valid = np.zeros((b, G), bool)
    valid[:, :2] = True
    return {
        "labels": jnp.asarray(labels),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(valid),
    }


def test_matcher_prefers_exact_boxes(rng):
    t = _toy_targets(1)
    logits = np.full((1, NQ, C), -5.0, np.float32)
    boxes = np.full((1, NQ, 4), 0.9, np.float32)
    # query 4 exactly matches gt 0; query 7 matches gt 1 (box + class)
    boxes[0, 4] = [0.3, 0.3, 0.2, 0.2]
    logits[0, 4, 1] = 5.0
    boxes[0, 7] = [0.7, 0.7, 0.1, 0.1]
    logits[0, 7, 2] = 5.0
    col = match(
        jnp.asarray(logits), jnp.asarray(boxes),
        t["labels"][:1], t["boxes"][:1], t["valid"][:1],
    )
    col = np.asarray(col)
    assert col[0, 0] == 4 and col[0, 1] == 7
    assert (col[0, 2:] == -1).all()


def test_loss_boxes_zero_for_perfect():
    t = _toy_targets(1)
    pred = jnp.tile(t["boxes"][:, :NQ // G].reshape(1, -1, 4), (1, 6, 1))[:, :NQ]
    # matched cols point at queries holding the exact gt boxes
    pred = jnp.asarray(np.full((1, NQ, 4), 0.5, np.float32))
    pred = pred.at[0, 3].set(t["boxes"][0, 0])
    pred = pred.at[0, 8].set(t["boxes"][0, 1])
    col = jnp.asarray([[3, 8, -1, -1, -1]])
    out = loss_boxes(pred, col, t["boxes"], t["valid"], jnp.float32(2.0))
    assert float(out["loss_bbox"]) < 1e-6
    assert float(out["loss_giou"]) < 1e-5


def test_loss_labels_focal_values():
    """Golden check against a direct numpy focal computation."""
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((1, 4, 3)).astype(np.float32)
    col = jnp.asarray([[2, -1]])
    labels = jnp.asarray([[1, 0]])
    valid = jnp.asarray([[True, False]])
    out = loss_labels(jnp.asarray(logits), col, labels, valid, jnp.float32(1.0))
    # numpy reference
    onehot = np.zeros((1, 4, 3), np.float32)
    onehot[0, 2, 1] = 1.0
    p = 1 / (1 + np.exp(-logits))
    ce = -(onehot * np.log(p) + (1 - onehot) * np.log(1 - p))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = 0.25 * onehot + 0.75 * (1 - onehot)
    focal = (alpha_t * ce * (1 - p_t) ** 2).sum()
    np.testing.assert_allclose(float(out["loss_ce"]), focal, rtol=1e-5)


def test_fed_loss_classes():
    w = jnp.asarray(np.random.default_rng(0).uniform(1, 10, (C,)).astype(np.float32))
    matched = jnp.asarray([1, 4, 4, -1])
    ids, mask = fed_loss_classes(jax.random.PRNGKey(0), matched, C, 5, w)
    ids, mask = np.asarray(ids), np.asarray(mask)
    active = ids[mask]
    assert len(active) == 5  # 2 appeared + 3 sampled = num_sample_cats
    assert len(set(active.tolist())) == 5  # no duplicates
    assert 1 in active and 4 in active  # appeared classes forced in


def test_fed_loss_classes_overflow_keeps_all_appeared():
    # more distinct appeared classes than num_sample_cats: the reference
    # keeps every appeared class (fed_loss.py:15-26) — none may be dropped
    appeared = np.arange(0, 14, 2)  # 7 distinct classes, num_sample_cats=5
    matched = jnp.asarray(appeared)
    ids, mask = fed_loss_classes(jax.random.PRNGKey(0), matched, 20, 5, None)
    active = set(np.asarray(ids)[np.asarray(mask)].tolist())
    assert set(appeared.tolist()) <= active
    assert len(active) == 7  # exactly the appeared set (keep = max(5, 7))


def test_set_criterion_opt_matcher_finite_and_invariants():
    """matcher_type='OptMatcher' drives the many-to-one loss layout
    (reference OptMatcher → SetCriterion, matcher.py:161-315)."""
    rng_np = np.random.default_rng(7)
    outputs = _toy_outputs(rng_np)
    outputs["aux_outputs"] = [_toy_outputs(rng_np)]
    outputs["interm_outputs"] = _toy_outputs(rng_np)
    outputs["pred_clip_logits"] = jnp.asarray(
        rng_np.standard_normal((2, NQ, C)).astype(np.float32)
    )
    targets = _toy_targets()
    targets["clip_logits"] = jnp.asarray(
        rng_np.standard_normal((2, G, C)).astype(np.float32)
    )
    losses = set_criterion(
        outputs, targets, jax.random.PRNGKey(0), num_classes=C,
        matcher_type="OptMatcher", use_fed_loss=True, fed_num_sample_cats=4,
        distill_type="clip_logits",
    )
    for k in ("loss_ce", "loss_bbox", "loss_giou", "loss_distill",
              "loss_ce_0", "loss_ce_interm"):
        assert k in losses, k
        assert np.isfinite(float(losses[k])), k
    # simOTA invariants on the assignment itself
    from richsem_tpu.models.ota_matcher import ota_match

    goq = np.asarray(ota_match(
        outputs["pred_logits"], outputs["pred_boxes"],
        targets["labels"], targets["boxes"], targets["valid"],
    ))
    valid = np.asarray(targets["valid"])
    for b in range(2):
        for g in range(G):
            n_assigned = (goq[b] == g).sum()
            if valid[b, g]:
                assert n_assigned >= 1  # every valid gt covered
            else:
                assert n_assigned == 0  # invalid gts never assigned


def test_full_criterion_runs_and_weights(rng):
    cfg = Config.from_dict(
        dict(
            cls_loss_coef=1.0, bbox_loss_coef=5.0, giou_loss_coef=2.0,
            use_dn=True, use_visual_distill=False, distill_loss_coef=0.5,
            aux_loss=True, dec_layers=3, two_stage_type="standard",
            no_interm_box_loss=False, interm_loss_coef=1.0,
        )
    )
    wd = build_weight_dict(cfg)
    assert wd["loss_ce"] == 1.0 and wd["loss_bbox_interm"] == 5.0
    assert "loss_ce_dn_1" in wd and "loss_giou_0" in wd

    outputs = _toy_outputs(rng)
    outputs["aux_outputs"] = [_toy_outputs(rng) for _ in range(2)]
    outputs["interm_outputs"] = _toy_outputs(rng)
    targets = _toy_targets()
    losses = set_criterion(
        outputs, targets, jax.random.PRNGKey(0), num_classes=C,
    )
    for k in ["loss_ce", "loss_bbox", "loss_giou", "loss_ce_0", "loss_ce_interm"]:
        assert k in losses and np.isfinite(float(losses[k])), k
    total = weighted_loss(losses, wd)
    assert np.isfinite(float(total))
    # weight masking hook zeroes selected components
    masked = weighted_loss(
        losses, wd, weight_mask={"loss_bbox": jnp.float32(0.0)}
    )
    assert float(masked) < float(total)


def test_dn_criterion_path(rng):
    outputs = _toy_outputs(rng)
    dn_pad = 8
    outputs["dn_outputs"] = {
        "pred_logits": jnp.asarray(rng.standard_normal((2, dn_pad, C)).astype(np.float32)),
        "pred_boxes": jnp.asarray(rng.uniform(0.3, 0.6, (2, dn_pad, 4)).astype(np.float32)),
        "aux_outputs": [],
    }
    targets = _toy_targets()
    match_gt = np.full((2, dn_pad), -1, np.int32)
    match_gt[0, 0] = 0
    match_gt[0, 1] = 1
    match_gt[1, 0] = 0
    meta = {
        "match_gt": jnp.asarray(match_gt),
        "slot_active": jnp.asarray(match_gt >= 0),
        "slot_in_use": jnp.ones((2, dn_pad), bool),
        "num_groups": jnp.int32(1),
    }
    meta = expand_dn_targets(targets["labels"], targets["boxes"], targets["valid"], meta, dn_pad)
    losses = set_criterion(
        outputs, targets, jax.random.PRNGKey(0), num_classes=C, dn_meta=meta,
    )
    assert "loss_ce_dn" in losses and np.isfinite(float(losses["loss_ce_dn"]))
    assert "loss_bbox_dn" in losses


def test_num_boxes_normalization_additivity(rng):
    """Same content twice with double num_boxes gives the same loss value."""
    out1 = _toy_outputs(rng, b=1)
    t1 = _toy_targets(1)
    l1 = set_criterion(out1, t1, jax.random.PRNGKey(0), num_classes=C)
    out2 = {k: jnp.concatenate([v, v]) for k, v in out1.items()}
    t2 = {k: jnp.concatenate([v, v]) for k, v in t1.items()}
    l2 = set_criterion(out2, t2, jax.random.PRNGKey(0), num_classes=C)
    np.testing.assert_allclose(float(l2["loss_bbox"]), float(l1["loss_bbox"]), rtol=1e-5)
    np.testing.assert_allclose(float(l2["loss_ce"]), float(l1["loss_ce"]), rtol=1e-5)
