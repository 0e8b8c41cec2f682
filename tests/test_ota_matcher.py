import jax.numpy as jnp
import numpy as np

from richsem_tpu.models.ota_matcher import ota_match


def test_ota_assigns_obvious_queries():
    nq, g, c = 20, 2, 5
    rng = np.random.default_rng(0)
    logits = np.full((1, nq, c), -6.0, np.float32)
    boxes = np.tile(np.array([0.9, 0.9, 0.05, 0.05], np.float32), (1, nq, 1))
    gt_boxes = np.array([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.6, 0.15, 0.2]]], np.float32)
    gt_labels = np.array([[1, 3]], np.int32)
    # queries 4 and 11 sit exactly on the gts with confident class scores
    boxes[0, 4] = gt_boxes[0, 0]
    logits[0, 4, 1] = 6.0
    boxes[0, 11] = gt_boxes[0, 1]
    logits[0, 11, 3] = 6.0
    out = np.asarray(
        ota_match(
            jnp.asarray(logits), jnp.asarray(boxes),
            jnp.asarray(gt_labels), jnp.asarray(gt_boxes),
            jnp.ones((1, g), bool),
        )
    )
    assert out[0, 4] == 0
    assert out[0, 11] == 1
    # every valid gt matched at least once
    assert (out[0] == 0).sum() >= 1 and (out[0] == 1).sum() >= 1


def test_ota_invalid_gt_unmatched():
    nq, g, c = 10, 3, 4
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, nq, c)).astype(np.float32))
    boxes = jnp.asarray(np.clip(rng.uniform(0.2, 0.7, (1, nq, 4)), 0.05, 0.9).astype(np.float32))
    gt_boxes = jnp.asarray(np.clip(rng.uniform(0.2, 0.7, (1, g, 4)), 0.05, 0.9).astype(np.float32))
    gt_labels = jnp.zeros((1, g), jnp.int32)
    valid = jnp.asarray([[True, False, False]])
    out = np.asarray(
        ota_match(logits, boxes, gt_labels, gt_boxes, valid)
    )
    assert not np.isin(out[0], [1, 2]).any()  # invalid gts never assigned
    assert (out[0] == 0).any()  # the valid one is
