"""CDN construction tests (group arithmetic, noise statistics, attn mask)."""

import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.models.dn import prepare_cdn

B, G, NQ, DN = 2, 10, 20, 100
PAD = 2 * DN


def _targets():
    labels = np.zeros((B, G), np.int32)
    labels[0, :3] = [1, 2, 3]
    labels[1, :1] = [5]
    boxes = np.zeros((B, G, 4), np.float32)
    boxes[0, :3] = [[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.4], [0.7, 0.2, 0.3, 0.1]]
    boxes[1, :1] = [[0.4, 0.6, 0.2, 0.3]]
    valid = np.zeros((B, G), bool)
    valid[0, :3] = True
    valid[1, :1] = True
    return jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid)


def _run(**kw):
    labels, boxes, valid = _targets()
    return prepare_cdn(
        labels, boxes, valid, jax.random.PRNGKey(0),
        dn_number=DN, num_classes=30, num_queries=NQ, **kw
    )


def test_shapes_and_groups():
    dn_labels, dn_boxes, attn, meta = _run()
    assert dn_labels.shape == (B, PAD)
    assert dn_boxes.shape == (B, PAD, 4)
    assert attn.shape == (B, PAD + NQ, PAD + NQ)
    # m = 3 → groups = 100 // 3 = 33
    assert int(meta["num_groups"]) == 33
    # positives per image = groups * count
    mg = np.asarray(meta["match_gt"])
    assert (mg[0] >= 0).sum() == 33 * 3
    assert (mg[1] >= 0).sum() == 33 * 1
    # image 1 has 1 gt: in each 2m=6 chunk, slots 1,2 (pos side) are inactive
    active = np.asarray(meta["slot_active"])
    assert active[0].sum() == 33 * 6
    assert active[1].sum() == 33 * 2  # 1 pos + 1 neg per group
    in_use = np.asarray(meta["slot_in_use"])
    assert in_use[0].sum() == in_use[1].sum() == 33 * 6


def test_label_noise_rate():
    labels, boxes, valid = _targets()
    # use a big batch of one gt to measure the flip rate
    lab = jnp.zeros((1, 1), jnp.int32)
    box = jnp.full((1, 1, 4), 0.5)
    val = jnp.ones((1, 1), bool)
    dn_labels, _, _, meta = prepare_cdn(
        lab, box, val, jax.random.PRNGKey(1),
        dn_number=DN, label_noise_ratio=0.5, num_classes=1000, num_queries=4,
    )
    active = np.asarray(meta["slot_active"])[0]
    flipped = (np.asarray(dn_labels)[0][active] != 0).mean()
    assert 0.1 < flipped < 0.4  # expect ~0.25


def test_box_noise_magnitude():
    _, dn_boxes_unsig, _, meta = _run(box_noise_scale=1.0)
    labels, boxes, valid = _targets()
    mg = np.asarray(meta["match_gt"])
    dnb = 1 / (1 + np.exp(-np.asarray(dn_boxes_unsig)))  # sigmoid
    # positive slots: each xyxy corner moved by < half extent (before clamp)
    b0 = np.asarray(boxes)[0]
    for s in np.nonzero(mg[0] >= 0)[0][:40]:
        gt = b0[mg[0, s]]
        gxy = np.concatenate([gt[:2] - gt[2:] / 2, gt[:2] + gt[2:] / 2])
        nxy = np.concatenate(
            [dnb[0, s, :2] - dnb[0, s, 2:] / 2, dnb[0, s, :2] + dnb[0, s, 2:] / 2]
        )
        half = np.concatenate([gt[2:] / 2, gt[2:] / 2])
        # clamping can only shrink the displacement
        assert (np.abs(nxy - gxy) <= half + 1e-5).all()


def test_attn_mask_semantics():
    _, _, attn, meta = _run()
    a = np.asarray(attn)[0]
    g = int(meta["num_groups"])
    m = 3
    # matching queries cannot see dn
    assert not a[PAD:, :PAD].any()
    # matching sees matching
    assert a[PAD:, PAD:].all()
    # dn group 0 sees itself, not group 1
    assert a[0, 2 * m - 1]
    assert not a[0, 2 * m]
    # dn can see matching queries (reference behavior)
    assert a[0, PAD:].all()


def test_zero_gt_batch():
    lab = jnp.zeros((1, 4), jnp.int32)
    box = jnp.zeros((1, 4, 4))
    val = jnp.zeros((1, 4), bool)
    dn_labels, dn_boxes, attn, meta = prepare_cdn(
        lab, box, val, jax.random.PRNGKey(2), dn_number=DN,
        num_classes=10, num_queries=5,
    )
    assert (np.asarray(dn_labels) == -1).all()
    assert (np.asarray(meta["match_gt"]) == -1).all()
    assert np.isfinite(np.asarray(dn_boxes)).all()
