import jax.numpy as jnp
import numpy as np
import pytest

from richsem_tpu.utils import boxes as B
from richsem_tpu.utils.misc import (
    batch_images,
    downsample_mask,
    inverse_sigmoid,
    valid_ratios,
)


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 0.8, (n, 2))
    wh = rng.uniform(0.05, 0.2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_cxcywh_roundtrip(rng):
    b = _rand_boxes(rng, 16)
    out = np.asarray(B.box_cxcywh_to_xyxy(B.box_xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-6)


def test_iou_identity(rng):
    b = jnp.asarray(_rand_boxes(rng, 8))
    iou, _ = B.box_iou(b, b)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), 1.0, atol=1e-5)


def test_iou_known_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0], [2.0, 2.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0]])
    iou, _ = B.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou)[0], [1.0 / 7.0, 0.0, 1.0], atol=1e-6)


def test_giou_bounds_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[2.0, 2.0, 3.0, 3.0]])
    g = np.asarray(B.generalized_box_iou(a, b))[0, 0]
    # disjoint boxes in a 3x3 enclosure: giou = 0 - (9-2)/9
    assert g == pytest.approx(-7.0 / 9.0, abs=1e-5)
    assert -1.0 <= g <= 1.0


def test_elementwise_matches_pairwise_diag(rng):
    a = jnp.asarray(_rand_boxes(rng, 8))
    b = jnp.asarray(_rand_boxes(rng, 8))
    pair = np.asarray(B.generalized_box_iou(a, b))
    elem = np.asarray(B.generalized_box_iou_elementwise(a, b))
    np.testing.assert_allclose(np.diag(pair), elem, atol=1e-5)


def test_masks_to_boxes():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    out = np.asarray(B.masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(out[0], [3, 2, 7, 5])
    np.testing.assert_allclose(out[1], [0, 0, 0, 0])


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.01, 0.3, 0.5, 0.9, 0.999])
    y = jax_sigmoid(inverse_sigmoid(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def test_batch_images_and_mask():
    ims = [np.ones((30, 40, 3), np.float32), np.ones((50, 20, 3), np.float32)]
    batch, mask = batch_images(ims, size_divisibility=32)
    assert batch.shape == (2, 64, 64, 3)
    assert not mask[0, :30, :40].any() and mask[0, 30:, :].all()
    assert not mask[1, :50, :20].any() and mask[1, :, 20:].all()


def test_batch_images_fixed_canvas():
    ims = [np.ones((30, 40, 3), np.float32)]
    batch, mask = batch_images(ims, target_hw=(64, 96))
    assert batch.shape == (1, 64, 96, 3)
    with pytest.raises(ValueError):
        batch_images(ims, target_hw=(16, 16))


def test_downsample_mask_and_valid_ratio():
    mask = np.ones((1, 64, 64), bool)
    mask[0, :32, :48] = False  # valid region
    m = jnp.asarray(mask)
    m8 = downsample_mask(m, 8)
    assert m8.shape == (1, 8, 8)
    assert not np.asarray(m8)[0, :4, :6].any()
    assert np.asarray(m8)[0, 4:, :].all()
    vr = np.asarray(valid_ratios(m))
    np.testing.assert_allclose(vr[0], [48 / 64, 32 / 64])
