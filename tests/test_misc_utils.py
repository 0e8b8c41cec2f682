import random

import numpy as np

from richsem_tpu.data.sltransforms import (
    adjust_brightness,
    adjust_contrast,
    lighting_noise,
    random_photometric,
)
from richsem_tpu.utils.box_losses import ciou_loss, diou_loss
from richsem_tpu.utils.visualizer import draw_detections
from richsem_tpu.utils.profiling import AverageMeter, TimeCounter


def _rec():
    rng = np.random.default_rng(0)
    return {
        "image": rng.integers(0, 255, (20, 30, 3), dtype=np.uint8),
        "boxes": np.asarray([[2, 2, 10, 10]], np.float32),
        "labels": np.asarray([1]),
    }


def test_brightness_contrast():
    r = _rec()
    b = adjust_brightness(r, 1.5)
    assert b["image"].mean() > r["image"].mean()
    c = adjust_contrast(r, 0.0)
    # collapses each channel to its mean
    assert c["image"].std(axis=(0, 1)).max() < 1.0
    np.testing.assert_array_equal(b["boxes"], r["boxes"])


def test_lighting_noise_permutes():
    r = _rec()
    out = lighting_noise(r, random.Random(3))
    assert sorted(out["image"].sum(axis=(0, 1)).tolist()) == sorted(
        r["image"].sum(axis=(0, 1)).tolist()
    )


def test_random_photometric_runs():
    out = random_photometric(_rec(), random.Random(0))
    assert out["image"].shape == (20, 30, 3)


def test_box_losses():
    import jax.numpy as jnp

    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    assert float(diou_loss(a, a)[0]) < 1e-5
    assert float(ciou_loss(a, a)[0]) < 1e-5
    b = jnp.asarray([[4.0, 4.0, 6.0, 6.0]])
    assert float(diou_loss(a, b)[0]) > 1.0  # disjoint + center distance


def test_visualizer_draws():
    img = np.zeros((40, 60, 3), np.uint8)
    out = draw_detections(
        img, np.asarray([[5, 5, 30, 30]]), np.asarray([2]),
        np.asarray([0.9]), {2: "cat"},
    )
    assert out.shape == (40, 60, 3)
    assert out.sum() > 0  # something was drawn


def test_profiling_helpers():
    tc = TimeCounter()
    with tc("x"):
        pass
    assert "x" in tc.summary()
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.avg == 3.0
