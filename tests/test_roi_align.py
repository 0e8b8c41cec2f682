import jax.numpy as jnp
import numpy as np

from richsem_tpu.ops.roi_align import roi_align


def test_constant_map():
    feats = jnp.full((1, 8, 8, 3), 2.5)
    boxes = jnp.asarray([[[1.0, 1.0, 6.0, 6.0]]])
    out = np.asarray(roi_align(feats, boxes, output_size=4))
    np.testing.assert_allclose(out, 2.5, rtol=1e-6)


def test_linear_ramp_exact():
    """Bilinear sampling is exact on a linear ramp: each bin returns the ramp
    value at its center (in pixel-center coordinates)."""
    h = w = 16
    a, b = 0.7, -0.3
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ramp = (a * yy + b * xx)[None, :, :, None]
    box = np.array([[[2.0, 3.0, 10.0, 11.0]]], np.float32)  # xyxy
    o = 4
    out = np.asarray(roi_align(jnp.asarray(ramp), jnp.asarray(box), output_size=o))
    bin_h = (11.0 - 3.0) / o
    bin_w = (10.0 - 2.0) / o
    for i in range(o):
        for j in range(o):
            yc = 3.0 - 0.5 + bin_h * (i + 0.5)
            xc = 2.0 - 0.5 + bin_w * (j + 0.5)
            np.testing.assert_allclose(out[0, 0, i, j, 0], a * yc + b * xc, rtol=1e-5)


def test_outside_is_zero():
    feats = jnp.ones((1, 8, 8, 1))
    boxes = jnp.asarray([[[20.0, 20.0, 30.0, 30.0]]])
    out = np.asarray(roi_align(feats, boxes, output_size=2))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_spatial_scale():
    """Boxes in image coords ×1/4 scale hit the right feature pixels."""
    h = w = 8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ramp = (yy + xx)[None, :, :, None]
    # image-space box [8, 8, 24, 24] at scale 1/4 -> feature box [2, 2, 6, 6]
    big = np.array([[[8.0, 8.0, 24.0, 24.0]]], np.float32)
    small = np.array([[[2.0, 2.0, 6.0, 6.0]]], np.float32)
    o1 = np.asarray(roi_align(jnp.asarray(ramp), jnp.asarray(big), 3, spatial_scale=0.25))
    o2 = np.asarray(roi_align(jnp.asarray(ramp), jnp.asarray(small), 3, spatial_scale=1.0))
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_batched_rois_shape():
    feats = jnp.zeros((2, 8, 8, 5))
    boxes = jnp.zeros((2, 7, 4))
    out = roi_align(feats, boxes, output_size=7)
    assert out.shape == (2, 7, 7, 7, 5)


def test_adaptive_degenerate_box_is_zero():
    """detectron2's adaptive grid on a box with extent <= 0 runs an empty
    sample loop and emits 0 (count = max(grid, 1)); the matmul path must
    match instead of bilinearly sampling the start point (ADVICE r4 #3)."""
    feats = jnp.ones((1, 8, 8, 2)) * 3.0
    boxes = jnp.asarray(
        [[[4.0, 4.0, 4.0, 6.0],    # zero width
          [4.0, 4.0, 6.0, 4.0],    # zero height
          [5.0, 5.0, 3.0, 7.0],    # negative width
          [2.0, 2.0, 6.0, 6.0]]]   # healthy control
    )
    out = np.asarray(
        roi_align(feats, boxes, 2, sampling_ratio=0, method="matmul")
    )
    np.testing.assert_allclose(out[0, :3], 0.0, atol=0)
    np.testing.assert_allclose(out[0, 3], 3.0, rtol=1e-6)


def test_matmul_matches_gather():
    """The MXU interpolation-matrix path agrees with the 4-tap gather path
    on random features and boxes (incl. partially out-of-bounds boxes), at
    the CLIP-teacher grid shape."""
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 28, 42, 16)), jnp.float32)
    xy = rng.uniform(-60, 42 * 32 * 0.8, size=(2, 9, 2))
    wh = rng.uniform(10, 42 * 32 * 0.5, size=(2, 9, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    g = np.asarray(
        roi_align(feats, boxes, 7, spatial_scale=1 / 32.0, method="gather")
    )
    m = np.asarray(
        roi_align(feats, boxes, 7, spatial_scale=1 / 32.0, method="matmul")
    )
    np.testing.assert_allclose(g, m, rtol=1e-5, atol=1e-5)
