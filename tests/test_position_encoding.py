import math

import jax.numpy as jnp
import numpy as np

from richsem_tpu.ops.position_encoding import (
    gen_sineembed_for_position,
    sine_position_embedding,
)


def test_shape_and_interleave():
    mask = jnp.zeros((2, 6, 8), bool)
    pos = sine_position_embedding(mask, num_pos_feats=16, temperature_h=20, temperature_w=20)
    assert pos.shape == (2, 6, 8, 32)
    p = np.asarray(pos)
    # first pair of the y-half at row i: sin/cos of normalized y coordinate
    # y_embed(row i) = (i+1)/H * 2pi (full-valid mask)
    y0 = (0 + 1) / 6 * 2 * math.pi
    np.testing.assert_allclose(p[0, 0, 0, 0], math.sin(y0), rtol=1e-5)
    np.testing.assert_allclose(p[0, 0, 0, 1], math.cos(y0), rtol=1e-5)
    # first pair of the x-half: sin/cos of normalized x
    x0 = (0 + 1) / 8 * 2 * math.pi
    np.testing.assert_allclose(p[0, 0, 0, 16], math.sin(x0), rtol=1e-5)
    np.testing.assert_allclose(p[0, 0, 0, 17], math.cos(x0), rtol=1e-5)


def test_padding_normalization():
    """Coordinates normalize over the *valid* extent, not the padded canvas."""
    mask = np.ones((1, 8, 8), bool)
    mask[0, :4, :6] = False
    pos = np.asarray(sine_position_embedding(jnp.asarray(mask), num_pos_feats=8))
    # last valid row has y_embed == 2pi => sin ~ 0, cos ~ 1
    np.testing.assert_allclose(pos[0, 3, 0, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(pos[0, 3, 0, 1], 1.0, atol=1e-4)


def test_gen_sineembed_2d_4d():
    pos2 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 5, 2)).astype(np.float32))
    e2 = gen_sineembed_for_position(pos2, num_feats=32)
    assert e2.shape == (2, 5, 64)
    pos4 = jnp.concatenate([pos2, pos2], axis=-1)
    e4 = gen_sineembed_for_position(pos4, num_feats=32)
    assert e4.shape == (2, 5, 128)
    # (y, x) halves of the 4-d embedding match the 2-d embedding
    np.testing.assert_allclose(np.asarray(e4[..., :64]), np.asarray(e2), rtol=1e-6)
    # value check: first x-pair is sin/cos(x*2pi / 10000^0)
    x = float(pos2[0, 0, 0]) * 2 * math.pi
    np.testing.assert_allclose(float(e2[0, 0, 32]), math.sin(x), rtol=1e-5)
    np.testing.assert_allclose(float(e2[0, 0, 33]), math.cos(x), rtol=1e-5)
