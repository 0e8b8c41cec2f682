"""Kernel-parity tests for multi-scale deformable attention.

Mirrors the reference's test strategy (ops/test.py: tiny shapes, a dtype
ladder, an independent slow oracle, and gradient checks) with TPU-native
machinery: numpy float64 loop oracle + dense one-hot differentiable oracle +
finite-difference grad checks under x64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from richsem_tpu.ops.ms_deform_attn import (
    compute_sampling_locations,
    ms_deform_attn,
    ms_deform_attn_dense_oracle,
    ms_deform_attn_reference_np,
)

SHAPES = ((6, 4), (3, 2))
B, M, D, Q, P = 2, 2, 8, 10, 3
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


def _random_inputs(rng, b=B, q=Q, spread=1.2):
    value = rng.standard_normal((b, S, M, D)).astype(np.float32)
    # locations deliberately straddle [0,1] to exercise zero-padding
    loc = rng.uniform(-0.1, spread, (b, q, M, L, P, 2)).astype(np.float32)
    aw = rng.uniform(0.1, 1.0, (b, q, M, L, P)).astype(np.float32)
    aw = aw / aw.sum(axis=(-2, -1), keepdims=True)
    return value, loc, aw


def test_forward_matches_numpy_oracle(rng):
    value, loc, aw = _random_inputs(rng)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)))
    want = ms_deform_attn_reference_np(value, SHAPES, loc, aw)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_forward_matches_dense_oracle(rng):
    value, loc, aw = _random_inputs(rng)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)))
    want = np.asarray(
        ms_deform_attn_dense_oracle(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_all_out_of_bounds_is_zero(rng):
    value, loc, aw = _random_inputs(rng)
    loc = np.full_like(loc, 5.0)  # far outside every level
    got = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_center_sample_recovers_value(rng):
    """A point exactly at a pixel center returns that pixel's value."""
    h, w = SHAPES[0]
    value = rng.standard_normal((1, S, 1, D)).astype(np.float32)
    # pixel (y=2, x=1) of level 0: normalized loc = ((x+0.5)/w, (y+0.5)/h)
    loc = np.zeros((1, 1, 1, L, 1, 2), np.float32)
    loc[..., 0] = (1 + 0.5) / w
    loc[..., 1] = (2 + 0.5) / h
    aw = np.zeros((1, 1, 1, L, 1), np.float32)
    aw[:, :, :, 0] = 1.0  # only level 0
    got = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)))
    np.testing.assert_allclose(got[0, 0], value[0, 2 * w + 1, 0], rtol=1e-5)


def test_gradients_match_dense_oracle(rng):
    value, loc, aw = _random_inputs(rng, b=1, q=4)
    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw))

    def loss_gather(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn(v, SHAPES, l, a)))

    def loss_dense(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_dense_oracle(v, SHAPES, l, a)))

    g1 = jax.grad(loss_gather, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


def test_gradcheck_finite_differences(rng):
    with jax.enable_x64(True):
        value, loc, aw = _random_inputs(rng, b=1, q=3)
        args = tuple(jnp.asarray(x, jnp.float64) for x in (value, loc, aw))

        def f(v, l, a):
            return ms_deform_attn(v, SHAPES, l, a)

        from jax.test_util import check_grads

        check_grads(f, args, order=1, modes=("rev",), rtol=1e-4, atol=1e-4)


def test_dtype_ladder(rng):
    """bf16 forward stays within tolerance of the f32 path (dtype ladder à la
    reference ops/test.py float64/float32 checks)."""
    value, loc, aw = _random_inputs(rng)
    ref = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)))
    got = np.asarray(
        ms_deform_attn(
            jnp.asarray(value, jnp.bfloat16),
            SHAPES,
            jnp.asarray(loc, jnp.bfloat16),
            jnp.asarray(aw, jnp.bfloat16),
        ).astype(jnp.float32)
    )
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


def test_compute_sampling_locations_2d():
    ref = jnp.asarray(np.full((1, 2, L, 2), 0.5, np.float32))
    off = jnp.asarray(np.ones((1, 2, M, L, P, 2), np.float32))
    loc = compute_sampling_locations(ref, off, SHAPES, P)
    # level 0 is (h=6, w=4): offset (1,1) px -> (1/4, 1/6) normalized
    np.testing.assert_allclose(
        np.asarray(loc)[0, 0, 0, 0, 0], [0.5 + 1 / 4, 0.5 + 1 / 6], rtol=1e-6
    )


def test_compute_sampling_locations_4d():
    ref = jnp.asarray(
        np.tile(np.array([0.5, 0.5, 0.4, 0.2], np.float32), (1, 2, L, 1))
    )
    off = jnp.asarray(np.ones((1, 2, M, L, P, 2), np.float32))
    loc = compute_sampling_locations(ref, off, SHAPES, P)
    # offset/n_points * wh * 0.5 = (1/3)*0.4*0.5, (1/3)*0.2*0.5
    np.testing.assert_allclose(
        np.asarray(loc)[0, 0, 0, 0, 0],
        [0.5 + 0.4 / 6, 0.5 + 0.2 / 6],
        rtol=1e-5,
    )


def test_shape_validation():
    v = jnp.zeros((1, S + 1, M, D))
    loc = jnp.zeros((1, 2, M, L, P, 2))
    aw = jnp.zeros((1, 2, M, L, P))
    with pytest.raises(ValueError):
        ms_deform_attn(v, SHAPES, loc, aw)
