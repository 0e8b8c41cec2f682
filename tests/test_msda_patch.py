"""Parity tests for the 2x2-patch-gather msda formulation.

Same oracle strategy as tests/test_ms_deform_attn.py (the reference's
ops/test.py pattern): numpy float64 loop oracle for the forward, dense
differentiable oracle for all three gradients, out-of-bounds zero padding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.ops.ms_deform_attn import (
    ms_deform_attn_dense_oracle,
    ms_deform_attn_reference_np,
)
from richsem_tpu.ops.ms_deform_attn_patch import ms_deform_attn_patch

SHAPES = ((6, 4), (3, 2))
B, M, D, Q, P = 2, 2, 8, 10, 3
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


def _random_inputs(rng, b=B, q=Q, spread=1.2):
    value = rng.standard_normal((b, S, M, D)).astype(np.float32)
    loc = rng.uniform(-0.1, spread, (b, q, M, L, P, 2)).astype(np.float32)
    aw = rng.uniform(0.1, 1.0, (b, q, M, L, P)).astype(np.float32)
    aw = aw / aw.sum(axis=(-2, -1), keepdims=True)
    return value, loc, aw


def test_forward_matches_numpy_oracle(rng):
    value, loc, aw = _random_inputs(rng)
    got = np.asarray(
        ms_deform_attn_patch(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)
        )
    )
    want = ms_deform_attn_reference_np(value, SHAPES, loc, aw)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_all_out_of_bounds_is_zero(rng):
    value, loc, aw = _random_inputs(rng)
    loc = np.full_like(loc, 5.0)
    got = np.asarray(
        ms_deform_attn_patch(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)
        )
    )
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_gradients_match_dense_oracle(rng):
    value, loc, aw = _random_inputs(rng, b=1, q=4)
    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw))

    def loss_patch(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_patch(v, SHAPES, l, a)))

    def loss_dense(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_dense_oracle(v, SHAPES, l, a)))

    g1 = jax.grad(loss_patch, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
        )


def test_bf16_matches_f32(rng):
    value, loc, aw = _random_inputs(rng)
    ref = np.asarray(
        ms_deform_attn_patch(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)
        )
    )
    got = np.asarray(
        ms_deform_attn_patch(
            jnp.asarray(value, jnp.bfloat16),
            SHAPES,
            jnp.asarray(loc),
            jnp.asarray(aw),
        )
    ).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_module_impl_patch_matches_gather():
    """impl='patch' is selectable from MSDeformAttn and agrees with the
    exact gather path through the full module (VERDICT r3 weak #5)."""
    from richsem_tpu.models.layers import MSDeformAttn

    rng = np.random.default_rng(3)
    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    q = 6
    query = jnp.asarray(rng.standard_normal((1, q, 32)), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (1, q, 2, 2)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((1, s, 32)), jnp.float32)

    def run(impl):
        mod = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2,
                           impl=impl)
        params = mod.init(jax.random.PRNGKey(0), query, ref, src, shapes)
        return np.asarray(mod.apply(params, query, ref, src, shapes))

    np.testing.assert_allclose(run("patch"), run("gather"), rtol=2e-5,
                               atol=2e-6)
