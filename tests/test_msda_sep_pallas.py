"""Parity tests for the fused Pallas separable msda (decoder path).

Validated against the same oracles as tests/test_msda_sep.py — numpy f64
loop oracle for the forward, dense differentiable oracle for all three
grads. On CPU the kernel runs in pallas interpret mode, so these tests
exercise the exact kernel program shipped to TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.ops.ms_deform_attn import (
    ms_deform_attn_dense_oracle,
    ms_deform_attn_reference_np,
)
from richsem_tpu.ops.ms_deform_attn_sep_pallas import (
    _num_chunks,
    ms_deform_attn_sep_pallas,
)

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
        ms_deform_attn_sep_pallas(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)
        )
    )
    want = ms_deform_attn_reference_np(value, SHAPES, loc, aw)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_forward_is_row_chunked(rng):
    # Q·P = 30 rows at the test shapes — with _CK_TARGET monkeyed small the
    # kernel would chunk; at production decoder shapes (Q·P = 4400) the
    # chunking is live. Assert the chunk helper splits evenly.
    assert _num_chunks(4400) > 1
    assert 4400 % _num_chunks(4400) == 0


def test_row_chunked_matches_single_chunk(rng, monkeypatch):
    """The multi-chunk grid (revisited d_img accumulator, per-chunk row
    blocks) must match the single-chunk program bit-for-bit math."""
    import richsem_tpu.ops.ms_deform_attn_sep_pallas as mod

    value, loc, aw = _random_inputs(rng, b=1, q=6)
    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw))

    def run():
        mod._VJP_CACHE.clear()
        out = ms_deform_attn_sep_pallas(args[0], SHAPES, args[1], args[2])
        grads = jax.grad(
            lambda v, l, a: jnp.sum(
                jnp.sin(ms_deform_attn_sep_pallas(v, SHAPES, l, a))
            ),
            argnums=(0, 1, 2),
        )(*args)
        return out, grads

    o1, g1 = run()
    monkeypatch.setattr(mod, "_CK_TARGET", 6)  # Q·P = 18 → 3 chunks
    assert mod._num_chunks(6 * P) > 1
    o2, g2 = run()
    mod._VJP_CACHE.clear()
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
        )


def test_all_out_of_bounds_is_zero(rng):
    value, loc, aw = _random_inputs(rng)
    loc = np.full_like(loc, 5.0)
    got = np.asarray(
        ms_deform_attn_sep_pallas(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)
        )
    )
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_gradients_match_dense_oracle(rng):
    value, loc, aw = _random_inputs(rng, b=1, q=4)
    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw))

    def loss_pl(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_sep_pallas(v, SHAPES, l, a)))

    def loss_dense(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_dense_oracle(v, SHAPES, l, a)))

    g1 = jax.grad(loss_pl, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
        )


def test_bf16_matches_f32(rng):
    value, loc, aw = _random_inputs(rng)
    ref = np.asarray(
        ms_deform_attn_sep_pallas(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(aw)
        )
    )
    got = np.asarray(
        ms_deform_attn_sep_pallas(
            jnp.asarray(value, jnp.bfloat16),
            SHAPES,
            jnp.asarray(loc),
            jnp.asarray(aw),
        )
    ).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
