"""Tiled (windowed) deformable attention vs the exact gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from richsem_tpu.ops.ms_deform_attn import ms_deform_attn
from richsem_tpu.ops.ms_deform_attn_tiled import (
    ms_deform_attn_tiled as _tiled_raw,
    tiled_supported,
)
import functools


@functools.partial(jax.jit, static_argnames=("tile", "margin"))
def _tiled_jit(v, l, a, tile=(8, 16), margin=8):
    return _tiled_raw(v, SHAPES, l, a, tile=tile, margin=margin)


def ms_deform_attn_tiled(v, shapes, l, a, tile=(8, 16), margin=8):
    return _tiled_jit(v, l, a, tile=tile, margin=margin)
from richsem_tpu.models.transformer_utils import encoder_reference_points
from richsem_tpu.ops.ms_deform_attn import compute_sampling_locations

# power-of-two pyramid (canvas-div-64 invariant)
SHAPES = ((16, 24), (8, 12), (4, 6), (2, 3))
S = sum(h * w for h, w in SHAPES)
B, M, D, P, L = 1, 2, 4, 2, 4


def _encoder_inputs(rng, offset_px=3.0):
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    vr = jnp.ones((B, L, 2))
    refs = encoder_reference_points(SHAPES, vr)  # [B, S, L, 2]
    offsets = rng.uniform(-offset_px, offset_px, (B, S, M, L, P, 2)).astype(np.float32)
    loc = compute_sampling_locations(refs, jnp.asarray(offsets), SHAPES, P)
    aw = rng.uniform(0.1, 1.0, (B, S, M, L, P)).astype(np.float32)
    aw = aw / aw.sum(axis=(-1, -2), keepdims=True)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)


def test_supported_check():
    assert tiled_supported(SHAPES, tile=(8, 16))
    assert not tiled_supported(((35, 35), (18, 18)), tile=(8, 16))


def test_tiled_matches_exact_within_margin(rng):
    """Samples within `margin` px of the tile match the gather path exactly."""
    value, loc, aw = _encoder_inputs(rng, offset_px=3.0)
    want = np.asarray(ms_deform_attn(value, SHAPES, loc, aw))
    got = np.asarray(
        ms_deform_attn_tiled(value, SHAPES, loc, aw, tile=(8, 16), margin=8)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tiled_zero_weight_far_samples(rng):
    """Samples far outside the window read zeros; near samples still match."""
    value, loc, aw = _encoder_inputs(rng, offset_px=0.5)
    # push one point of one query far away
    loc = loc.at[:, 5, :, 0, 0, :].set(0.99)
    got = ms_deform_attn_tiled(value, SHAPES, loc, aw, margin=4)
    assert bool(jnp.isfinite(got).all())
    # other queries unaffected vs exact
    want = np.asarray(ms_deform_attn(value, SHAPES, loc, aw))
    np.testing.assert_allclose(
        np.asarray(got)[:, 100:], want[:, 100:], rtol=2e-4, atol=2e-4
    )


def test_tiled_gradients_match_exact(rng):
    value, loc, aw = _encoder_inputs(rng, offset_px=2.0)

    def loss_t(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_tiled(v, SHAPES, l, a, margin=8)))

    def loss_e(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn(v, SHAPES, l, a)))

    gt = jax.grad(loss_t, argnums=(0, 1, 2))(value, loc, aw)
    ge = jax.grad(loss_e, argnums=(0, 1, 2))(value, loc, aw)
    for a, b_ in zip(gt, ge):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3
        )


def test_tiled_with_padding_mask_valid_ratios(rng):
    """Valid-ratio-scaled refs (padded images) stay within the margin."""
    from richsem_tpu.utils.misc import resize_mask, valid_ratios

    mask = np.ones((B, 128, 192), bool)
    mask[:, :96, :160] = False  # 0.75 / 0.833 valid
    mask = jnp.asarray(mask)
    masks = [resize_mask(mask, (h, w)) for h, w in SHAPES]
    vr = jnp.stack([valid_ratios(m_) for m_ in masks], axis=1)
    refs = encoder_reference_points(SHAPES, vr)
    offsets = rng.uniform(-2, 2, (B, S, M, L, P, 2)).astype(np.float32)
    loc = compute_sampling_locations(refs, jnp.asarray(offsets), SHAPES, P)
    aw = rng.uniform(0.1, 1.0, (B, S, M, L, P)).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum(axis=(-1, -2), keepdims=True))
    value = jnp.asarray(rng.standard_normal((B, S, M, D)).astype(np.float32))
    want = np.asarray(ms_deform_attn(value, SHAPES, loc, aw))
    got = np.asarray(ms_deform_attn_tiled(value, SHAPES, loc, aw, margin=8))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
