"""Pallas-v2 tiled msda kernel vs the exact gather oracle (interpret mode).

The CPU suite runs the kernel through the Pallas interpreter; hardware
verification (Mosaic lowering, MXU shapes, timings) runs on the TPU via
tools/bench_msda.py and /verify.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

import richsem_tpu.ops.ms_deform_attn_pallas2 as mp2
from richsem_tpu.ops.ms_deform_attn import ms_deform_attn

SHAPES = ((32, 24), (16, 12), (8, 6), (4, 3))
B, M, D, P = 2, 4, 8, 4


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*a, **kw)

    monkeypatch.setattr(mp2.pl, "pallas_call", patched)


def _clamped_inputs(seed, bound):
    from richsem_tpu.models.transformer_utils import encoder_reference_points
    from richsem_tpu.ops.ms_deform_attn import compute_sampling_locations

    s = sum(h * w for h, w in SHAPES)
    rng = np.random.default_rng(seed)
    val = jnp.asarray(rng.normal(size=(B, s, M, D)), jnp.float32)
    vr = jnp.ones((B, 4, 2), jnp.float32)
    refs = encoder_reference_points(SHAPES, vr)
    # the 0.9973/0.00137 skew keeps samples off exact integer pixels, where
    # the hat and 2-tap bilinear formulations pick different (both valid)
    # subgradients of d/d(loc)
    offs = jnp.asarray(
        rng.uniform(-bound, bound, (B, s, M, 4, P, 2)) * 0.9973 + 0.00137,
        jnp.float32,
    )
    loc = compute_sampling_locations(refs, offs, SHAPES, P)
    aw = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, s, M, 4 * P)), jnp.float32), -1
    ).reshape(B, s, M, 4, P)
    return val, loc, aw


@pytest.mark.parametrize("tile,margin", [((8, 8), 4), ((16, 8), 6)])
def test_pallas2_in_window_exact_and_grads(tile, margin):
    """With offsets bounded by ±(margin − 0.5) — the model's clamp — the
    kernel must agree with the exact oracle: forward and all three grads."""
    val, loc, aw = _clamped_inputs(1, margin - 0.5)

    ref = ms_deform_attn(val, SHAPES, loc, aw)
    out = mp2.ms_deform_attn_pallas2(val, SHAPES, loc, aw, tile=tile,
                                     margin=margin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss(fn):
        def f(v, l, a):
            o = fn(v, SHAPES, l, a)
            w = jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape)
            return (o.astype(jnp.float32) * jnp.sin(w)).sum()
        return f

    g_ref = jax.grad(loss(ms_deform_attn), argnums=(0, 1, 2))(val, loc, aw)
    g_out = jax.grad(
        loss(lambda v, s, l, a: mp2.ms_deform_attn_pallas2(
            v, s, l, a, tile=tile, margin=margin
        )),
        argnums=(0, 1, 2),
    )(val, loc, aw)
    for a, b, name in zip(g_ref, g_out, ("d_value", "d_loc", "d_aw")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-3, atol=3e-3,
            err_msg=name,
        )


def test_pallas2_out_of_window_truncates_to_zero():
    """Samples beyond the margin read zeros (same semantics as the XLA
    tiled kernel): compare against the oracle with attention weights of
    out-of-window points zeroed."""
    from richsem_tpu.models.transformer_utils import encoder_reference_points
    from richsem_tpu.ops.ms_deform_attn import compute_sampling_locations

    margin, tile = 4, (8, 8)
    s = sum(h * w for h, w in SHAPES)
    rng = np.random.default_rng(3)
    val = jnp.asarray(rng.normal(size=(B, s, M, D)), jnp.float32)
    vr = jnp.ones((B, 4, 2), jnp.float32)
    refs = encoder_reference_points(SHAPES, vr)
    offs = jnp.asarray(
        rng.uniform(-2.0, 2.0, (B, s, M, 4, P, 2)), jnp.float32
    )
    # push one point of one head far out of the window for EVERY query:
    # offset > max stride + margin + 1 clears the window at every level
    offs = offs.at[:, :, 0, :, 0, :].set(14.0)
    loc = compute_sampling_locations(refs, offs, SHAPES, P)
    aw = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, s, M, 4 * P)), jnp.float32), -1
    ).reshape(B, s, M, 4, P)

    out = mp2.ms_deform_attn_pallas2(val, SHAPES, loc, aw, tile=tile,
                                     margin=margin)
    aw_trunc = aw.at[:, :, 0, :, 0].set(0.0)
    ref = ms_deform_attn(val, SHAPES, loc, aw_trunc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
