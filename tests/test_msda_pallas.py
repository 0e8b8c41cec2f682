"""Pallas tiled msda kernel vs the exact gather oracle (interpret mode).

The CPU test suite can't run Mosaic-compiled kernels; ``interpret=True``
executes the same kernel logic through the Pallas interpreter. Hardware
verification (real DMAs, MXU) runs on the TPU via tools/profile & /verify.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

import richsem_tpu.ops.ms_deform_attn_pallas as mp
from richsem_tpu.ops.ms_deform_attn import ms_deform_attn

SHAPES = ((32, 24), (16, 12), (8, 6), (4, 3))
B, M, D, P = 2, 4, 8, 4


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(mp.pl, "pallas_call", patched)


def _inputs(seed=0):
    s = sum(h * w for h, w in SHAPES)
    rng = np.random.default_rng(seed)
    val = jnp.asarray(rng.normal(size=(B, s, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (B, s, M, 4, P, 2)), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, s, M, 4 * P)), jnp.float32), -1
    ).reshape(B, s, M, 4, P)
    return val, loc, aw


def test_pallas_geometry_hybrid():
    # margin 4 at tile (8,8): level 0 runs the windowed row-DMA path
    # (stride 8, window 16 < level 32), levels 1-3 the whole-level path
    # (strides < 8 — bf16 sublane alignment forbids their window DMAs;
    # whole-level sampling is exact, no margin truncation at all)
    assert mp._geometry(SHAPES, (8, 8), 4)[3] == [True, False, False, False]
    # unsupported plans raise
    with pytest.raises(ValueError):
        mp._geometry(((15, 7), (5, 2)), (8, 8), 4)


def test_pallas_in_window_exact_and_grads():
    """With sampling offsets inside the margin, the kernel must agree with
    the exact oracle to float precision — forward and all three grads."""
    from richsem_tpu.models.transformer_utils import encoder_reference_points
    from richsem_tpu.ops.ms_deform_attn import compute_sampling_locations

    s = sum(h * w for h, w in SHAPES)
    rng = np.random.default_rng(1)
    val = jnp.asarray(rng.normal(size=(B, s, M, D)), jnp.float32)
    vr = jnp.ones((B, 4, 2), jnp.float32)
    refs = encoder_reference_points(SHAPES, vr)
    offs = jnp.asarray(rng.uniform(-3, 3, (B, s, M, 4, P, 2)), jnp.float32)
    loc = compute_sampling_locations(refs, offs, SHAPES, P)
    aw = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, s, M, 4 * P)), jnp.float32), -1
    ).reshape(B, s, M, 4, P)

    ref = ms_deform_attn(val, SHAPES, loc, aw)
    out = mp.ms_deform_attn_tiled_pallas(val, SHAPES, loc, aw, tile=(8, 8),
                                         margin=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss_ref(v, l, a):
        return (ms_deform_attn(v, SHAPES, l, a).astype(jnp.float32) ** 2).sum()

    def loss_new(v, l, a):
        o = mp.ms_deform_attn_tiled_pallas(v, SHAPES, l, a, tile=(8, 8),
                                           margin=4)
        return (o.astype(jnp.float32) ** 2).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(val, loc, aw)
    gn = jax.grad(loss_new, argnums=(0, 1, 2))(val, loc, aw)
    for name, a_, b_ in zip(("d_value", "d_loc", "d_aw"), gr, gn):
        scale = max(float(jnp.abs(a_).max()), 1.0)
        diff = float(jnp.abs(a_ - b_).max())
        assert diff / scale < 5e-3, f"{name}: {diff} vs scale {scale}"


def test_fold_windows_is_extraction_adjoint():
    """fold_windows must be the exact linear adjoint of window extraction."""
    rng = np.random.default_rng(2)
    b, m, d = 1, 2, 4
    sy = sx = 4
    wy = wx = 8
    ty = tx = 3
    hp = ty * sy + 4
    wp = tx * sx + 4

    img = jnp.asarray(rng.normal(size=(b, m, hp, wp, d)), jnp.float32)
    dwin = jnp.asarray(
        rng.normal(size=(b, m, ty, tx, wy, wx, d)), jnp.float32
    )

    def extract(x):
        outs = []
        for i in range(ty):
            row = []
            for j in range(tx):
                row.append(x[:, :, i * sy : i * sy + wy, j * sx : j * sx + wx])
            outs.append(jnp.stack(row, 2))
        return jnp.stack(outs, 2)  # [b, m, ty, tx, wy, wx, d]

    # <extract(img), dwin> == <img, fold(dwin)>
    lhs = float((extract(img) * dwin).sum())
    rhs = float(
        (img * mp.fold_windows(dwin, sy, sx, wy, wx, ty, tx, hp, wp)).sum()
    )
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)
