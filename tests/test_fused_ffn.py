"""Parity: fused Pallas encoder tail vs the flax LN+FFN composition.

Three-way agreement at f32 (tight) and bf16 (loose) compute:
  flax modules (LayerNorm + FFN)  ==  xla_encoder_tail  ==  fused kernel
including gradients w.r.t. inputs and every weight (the fused backward is
hand-derived with per-block recompute).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from richsem_tpu.models.layers import FFN
from richsem_tpu.ops.fused_ffn import fused_encoder_tail, xla_encoder_tail

N, D, F = 1100, 256, 512  # N % _TK != 0 exercises the pad path
EPS = 1e-5


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(N, D)) * 0.5, jnp.float32)
    attn = jnp.asarray(rng.normal(size=(N, D)) * 0.5, jnp.float32)
    p = dict(
        w1=jnp.asarray(rng.normal(size=(D, F)) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32),
        w2=jnp.asarray(rng.normal(size=(F, D)) * 0.05, jnp.float32),
        b2=jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32),
        s1=jnp.asarray(1.0 + rng.normal(size=(D,)) * 0.1, jnp.float32),
        sb1=jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32),
        s2=jnp.asarray(1.0 + rng.normal(size=(D,)) * 0.1, jnp.float32),
        sb2=jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32),
    )
    return src, attn, p


def _flax_tail(src, attn, p, cdt):
    """The pre-round-5 composition: nn.LayerNorm + FFN module."""
    ln = nn.LayerNorm(epsilon=EPS)
    x = ln.apply({"params": {"scale": p["s1"], "bias": p["sb1"]}}, src + attn)
    ffn = FFN(d_model=D, d_ffn=F, activation="relu", compute_dtype=cdt)
    params = {
        "linear1": {"kernel": p["w1"], "bias": p["b1"]},
        "linear2": {"kernel": p["w2"], "bias": p["b2"]},
        "norm": {"scale": p["s2"], "bias": p["sb2"]},
    }
    return ffn.apply({"params": params}, x[None])[0]


def _call(fn, src, attn, p, cdt):
    return fn(src, attn, p["w1"], p["b1"], p["w2"], p["b2"],
              p["s1"], p["sb1"], p["s2"], p["sb2"], EPS, cdt)


@pytest.mark.parametrize("cdt,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 3e-2)])
def test_forward_three_way(data, cdt, tol):
    src, attn, p = data
    ref = np.asarray(_flax_tail(src, attn, p, cdt), np.float32)
    xla = np.asarray(_call(xla_encoder_tail, src, attn, p, cdt), np.float32)
    fused = np.asarray(_call(fused_encoder_tail, src, attn, p, cdt),
                       np.float32)
    np.testing.assert_allclose(xla, ref, rtol=tol, atol=tol)
    np.testing.assert_allclose(fused, xla, rtol=tol, atol=tol)


@pytest.mark.parametrize("cdt,tol", [(jnp.float32, 1e-4), (jnp.bfloat16, 5e-2)])
def test_grads_fused_vs_xla(data, cdt, tol):
    src, attn, p = data
    rng = np.random.default_rng(1)
    cot = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)

    def loss(fn, src, attn, p):
        return (_call(fn, src, attn, p, cdt) * cot).sum()

    g_x = jax.grad(lambda *a: loss(xla_encoder_tail, *a), argnums=(0, 1, 2))(
        src, attn, p
    )
    g_f = jax.grad(lambda *a: loss(fused_encoder_tail, *a), argnums=(0, 1, 2))(
        src, attn, p
    )
    for name, a, b in [
        ("dsrc", g_x[0], g_f[0]),
        ("dattn", g_x[1], g_f[1]),
    ]:
        sc = max(np.abs(np.asarray(a)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            rtol=tol, atol=tol * sc, err_msg=name,
        )
    for k in g_x[2]:
        a, b = np.asarray(g_x[2][k], np.float32), np.asarray(
            g_f[2][k], np.float32
        )
        sc = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=tol, atol=tol * sc,
                                   err_msg=f"d{k}")


def test_grads_xla_vs_flax_f32(data):
    """xla_encoder_tail's autodiff == the flax composition's autodiff."""
    src, attn, p = data
    cot = jnp.ones((N, D), jnp.float32)

    g_ref = jax.grad(
        lambda s, a, pp: (_flax_tail(s, a, pp, jnp.float32) * cot).sum(),
        argnums=(0, 2),
    )(src, attn, p)
    g_x = jax.grad(
        lambda s, a, pp: (_call(xla_encoder_tail, s, a, pp, jnp.float32)
                          * cot).sum(),
        argnums=(0, 2),
    )(src, attn, p)
    np.testing.assert_allclose(
        np.asarray(g_x[0]), np.asarray(g_ref[0]), rtol=1e-5, atol=1e-5
    )
    for k in g_ref[1]:
        np.testing.assert_allclose(
            np.asarray(g_x[1][k]), np.asarray(g_ref[1][k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_encoder_layer_param_tree_unchanged():
    """The holder-module tail declares the exact same param tree as the
    flax-module tail (checkpoint compatibility). The gelu variant takes
    the flax-module branch, relu the holder branch; trees must agree
    modulo the activation having no params."""
    from richsem_tpu.models.dino import DINOConfig, DeformableEncoderLayer

    rng = jax.random.PRNGKey(0)
    src = jnp.zeros((1, 64, 32), jnp.float32)
    pos = jnp.zeros_like(src)
    ref = jnp.full((1, 64, 1, 2), 0.5)
    shapes = ((8, 8),)
    mask = jnp.zeros((1, 64), bool)
    trees = {}
    for act in ("relu", "gelu"):
        cfg = DINOConfig(
            hidden_dim=32, nheads=4, dim_feedforward=64,
            num_feature_levels=1, activation=act,
        )
        params = DeformableEncoderLayer(cfg).init(
            rng, src, pos, ref, shapes, mask
        )
        trees[act] = jax.tree_util.tree_map(
            lambda x: (x.shape, str(x.dtype)), params
        )
    assert trees["relu"] == trees["gelu"]


def test_selective_remat_grads_match_plain():
    """enc_selective_remat wraps the encoder layer in nn.remat with a
    save-only-msda_out policy; with the holder-param tail the recompute
    must reproduce the plain layer's gradients exactly (CPU, f32)."""
    from richsem_tpu.models.dino import DINOConfig, DeformableEncoderLayer

    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(1, 64, 32)) * 0.5, jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, 64, 32)) * 0.5, jnp.float32)
    ref = jnp.full((1, 64, 1, 2), 0.5)
    shapes = ((8, 8),)
    mask = jnp.zeros((1, 64), bool)
    cfg = DINOConfig(hidden_dim=32, nheads=4, dim_feedforward=64,
                     num_feature_levels=1)
    layer = DeformableEncoderLayer(cfg)
    params = layer.init(jax.random.PRNGKey(0), src, pos, ref, shapes, mask)

    import flax.linen as nn_

    remat_layer = nn_.remat(
        DeformableEncoderLayer, static_argnums=(4, 6), prevent_cse=False,
        policy=jax.checkpoint_policies.save_only_these_names("msda_out"),
    )(cfg)

    def loss(mod, p):
        # deterministic passed explicitly: the remat wrapper's
        # static_argnums=(4, 6) covers (spatial_shapes, deterministic)
        return (mod.apply(p, src, pos, ref, shapes, mask, True) ** 2).sum()

    g_plain = jax.grad(lambda p: loss(layer, p))(params)
    g_remat = jax.grad(lambda p: loss(remat_layer, p))(params)
    flat_a = jax.tree_util.tree_leaves(g_plain)
    flat_b = jax.tree_util.tree_leaves(g_remat)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)
