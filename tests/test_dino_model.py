"""DINO model skeleton tests: shapes, finiteness, DN split, grad flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from richsem_tpu.models.dino import DINO, DINOConfig

TINY = DINOConfig(
    num_classes=12,
    hidden_dim=32,
    nheads=4,
    enc_layers=2,
    dec_layers=2,
    dim_feedforward=64,
    num_queries=20,
    dn_labelbook_size=12,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = DINO(TINY)
    images = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64), bool)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images, mask, train=False
    )
    return model, params


def _forward(model, params, b=1, h=96, w=96, **kw):
    images = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (b, h, w, 3)), jnp.float32)
    mask = np.ones((b, h, w), bool)
    mask[:, : h - 10, : w - 6] = False
    return model.apply(params, images, jnp.asarray(mask), **kw)


def test_output_structure(model_and_params):
    model, params = model_and_params
    out = jax.jit(lambda p, i, m: model.apply(p, i, m, train=False))(
        params,
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64), bool),
    )
    assert out["pred_logits"].shape == (1, 20, 12)
    assert out["pred_boxes"].shape == (1, 20, 4)
    assert len(out["aux_outputs"]) == TINY.dec_layers - 1
    assert out["interm_outputs"]["pred_boxes"].shape == (1, 20, 4)
    assert bool(jnp.isfinite(out["pred_logits"]).all())
    boxes = out["pred_boxes"]
    assert bool(((boxes >= 0) & (boxes <= 1)).all())


def test_dn_split(model_and_params):
    model, params = model_and_params
    ndn = 8
    out = _forward(
        model,
        params,
        dn_labels=jnp.zeros((1, ndn), jnp.int32),
        dn_boxes_unsig=jnp.zeros((1, ndn, 4)),
        dn_attn_mask=jnp.ones((1, ndn + 20, ndn + 20), bool),
        train=True,
    )
    assert out["dn_outputs"]["pred_logits"].shape == (1, ndn, 12)
    assert out["pred_logits"].shape == (1, 20, 12)
    assert len(out["dn_outputs"]["aux_outputs"]) == TINY.dec_layers - 1


def test_dn_attn_mask_isolates(model_and_params):
    """Matching-query outputs must be identical whether or not DN queries are
    present, when the attention mask blocks DN→matching visibility."""
    model, params = model_and_params
    out_plain = _forward(model, params, train=False)
    ndn = 4
    qt = ndn + 20
    attn = np.ones((1, qt, qt), bool)
    attn[:, ndn:, :ndn] = False  # matching queries cannot see DN
    out_dn = _forward(
        model,
        params,
        dn_labels=jnp.asarray(np.random.default_rng(1).integers(0, 12, (1, ndn)), jnp.int32),
        dn_boxes_unsig=jnp.asarray(np.random.default_rng(2).normal(size=(1, ndn, 4)), jnp.float32),
        dn_attn_mask=jnp.asarray(attn),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_plain["pred_logits"]),
        np.asarray(out_dn["pred_logits"]),
        rtol=1e-4,
        atol=1e-4,
    )


def test_grad_flow(model_and_params):
    """A scalar loss reaches every trainable leaf (no dead submodules).

    Params are noise-perturbed first: several heads are zero-initialized by
    design (bbox final layer, sampling offsets), which blocks gradient flow
    to their inputs only at exact init.
    """
    model, params = model_and_params
    keys = jax.random.split(jax.random.PRNGKey(7), len(jax.tree.leaves(params)))
    keys = iter(keys)
    params = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(next(keys), x.shape, x.dtype), params
    )

    def loss_fn(p):
        out = _forward(model, p, train=False)
        total = jnp.sum(out["pred_logits"] ** 2) + jnp.sum(out["pred_boxes"])
        total += jnp.sum(out["interm_outputs"]["pred_logits"] ** 2)
        total += jnp.sum(out["interm_outputs"]["pred_boxes"] ** 2)
        for aux in out["aux_outputs"]:
            total += jnp.sum(aux["pred_logits"] ** 2)
            total += jnp.sum(aux["pred_boxes"] ** 2)
        return total

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    dead = [
        jax.tree_util.keystr(path)
        for path, g in flat
        if float(jnp.abs(g).max()) == 0.0
    ]
    assert not dead, f"dead gradients at: {dead[:10]}"


def test_label_encoding_tied_to_classifier(model_and_params):
    model, params = model_and_params
    emb = model.apply(
        params, jnp.asarray([[3]], jnp.int32), method=DINO.encode_dn_labels
    )
    kernel = params["params"]["cls_kernel"]
    np.testing.assert_allclose(np.asarray(emb[0, 0]), np.asarray(kernel[:, 3]))
