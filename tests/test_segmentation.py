import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.models.segmentation import (
    MaskHeadSmallConv,
    MHAttentionMap,
    dice_loss,
    loss_masks,
    mask_focal_loss,
    postprocess_segm,
)


def test_attention_map_softmax():
    mod = MHAttentionMap(hidden_dim=32, num_heads=4)
    q = jnp.zeros((1, 5, 32))
    f = jnp.zeros((1, 6, 8, 32))
    params = mod.init(jax.random.PRNGKey(0), q, f)
    attn = mod.apply(params, q, f)
    assert attn.shape == (1, 5, 4, 6, 8)
    np.testing.assert_allclose(np.asarray(attn.sum(axis=(-2, -1))), 1.0, rtol=1e-5)


def test_attention_map_pad_mask():
    mod = MHAttentionMap(hidden_dim=16, num_heads=2)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 3, 16)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(1, 4, 4, 16)), jnp.float32)
    pad = np.zeros((1, 4, 4), bool)
    pad[:, :, 2:] = True
    params = mod.init(jax.random.PRNGKey(0), q, f)
    attn = np.asarray(mod.apply(params, q, f, jnp.asarray(pad)))
    assert attn[..., 2:].max() < 1e-6  # padded columns get no attention


def test_mask_head_shapes():
    head = MaskHeadSmallConv(hidden_dim=32, num_heads=4)
    b, q = 1, 5
    attn = jnp.zeros((b, q, 4, 4, 6))
    c5 = jnp.zeros((b, 4, 6, 32))
    c4 = jnp.zeros((b, 8, 12, 32))
    c3 = jnp.zeros((b, 16, 24, 32))
    params = head.init(jax.random.PRNGKey(0), attn, c5, c4, c3)
    out = head.apply(params, attn, c5, c4, c3)
    assert out.shape == (b, q, 16, 24)
    assert bool(jnp.isfinite(out).all())


def test_dice_and_focal_perfect():
    t = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 8, 8)) > 0.5)
    logits = jnp.where(t, 20.0, -20.0)
    valid = jnp.ones((3,), bool)
    assert float(dice_loss(logits, t, valid, 3.0)) < 0.02
    assert float(mask_focal_loss(logits, t, valid, 3.0)) < 1e-6


def test_loss_masks_matched():
    b, q, g, hm, wm = 1, 6, 2, 8, 8
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(size=(b, g, hm, wm)) > 0.5)
    pred = jnp.full((b, q, hm, wm), -20.0)
    pred = pred.at[0, 2].set(jnp.where(gt[0, 0], 20.0, -20.0))
    pred = pred.at[0, 4].set(jnp.where(gt[0, 1], 20.0, -20.0))
    col = jnp.asarray([[2, 4]])
    valid = jnp.ones((b, g), bool)
    out = loss_masks(pred, col, gt, valid, jnp.float32(2.0))
    assert float(out["loss_mask"]) < 1e-6
    assert float(out["loss_dice"]) < 0.02


def test_postprocess_segm():
    logits = jnp.full((1, 3, 4, 6), -5.0).at[0, 0, 1, 1].set(5.0)
    masks = postprocess_segm(logits, jnp.asarray([[60, 90]]), (32, 48))
    assert masks.shape == (1, 3, 32, 48)
    assert bool(masks[0, 0].any()) and not bool(masks[0, 1].any())
