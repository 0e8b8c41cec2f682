"""masks=True path: DINO forward → mask losses, end to end on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _tiny_cfg_dict
from richsem_tpu.models.criterion import build_weight_dict, set_criterion, weighted_loss
from richsem_tpu.models.dino import DINO, DINOConfig


def test_dino_masks_forward_and_loss():
    cfg = _tiny_cfg_dict(
        masks=True, num_classes=6, dn_labelbook_size=6, num_queries=10,
        hidden_dim=32, nheads=4, enc_layers=1, dec_layers=1,
        dim_feedforward=64, use_dn=False, mask_loss_coef=1.0,
        dice_loss_coef=1.0,
    )
    model = DINO(DINOConfig.from_config(cfg))
    b, h, w, g = 1, 96, 96, 3
    images = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (b, h, w, 3)), jnp.float32)
    mask = jnp.zeros((b, h, w), bool)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images, mask, train=False
    )
    out = model.apply(params, images, mask, train=False)
    assert out["pred_masks"].shape == (b, 10, h // 8, w // 8)
    assert bool(jnp.isfinite(out["pred_masks"]).all())

    rng = np.random.default_rng(1)
    targets = {
        "labels": jnp.asarray(rng.integers(0, 6, (b, g)), jnp.int32),
        "boxes": jnp.asarray(np.clip(rng.uniform(0.2, 0.6, (b, g, 4)), 0.1, 0.8), jnp.float32),
        "valid": jnp.ones((b, g), bool),
        "masks": jnp.asarray(rng.uniform(size=(b, g, h // 8, w // 8)) > 0.7),
    }
    losses = set_criterion(out, targets, jax.random.PRNGKey(2), num_classes=6)
    assert "loss_mask" in losses and "loss_dice" in losses
    assert np.isfinite(float(losses["loss_mask"]))
    wd = build_weight_dict(cfg)
    assert "loss_mask" in wd and "loss_dice" in wd
    total = weighted_loss(losses, wd)
    assert np.isfinite(float(total))


def test_collate_with_masks():
    from richsem_tpu.data.loader import collate
    from richsem_tpu.data.transforms import normalize

    rng = np.random.default_rng(0)
    rec = {
        "image": rng.integers(0, 255, (60, 80, 3), dtype=np.uint8),
        "boxes": np.asarray([[5, 5, 30, 30]], np.float32),
        "labels": np.asarray([1]),
        "area": np.asarray([625.0], np.float32),
        "iscrowd": np.asarray([0]),
        "image_id": 0,
        "orig_size": (60, 80),
        "masks": np.zeros((1, 60, 80), bool),
    }
    rec["masks"][0, 5:30, 5:30] = True
    batch = collate([normalize(rec)], [(64, 96)], max_gt=4)
    assert batch["masks"].shape == (1, 4, 8, 12)
    assert batch["masks"][0, 0].any() and not batch["masks"][0, 1].any()


def test_dino_cond_inst_forward_and_loss():
    """mask_head_type='cond_inst': dynamic-conv mask branch end to end
    (reference cond_inst.py:70-502)."""
    cfg = _tiny_cfg_dict(
        masks=True, mask_head_type="cond_inst", num_classes=6,
        dn_labelbook_size=6, num_queries=10, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=1, dim_feedforward=64, use_dn=False,
        mask_loss_coef=1.0, dice_loss_coef=1.0,
    )
    model = DINO(DINOConfig.from_config(cfg))
    b, h, w, g = 1, 96, 96, 3
    images = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (b, h, w, 3)), jnp.float32
    )
    mask = jnp.zeros((b, h, w), bool)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images, mask, train=False
    )
    out = model.apply(params, images, mask, train=False)
    assert out["mask_feats"].shape == (b, h // 8, w // 8, 32 // 32)
    n_params = out["mask_params"].shape[-1]
    assert out["mask_params"].shape == (b, 10, n_params)
    # layout: (Cm+2)*8 + 8 + 8*8 + 8 + 8*1 + 1 with Cm=1
    assert n_params == (1 + 2) * 8 + 8 + 8 * 8 + 8 + 8 + 1

    rng = np.random.default_rng(1)
    targets = {
        "labels": jnp.asarray(rng.integers(0, 6, (b, g)), jnp.int32),
        "boxes": jnp.asarray(
            np.clip(rng.uniform(0.2, 0.6, (b, g, 4)), 0.1, 0.8), jnp.float32
        ),
        "valid": jnp.ones((b, g), bool),
        "masks": jnp.asarray(rng.uniform(size=(b, g, h // 8, w // 8)) > 0.7),
    }

    def total_loss(p):
        o = model.apply(p, images, mask, train=False)
        losses = set_criterion(o, targets, jax.random.PRNGKey(2), num_classes=6)
        return losses["loss_mask"] + losses["loss_dice"], losses

    (tot, losses), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
    assert np.isfinite(float(tot))
    assert "loss_mask" in losses and "loss_dice" in losses
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(
            grads["params"]["cond_inst"]["controller"]
        )))
    )
    assert gnorm > 0, "mask loss must reach the CondInst controller"


def test_cond_inst_rel_coords_move_mask():
    """The dynamic mask must follow the instance center (rel-coord path)."""
    from richsem_tpu.models.cond_inst import dynamic_mask_logits

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    n = (4 + 2) * 8 + 8 + 8 * 8 + 8 + 8 + 1
    params = jnp.asarray(rng.normal(size=(1, 1, n)) * 0.3, jnp.float32)
    m1 = dynamic_mask_logits(feats, params, jnp.asarray([[[8.0, 8.0]]]))
    m2 = dynamic_mask_logits(feats, params, jnp.asarray([[[40.0, 40.0]]]))
    assert not np.allclose(np.asarray(m1), np.asarray(m2))
