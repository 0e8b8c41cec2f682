"""Swin / ConvNeXt backbone smoke + integration tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from richsem_tpu.models.convnext import ConvNeXt, ConvNeXtConfig
from richsem_tpu.models.swin import SwinConfig, SwinTransformer, _rel_pos_index


def test_rel_pos_index_properties():
    idx = _rel_pos_index(3)
    assert idx.shape == (9, 9)
    # self-relative position maps to the center entry everywhere
    assert len(set(np.diag(idx).tolist())) == 1
    assert idx.max() < 25 and idx.min() >= 0


def test_swin_output_shapes():
    cfg = SwinConfig(embed_dim=24, depths=(1, 1, 2, 1), num_heads=(2, 2, 4, 4),
                     window_size=4)
    model = SwinTransformer(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert outs[0].shape == (1, 8, 12, 48)   # stride 8
    assert outs[1].shape == (1, 4, 6, 96)    # stride 16
    assert outs[2].shape == (1, 2, 3, 192)   # stride 32
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_swin_nondivisible_input():
    """Inputs not divisible by the window pad internally."""
    cfg = SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                     window_size=4)
    model = SwinTransformer(cfg)
    x = jnp.zeros((1, 72, 104, 3))  # 72/4=18, /8=9 → odd stage sizes
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert outs[0].shape[1:3] == (9, 13)
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_convnext_output_shapes():
    cfg = ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128))
    model = ConvNeXt(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert outs[0].shape == (1, 8, 12, 32)
    assert outs[1].shape == (1, 4, 6, 64)
    assert outs[2].shape == (1, 2, 3, 128)


@pytest.mark.parametrize("backbone", ["swin_T_224_1k", "convnext_tiny"])
def test_dino_with_alt_backbone(backbone):
    from __graft_entry__ import _tiny_cfg_dict
    from richsem_tpu.models.dino import DINO, DINOConfig

    cfg = _tiny_cfg_dict(backbone=backbone, hidden_dim=32, nheads=4,
                         enc_layers=1, dec_layers=1, dim_feedforward=64,
                         num_queries=12, num_classes=8, dn_labelbook_size=8)
    model = DINO(DINOConfig.from_config(cfg))
    images = jnp.zeros((1, 96, 96, 3))
    mask = jnp.zeros((1, 96, 96), bool)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images, mask, train=False
    )
    out = model.apply(params, images, mask, train=False)
    assert out["pred_logits"].shape == (1, 12, 8)
    assert bool(jnp.isfinite(out["pred_logits"]).all())


def test_focalnet_output_shapes():
    from richsem_tpu.models.focalnet import FocalNet, FocalNetConfig

    cfg = FocalNetConfig(embed_dim=16, depths=(1, 1, 2, 1), focal_level=2)
    model = FocalNet(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert outs[0].shape == (1, 8, 12, 32)
    assert outs[2].shape == (1, 2, 3, 128)
    assert all(bool(jnp.isfinite(o).all()) for o in outs)
