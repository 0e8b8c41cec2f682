"""CondInst dynamic-convolution mask head (TPU-native redesign).

Capability parity with the reference's CondInst branch
(models/richsem/cond_inst.py:70-502 — ``MaskBranch`` + ``MaskConvBranch`` +
``dynamic_mask_with_coords`` + ``parse_dynamic_params``; dead code in the
reference, never imported, but part of its capability surface):

* a **controller** MLP maps each query embedding to the flattened weights
  and biases of a tiny per-instance 3-layer 1×1-conv network
  (cond_inst.py:219-247);
* a **mask branch** fuses the stride-8/16/32 encoder features into one
  stride-8 mask feature map of ``hidden_dim // channel_div`` channels
  (``MaskConvBranch``, cond_inst.py:70-124);
* each instance's mask = its dynamic network applied per pixel to
  [mask features ++ relative coordinates to the instance center]
  (``dynamic_mask_with_coords``, cond_inst.py:335-420).

TPU-first notes: dynamic 1×1 convs become batched einsums over
``[B, K, H·W, C]`` (MXU-friendly, no per-instance python loops); instances
are the *padded GT slots* matched by the criterion, so all shapes are
static. Rel-coords stay float32.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def dynamic_param_layout(
    in_channels: int, dy_channels: int, layers: int = 3, rel_coord: bool = True
) -> Tuple[List[int], List[int]]:
    """weight/bias element counts per dynamic layer (cond_inst.py:219-241)."""
    weight_nums, bias_nums = [], []
    for l in range(layers):
        if l == 0:
            cin = in_channels + (2 if rel_coord else 0)
            weight_nums.append(cin * dy_channels)
            bias_nums.append(dy_channels)
        elif l == layers - 1:
            weight_nums.append(dy_channels * 1)
            bias_nums.append(1)
        else:
            weight_nums.append(dy_channels * dy_channels)
            bias_nums.append(dy_channels)
    return weight_nums, bias_nums


def parse_dynamic_params(
    params: jnp.ndarray,  # [B, K, n_params]
    in_channels: int,
    dy_channels: int,
    layers: int = 3,
    rel_coord: bool = True,
):
    """→ list of (w [B,K,cin,cout], b [B,K,cout]) per dynamic layer."""
    weight_nums, bias_nums = dynamic_param_layout(
        in_channels, dy_channels, layers, rel_coord
    )
    out = []
    pos = 0
    cin = in_channels + (2 if rel_coord else 0)
    for l, (wn, bn) in enumerate(zip(weight_nums, bias_nums)):
        cout = bn
        w = params[..., pos : pos + wn].reshape(
            *params.shape[:-1], cout, cin
        ).swapaxes(-1, -2)  # torch conv weight [cout, cin] → [cin, cout]
        pos += wn
        b = params[..., pos : pos + bn]
        pos += bn
        out.append((w, b))
        cin = cout
    return out


def compute_locations(h: int, w: int, stride: int) -> jnp.ndarray:
    """Pixel-center coordinates of a stride-``stride`` grid, (x, y) order
    (cond_inst.py compute_locations semantics: ``stride·i + stride//2``)."""
    ys = (jnp.arange(h, dtype=jnp.float32) * stride + stride // 2)
    xs = (jnp.arange(w, dtype=jnp.float32) * stride + stride // 2)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)  # [h, w, 2]


def dynamic_mask_logits(
    mask_feats: jnp.ndarray,  # [B, Hm, Wm, Cm]
    params: jnp.ndarray,  # [B, K, n_params]
    centers_px: jnp.ndarray,  # [B, K, 2] instance centers in image px (x, y)
    dy_channels: int = 8,
    layers: int = 3,
    rel_coord: bool = True,
    mask_feat_stride: int = 8,
    sizes_px: jnp.ndarray = None,  # [B, K, 2] (w, h) for use_relative_hw
) -> jnp.ndarray:
    """→ mask logits [B, K, Hm, Wm] (cond_inst.py:335-420 semantics)."""
    b, hm, wm, cm = mask_feats.shape
    k = params.shape[1]
    feats = jnp.broadcast_to(
        mask_feats.reshape(b, 1, hm * wm, cm), (b, k, hm * wm, cm)
    ).astype(jnp.float32)
    if rel_coord:
        loc = compute_locations(hm, wm, mask_feat_stride).reshape(1, 1, hm * wm, 2)
        rel = centers_px.astype(jnp.float32)[:, :, None, :] - loc
        if sizes_px is not None:
            # use_relative_hw (cond_inst.py:358-362): scale by instance size
            rel = rel / jnp.clip(sizes_px[:, :, None, :], 1e-3) * 2.0
        x = jnp.concatenate([rel, feats], axis=-1)
    else:
        x = feats
    for l, (w, bias) in enumerate(
        parse_dynamic_params(
            params.astype(jnp.float32), cm, dy_channels, layers, rel_coord
        )
    ):
        x = jnp.einsum("bksc,bkcd->bksd", x, w) + bias[:, :, None, :]
        if l < layers - 1:
            x = nn.relu(x)
    return x[..., 0].reshape(b, k, hm, wm)


def aligned_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[B, K, H, W] → [B, K, H·f, W·f] bilinear (aligned_bilinear parity)."""
    if factor == 1:
        return x
    b, k, h, w = x.shape
    return jax.image.resize(x, (b, k, h * factor, w * factor), "bilinear")


class CondInstMaskBranch(nn.Module):
    """Stride-8 mask feature map from the multi-scale projected features
    (``MaskConvBranch``, cond_inst.py:70-124): per-level 3×3 conv + LN +
    relu refine, upsample-and-sum onto the stride-8 level, then a conv
    tower ending in a 1×1 to ``out_channels``."""

    out_channels: int
    hidden_channels: int = 128
    num_convs: int = 4

    @nn.compact
    def __call__(self, srcs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        def block(x, ch, name):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, name=f"{name}_conv")(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_ln")(x)
            return nn.relu(x)

        x = None
        for i, s in enumerate(srcs):
            r = block(s, self.hidden_channels, f"refine{i}")
            if x is None:
                x = r
            else:
                b, h, w, c = x.shape
                r = jax.image.resize(r, (b, h, w, c), "bilinear")
                x = x + r
        for i in range(self.num_convs):
            x = block(x, self.hidden_channels, f"tower{i}")
        return nn.Conv(self.out_channels, (1, 1), name="tower_out")(x)


class CondInstHead(nn.Module):
    """Controller + mask branch (``MaskBranch``, cond_inst.py:206-288)."""

    hidden_dim: int
    channel_div: int = 32
    dy_channels: int = 8
    controller_layers: int = 3
    rel_coord: bool = True
    mask_feat_stride: int = 8

    def setup(self):
        from richsem_tpu.models.layers import MLP

        self.mask_channels = max(self.hidden_dim // self.channel_div, 1)
        wn, bn = dynamic_param_layout(
            self.mask_channels, self.dy_channels, self.controller_layers,
            self.rel_coord,
        )
        self.num_gen_params = sum(wn) + sum(bn)
        self.controller = MLP(
            self.hidden_dim, self.num_gen_params, 3, name="controller"
        )
        self.mask_branch = CondInstMaskBranch(
            self.mask_channels, name="mask_branch"
        )

    def mask_features(self, srcs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        return self.mask_branch(srcs)

    def controller_params(self, hs: jnp.ndarray) -> jnp.ndarray:
        return self.controller(hs)

    def instance_masks(
        self,
        mask_feats: jnp.ndarray,  # [B, Hm, Wm, Cm]
        params: jnp.ndarray,  # [B, K, n_params]
        boxes: jnp.ndarray,  # [B, K, 4] normalized cxcywh
    ) -> jnp.ndarray:
        hm, wm = mask_feats.shape[1:3]
        scale = jnp.asarray(
            [wm * self.mask_feat_stride, hm * self.mask_feat_stride],
            jnp.float32,
        )
        centers = boxes[..., :2].astype(jnp.float32) * scale
        return dynamic_mask_logits(
            mask_feats, params, centers,
            dy_channels=self.dy_channels, layers=self.controller_layers,
            rel_coord=self.rel_coord, mask_feat_stride=self.mask_feat_stride,
        )
