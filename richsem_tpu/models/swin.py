"""Swin Transformer backbone (flax, NHWC).

Capability parity with the reference's Swin backbone
(models/richsem/swin_transformer.py:427-720, selected via ``args.backbone``
∈ swin_T/B/L, backbone.py:204-249): 4×4 patch embed, 4 stages of shifted
7×7-window attention with relative position bias, patch merging, per-stage
LayerNorm on the multi-scale outputs (C3/C4/C5 for the detector), optional
stochastic depth. TPU-first notes: NHWC throughout; window partitioning is
pure reshapes; inputs pad to window multiples with attention masking (the
reference pads likewise); stages/checkpointing compose with the detector's
``use_checkpoint`` remat.

Variants (reference backbone.py:211-224): T (96, [2,2,6,2], [3,6,12,24]),
B (128, [2,2,18,2], [4,8,16,32]), L (192, [2,2,18,2], [6,12,24,48]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Any = None  # matmul compute dtype (params/norms stay f32)

    @classmethod
    def variant(cls, name: str) -> "SwinConfig":
        table = {
            "swin_T_224_1k": cls(),
            "swin_B_224_22k": cls(embed_dim=128, depths=(2, 2, 18, 2),
                                   num_heads=(4, 8, 16, 32)),
            "swin_B_384_22k": cls(embed_dim=128, depths=(2, 2, 18, 2),
                                   num_heads=(4, 8, 16, 32), window_size=12),
            "swin_L_224_22k": cls(embed_dim=192, depths=(2, 2, 18, 2),
                                   num_heads=(6, 12, 24, 48)),
            "swin_L_384_22k": cls(embed_dim=192, depths=(2, 2, 18, 2),
                                   num_heads=(6, 12, 24, 48), window_size=12),
        }
        if name not in table:
            raise KeyError(f"unknown swin variant {name}; options {sorted(table)}")
        return table[name]

    def num_channels(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * 2**i for i in self.out_indices)


def _rel_pos_index(ws: int) -> np.ndarray:
    """Relative-position index table for a ws×ws window → [ws², ws²]."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        """x: [nW, ws², C]; mask: [nGroups, ws², ws²] additive or None."""
        ws = self.window_size
        n, l, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(n, l, 3, self.num_heads, hd), 3, axis=2)
        q = q[:, :, 0].transpose(0, 2, 1, 3)  # [n, H, l, hd]
        k = k[:, :, 0].transpose(0, 2, 1, 3)
        v = v[:, :, 0].transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (hd**-0.5)
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = table[idx.reshape(-1)].reshape(l, l, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            g = mask.shape[0]
            attn = attn.reshape(n // g, g, self.num_heads, l, l) + mask[
                None, :, None
            ]
            attn = attn.reshape(n, self.num_heads, l, l)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            v.dtype
        )
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(n, l, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws, b, h, w):
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float
    drop_path: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        pad_b = (-h) % ws
        pad_r = (-w) % ws
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        mask = None
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = self._shift_mask(hp, wp)
        wins = _window_partition(y, ws)
        wins = WindowAttention(
            self.dim, self.num_heads, ws, dtype=self.dtype, name="attn"
        )(wins, mask)
        y = _window_reverse(wins, ws, b, hp, wp)
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + self._drop_path(y, deterministic)
        z = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        z = nn.Dense(
            int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1"
        )(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(z)
        return x + self._drop_path(z, deterministic)

    def _drop_path(self, y, deterministic):
        if deterministic or self.drop_path == 0.0:
            return y
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
        return y * mask / keep

    def _shift_mask(self, hp, wp):
        """Additive mask isolating the 9 shifted regions (−100 off-region)."""
        ws, sh = self.window_size, self.shift
        img = np.zeros((1, hp, wp, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
            for ws_ in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
                img[:, hs, ws_, :] = cnt
                cnt += 1
        wins = _window_partition(jnp.asarray(img), ws)[:, :, 0]  # [nW, ws²]
        diff = wins[:, :, None] - wins[:, None, :]
        return jnp.where(diff == 0, 0.0, -100.0)


class SwinTransformer(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        dims = [c.embed_dim * 2**i for i in range(len(c.depths))]
        dpr = np.linspace(0, c.drop_path_rate, sum(c.depths)).tolist()
        y = nn.Conv(c.embed_dim, (4, 4), strides=(4, 4), dtype=c.dtype,
                    name="patch_embed")(x)
        y = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(y)
        outs = []
        blk = 0
        for stage, depth in enumerate(c.depths):
            for i in range(depth):
                y = SwinBlock(
                    dim=dims[stage],
                    num_heads=c.num_heads[stage],
                    window_size=c.window_size,
                    shift=0 if i % 2 == 0 else c.window_size // 2,
                    mlp_ratio=c.mlp_ratio,
                    drop_path=dpr[blk],
                    dtype=c.dtype,
                    name=f"stage{stage}_block{i}",
                )(y, deterministic)
                blk += 1
            if stage in c.out_indices:
                outs.append(
                    nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(y)
                )
            if stage < len(c.depths) - 1:
                # patch merging: 2×2 neighborhood concat → LN → linear ↓2
                b, h, w, ch = y.shape
                pad_b, pad_r = h % 2, w % 2
                if pad_b or pad_r:
                    y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
                    h, w = h + pad_b, w + pad_r
                y = y.reshape(b, h // 2, 2, w // 2, 2, ch)
                y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h // 2, w // 2, 4 * ch
                )
                y = nn.LayerNorm(epsilon=1e-5, name=f"merge_norm{stage}")(y)
                y = nn.Dense(2 * ch, use_bias=False, dtype=c.dtype,
                             name=f"merge_reduce{stage}")(y)
        return tuple(outs)
