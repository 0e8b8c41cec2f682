"""FocalNet backbone (flax, NHWC).

Capability parity with the reference's FocalNet backbone
(models/richsem/focal.py:38-588, ``args.backbone`` ∈ focalnet_L/XL/H,
backbone.py:264-290): 4×4 patch embed, 4 stages of focal-modulation blocks
(hierarchical gated depthwise-conv context + global context, multiplicative
modulation of a query projection), 2×2-conv downsampling, LN multi-scale
outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FocalNetConfig:
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    focal_level: int = 3
    focal_window: int = 3
    drop_path_rate: float = 0.3
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Any = None  # conv/matmul compute dtype (params/norms stay f32)

    @classmethod
    def variant(cls, name: str) -> "FocalNetConfig":
        table = {
            "focalnet_L_384_22k": cls(),
            "focalnet_L_384_22k_fl4": cls(focal_level=4),
            "focalnet_XL_384_22k": cls(embed_dim=256),
            "focalnet_XL_384_22k_fl4": cls(embed_dim=256, focal_level=4),
            "focalnet_H_224_22k": cls(embed_dim=352),
            "focalnet_H_224_22k_fl4": cls(embed_dim=352, focal_level=4),
        }
        if name not in table:
            raise KeyError(f"unknown focalnet variant {name}")
        return table[name]

    def num_channels(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * 2**i for i in self.out_indices)


class FocalModulation(nn.Module):
    dim: int
    focal_level: int
    focal_window: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C]."""
        f = nn.Dense(2 * self.dim + self.focal_level + 1, dtype=self.dtype,
                     name="f")(x)
        q = f[..., : self.dim]
        ctx = f[..., self.dim : 2 * self.dim]
        gates = f[..., 2 * self.dim :]
        ctx_all = jnp.zeros_like(ctx)
        for lvl in range(self.focal_level):
            k = self.focal_window + 2 * lvl
            ctx = nn.Conv(
                self.dim, (k, k), padding=[(k // 2, k // 2)] * 2,
                feature_group_count=self.dim, use_bias=False,
                dtype=self.dtype, name=f"focal_conv{lvl}",
            )(ctx)
            ctx = nn.gelu(ctx)
            ctx_all = ctx_all + ctx * gates[..., lvl : lvl + 1]
        ctx_global = nn.gelu(ctx.mean(axis=(1, 2), keepdims=True))
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level :]
        modulator = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                            name="h")(ctx_all)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(q * modulator)


class FocalBlock(nn.Module):
    dim: int
    focal_level: int
    focal_window: int
    drop_path: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = FocalModulation(
            self.dim, self.focal_level, self.focal_window, dtype=self.dtype,
            name="modulation"
        )(y)
        x = x + self._drop_path(y, deterministic)
        z = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        z = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(z)
        return x + self._drop_path(z, deterministic)

    def _drop_path(self, y, deterministic):
        if deterministic or self.drop_path == 0.0:
            return y
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1)
        )
        return y * mask / keep


class FocalNet(nn.Module):
    cfg: FocalNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        dims = [c.embed_dim * 2**i for i in range(len(c.depths))]
        dpr = np.linspace(0, c.drop_path_rate, sum(c.depths)).tolist()
        y = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=c.dtype,
                    name="patch_embed")(x)
        y = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(y)
        outs = []
        blk = 0
        for stage, depth in enumerate(c.depths):
            if stage > 0:
                y = nn.Conv(
                    dims[stage], (2, 2), strides=(2, 2), dtype=c.dtype,
                    name=f"down{stage}"
                )(y)
                y = nn.LayerNorm(epsilon=1e-5, name=f"down_norm{stage}")(y)
            for i in range(depth):
                y = FocalBlock(
                    dims[stage], c.focal_level, c.focal_window, dpr[blk],
                    dtype=c.dtype,
                    name=f"stage{stage}_block{i}",
                )(y, deterministic)
                blk += 1
            if stage in c.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(y))
        return tuple(outs)
