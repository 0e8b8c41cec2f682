"""ConvNeXt backbone (flax, NHWC).

Capability parity with the reference's ConvNeXt backbone
(models/richsem/convnext.py:55-251, ``args.backbone='convnext_xlarge_22k'``,
backbone.py:251-262): 4×4 patch stem, 4 stages of (depthwise 7×7 → LN →
4× pointwise → GELU → pointwise → layer-scale) blocks with stochastic
depth, LN-normalized multi-scale outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    drop_path_rate: float = 0.4
    layer_scale_init: float = 1e-6
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Any = None  # conv/matmul compute dtype (params/norms stay f32)

    @classmethod
    def variant(cls, name: str) -> "ConvNeXtConfig":
        table = {
            "convnext_tiny": cls(),
            "convnext_small": cls(depths=(3, 3, 27, 3)),
            "convnext_base": cls(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
            "convnext_large": cls(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
            "convnext_xlarge_22k": cls(
                depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)
            ),
        }
        if name not in table:
            raise KeyError(f"unknown convnext variant {name}")
        return table[name]

    def num_channels(self) -> Tuple[int, ...]:
        return tuple(self.dims[i] for i in self.out_indices)


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float
    layer_scale_init: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3)] * 2,
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        y = y * gamma
        if not deterministic and self.drop_path > 0:
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1)
            )
            y = y * mask / keep
        return x + y


class ConvNeXt(nn.Module):
    cfg: ConvNeXtConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        dpr = np.linspace(0, c.drop_path_rate, sum(c.depths)).tolist()
        y = nn.Conv(c.dims[0], (4, 4), strides=(4, 4), dtype=c.dtype,
                    name="stem")(x)
        y = nn.LayerNorm(epsilon=1e-5, name="stem_norm")(y)
        outs = []
        blk = 0
        for stage, depth in enumerate(c.depths):
            if stage > 0:
                y = nn.LayerNorm(epsilon=1e-5, name=f"down_norm{stage}")(y)
                y = nn.Conv(
                    c.dims[stage], (2, 2), strides=(2, 2), dtype=c.dtype,
                    name=f"down{stage}"
                )(y)
            for i in range(depth):
                y = ConvNeXtBlock(
                    c.dims[stage], dpr[blk], c.layer_scale_init, dtype=c.dtype,
                    name=f"stage{stage}_block{i}",
                )(y, deterministic)
                blk += 1
            if stage in c.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(y))
        return tuple(outs)
