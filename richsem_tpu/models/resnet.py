"""ResNet backbone with frozen batch-norm (flax.linen, NHWC).

Capability parity with the reference backbone
(models/richsem/backbone.py:20-158): torchvision-style ResNet-50/101 whose
BatchNorm layers are *frozen affine* transforms (``FrozenBatchNorm2d``,
backbone.py:20-56), returning C3/C4/C5 (strides 8/16/32, channels
512/1024/2048) plus per-level padding masks. TPU-first differences:

* channel-last (NHWC) layout throughout — the native TPU conv layout;
* parameter "freezing" (stem+layer1 unless a 21k-pretrained init is used,
  backbone.py:63-80) is not module state: it is an optimizer partition
  (see richsem_tpu/train/optim.py), keeping the model purely functional;
* the bottleneck keeps torchvision v1.5 geometry (stride on the 3×3) so
  converted torchvision / IN-21k checkpoints are drop-in
  (tools/convert_resnet.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with statistics and affine params fixed at init.

    All four tensors live in params (so checkpoints can load them) but the
    optimizer masks them out — they never train, matching the reference's
    FrozenBatchNorm2d semantics (backbone.py:20-56, eps folded the same way).
    The folded scale/shift are computed in f32 then applied in the input's
    dtype so a bf16 backbone stays bf16 through the norm.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        w = scale / jnp.sqrt(var + self.eps)
        return x * w.astype(x.dtype) + (bias - mean * w).astype(x.dtype)


class Bottleneck(nn.Module):
    """torchvision-v1.5 bottleneck: 1×1 → 3×3(stride) → 1×1, expansion 4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    dtype: Any = None  # conv compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = FrozenBatchNorm(out_ch, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(
                out_ch,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Returns features at the requested strides.

    ``return_strides`` defaults to (8, 16, 32) — C3, C4, C5, matching the
    reference's ``return_interm_indices=[1, 2, 3]`` (backbone.py:154-156).
    """

    block_counts: Sequence[int] = (3, 4, 6, 3)
    return_strides: Sequence[int] = (8, 16, 32)
    dilation_last: bool = False  # reference's `dilation` knob (stride-16 C5)
    dtype: Any = None  # conv compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        y = FrozenBatchNorm(64, name="stem_bn")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        dilations = (1, 1, 1, 1)
        if self.dilation_last:
            strides = (1, 2, 2, 1)
            dilations = (1, 1, 1, 2)
        out_stride = 4
        for stage, (n_blocks, p, s, d) in enumerate(
            zip(self.block_counts, planes, strides, dilations)
        ):
            for b in range(n_blocks):
                y = Bottleneck(
                    planes=p,
                    stride=s if b == 0 else 1,
                    downsample=(b == 0),
                    dilation=d,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(y)
            out_stride *= s
            feats[out_stride] = y
        return tuple(feats[s] for s in self.return_strides)
