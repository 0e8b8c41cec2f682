"""Convert a torchvision/timm ResNet-50/101 checkpoint to richsem_tpu params.

Usage:
  python tools/convert_resnet.py resnet50.pth backbone_params.pkl

Covers torchvision ``resnet50`` state dicts and the IN-21k
``resnet50_miil_21k_pretrained.pth`` (timm naming) the reference's
``richsem_4scale_r5021k`` recipe expects (reference backbone.py:102-158).
The output is a pickle of the flax ResNet param tree (see
richsem_tpu/models/resnet.py); load it with
``richsem_tpu.utils.checkpoint.load_pretrained_params`` scoped under
``params/backbone``.
"""

from __future__ import annotations

import pickle
import sys
from typing import Dict

import numpy as np


def _t(x):
    return x.detach().cpu().float().numpy()


def _conv(w):
    return _t(w).transpose(2, 3, 1, 0)


def _bn(sd, prefix):
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }


def convert(sd, block_counts=(3, 4, 6, 3)) -> Dict:
    # normalize timm naming (module./body. prefixes)
    sd = {k.replace("module.", "").replace("body.", ""): v for k, v in sd.items()}
    out = {
        "stem_conv": {"kernel": _conv(sd["conv1.weight"])},
        "stem_bn": _bn(sd, "bn1"),
    }
    for li, n in enumerate(block_counts, start=1):
        for b in range(n):
            p = f"layer{li}.{b}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {"kernel": _conv(sd[f"{p}.conv{ci}.weight"])}
                blk[f"bn{ci}"] = _bn(sd, f"{p}.bn{ci}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _conv(sd[f"{p}.downsample.0.weight"])
                }
                blk["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
            out[f"layer{li}_block{b}"] = blk
    return out


def main():
    import torch

    src, dst = sys.argv[1], sys.argv[2]
    obj = torch.load(src, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
    params = convert(sd)
    with open(dst, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
