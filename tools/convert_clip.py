"""Convert an OpenAI CLIP checkpoint (.pt) to a richsem_tpu param pickle.

Usage:
  python tools/convert_clip.py RN50.pt clip_rn50_params.pkl

Replaces the reference's runtime torch-side loading (clip/clip.py:94-194 +
clip/model.py:446-483 ``build_model`` state-dict sniffing): the conversion
runs once offline with torch-cpu; the framework then loads a pure pickle of
numpy arrays shaped for the flax modules in richsem_tpu/models/clip/model.py.
"""

from __future__ import annotations

import pickle
import sys
from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    return x.detach().cpu().float().numpy()


def _conv(w) -> np.ndarray:  # OIHW -> HWIO
    return _t(w).transpose(2, 3, 1, 0)


def _dense(w) -> np.ndarray:  # [out, in] -> [in, out]
    return _t(w).T


def _bn(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }


def _mha(sd, prefix, width, heads) -> Dict:
    """torch nn.MultiheadAttention → flax MultiHeadDotProductAttention."""
    hd = width // heads
    w = _t(sd[f"{prefix}.in_proj_weight"])  # [3W, W]
    b = _t(sd[f"{prefix}.in_proj_bias"])
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        out[name] = {
            "kernel": w[i * width : (i + 1) * width].T.reshape(width, heads, hd),
            "bias": b[i * width : (i + 1) * width].reshape(heads, hd),
        }
    out["out"] = {
        "kernel": _t(sd[f"{prefix}.out_proj.weight"]).T.reshape(heads, hd, width),
        "bias": _t(sd[f"{prefix}.out_proj.bias"]),
    }
    return out


def _ln(sd, prefix) -> Dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_rn50_visual(sd) -> Dict:
    out = {}
    for i in (1, 2, 3):
        out[f"conv{i}"] = {"kernel": _conv(sd[f"visual.conv{i}.weight"])}
        out[f"bn{i}"] = _bn(sd, f"visual.bn{i}")
    # sniff block counts from the state dict (clip/model.py:451-453
    # build_model does the same) so any ModifiedResNet depth converts
    layer_sizes = {
        li: len({
            k.split(".")[2]
            for k in sd
            if k.startswith(f"visual.layer{li}.")
        })
        for li in (1, 2, 3, 4)
    }
    for li, n in layer_sizes.items():
        for b in range(n):
            p = f"visual.layer{li}.{b}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {"kernel": _conv(sd[f"{p}.conv{ci}.weight"])}
                blk[f"bn{ci}"] = _bn(sd, f"{p}.bn{ci}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {"kernel": _conv(sd[f"{p}.downsample.0.weight"])}
                blk["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
            out[f"layer{li}_block{b}"] = blk
    ap = "visual.attnpool"
    out["attnpool"] = {
        "positional_embedding": _t(sd[f"{ap}.positional_embedding"]),
        "q_proj": {"kernel": _dense(sd[f"{ap}.q_proj.weight"]), "bias": _t(sd[f"{ap}.q_proj.bias"])},
        "k_proj": {"kernel": _dense(sd[f"{ap}.k_proj.weight"]), "bias": _t(sd[f"{ap}.k_proj.bias"])},
        "v_proj": {"kernel": _dense(sd[f"{ap}.v_proj.weight"]), "bias": _t(sd[f"{ap}.v_proj.bias"])},
        "c_proj": {"kernel": _dense(sd[f"{ap}.c_proj.weight"]), "bias": _t(sd[f"{ap}.c_proj.bias"])},
    }
    return out


def convert_vit_visual(sd) -> Dict:
    # sniff tower geometry from the state dict (clip/model.py:446-457
    # build_model parity): width from conv1's out channels, torch's
    # heads = width // 64 convention, layer count from the resblock keys
    width = sd["visual.conv1.weight"].shape[0]
    heads = width // 64
    layers = len({
        k.split(".")[3]
        for k in sd
        if k.startswith("visual.transformer.resblocks.")
    })
    out = {
        "conv1": {"kernel": _conv(sd["visual.conv1.weight"])},
        "class_embedding": _t(sd["visual.class_embedding"]),
        "positional_embedding": _t(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": _t(sd["visual.proj"]),
    }
    for i in range(layers):
        p = f"visual.transformer.resblocks.{i}"
        out[f"block{i}"] = {
            "ln_1": _ln(sd, f"{p}.ln_1"),
            "ln_2": _ln(sd, f"{p}.ln_2"),
            "attn": _mha(sd, f"{p}.attn", width, heads),
            "mlp_c_fc": {"kernel": _dense(sd[f"{p}.mlp.c_fc.weight"]), "bias": _t(sd[f"{p}.mlp.c_fc.bias"])},
            "mlp_c_proj": {"kernel": _dense(sd[f"{p}.mlp.c_proj.weight"]), "bias": _t(sd[f"{p}.mlp.c_proj.bias"])},
        }
    return out


def convert(state_dict) -> Dict:
    sd = state_dict
    is_vit = "visual.class_embedding" in sd
    width = sd["ln_final.weight"].shape[0]
    heads = width // 64
    layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}
    )
    params = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _t(sd["text_projection"]),
        "logit_scale": _t(sd["logit_scale"]),
        "visual": convert_vit_visual(sd) if is_vit else convert_rn50_visual(sd),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        params[f"text_block{i}"] = {
            "ln_1": _ln(sd, f"{p}.ln_1"),
            "ln_2": _ln(sd, f"{p}.ln_2"),
            "attn": _mha(sd, f"{p}.attn", width, heads),
            "mlp_c_fc": {"kernel": _dense(sd[f"{p}.mlp.c_fc.weight"]), "bias": _t(sd[f"{p}.mlp.c_fc.bias"])},
            "mlp_c_proj": {"kernel": _dense(sd[f"{p}.mlp.c_proj.weight"]), "bias": _t(sd[f"{p}.mlp.c_proj.bias"])},
        }
    return {"params": params}


def main():
    import torch

    src, dst = sys.argv[1], sys.argv[2]
    obj = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):  # jit archive
        sd = obj.state_dict()
    elif "state_dict" in obj:
        sd = obj["state_dict"]
    else:
        sd = obj
    params = convert(sd)
    with open(dst, "wb") as f:
        pickle.dump(params, f)
    n = sum(np.size(v) for v in _leaves(params))
    print(f"wrote {dst}: {n/1e6:.1f}M params")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
