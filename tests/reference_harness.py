"""Import-and-wire harness for the reference torch detector (CPU).

Loads `/root/reference`'s DeformableTransformer WITHOUT its heavy deps:
the package __init__ chain (models → models.richsem → richsem.py) pulls in
torchvision / detectron2 / clip / timm, none of which exist in this image,
so namespace-only package stubs are registered and the needed submodules
are loaded by file path. The CUDA extension is replaced by the reference's
own pure-torch oracle (`ms_deform_attn_core_pytorch`,
ops/functions/ms_deform_attn_func.py:41-61).

`build_reference_detector` then reproduces DINO's head wiring
(richsem.py:294-317 input projections, :330-382 shared bbox/class embeds,
:397-422 enc-out heads) for the closed-vocab + enc_cls_agn configuration —
the one configuration whose reference modules are CLIP-free — and
`reference_forward` replays the eval forward (richsem.py:593-811).

This file is TEST GLUE: it calls reference code, it does not copy it.
"""

from __future__ import annotations

import copy
import sys
import types

REF = "/root/reference"


def _ensure_stub_packages():
    if "models.richsem.deformable_transformer" in sys.modules:
        return
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # torchvision stub: util/misc.py imports it at module level (only for a
    # <0.7 compat shim and tracing helpers we never call)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.15.0"
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops_misc = types.ModuleType("torchvision.ops.misc")
        tv.ops = tv_ops
        tv_ops.misc = tv_ops_misc
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.ops.misc"] = tv_ops_misc
    # the CUDA pybind module: never called once MSDeformAttnFunction is
    # patched, but ms_deform_attn_func.py imports it at module level
    if "MultiScaleDeformableAttention" not in sys.modules:
        sys.modules["MultiScaleDeformableAttention"] = types.ModuleType(
            "MultiScaleDeformableAttention"
        )
    # namespace-only parents so `models.richsem.*` submodules import without
    # executing models/__init__.py (which drags in torchvision/detectron2/clip)
    for name, path in (
        ("models", f"{REF}/models"),
        ("models.richsem", f"{REF}/models/richsem"),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg


def load_reference_transformer_module():
    _ensure_stub_packages()
    import importlib

    dt = importlib.import_module("models.richsem.deformable_transformer")
    msda_mod = importlib.import_module(
        "models.richsem.ops.modules.ms_deform_attn"
    )
    func_mod = importlib.import_module(
        "models.richsem.ops.functions.ms_deform_attn_func"
    )

    class _CoreTorchShim:
        """Routes the CUDA autograd Function to the reference's own
        grid_sample oracle (ms_deform_attn_func.py:41-61)."""

        @staticmethod
        def apply(value, shapes, level_start_index, sampling_locations,
                  attention_weights, im2col_step):
            return func_mod.ms_deform_attn_core_pytorch(
                value, shapes, sampling_locations, attention_weights
            )

    msda_mod.MSDeformAttnFunction = _CoreTorchShim
    return dt


def make_args(hidden_dim=64, nheads=4, enc_layers=2, dec_layers=2,
              dim_feedforward=128, num_queries=12, num_feature_levels=4,
              enc_n_points=4, dec_n_points=4):
    return types.SimpleNamespace(
        hidden_dim=hidden_dim, dropout=0.0, nheads=nheads,
        num_queries=num_queries, dim_feedforward=dim_feedforward,
        enc_layers=enc_layers, unic_layers=0, dec_layers=dec_layers,
        pre_norm=False, query_dim=4, transformer_activation="relu",
        num_patterns=0, num_feature_levels=num_feature_levels,
        enc_n_points=enc_n_points, dec_n_points=dec_n_points,
        use_deformable_box_attn=False, box_attn_type="roi_align",
        decoder_layer_noise=False, random_refpoints_xy=False,
        add_channel_attention=False, add_pos_value=False,
        two_stage_type="standard", two_stage_pat_embed=0,
        two_stage_add_query_num=0, two_stage_learn_wh=False,
        two_stage_keep_all_tokens=False, dec_layer_number=None,
        decoder_sa_type="sa", decoder_module_seq=["sa", "ca", "ffn"],
        embed_init_tgt=True, attn_label_enc=False,
        pe_temperatureH=20, pe_temperatureW=20,
    )


def build_reference_detector(args, num_classes, backbone_channels=(512, 1024, 2048),
                             seed=0):
    """→ (transformer, input_projs, class_linear, pos_module) — the DINO
    wiring for closed-vocab + enc_cls_agn (richsem.py:294-422)."""
    import math

    import torch
    import torch.nn as nn

    dt = load_reference_transformer_module()
    import importlib

    utils_mod = importlib.import_module("models.richsem.utils")
    pe_mod = importlib.import_module("models.richsem.position_encoding")

    torch.manual_seed(seed)
    tf = dt.build_deformable_transformer(args)

    h = args.hidden_dim
    # input projections (richsem.py:294-317)
    projs = []
    for ch in backbone_channels:
        projs.append(nn.Sequential(
            nn.Conv2d(ch, h, kernel_size=1), nn.GroupNorm(32, h)))
    for extra in range(args.num_feature_levels - len(backbone_channels)):
        in_ch = backbone_channels[-1] if extra == 0 else h
        projs.append(nn.Sequential(
            nn.Conv2d(in_ch, h, kernel_size=3, stride=2, padding=1),
            nn.GroupNorm(32, h)))
    input_projs = nn.ModuleList(projs)
    for proj in input_projs:  # xavier + zero bias (richsem.py:448-452)
        nn.init.xavier_uniform_(proj[0].weight, gain=1)
        nn.init.constant_(proj[0].bias, 0)

    # shared heads (richsem.py:330-382)
    bias_value = -math.log((1 - 0.01) / 0.01)
    _bbox_embed = utils_mod.MLP(h, h, 4, 3)
    nn.init.constant_(_bbox_embed.layers[-1].weight.data, 0)
    nn.init.constant_(_bbox_embed.layers[-1].bias.data, 0)
    _class_embed = nn.Linear(h, num_classes)
    _class_embed.bias.data = torch.ones(num_classes) * bias_value
    tf.decoder.bbox_embed = nn.ModuleList([_bbox_embed] * args.dec_layers)
    tf.decoder.class_embed = nn.ModuleList([_class_embed] * args.dec_layers)
    # enc-out heads: bbox deepcopy (share=False), class Linear (enc_cls_agn)
    tf.enc_out_bbox_embed = copy.deepcopy(_bbox_embed)
    enc_cls = nn.Linear(h, num_classes)
    enc_cls.bias.data = torch.ones(num_classes) * bias_value
    tf.enc_out_class_embed = enc_cls
    tf.label_enc = nn.Embedding(num_classes + 1, h)  # unused (no DN)

    pos_module = pe_mod.PositionEmbeddingSineHW(
        h // 2, temperatureH=args.pe_temperatureH,
        temperatureW=args.pe_temperatureW, normalize=True,
    )
    # randomize every weight that has a torch default init of zeros-adjacent
    # values already handled above; reseed dense inits for variety
    return tf, input_projs, _class_embed, pos_module


def reference_forward(tf, input_projs, class_embed, pos_module, feats, mask):
    """Eval forward from backbone features (richsem.py:593-811, no DN)."""
    import torch
    import torch.nn.functional as F

    from util.misc import NestedTensor, inverse_sigmoid

    srcs, masks, poss = [], [], []
    n_backbone = len(feats)
    for l, feat in enumerate(feats):
        m = F.interpolate(mask[None].float(), size=feat.shape[-2:]).to(torch.bool)[0]
        srcs.append(input_projs[l](feat))
        masks.append(m)
        poss.append(pos_module(NestedTensor(srcs[-1], m)))
    for l in range(n_backbone, len(input_projs)):
        src = input_projs[l](feats[-1] if l == n_backbone else srcs[-1])
        m = F.interpolate(mask[None].float(), size=src.shape[-2:]).to(torch.bool)[0]
        srcs.append(src)
        masks.append(m)
        poss.append(pos_module(NestedTensor(src, m)))

    hs, reference, hs_enc, ref_enc, init_box_proposal, _ = tf(
        srcs, masks, None, poss, None, None
    )
    outputs_coords = []
    for ref_sig, bbox_embed, layer_hs in zip(
        reference[:-1], tf.decoder.bbox_embed, hs
    ):
        delta = bbox_embed(layer_hs)
        outputs_coords.append((delta + inverse_sigmoid(ref_sig)).sigmoid())
    outputs_class = [class_embed(h) for h in hs]
    interm_class = tf.enc_out_class_embed(hs_enc[-1])
    return {
        "hs": [h.detach().numpy() for h in hs],
        "references": [r.detach().numpy() for r in reference],
        "pred_logits": outputs_class[-1].detach().numpy(),
        "pred_boxes": outputs_coords[-1].detach().numpy(),
        "aux": [
            (c.detach().numpy(), b.detach().numpy())
            for c, b in zip(outputs_class[:-1], outputs_coords[:-1])
        ],
        "interm_logits": interm_class.detach().numpy(),
        "interm_boxes": ref_enc[-1].detach().numpy(),
        "init_box_proposal": init_box_proposal.detach().numpy(),
    }
