"""Model assembly: registry entry for 'richsem'.

Parity with ``build_richsem`` (models/richsem/richsem.py:1369-1533): builds
the DINO module, the loss weight matrix, and the postprocess config from a
merged config. The criterion itself is a pure function
(:mod:`richsem_tpu.models.criterion`) so "building" it means capturing its
static arguments.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

from richsem_tpu.models.criterion import build_weight_dict
from richsem_tpu.models.dino import DINO, DINOConfig
from richsem_tpu.models.registry import register_model


@register_model("richsem")
def build_richsem(cfg) -> Tuple[Any, Dict[str, float], Dict[str, Any]]:
    """→ (model_module, weight_dict, postprocess_kwargs)."""
    model = DINO(DINOConfig.from_config(cfg))
    weight_dict = build_weight_dict(cfg)
    post_kwargs = dict(
        num_select=cfg.num_select,
        nms_iou_threshold=cfg.nms_iou_threshold,
    )
    return model, weight_dict, post_kwargs
