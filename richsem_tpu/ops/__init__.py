from richsem_tpu.ops.ms_deform_attn import (
    ms_deform_attn,
    ms_deform_attn_reference_np,
)

__all__ = ["ms_deform_attn", "ms_deform_attn_reference_np"]
