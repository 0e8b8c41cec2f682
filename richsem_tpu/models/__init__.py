from richsem_tpu.models.registry import MODEL_REGISTRY, register_model

__all__ = ["MODEL_REGISTRY", "register_model"]
