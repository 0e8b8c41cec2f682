from richsem_tpu.models.clip.model import CLIP, CLIPConfig

__all__ = ["CLIP", "CLIPConfig"]
