from richsem_tpu.data.datasets import build_dataset

__all__ = ["build_dataset"]
