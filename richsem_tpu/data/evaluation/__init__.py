from richsem_tpu.data.evaluation.detection_eval import (
    CocoEvaluator,
    DetectionEvaluator,
    LvisEvaluator,
)

__all__ = ["DetectionEvaluator", "CocoEvaluator", "LvisEvaluator"]
