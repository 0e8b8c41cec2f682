"""RichSem-TPU: a TPU-native (JAX/XLA/Pallas/pjit) detection framework.

A ground-up rebuild of the capabilities of MengLcool/RichSem (NeurIPS 2023,
arXiv 2310.12152): a DINO-style deformable-DETR detector for long-tailed LVIS
detection with a frozen CLIP teacher providing open-vocabulary classification
and training-time semantic distillation.

Reference parity map lives in SURVEY.md at the repo root; individual modules
cite the reference files (``/root/reference/<file>:<line>``) whose behavior
they re-implement TPU-first.
"""

__version__ = "0.1.0"
