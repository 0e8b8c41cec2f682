# RichSem R50 4-scale, LVIS + ImageNet-LVIS, 24 epochs.
# Matches the reference headline recipe (reference
# config/RichSem/richsem_4scale.py:1-15): CLIP-RN50 open-vocab classifier +
# visual distillation + mixed weak-label training.
_base_ = ["dino_4scale_lvis.py"]

epochs = 24
lr_drop = 20

use_language = True
use_visual_distill = True
distill_type = "clip_logits"
clip_distill_objective = "gt"
distill_loss_coef = 0.5
use_dynamic_distill_weight = False

use_imagenet = True
imagenet_use_mosaic = True

clip_model = "RN50"
resnet_pretrain_path = ""
