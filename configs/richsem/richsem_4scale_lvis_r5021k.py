# RichSem R50(IN-21k init) 4-scale — the 40.1 AP recipe (reference
# config/RichSem/richsem_4scale_r5021k.py:1-3). The backbone initializes from
# a converted IN-21k ResNet-50 checkpoint and is fully finetuned.
_base_ = ["richsem_4scale_lvis.py"]

resnet_pretrain_path = "DATASET/pretrain_model_path/resnet50_miil_21k_pretrained.pth"
