# Data-augmentation scales shared by every RichSem-TPU recipe.
# Values match the reference recipe (reference config/RichSem/data_transformer.py:1-8).
data_aug_scales = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]
data_aug_max_size = 1333
data_aug_scales2_resize = [400, 500, 600]
data_aug_scales2_crop = [384, 600]
data_aug_scale_overlap = None

# --- TPU static-shape bucketing (no reference equivalent) ---------------
# Images are padded into one of these (H, W) canvases so every train step
# has a static shape; XLA compiles once per bucket. Buckets cover the
# aspect-ratio range produced by the multi-scale resize above.
train_canvas_buckets = [
    (896, 1344),   # landscape, shortest side <= 800 @ max 1333 (rounded /64)
    (1344, 896),   # portrait
    (1152, 1152),  # near-square (div 64 for the tiled msda path)
]
eval_canvas = (896, 1344)  # eval resize is fixed shortest-side 800 @ max 1333
size_divisibility = 32
# Padded ground-truth slots per image (validity-masked); LVIS p99 ~ 300.
max_gt_per_image = 300
