import random

import numpy as np

from richsem_tpu.data.transforms import mosaic_compose


def _rec(h, w, color, n_boxes=1, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), color, np.uint8)
    boxes = []
    for _ in range(n_boxes):
        bw, bh = int(rng.integers(10, w // 2)), int(rng.integers(10, h // 2))
        x, y = int(rng.integers(0, w - bw)), int(rng.integers(0, h - bh))
        boxes.append([x, y, x + bw, y + bh])
    boxes = np.asarray(boxes, np.float32)
    return {
        "image": img,
        "boxes": boxes,
        "labels": np.arange(n_boxes, dtype=np.int64),
        "area": (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
        "iscrowd": np.zeros(n_boxes, np.int64),
        "image_id": 0,
        "orig_size": (h, w),
    }


def test_mosaic_canvas_and_boxes():
    rng = random.Random(0)
    recs = [_rec(100, 120, c, 2, s) for s, c in enumerate((30, 80, 150, 220))]
    out = mosaic_compose(recs, rng, img_scale=(128, 128))
    assert out["image"].shape == (256, 256, 3)
    assert out["size"] == (256, 256)
    b = out["boxes"]
    assert len(b) >= 4  # most boxes survive
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 256).all()
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
    assert len(out["labels"]) == len(b)


def test_mosaic_box_content_alignment():
    """A box drawn as a colored block lands where the box says it is."""
    rng = random.Random(1)
    recs = []
    for s, c in enumerate((40, 90, 160, 210)):
        r = _rec(100, 100, c, 1, s + 10)
        x0, y0, x1, y1 = r["boxes"][0].astype(int)
        r["image"][y0:y1, x0:x1] = 255  # paint the object white
        recs.append(r)
    out = mosaic_compose(recs, rng, img_scale=(128, 128))
    img, boxes = out["image"], out["boxes"]
    for b in boxes:
        x0, y0, x1, y1 = b.astype(int)
        patch = img[y0:y1, x0:x1]
        if patch.size == 0:
            continue
        # the object region should be mostly white (resizing blurs edges)
        assert (patch == 255).mean() > 0.5


def test_mosaic_empty_boxes_ok():
    rng = random.Random(2)
    recs = [_rec(64, 64, 50, 1, s) for s in range(4)]
    for r in recs:
        r["boxes"] = np.zeros((0, 4), np.float32)
        r["labels"] = np.zeros((0,), np.int64)
        r["area"] = np.zeros((0,), np.float32)
        r["iscrowd"] = np.zeros((0,), np.int64)
    out = mosaic_compose(recs, rng, img_scale=(64, 64))
    assert out["boxes"].shape == (0, 4)
