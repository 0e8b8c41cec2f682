"""Host input-pipeline throughput at production settings (VERDICT r3 #3).

Generates a synthetic JPEG corpus at LVIS-like sizes (LVIS = COCO images;
typical 640-max-side JPEGs) with an LVIS-like annotation density (~11
instances/image), then drives the PRODUCTION pipeline — CocoIndex →
DetectionDataset → make_train_transform (multi-scale resize / crop / flip /
normalize, configs/richsem/base_data_aug.py) → threaded DataLoader with the
shipped canvas buckets and max_gt — and reports sustained images/sec.

The reference feeds GPUs with multi-process torch DataLoader workers
(/root/reference/util/misc.py:286-290, main.py:250-266); this measures our
cv2-thread-pool replacement (richsem_tpu/data/loader.py) on this host.

Prints ONE JSON line: host img/s, per-core img/s, cores, and the ratio to
the chip's train rate (pass --chip-rate, default 5.0 img/s).

Usage: python tools/bench_input_pipeline.py [--images N] [--threads T]
           [--chip-rate R]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

# LVIS rides COCO images: max side 640, common aspect ratios
CORPUS_SIZES = [
    (480, 640), (640, 480), (427, 640), (640, 427), (612, 612),
    (426, 640), (640, 426), (375, 500), (500, 375), (480, 640),
]
ANNS_PER_IMAGE = 11  # LVIS v1 train mean 11.2
NUM_CLASSES = 1203


def make_corpus(root: str, n_images: int, seed: int = 0) -> str:
    """Write n JPEGs + a COCO-format annotation json; returns ann path."""
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        h, w = CORPUS_SIZES[i % len(CORPUS_SIZES)]
        # smooth noise: JPEG-decode cost sits between flat and white noise,
        # like natural images
        base = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)
        fname = f"{i:08d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append({"id": i + 1, "file_name": fname, "height": h,
                       "width": w})
        for _ in range(ANNS_PER_IMAGE):
            x = float(rng.uniform(0, w * 0.7))
            y = float(rng.uniform(0, h * 0.7))
            bw = float(rng.uniform(8, w - x))
            bh = float(rng.uniform(8, h - y))
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": int(rng.integers(0, NUM_CLASSES)),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"c{c}"} for c in range(NUM_CLASSES)],
    }
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path


class _SeqSampler:
    def __init__(self, n):
        self.n = n

    def epoch_indices(self, epoch):
        return np.arange(self.n)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=400)
    ap.add_argument("--threads", type=int,
                    default=int(os.environ.get("BENCH_PIPE_THREADS", "8")))
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--chip-rate", type=float, default=5.0,
                    help="train img/s/chip to compare against (BENCH_r04)")
    args = ap.parse_args()

    from richsem_tpu.config import Config
    from richsem_tpu.data.datasets import CocoIndex, DetectionDataset
    from richsem_tpu.data.loader import DataLoader
    from richsem_tpu.data.transforms import make_train_transform

    cfg = Config.fromfile("configs/richsem/richsem_4scale_lvis.py")
    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        ann_path = make_corpus(root, args.images)
        gen_s = time.time() - t0

        tf = make_train_transform(
            cfg.data_aug_scales, cfg.data_aug_max_size,
            cfg.data_aug_scales2_resize, tuple(cfg.data_aug_scales2_crop),
        )
        ds = DetectionDataset(
            os.path.join(root, "imgs"), CocoIndex(ann_path), tf,
            is_train=True,
        )
        loader = DataLoader(
            ds, _SeqSampler(len(ds)), batch_size=args.batch,
            buckets=cfg.train_canvas_buckets, max_gt=cfg.max_gt_per_image,
            num_threads=args.threads, prefetch=4,
        )
        # warmup epoch slice: first touches (imports, jpeg tables)
        it = loader.epoch(0)
        n_warm = 5
        for _ in range(n_warm):
            next(it)
        t0 = time.time()
        n_imgs = 0
        for batch in it:
            n_imgs += batch["images"].shape[0]
        dt = time.time() - t0
        rate = n_imgs / dt
        cores = len(os.sched_getaffinity(0))
        print(json.dumps({
            "metric": "host input pipeline images/sec (decode+aug+collate, "
                      "production train transform + canvas buckets)",
            "value": round(rate, 2),
            "unit": "images/sec",
            "cores": cores,
            "per_core": round(rate / cores, 2),
            "threads": args.threads,
            "images": n_imgs,
            "corpus_gen_s": round(gen_s, 1),
            "chip_rate": args.chip_rate,
            "ratio_to_chip": round(rate / args.chip_rate, 2),
        }))


if __name__ == "__main__":
    main()
