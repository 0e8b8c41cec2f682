"""Side data utilities: TSV dataset, SSD-style random crop, local staging.

Capability parity with the reference's misc data helpers, rebuilt for this
framework's host pipeline (numpy records in, static buckets out):

* ``TsvFile`` / ``tsv_records`` — the reference's ``TSVDataset``
  (datasets/dataset.py:13-44) reads rows of a tab-separated file whose last
  column is a base64-encoded image and whose second column is a class id
  (ImageNet-style). Its ``TSVFile`` backend (``datasets/tsv_io.py``) is
  absent from the reference repo — the class cannot actually run there —
  so this is a fresh implementation of the standard .tsv + .lineidx
  layout: a sidecar file of byte offsets enables O(1) random row access
  (built on first use when missing).
* ``ssd_random_crop`` — the SSD IoU-constrained crop
  (datasets/random_crop.py:49-134): sample a minimum-IoU mode from
  {0.1, 0.3, 0.5, 0.9, keep}, try up to 50 crops of [0.3, 1]x dims with
  aspect in [0.5, 2], require max-IoU(crop, boxes) over the threshold,
  keep boxes whose CENTER is inside the crop, clip them to the crop.
* ``prepare_local_dataset`` — the copy-to-local-disk staging helper
  (datasets/data_util.py:100-169): copy files/trees (skip existing) or
  copy+unzip ``.zip`` sources, returning the list of created paths for
  end-of-run cleanup. Multi-host: only process 0 copies; others wait on a
  jax multihost barrier when distributed is initialized.
"""

from __future__ import annotations

import base64
import io
import os
import shutil
import zipfile
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# TSV dataset
# ---------------------------------------------------------------------------
class TsvFile:
    """Random access over a tab-separated file via a .lineidx sidecar."""

    def __init__(self, tsv_path: str):
        self.tsv_path = tsv_path
        self.lineidx_path = os.path.splitext(tsv_path)[0] + ".lineidx"
        if not os.path.exists(self.lineidx_path):
            self._build_lineidx()
        with open(self.lineidx_path) as f:
            self._offsets = [int(line) for line in f if line.strip()]
        self._fp = None

    def _build_lineidx(self) -> None:
        offsets = []
        with open(self.tsv_path, "rb") as f:
            pos = 0
            for line in f:
                offsets.append(pos)
                pos += len(line)
        tmp = self.lineidx_path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(str(o) for o in offsets))
        os.replace(tmp, self.lineidx_path)

    def num_rows(self) -> int:
        return len(self._offsets)

    def seek(self, index: int) -> List[str]:
        if self._fp is None:
            self._fp = open(self.tsv_path, "rb")
        self._fp.seek(self._offsets[index])
        return self._fp.readline().decode("utf-8").rstrip("\n").split("\t")

    def __len__(self) -> int:
        return self.num_rows()

    def close(self) -> None:
        if self._fp is not None:
            self._fp.close()
            self._fp = None


def tsv_row_to_record(
    row: Sequence[str], label_map: Optional[Dict[int, int]] = None
) -> Dict:
    """One TSV row → a detection record (whole-image box, like
    ImagenetDetection): ``{"image" [H,W,3] uint8, "labels", "boxes"
    (normalized cxcywh), "is_extra": True}``."""
    from PIL import Image

    image = Image.open(io.BytesIO(base64.b64decode(row[-1]))).convert("RGB")
    arr = np.asarray(image, np.uint8)
    cls = int(row[1])
    if label_map is not None:
        cls = label_map.get(cls, -1)
    if cls >= 0:
        labels = np.asarray([cls], np.int64)
        boxes = np.asarray([[0.5, 0.5, 1.0, 1.0]], np.float32)
    else:  # unmapped class: unlabeled whole image (lvis.py:210-215)
        labels = np.zeros((0,), np.int64)
        boxes = np.zeros((0, 4), np.float32)
    return {
        "image": arr,
        "labels": labels,
        "boxes": boxes,
        "is_extra": True,
    }


def tsv_records(
    tsv_path: str, label_map: Optional[Dict[int, int]] = None
) -> Iterator[Dict]:
    """Iterate a whole TSV as detection records (host-side)."""
    tsv = TsvFile(tsv_path)
    try:
        for i in range(len(tsv)):
            yield tsv_row_to_record(tsv.seek(i), label_map)
    finally:
        tsv.close()


# ---------------------------------------------------------------------------
# SSD-style IoU-constrained random crop
# ---------------------------------------------------------------------------
def _iou_one_to_many(crop: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    lt = np.maximum(crop[:2], boxes[:, :2])
    rb = np.minimum(crop[2:], boxes[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    a1 = (crop[2] - crop[0]) * (crop[3] - crop[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a1 + a2 - inter, 1e-9)


def ssd_random_crop(
    image: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    rng: np.random.Generator,
    max_tries: int = 50,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SSD random crop (random_crop.py:49-134 protocol).

    ``image`` [H, W, C]; ``boxes`` xyxy pixels; returns the (possibly)
    cropped triple. Modes match the reference: a minimum-IoU drawn from
    {0.1, 0.3, 0.5, 0.9, None=keep}; 50 attempts of [0.3, 1]-scaled crops
    with aspect ratio in [0.5, 2]; a crop is accepted when the best
    box-IoU exceeds the mode; boxes survive iff their center lies inside
    the crop, then are clipped and shifted.
    """
    h, w = image.shape[:2]
    while True:
        mode = rng.choice(np.asarray([0.1, 0.3, 0.5, 0.9, np.nan]))
        if np.isnan(mode):
            return image, boxes, labels
        for _ in range(max_tries):
            new_h = rng.uniform(0.3 * h, h)
            new_w = rng.uniform(0.3 * w, w)
            if not (0.5 <= new_h / new_w <= 2.0):
                continue
            left = rng.uniform(0, w - new_w)
            top = rng.uniform(0, h - new_h)
            crop = np.asarray(
                [int(left), int(top), int(left + new_w), int(top + new_h)],
                np.float32,
            )
            if len(boxes) == 0:
                continue
            overlap = _iou_one_to_many(crop, boxes.astype(np.float32))
            if overlap.max() < mode:
                continue
            centers = (boxes[:, :2] + boxes[:, 2:]) / 2.0
            keep = (
                (centers[:, 0] > crop[0]) & (centers[:, 0] < crop[2])
                & (centers[:, 1] > crop[1]) & (centers[:, 1] < crop[3])
            )
            if not keep.any():
                continue
            x0, y0, x1, y1 = crop.astype(int)
            new_image = image[y0:y1, x0:x1]
            new_boxes = boxes[keep].astype(np.float32).copy()
            new_boxes[:, :2] = np.maximum(new_boxes[:, :2], crop[:2]) - crop[:2]
            new_boxes[:, 2:] = np.minimum(new_boxes[:, 2:], crop[2:]) - crop[:2]
            return new_image, new_boxes, labels[keep]


# ---------------------------------------------------------------------------
# local dataset staging
# ---------------------------------------------------------------------------
def _check_and_copy(src: str, dst: str) -> Optional[str]:
    """Copy file or tree unless dst exists (data_util.py:103-107)."""
    if os.path.exists(dst):
        return None
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    if os.path.isdir(src):
        shutil.copytree(src, dst, copy_function=shutil.copyfile)
    else:
        shutil.copyfile(src, dst)
    return dst


def prepare_local_dataset(
    pathdict: Dict[str, str],
    static_paths: Dict[str, str],
    is_main_process: bool = True,
    barrier=None,
) -> Optional[List[str]]:
    """Stage remote/shared dataset files onto local disk before training
    (data_util.py:117-169). ``pathdict`` maps keys → local target paths;
    ``static_paths`` maps the same keys → source paths (the reference
    reads these from util/static_data_path.py). ``.zip`` sources are
    copied then extracted next to the target. Returns the created paths
    (for cleanup) or None if nothing was copied. Non-main processes skip
    the copy and only synchronize on ``barrier`` (e.g.
    ``multihost_utils.sync_global_devices``)."""
    copied: List[str] = []
    if is_main_process:
        for key, tgt in pathdict.items():
            src = static_paths[key]
            if src.endswith(".zip"):
                cp_dir = os.path.dirname(tgt)
                cp_path = os.path.join(cp_dir, os.path.basename(src))
                if _check_and_copy(src, cp_path):
                    copied.append(cp_path)
                with zipfile.ZipFile(cp_path, "r") as zf:
                    zf.extractall(cp_dir or ".")
                copied.append(tgt)
            else:
                if _check_and_copy(src, tgt):
                    copied.append(tgt)
    if barrier is not None:
        barrier()
    return copied or None
