"""Detection visualization.

Capability parity with the reference's visualizers (util/visualizer.py /
util/vis_utils.py): draw predicted/GT boxes with class names and scores on
an image and save to disk — cv2-based, no matplotlib dependency.
"""

from __future__ import annotations

import colorsys
from typing import Dict, Optional, Sequence

import cv2
import numpy as np


def _color(cid: int):
    h = (cid * 0.618033988749895) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.65, 0.95)
    return int(b * 255), int(g * 255), int(r * 255)  # BGR


def draw_detections(
    image: np.ndarray,  # HWC uint8 RGB
    boxes: np.ndarray,  # [N, 4] xyxy pixels
    labels: np.ndarray,  # [N]
    scores: Optional[np.ndarray] = None,
    class_names: Optional[Dict[int, str]] = None,
    score_thresh: float = 0.3,
    thickness: int = 2,
) -> np.ndarray:
    """→ BGR uint8 image with boxes drawn (ready for cv2.imwrite)."""
    canvas = cv2.cvtColor(np.ascontiguousarray(image), cv2.COLOR_RGB2BGR)
    for i in range(len(boxes)):
        s = float(scores[i]) if scores is not None else 1.0
        if s < score_thresh:
            continue
        x0, y0, x1, y1 = [int(v) for v in boxes[i]]
        cid = int(labels[i])
        color = _color(cid)
        cv2.rectangle(canvas, (x0, y0), (x1, y1), color, thickness)
        name = (class_names or {}).get(cid, str(cid))
        text = f"{name} {s:.2f}" if scores is not None else name
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(canvas, (x0, y0 - th - 4), (x0 + tw + 2, y0), color, -1)
        cv2.putText(canvas, text, (x0 + 1, y0 - 3), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (255, 255, 255), 1, cv2.LINE_AA)
    return canvas


def save_detections(path: str, image, boxes, labels, scores=None, **kw) -> None:
    cv2.imwrite(path, draw_detections(image, boxes, labels, scores, **kw))
