"""Box visualization (cv2).

Mirrors /root/reference/util/visualize.py:69-377: per-class colors, filled
alpha boxes, score labels.
"""
from __future__ import annotations

from typing import Optional, Sequence

import cv2
import numpy as np


def _class_color(label: int) -> tuple:
    rng = np.random.RandomState(int(label) * 7919 + 13)
    return tuple(int(c) for c in rng.randint(64, 255, 3))


def plot_bounding_boxes_on_image(
    image_bgr: np.ndarray,
    boxes_xyxy: np.ndarray,
    scores: np.ndarray,
    labels: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    alpha: float = 0.2,
    thickness: int = 2,
) -> np.ndarray:
    out = image_bgr.copy()
    overlay = image_bgr.copy()
    for box, score, label in zip(boxes_xyxy, scores, labels):
        color = _class_color(int(label))
        x0, y0, x1, y1 = [int(round(float(v))) for v in box]
        cv2.rectangle(overlay, (x0, y0), (x1, y1), color, -1)
        cv2.rectangle(out, (x0, y0), (x1, y1), color, thickness)
        name = (
            class_names[int(label)]
            if class_names and 0 <= int(label) < len(class_names)
            else str(int(label))
        )
        text = f"{name}: {float(score):.2f}"
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(out, (x0, y0 - th - 4), (x0 + tw, y0), color, -1)
        cv2.putText(out, text, (x0, y0 - 2), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (255, 255, 255), 1, cv2.LINE_AA)
    return cv2.addWeighted(overlay, alpha, out, 1 - alpha, 0)
