"""Class-name persistence inside checkpoints.

Mirrors /root/reference/util/misc.py:198-232: class names ride in the weight
file as an integer array (codepoints, '|'-separated) so eval/inference can
label outputs without the dataset. Stored under the ``_classes_`` key of the
npz checkpoint (main.py:151-153 registers the analogous buffer).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

COCO_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
)


def encode_labels(names: Sequence[str]) -> np.ndarray:
    joined = "|".join(names)
    return np.asarray([ord(c) for c in joined], np.int32)


def decode_labels(encoded: np.ndarray) -> Tuple[str, ...]:
    return tuple("".join(chr(int(c)) for c in encoded).split("|"))


def load_class_names(checkpoint_path: str):
    """Read the ``_classes_`` entry from an npz checkpoint, or None."""
    path = checkpoint_path if checkpoint_path.endswith(".npz") else checkpoint_path + ".npz"
    archive = np.load(path)
    if "_classes_" in archive:
        return decode_labels(archive["_classes_"])
    return None
