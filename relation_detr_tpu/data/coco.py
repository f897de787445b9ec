"""COCO detection dataset (host-side).

Spec: /root/reference/datasets/coco.py (cv2 image loading with threads
disabled, xywh->xyxy + clamp + degenerate filtering per
/root/reference/transforms/convert_coco_polys_to_mask.py:7-101, train-time
removal of images without annotations at coco.py:98-133). pycocotools is not
available in this image, so annotation parsing is a small self-contained JSON
index; evaluation lives in utils/coco_eval.py.
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional

import cv2
import numpy as np

cv2.setNumThreads(0)  # avoid DataLoader/OpenCV thread deadlocks (coco.py:50-52)


class CocoDetection:
    def __init__(
        self,
        img_folder: str,
        ann_file: str,
        transforms=None,
        train: bool = False,
        class_agnostic: bool = False,
    ):
        """``class_agnostic`` collapses every category to id 1 — the SA-Det-100k
        evaluation protocol (/root/reference/README.md:74-77)."""
        self.img_folder = img_folder
        self.transforms = transforms
        self.train = train
        self.class_agnostic = class_agnostic
        with open(ann_file) as f:
            coco = json.load(f)
        self.images = {img["id"]: img for img in coco["images"]}
        self.anns_by_image: Dict[int, List[dict]] = defaultdict(list)
        for ann in coco.get("annotations", []):
            self.anns_by_image[ann["image_id"]].append(ann)
        self.categories = sorted(c["id"] for c in coco.get("categories", []))
        self.ids = sorted(self.images.keys())
        if train:
            self.ids = [i for i in self.ids if self._has_valid_anns(i)]

    def _prepare(self, img_id: int, height: int, width: int):
        """xywh -> clamped xyxy, drop crowd + degenerate boxes
        (convert_coco_polys_to_mask.py)."""
        boxes, labels = [], []
        for ann in self.anns_by_image.get(img_id, []):
            if ann.get("iscrowd", 0):
                continue
            x, y, w, h = ann["bbox"]
            x0 = min(max(x, 0), width)
            y0 = min(max(y, 0), height)
            x1 = min(max(x + w, 0), width)
            y1 = min(max(y + h, 0), height)
            if x1 <= x0 or y1 <= y0:
                continue
            boxes.append([x0, y0, x1, y1])
            labels.append(1 if self.class_agnostic else ann["category_id"])
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int64)
        return boxes, labels

    def _has_valid_anns(self, img_id: int) -> bool:
        info = self.images[img_id]
        boxes, _ = self._prepare(img_id, info["height"], info["width"])
        return len(boxes) > 0

    def __len__(self):
        return len(self.ids)

    def get_raw(self, index: int):
        """Untransformed sample — used by multi-image transforms to fetch
        extra images without recursing through the transform chain."""
        transforms, self.transforms = self.transforms, None
        try:
            return self[index]
        finally:
            self.transforms = transforms

    def __getitem__(self, index: int):
        img_id = self.ids[index]
        info = self.images[img_id]
        path = os.path.join(self.img_folder, info["file_name"])
        data = np.fromfile(path, np.uint8)
        image = cv2.imdecode(data, cv2.IMREAD_COLOR)  # BGR HWC
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        boxes, labels = self._prepare(img_id, image.shape[0], image.shape[1])
        sample = {
            "image": image,
            "boxes": boxes,
            "labels": labels,
            "image_id": img_id,
            "orig_size": np.asarray(image.shape[:2], np.int64),  # (h, w)
        }
        if self.transforms is not None:
            # multi-image transforms (Mosaic/MixUp/CopyPaste) pull extra
            # samples from this dataset (reference update_dataset hook,
            # datasets/coco.py:31-40)
            if hasattr(self.transforms, "update_dataset"):
                self.transforms.update_dataset(self)
            for t in getattr(self.transforms, "transforms", ()):  # Compose
                if hasattr(t, "update_dataset"):
                    t.update_dataset(self)
            sample = self.transforms(sample)
        return sample


class Object365Detection(CocoDetection):
    """Objects365 with the reference's corrupt-image skip
    (/root/reference/datasets/coco.py:136-161)."""

    def __getitem__(self, index: int):
        for offset in range(len(self)):
            try:
                return super().__getitem__((index + offset) % len(self))
            except (cv2.error, AttributeError, OSError):
                continue
        raise RuntimeError("no readable images in dataset")
