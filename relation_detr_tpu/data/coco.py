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


def _rasterize_segmentation(seg, box, height: int, width: int) -> np.ndarray:
    """Polygon / uncompressed-RLE -> (H, W) uint8 mask; falls back to the
    box rectangle when no segmentation is present."""
    mask = np.zeros((height, width), np.uint8)
    if isinstance(seg, list) and seg:
        polys = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
                 for p in seg if len(p) >= 6]
        if polys:
            cv2.fillPoly(mask, polys, 1)
            return mask
    if isinstance(seg, dict) and isinstance(seg.get("counts"), list):
        # uncompressed RLE: column-major runs of 0s and 1s alternating
        h, w = seg.get("size", (height, width))
        flat = np.zeros(h * w, np.uint8)
        pos, val = 0, 0
        for run in seg["counts"]:
            if val:
                flat[pos:pos + run] = 1
            pos += run
            val ^= 1
        m = flat.reshape(w, h).T  # COCO RLE is column-major
        mask[:h, :w] = m[:height, :width]
        return mask
    x0, y0, x1, y1 = (int(round(v)) for v in box)
    mask[y0:y1, x0:x1] = 1
    return mask


class CocoDetection:
    def __init__(
        self,
        img_folder: str,
        ann_file: str,
        transforms=None,
        train: bool = False,
        class_agnostic: bool = False,
        return_masks: bool = False,
    ):
        """``class_agnostic`` collapses every category to id 1 — the SA-Det-100k
        evaluation protocol (/root/reference/README.md:74-77). ``return_masks``
        rasterizes segmentation polygons / uncompressed RLE to (N, H, W) uint8
        masks (ConvertCocoPolysToMask return_masks,
        convert_coco_polys_to_mask.py:7-101) — needed by mask-based
        SimpleCopyPaste."""
        self.img_folder = img_folder
        self.transforms = transforms
        self.train = train
        self.class_agnostic = class_agnostic
        self.return_masks = return_masks
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
        (convert_coco_polys_to_mask.py). Returns (boxes, labels, masks);
        masks is None unless ``return_masks``."""
        boxes, labels, masks = [], [], []
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
            if self.return_masks:
                masks.append(_rasterize_segmentation(
                    ann.get("segmentation"), (x0, y0, x1, y1), height, width
                ))
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int64)
        if self.return_masks:
            masks = (np.stack(masks) if masks
                     else np.zeros((0, height, width), np.uint8))
            return boxes, labels, masks
        return boxes, labels, None

    def _has_valid_anns(self, img_id: int) -> bool:
        info = self.images[img_id]
        boxes = self._prepare(img_id, info["height"], info["width"])[0]
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
        boxes, labels, masks = self._prepare(img_id, image.shape[0], image.shape[1])
        sample = {
            "image": image,
            "boxes": boxes,
            "labels": labels,
            "image_id": img_id,
            "orig_size": np.asarray(image.shape[:2], np.int64),  # (h, w)
        }
        if masks is not None:
            sample["masks"] = masks
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
