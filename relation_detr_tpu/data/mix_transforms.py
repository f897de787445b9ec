"""Multi-image augmentations: Mosaic, MixUp, SimpleCopyPaste.

Spec: /root/reference/transforms/mix_transform.py (Mosaic 2x2 canvas
:170-270, MixUp 0.5 blend :71-116) and
/root/reference/transforms/simple_copy_paste.py (mask-based copy-paste).
These pull extra samples straight from the dataset (the reference wires
this via an update_dataset hook, datasets/coco.py:31-40).
"""
from __future__ import annotations

import random
from typing import Dict, Optional

import cv2
import numpy as np


class BaseMixTransform:
    """Wraps a per-sample transform with access to the source dataset."""

    def __init__(self, dataset=None, p: float = 0.5, seed: int = 0):
        self.dataset = dataset
        self.p = p
        self.rng = random.Random(seed)

    def update_dataset(self, dataset):
        self.dataset = dataset

    def _random_sample(self) -> Dict:
        idx = self.rng.randrange(len(self.dataset))
        return self.dataset.get_raw(idx) if hasattr(self.dataset, "get_raw") else self.dataset[idx]


class MixUp(BaseMixTransform):
    """0.5-blend two images; boxes/labels concatenate (mix_transform.py:71-116)."""

    def __call__(self, sample: Dict) -> Dict:
        if self.dataset is None or self.rng.random() > self.p:
            return sample
        other = self._random_sample()
        h = max(sample["image"].shape[0], other["image"].shape[0])
        w = max(sample["image"].shape[1], other["image"].shape[1])
        canvas = np.zeros((h, w, 3), np.float32)
        canvas[: sample["image"].shape[0], : sample["image"].shape[1]] = (
            sample["image"].astype(np.float32) * 0.5
        )
        canvas[: other["image"].shape[0], : other["image"].shape[1]] += (
            other["image"].astype(np.float32) * 0.5
        )
        return {
            **sample,
            "image": canvas.astype(sample["image"].dtype),
            "boxes": np.concatenate([sample["boxes"], other["boxes"]], 0),
            "labels": np.concatenate([sample["labels"], other["labels"]], 0),
        }


class Mosaic(BaseMixTransform):
    """2x2 mosaic around a jittered center (mix_transform.py:170-270)."""

    def __init__(self, dataset=None, p: float = 1.0, target_size: int = 640, seed: int = 0):
        super().__init__(dataset, p, seed)
        self.target_size = target_size

    def __call__(self, sample: Dict) -> Dict:
        if self.dataset is None or self.rng.random() > self.p:
            return sample
        s = self.target_size
        canvas = np.full((2 * s, 2 * s, 3), 114, sample["image"].dtype)
        cx = int(self.rng.uniform(s * 0.5, s * 1.5))
        cy = int(self.rng.uniform(s * 0.5, s * 1.5))
        samples = [sample] + [self._random_sample() for _ in range(3)]
        all_boxes, all_labels = [], []
        corners = [
            (slice(0, cy), slice(0, cx)),  # top-left
            (slice(0, cy), slice(cx, 2 * s)),  # top-right
            (slice(cy, 2 * s), slice(0, cx)),  # bottom-left
            (slice(cy, 2 * s), slice(cx, 2 * s)),  # bottom-right
        ]
        for spl, (ys, xs) in zip(samples, corners):
            th, tw = ys.stop - ys.start, xs.stop - xs.start
            if th <= 0 or tw <= 0:
                continue
            img = spl["image"]
            r = min(th / img.shape[0], tw / img.shape[1])
            nh, nw = max(int(img.shape[0] * r), 1), max(int(img.shape[1] * r), 1)
            resized = cv2.resize(img, (nw, nh))
            y0, x0 = ys.start, xs.start
            canvas[y0 : y0 + nh, x0 : x0 + nw] = resized
            if len(spl["boxes"]):
                boxes = spl["boxes"] * r + np.asarray([x0, y0, x0, y0], np.float32)
                boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
                boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
                keep = (boxes[:, 2] > boxes[:, 0] + 1) & (boxes[:, 3] > boxes[:, 1] + 1)
                all_boxes.append(boxes[keep])
                all_labels.append(spl["labels"][keep])
        boxes = (
            np.concatenate(all_boxes, 0)
            if all_boxes
            else np.zeros((0, 4), np.float32)
        )
        labels = (
            np.concatenate(all_labels, 0) if all_labels else np.zeros((0,), np.int64)
        )
        return {**sample, "image": canvas, "boxes": boxes, "labels": labels}


class _RawCache:
    """Small LRU-ish cache of raw samples for the Cached* variants
    (mix_transform.py:119-168, 272-326)."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self.store = {}

    def get(self, dataset, idx):
        if idx not in self.store:
            if len(self.store) >= self.capacity:
                self.store.pop(next(iter(self.store)))
            self.store[idx] = (
                dataset.get_raw(idx) if hasattr(dataset, "get_raw") else dataset[idx]
            )
        s = self.store[idx]
        return {**s, "boxes": s["boxes"].copy(), "labels": s["labels"].copy()}


class CachedMosaic(Mosaic):
    def __init__(self, *args, cache_capacity: int = 256, **kwargs):
        super().__init__(*args, **kwargs)
        self.cache = _RawCache(cache_capacity)

    def _random_sample(self):
        return self.cache.get(self.dataset, self.rng.randrange(len(self.dataset)))


class CachedMixUp(MixUp):
    def __init__(self, *args, cache_capacity: int = 256, **kwargs):
        super().__init__(*args, **kwargs)
        self.cache = _RawCache(cache_capacity)

    def _random_sample(self):
        return self.cache.get(self.dataset, self.rng.randrange(len(self.dataset)))


class SimpleCopyPaste:
    """Mask-based copy-paste (arXiv:2012.07177), matching the reference's
    batch-level transform (/root/reference/transforms/simple_copy_paste.py):
    randomly select objects from another sample, build their union alpha
    mask (optionally gaussian-blurred for blending), composite the paste
    image over this one, occlude this sample's masks, recompute its boxes
    from the surviving masks, and append the pasted objects.

    Falls back to pasting box rectangles when either sample lacks "masks"
    (datasets constructed without return_masks=True).
    """

    def __init__(self, dataset=None, p: float = 0.5, blending: bool = True,
                 max_paste: int = 10, seed: int = 0):
        self.dataset = dataset
        self.p = p
        self.blending = blending
        self.max_paste = max_paste
        self.rng = random.Random(seed)

    def update_dataset(self, dataset):
        self.dataset = dataset

    def __call__(self, sample: Dict) -> Dict:
        if self.dataset is None or self.rng.random() > self.p:
            return sample
        idx = self.rng.randrange(len(self.dataset))
        other = (
            self.dataset.get_raw(idx)
            if hasattr(self.dataset, "get_raw")
            else self.dataset[idx]
        )
        if "masks" in sample and "masks" in other and len(other["masks"]):
            return self._paste_masks(sample, other)
        return self._paste_boxes(sample, other)

    def _paste_masks(self, sample: Dict, other: Dict) -> Dict:
        h, w = sample["image"].shape[:2]
        oh, ow = other["image"].shape[:2]
        # random selection with replacement, deduplicated (reference :26-30)
        n = len(other["masks"])
        sel = sorted({self.rng.randrange(n) for _ in range(n)})[: self.max_paste]
        paste_img = other["image"]
        paste_masks = other["masks"][sel].astype(np.uint8)
        paste_boxes = other["boxes"][sel].copy()
        paste_labels = other["labels"][sel]
        if (oh, ow) != (h, w):  # reference resizes paste data to match (:40-52)
            paste_img = cv2.resize(paste_img, (w, h), interpolation=cv2.INTER_LINEAR)
            paste_masks = np.stack([
                cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
                for m in paste_masks
            ]) if len(paste_masks) else np.zeros((0, h, w), np.uint8)
            paste_boxes *= np.asarray([w / ow, h / oh, w / ow, h / oh], np.float32)

        alpha = (paste_masks.sum(0) > 0).astype(np.float32)
        if self.blending:  # gaussian-blurred alpha (reference :55-62)
            alpha = cv2.GaussianBlur(alpha, (5, 5), 2.0)
        image = (
            sample["image"].astype(np.float32) * (1.0 - alpha[..., None])
            + paste_img.astype(np.float32) * alpha[..., None]
        ).astype(sample["image"].dtype)

        hard = (alpha > 0.5) if self.blending else (alpha > 0)
        masks = sample["masks"].astype(np.uint8) * (~hard)
        keep = masks.sum((-1, -2)) > 0  # drop fully-occluded objects (:68-70)
        masks = masks[keep]
        boxes = _masks_to_boxes(masks)
        return {
            **sample,
            "image": image,
            "masks": np.concatenate([masks, paste_masks], 0),
            "boxes": np.concatenate([boxes, paste_boxes], 0).astype(np.float32),
            "labels": np.concatenate([sample["labels"][keep], paste_labels], 0),
        }

    def _paste_boxes(self, sample: Dict, other: Dict) -> Dict:
        img = sample["image"].copy()
        h, w = img.shape[:2]
        new_boxes, new_labels = [], []
        for box, label in list(zip(other["boxes"], other["labels"]))[: self.max_paste]:
            x0, y0, x1, y1 = [int(v) for v in box]
            patch = other["image"][y0:y1, x0:x1]
            if patch.size == 0:
                continue
            ph, pw = patch.shape[:2]
            if ph >= h or pw >= w:
                continue
            ty = self.rng.randrange(0, h - ph)
            tx = self.rng.randrange(0, w - pw)
            img[ty : ty + ph, tx : tx + pw] = patch
            new_boxes.append([tx, ty, tx + pw, ty + ph])
            new_labels.append(label)
        if not new_boxes:
            return sample
        return {
            **sample,
            "image": img,
            "boxes": np.concatenate(
                [sample["boxes"], np.asarray(new_boxes, np.float32)], 0
            ),
            "labels": np.concatenate(
                [sample["labels"], np.asarray(new_labels, np.int64)], 0
            ),
        }


def _masks_to_boxes(masks: np.ndarray) -> np.ndarray:
    """torchvision ops.masks_to_boxes equivalent (reference :79)."""
    if len(masks) == 0:
        return np.zeros((0, 4), np.float32)
    boxes = []
    for m in masks:
        ys, xs = np.nonzero(m)
        boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
    return np.asarray(boxes, np.float32)
