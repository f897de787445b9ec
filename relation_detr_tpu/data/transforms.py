"""Host-side augmentation presets (numpy/cv2).

Spec: /root/reference/transforms/presets.py. The default ``detr`` preset
(presets.py:60-74, wired in configs/train_config.py:24) is: horizontal flip
p=0.5, then RandomChoice between (a) multi-scale shortest-side resize with
max 1333 and (b) resize-to-{400,500,600} -> RandomSizeCrop(384, 600) ->
multi-scale resize; followed by float conversion + ImageNet normalization +
box sanitization. These run on the host; the padded-to-bucket batching lives
in data/loader.py so every device batch is a static canvas.
"""
from __future__ import annotations

import random
from typing import Dict, Sequence

import cv2
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

DETR_SCALES = (480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800)


def hflip(sample: Dict) -> Dict:
    image = sample["image"][:, ::-1]
    boxes = sample["boxes"].copy()
    w = sample["image"].shape[1]
    boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    return {**sample, "image": np.ascontiguousarray(image), "boxes": boxes}


def _bilinear_taps(in_size: int, out_size: int, antialias: bool):
    """Per-output-pixel source indices + weights for 1D (antialiased)
    bilinear resampling, the separable kernel torch/torchvision use
    (ATen upsample_bilinear2d_aa): triangle filter, support widened by the
    downscale factor when antialias is on, weights renormalized over the
    in-bounds taps. Returns (js (out,K) int, w (out,K) float32)."""
    scale = in_size / out_size
    if antialias and scale > 1.0:
        support, inv = scale, 1.0 / scale
    else:
        support, inv = 1.0, 1.0
    centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale
    lo = np.floor(centers - support + 0.5).astype(np.int64)
    K = int(np.ceil(2.0 * support)) + 1
    js = lo[:, None] + np.arange(K)[None]
    w = np.maximum(1.0 - np.abs((js + 0.5 - centers[:, None]) * inv), 0.0)
    w = np.where((js >= 0) & (js < in_size), w, 0.0)
    w = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)
    return np.clip(js, 0, in_size - 1), w


def resize_bilinear(image: np.ndarray, out_h: int, out_w: int,
                    antialias: bool = True) -> np.ndarray:
    """Exact torch bilinear resize (align_corners=False), optionally
    antialiased — the reference's eval resize math
    (/root/reference/models/detectors/base_detector.py:41-58,75:
    torchvision F.resize(..., antialias=True)). Golden-tested vs
    torch.nn.functional.interpolate in tests/test_transforms.py.

    cv2.INTER_AREA (the previous proxy) is box filtering, NOT the same
    kernel; this separable gather implementation reproduces the triangle
    filter bit-for-bit in float32. uint8 inputs compute in float32 and
    round half away from zero (torchvision's uint8 path is fixed-point and
    documents itself within ±1 of the float path)."""
    in_dtype = image.dtype
    x = image.astype(np.float32, copy=False)
    if x.ndim == 2:
        x = x[..., None]
        squeeze = True
    else:
        squeeze = False
    js_h, w_h = _bilinear_taps(x.shape[0], out_h, antialias)
    js_w, w_w = _bilinear_taps(x.shape[1], out_w, antialias)
    # rows: (out_h, K, W, C) weighted-sum -> (out_h, W, C)
    x = (x[js_h] * w_h[..., None, None]).sum(axis=1)
    # cols: (out_h, out_w, K, C) -> (out_h, out_w, C)
    x = (x[:, js_w] * w_w[None, ..., None]).sum(axis=2)
    if squeeze:
        x = x[..., 0]
    if np.issubdtype(in_dtype, np.integer):
        info = np.iinfo(in_dtype)
        return np.clip(np.floor(x + 0.5), info.min, info.max).astype(in_dtype)
    return x.astype(in_dtype, copy=False)


def resize_shortest(sample: Dict, size: int, max_size: int = 1333,
                    antialias: bool = False) -> Dict:
    h, w = sample["image"].shape[:2]
    r = size / min(h, w)
    if max_size is not None:
        r = min(r, max_size / max(h, w))
    new_h, new_w = int(round(h * r)), int(round(w * r))
    if antialias:
        # eval path: exact torch-antialias bilinear (base_detector.py:75);
        # sits on the mAP-parity critical path, so no cv2 proxy here
        image = resize_bilinear(sample["image"], new_h, new_w, antialias=True)
    else:
        image = cv2.resize(sample["image"], (new_w, new_h),
                           interpolation=cv2.INTER_LINEAR)
    boxes = sample["boxes"] * np.asarray(
        [new_w / w, new_h / h, new_w / w, new_h / h], np.float32
    )
    return {**sample, "image": image, "boxes": boxes}


def random_size_crop(sample: Dict, min_size: int, max_size: int, rng: random.Random) -> Dict:
    h, w = sample["image"].shape[:2]
    cw = rng.randint(min(min_size, w), min(max_size, w))
    ch = rng.randint(min(min_size, h), min(max_size, h))
    x0 = rng.randint(0, max(w - cw, 0))
    y0 = rng.randint(0, max(h - ch, 0))
    image = sample["image"][y0 : y0 + ch, x0 : x0 + cw]
    boxes = sample["boxes"] - np.asarray([x0, y0, x0, y0], np.float32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, cw)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, ch)
    keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    return {
        **sample,
        "image": np.ascontiguousarray(image),
        "boxes": boxes[keep],
        "labels": sample["labels"][keep],
    }


def normalize(sample: Dict) -> Dict:
    image = sample["image"].astype(np.float32) / 255.0
    image = (image - IMAGENET_MEAN) / IMAGENET_STD
    return {**sample, "image": image}


class DetrPreset:
    """The ``detr`` train preset (presets.py:60-74)."""

    def __init__(
        self,
        scales: Sequence[int] = DETR_SCALES,
        max_size: int = 1333,
        crop_scales: Sequence[int] = (400, 500, 600),
        crop_range=(384, 600),
        seed: int = 0,
    ):
        self.scales = list(scales)
        self.max_size = max_size
        self.crop_scales = list(crop_scales)
        self.crop_range = crop_range
        self.rng = random.Random(seed)

    def __call__(self, sample: Dict) -> Dict:
        if self.rng.random() < 0.5:
            sample = hflip(sample)
        if self.rng.random() < 0.5:
            sample = resize_shortest(
                sample, self.rng.choice(self.scales), self.max_size
            )
        else:
            sample = resize_shortest(
                sample, self.rng.choice(self.crop_scales), None
            )
            sample = random_size_crop(sample, *self.crop_range, self.rng)
            sample = resize_shortest(
                sample, self.rng.choice(self.scales), self.max_size
            )
        return normalize(sample)


class EvalPreset:
    """Eval resize+normalize, host-side equivalent of the in-model transform
    (/root/reference/models/detectors/base_detector.py:60-80).

    ``normalize_host=False`` keeps uint8 pixels; the jitted detections fn
    normalizes on device (utils/evaluation.py::make_detections_fn). Same
    math, but the host->device upload shrinks 4x — on this container's axon
    relay the fp32 image upload was the eval bottleneck (PERF.md)."""

    def __init__(self, min_size: int = 800, max_size: int = 1333,
                 normalize_host: bool = True):
        self.min_size = min_size
        self.max_size = max_size
        self.normalize_host = normalize_host

    def __call__(self, sample: Dict) -> Dict:
        sample = resize_shortest(sample, self.min_size, self.max_size,
                                 antialias=True)
        return normalize(sample) if self.normalize_host else sample


def scale_jitter(sample: Dict, target_size, scale_range, rng: random.Random) -> Dict:
    """LSJ ScaleJitter: random scale in range relative to target
    (presets.py:30-48 / torchvision ScaleJitter)."""
    h, w = sample["image"].shape[:2]
    th, tw = target_size
    scale = rng.uniform(*scale_range) * min(th / h, tw / w)
    new_h, new_w = max(int(h * scale), 1), max(int(w * scale), 1)
    image = cv2.resize(sample["image"], (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    boxes = sample["boxes"] * np.asarray(
        [new_w / w, new_h / h, new_w / w, new_h / h], np.float32
    )
    return {**sample, "image": image, "boxes": boxes}


def fixed_size_crop(sample: Dict, size, rng: random.Random, fill: int = 114) -> Dict:
    """Crop (or pad) to a fixed canvas at a random position (LSJ FixedSizeCrop)."""
    th, tw = size
    h, w = sample["image"].shape[:2]
    y0 = rng.randint(0, max(h - th, 0))
    x0 = rng.randint(0, max(w - tw, 0))
    crop = sample["image"][y0 : y0 + th, x0 : x0 + tw]
    canvas = np.full((th, tw, *crop.shape[2:]), fill, crop.dtype)
    canvas[: crop.shape[0], : crop.shape[1]] = crop
    boxes = sample["boxes"] - np.asarray([x0, y0, x0, y0], np.float32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, tw)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, th)
    keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    return {
        **sample,
        "image": canvas,
        "boxes": boxes[keep],
        "labels": sample["labels"][keep],
    }


class LSJPreset:
    """Large-scale jitter preset (presets.py:30-48): hflip + ScaleJitter(0.1, 2)
    + FixedSizeCrop + normalize."""

    def __init__(self, size: int = 1024, scale_range=(0.1, 2.0), seed: int = 0):
        self.size = (size, size)
        self.scale_range = scale_range
        self.rng = random.Random(seed)

    def __call__(self, sample: Dict) -> Dict:
        if self.rng.random() < 0.5:
            sample = hflip(sample)
        sample = scale_jitter(sample, self.size, self.scale_range, self.rng)
        sample = fixed_size_crop(sample, self.size, self.rng)
        return normalize(sample)


class Compose:
    def __init__(self, *transforms):
        self.transforms = transforms

    def __call__(self, sample: Dict) -> Dict:
        for t in self.transforms:
            sample = t(sample)
        return sample


def shift_image(sample: Dict, dx_frac: float, dy_frac: float) -> Dict:
    """A.ShiftScaleRotate with shift only (scale 0, rotate 0): translate the
    image with constant-0 border and shift boxes, dropping fully-off-canvas
    ones (BboxParams min_visibility=0.0 semantics — presets.py:109-117,150)."""
    img = sample["image"]
    h, w = img.shape[:2]
    dx, dy = round(w * dx_frac), round(h * dy_frac)
    mat = np.float32([[1, 0, dx], [0, 1, dy]])
    out = cv2.warpAffine(img, mat, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    boxes = sample["boxes"] + np.asarray([dx, dy, dx, dy], np.float32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
    keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    result = {**sample, "image": out, "boxes": boxes[keep],
              "labels": sample["labels"][keep]}
    if "masks" in sample and len(sample["masks"]):
        result["masks"] = np.stack([
            cv2.warpAffine(m, mat, (w, h), flags=cv2.INTER_NEAREST)
            for m in sample["masks"]
        ])[keep]
    return result


def vflip(sample: Dict) -> Dict:
    image = sample["image"][::-1]
    boxes = sample["boxes"].copy()
    h = sample["image"].shape[0]
    boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
    result = {**sample, "image": np.ascontiguousarray(image), "boxes": boxes}
    if "masks" in sample and len(sample["masks"]):
        result["masks"] = np.ascontiguousarray(sample["masks"][:, ::-1])
    return result


class ColorAugmentations:
    """Parameter-exact port of the ``strong_album`` albumentations block
    (/root/reference/transforms/presets.py:106-151):

      ShiftScaleRotate(shift<=6.25%, p=.5) -> RandomBrightnessContrast(
      brightness (0.1,0.3), contrast (0.1,0.3), p=.2) -> OneOf[RGBShift(+-10)
      | HueSaturationValue(20/30/20)](p=1) -> ImageCompression(85-95, p=.2)
      -> ChannelShuffle(p=.1) -> OneOf[Blur(3) | MedianBlur(3)](p=.1)

    cv2-based on uint8 RGB before normalization; same op semantics as
    albumentations (brightness_by_max beta*255, hue add mod 180, box shift
    with min_visibility=0 drop)."""

    def __init__(self, seed: int = 0):
        self.rng = random.Random(seed)

    def __call__(self, sample: Dict) -> Dict:
        r = self.rng
        if r.random() < 0.5:  # ShiftScaleRotate, shift_limit=0.0625
            sample = shift_image(
                sample, r.uniform(-0.0625, 0.0625), r.uniform(-0.0625, 0.0625)
            )
        img = sample["image"]
        assert img.dtype == np.uint8, "apply color augs before normalize()"
        if r.random() < 0.2:  # RandomBrightnessContrast((0.1,0.3), (0.1,0.3))
            alpha = 1.0 + r.uniform(0.1, 0.3)
            beta = r.uniform(0.1, 0.3) * 255.0  # brightness_by_max=True
            img = np.clip(img.astype(np.float32) * alpha + beta, 0, 255
                          ).astype(np.uint8)
        if r.random() < 0.5:  # OneOf(p=1): RGBShift
            shifts = np.asarray([r.randint(-10, 10) for _ in range(3)])
            img = np.clip(img.astype(np.int32) + shifts, 0, 255).astype(np.uint8)
        else:  # OneOf(p=1): HueSaturationValue
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int32)
            hsv[..., 0] = (hsv[..., 0] + r.randint(-20, 20)) % 180
            hsv[..., 1] = np.clip(hsv[..., 1] + r.randint(-30, 30), 0, 255)
            hsv[..., 2] = np.clip(hsv[..., 2] + r.randint(-20, 20), 0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        if r.random() < 0.2:  # ImageCompression(quality 85-95)
            q = r.randint(85, 95)
            _, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
            img = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                               cv2.COLOR_BGR2RGB)
        if r.random() < 0.1:  # ChannelShuffle
            perm = [0, 1, 2]
            r.shuffle(perm)
            img = img[..., perm]
        if r.random() < 0.1:  # OneOf: Blur(3) | MedianBlur(3)
            img = (cv2.blur(img, (3, 3)) if r.random() < 0.5
                   else cv2.medianBlur(img, 3))
        return {**sample, "image": img}


class StrongAlbumPreset:
    """``strong_album`` preset, op-for-op (presets.py:96-159): hflip ->
    RandomChoice(resize | resize+crop+resize) -> albumentations block ->
    hflip -> VERTICAL flip. (The 1200_2000 variant at presets.py:165-230 is
    the same pipeline with larger scales.)"""

    def __init__(
        self,
        scales: Sequence[int] = DETR_SCALES,
        max_size: int = 1333,
        crop_scales: Sequence[int] = (400, 500, 600),
        crop_range=(384, 600),
        seed: int = 0,
    ):
        self.scales = list(scales)
        self.max_size = max_size
        self.crop_scales = list(crop_scales)
        self.crop_range = crop_range
        self.rng = random.Random(seed)
        self.color = ColorAugmentations(seed=seed + 1)

    def __call__(self, sample: Dict) -> Dict:
        rng = self.rng
        if rng.random() < 0.5:
            sample = hflip(sample)
        if rng.random() < 0.5:
            sample = resize_shortest(
                sample, rng.choice(self.scales), self.max_size, antialias=True
            )
        else:
            sample = resize_shortest(
                sample, rng.choice(self.crop_scales), None, antialias=True
            )
            sample = random_size_crop(sample, *self.crop_range, rng)
            sample = resize_shortest(
                sample, rng.choice(self.scales), self.max_size, antialias=True
            )
        sample = self.color(sample)
        if rng.random() < 0.5:
            sample = hflip(sample)
        if rng.random() < 0.5:
            sample = vflip(sample)
        return sample


def photometric_distort(sample: Dict, rng: random.Random, p: float = 0.5) -> Dict:
    """SSD-style RandomPhotometricDistort (torchvision v2 semantics used by
    the reference ssd/rtdetr presets, presets.py:76-94, 231-241): independent
    p-gated brightness/contrast/saturation/hue jitters, contrast randomly
    before or after the color ops."""
    img = sample["image"]
    assert img.dtype == np.uint8, "apply photometric distort before normalize()"
    f = img.astype(np.float32)

    def brightness(f):
        return f * rng.uniform(0.875, 1.125)

    def contrast(f):
        mean = cv2.cvtColor(f.astype(np.uint8), cv2.COLOR_RGB2GRAY).mean()
        return (f - mean) * rng.uniform(0.5, 1.5) + mean

    def saturation_hue(f):
        hsv = cv2.cvtColor(np.clip(f, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV)
        hsv = hsv.astype(np.float32)
        if rng.random() < p:
            hsv[..., 1] = np.clip(hsv[..., 1] * rng.uniform(0.5, 1.5), 0, 255)
        if rng.random() < p:
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-0.05, 0.05) * 180) % 180
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float32)

    if rng.random() < p:
        f = brightness(f)
    contrast_first = rng.random() < 0.5
    if contrast_first and rng.random() < p:
        f = contrast(f)
    f = saturation_hue(f)
    if not contrast_first and rng.random() < p:
        f = contrast(f)
    return {**sample, "image": np.clip(f, 0, 255).astype(np.uint8)}


def random_zoom_out(sample: Dict, rng: random.Random, fill=(123, 117, 104),
                    side_range=(1.0, 4.0), p: float = 0.5) -> Dict:
    """torchvision RandomZoomOut: paste the image at a random position in a
    canvas up to side_range x larger, filled with `fill`."""
    if rng.random() >= p:
        return sample
    h, w = sample["image"].shape[:2]
    r = rng.uniform(*side_range)
    ch, cw = int(h * r), int(w * r)
    y0 = rng.randint(0, ch - h)
    x0 = rng.randint(0, cw - w)
    canvas = np.empty((ch, cw, 3), np.uint8)
    canvas[...] = np.asarray(fill, np.uint8)
    canvas[y0:y0 + h, x0:x0 + w] = sample["image"]
    boxes = sample["boxes"] + np.asarray([x0, y0, x0, y0], np.float32)
    return {**sample, "image": canvas, "boxes": boxes}


def random_iou_crop(sample: Dict, rng: random.Random, trials: int = 40) -> Dict:
    """torchvision RandomIoUCrop (SSD crop): sample a min-IoU requirement from
    {skip, 0, .1, .3, .5, .7, .9}, then try random crops (scale 0.3-1, aspect
    0.5-2) until every kept box's center is inside and IoU >= requirement."""
    h, w = sample["image"].shape[:2]
    boxes = sample["boxes"]
    if len(boxes) == 0:
        return sample
    options = (None, 0.0, 0.1, 0.3, 0.5, 0.7, 0.9)
    min_iou = rng.choice(options)
    if min_iou is None:
        return sample
    for _ in range(trials):
        cw = int(w * rng.uniform(0.3, 1.0))
        ch = int(h * rng.uniform(0.3, 1.0))
        if not 0.5 <= cw / max(ch, 1) <= 2.0:
            continue
        x0 = rng.randint(0, w - cw)
        y0 = rng.randint(0, h - ch)
        crop = np.asarray([x0, y0, x0 + cw, y0 + ch], np.float32)
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        inside = (cx >= crop[0]) & (cx < crop[2]) & (cy >= crop[1]) & (cy < crop[3])
        if not inside.any():
            continue
        ix0 = np.maximum(boxes[:, 0], crop[0])
        iy0 = np.maximum(boxes[:, 1], crop[1])
        ix1 = np.minimum(boxes[:, 2], crop[2])
        iy1 = np.minimum(boxes[:, 3], crop[3])
        inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area + cw * ch - inter, 1e-9)
        if iou[inside].min() < min_iou:
            continue
        image = sample["image"][y0:y0 + ch, x0:x0 + cw]
        nb = boxes[inside] - np.asarray([x0, y0, x0, y0], np.float32)
        nb[:, [0, 2]] = nb[:, [0, 2]].clip(0, cw)
        nb[:, [1, 3]] = nb[:, [1, 3]].clip(0, ch)
        return {
            **sample,
            "image": np.ascontiguousarray(image),
            "boxes": nb,
            "labels": sample["labels"][inside],
        }
    return sample


def resize_fixed(sample: Dict, size) -> Dict:
    th, tw = size
    h, w = sample["image"].shape[:2]
    image = cv2.resize(sample["image"], (tw, th), interpolation=cv2.INTER_LINEAR)
    boxes = sample["boxes"] * np.asarray(
        [tw / w, th / h, tw / w, th / h], np.float32
    )
    return {**sample, "image": image, "boxes": boxes}


def _sanitize(sample: Dict) -> Dict:
    boxes = sample["boxes"]
    keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    return {**sample, "boxes": boxes[keep], "labels": sample["labels"][keep]}


class MultiscalePreset:
    """`multiscale` (presets.py:50-58): multi-scale shortest-side resize +
    hflip + normalize, no crop branch."""

    def __init__(self, scales: Sequence[int] = DETR_SCALES, max_size: int = 1333,
                 seed: int = 0):
        self.scales = list(scales)
        self.max_size = max_size
        self.rng = random.Random(seed)

    def __call__(self, sample: Dict) -> Dict:
        sample = resize_shortest(sample, self.rng.choice(self.scales), self.max_size)
        if self.rng.random() < 0.5:
            sample = hflip(sample)
        return normalize(sample)


class SSDPreset:
    """`ssd` (presets.py:76-86): photometric distort + zoom-out + IoU crop +
    hflip + normalize + sanitize."""

    def __init__(self, seed: int = 0, with_distort: bool = True,
                 with_zoom_out: bool = True):
        self.rng = random.Random(seed)
        self.with_distort = with_distort
        self.with_zoom_out = with_zoom_out

    def __call__(self, sample: Dict) -> Dict:
        if self.with_distort:
            sample = photometric_distort(sample, self.rng)
        if self.with_zoom_out:
            sample = random_zoom_out(sample, self.rng)
        sample = random_iou_crop(sample, self.rng)
        if self.rng.random() < 0.5:
            sample = hflip(sample)
        return normalize(_sanitize(sample))


class RTDetrPreset:
    """`rtdetr_transform` (presets.py:231-241): distort p=0.8 + zoom-out
    (fill 0) + IoU crop + hflip + fixed 640x640 resize + normalize."""

    def __init__(self, size: int = 640, seed: int = 0):
        self.size = (size, size)
        self.rng = random.Random(seed)

    def __call__(self, sample: Dict) -> Dict:
        sample = photometric_distort(sample, self.rng, p=0.8)
        sample = random_zoom_out(sample, self.rng, fill=(0, 0, 0))
        sample = random_iou_crop(sample, self.rng)
        if self.rng.random() < 0.5:
            sample = hflip(sample)
        sample = resize_fixed(sample, self.size)
        return normalize(_sanitize(sample))


# preset registry mirroring `transforms.presets` usage in configs
def detr(seed: int = 0) -> DetrPreset:
    return DetrPreset(seed=seed)


def lsj(seed: int = 0) -> LSJPreset:
    return LSJPreset(1024, seed=seed)


def lsj_1536(seed: int = 0) -> LSJPreset:
    return LSJPreset(1536, seed=seed)


def eval_800_1333() -> EvalPreset:
    return EvalPreset(800, 1333)


def strong_album(seed: int = 0) -> StrongAlbumPreset:
    return StrongAlbumPreset(seed=seed)


def strong_album_1200_2000(seed: int = 0) -> StrongAlbumPreset:
    """1200x2000 variant (presets.py:165-229, used by the FocalNet-L config)."""
    scales = tuple(range(720, 1201, 48))
    return StrongAlbumPreset(seed=seed, scales=scales, max_size=2000,
                             crop_scales=(600, 750, 900), crop_range=(576, 900))


def multiscale(seed: int = 0) -> MultiscalePreset:
    return MultiscalePreset(seed=seed)


def ssd(seed: int = 0) -> SSDPreset:
    return SSDPreset(seed=seed)


def ssdlite(seed: int = 0) -> SSDPreset:
    """`ssdlite` (presets.py:88-94): ssd without distort/zoom-out."""
    return SSDPreset(seed=seed, with_distort=False, with_zoom_out=False)


def rtdetr_transform(seed: int = 0) -> RTDetrPreset:
    return RTDetrPreset(seed=seed)


def mosaic_detr(dataset=None, seed: int = 0) -> Compose:
    """Mosaic followed by the detr preset (presets.py:245-316)."""
    from relation_detr_tpu.data.mix_transforms import Mosaic

    return Compose(Mosaic(dataset, seed=seed), DetrPreset(seed=seed))
