"""Box coordinate ops (jittable, fp32-friendly).

Numerical spec: torchvision ``boxes`` ops as used by the reference
(/root/reference/models/matcher/hungarian_matcher.py:56-59,
 /root/reference/models/bricks/set_criterion.py:99-105) and
``inverse_sigmoid`` (/root/reference/util/misc.py:31-35).
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x0, y0, x1, y1), any leading dims."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x0, y0, x1, y1) -> (cx, cy, w, h), any leading dims."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape (..., N)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def _pairwise_inter_union(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise intersection/union of xyxy boxes: (..., N, 4) x (..., M, 4)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter, union


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    inter, union = _pairwise_inter_union(boxes1, boxes2)
    return inter / jnp.maximum(union, 1e-12)


def elementwise_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned xyxy boxes: (..., 4) x (..., 4) -> (...)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-12)


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes -> (..., N, M).

    GIoU = IoU - (area_hull - union) / area_hull.
    """
    inter, union = _pairwise_inter_union(boxes1, boxes2)
    iou = inter / jnp.maximum(union, 1e-12)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-12)


def elementwise_generalized_box_iou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise GIoU of aligned xyxy boxes: (..., 4) x (..., 4) -> (...)."""
    iou = elementwise_box_iou(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    union = area1 + area2 - wh[..., 0] * wh[..., 1]
    lt_h = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_h = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_h = jnp.clip(rb_h - lt_h, 0.0)
    hull = wh_h[..., 0] * wh_h[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-12)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Clamped logit; matches /root/reference/util/misc.py:31-35."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)
