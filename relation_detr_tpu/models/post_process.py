"""Detection post-processing: flat top-k over (queries x classes).

Spec: /root/reference/models/bricks/post_process.py:8-74. Fully jittable;
NMS / confidence filtering are optional mask-based steps (results keep static
shape with a validity mask instead of ragged lists).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from relation_detr_tpu.ops.boxes import box_cxcywh_to_xyxy


def post_process(
    pred_logits: jnp.ndarray,  # (B, Q, K)
    pred_boxes: jnp.ndarray,  # (B, Q, 4) normalized cxcywh
    target_sizes: jnp.ndarray,  # (B, 2) original (h, w)
    select_box_nums_for_evaluation: int = 300,
    confidence_score: float = -1.0,
    nms_iou_threshold: float = -1.0,
) -> Dict[str, jnp.ndarray]:
    """Returns dict of (B, N) scores/labels, (B, N, 4) xyxy boxes, (B, N) valid."""
    bs, num_queries, num_classes = pred_logits.shape
    prob = jax.nn.sigmoid(pred_logits).reshape(bs, -1)
    k = min(select_box_nums_for_evaluation, num_queries * num_classes)
    scores, topk_indexes = jax.lax.top_k(prob, k)
    topk_boxes = topk_indexes // num_classes
    labels = topk_indexes % num_classes
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    boxes = jnp.take_along_axis(boxes, topk_boxes[..., None], axis=1)

    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)[:, None, :]
    boxes = boxes * scale

    valid = jnp.ones_like(scores, bool)
    if confidence_score > 0:
        valid = valid & (scores > confidence_score)
    if nms_iou_threshold > 0:
        from relation_detr_tpu.ops.nms import nms_mask

        keep = jax.vmap(lambda b, s: nms_mask(b, s, nms_iou_threshold))(boxes, scores)
        valid = valid & keep
    return {"scores": scores, "labels": labels, "boxes": boxes, "valid": valid}


def segmentation_post_process(
    pred_logits: jnp.ndarray,  # (B, Q, K)
    pred_masks: jnp.ndarray,  # (B, Q, h, w) low-res mask logits
    target_hw,  # static (H, W) output size
) -> jnp.ndarray:
    """Per-class averaged mask decode -> (B, H, W) class map.

    Mirrors SegmentationPostProcess (post_process.py:77-129): queries are
    argmax-assigned to classes, same-class mask logits are sigmoid-averaged,
    upsampled bilinearly, and argmaxed into a segmentation map. Static-shape
    version: the per-class average uses a one-hot membership matrix instead
    of ragged indexing.
    """
    bs, num_queries, num_classes = pred_logits.shape
    q_class = jnp.argmax(pred_logits, axis=-1)  # (B, Q)
    member = jax.nn.one_hot(q_class, num_classes, dtype=pred_masks.dtype)  # (B, Q, K)
    probs = jax.nn.sigmoid(pred_masks)  # (B, Q, h, w)
    sums = jnp.einsum("bqk,bqhw->bkhw", member, probs)
    counts = jnp.maximum(member.sum(axis=1), 1.0)  # (B, K)
    per_class = sums / counts[..., None, None]
    per_class = jax.image.resize(
        per_class, (bs, num_classes, *target_hw), method="bilinear"
    )
    return jnp.argmax(per_class, axis=1)
