"""Jittable NMS (static shapes).

Replaces torchvision.ops.nms used by the optional PostProcess filter
(/root/reference/models/bricks/post_process.py:51-62). Returns a keep mask
rather than a ragged index list so results stay static-shaped under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from relation_detr_tpu.ops.boxes import box_iou


def nms_mask(
    boxes: jnp.ndarray,  # (N, 4) xyxy, assumed sorted by descending score
    scores: jnp.ndarray,  # (N,)
    iou_threshold: float,
) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes -> (N,) bool keep mask."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    ious = box_iou(boxes_sorted, boxes_sorted)  # (N, N)

    def body(i, keep):
        # suppress j > i if kept i overlaps j
        suppress = keep[i] & (ious[i] > iou_threshold) & (jnp.arange(n) > i)
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep
