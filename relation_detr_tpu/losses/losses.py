"""Classification losses (focal family), padded-batch form.

Numerical spec: /root/reference/models/bricks/losses.py. All variants reduce
as ``(loss.sum(queries) / num_queries).sum() / num_boxes`` and are multiplied
by ``num_queries`` at the call site (set_criterion.py:72-80), i.e. net
``loss.sum() / num_boxes``; the padded-batch versions add an optional
per-query mask so padding slots contribute exactly zero.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy on logits."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def sigmoid_focal_loss(
    logits: jnp.ndarray,  # (B, Q, K)
    targets_onehot: jnp.ndarray,  # (B, Q, K) in {0, 1}
    num_boxes: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    query_mask: Optional[jnp.ndarray] = None,  # (B, Q)
) -> jnp.ndarray:
    """Focal loss; weight keeps gradient (losses.py:4-12)."""
    prob = jax.nn.sigmoid(logits)
    t = targets_onehot.astype(logits.dtype)
    weight = (1 - alpha) * prob**gamma * (1 - t) + t * alpha * (1 - prob) ** gamma
    loss = _bce_with_logits(logits, t) * weight
    if query_mask is not None:
        loss = loss * query_mask[..., None]
    num_queries = max(loss.shape[1], 1)
    return (loss.sum(axis=1) / num_queries).sum() / num_boxes


def vari_sigmoid_focal_loss(
    logits: jnp.ndarray,  # (B, Q, K)
    targets_onehot: jnp.ndarray,  # (B, Q, K)
    gt_score: jnp.ndarray,  # (B, Q) detached IoU of the matched pair
    num_boxes: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    query_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """IoU-aware varifocal loss, RT-DETR style with detached prob
    (losses.py:15-21)."""
    prob = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
    t = targets_onehot.astype(logits.dtype)
    target_score = t * gt_score[..., None]
    weight = (1 - alpha) * prob**gamma * (1 - t) + target_score
    loss = _bce_with_logits(logits, target_score) * weight
    if query_mask is not None:
        loss = loss * query_mask[..., None]
    num_queries = max(loss.shape[1], 1)
    return (loss.sum(axis=1) / num_queries).sum() / num_boxes


def ia_bce_loss(
    logits: jnp.ndarray,
    targets_onehot: jnp.ndarray,
    gt_score: jnp.ndarray,
    num_boxes: jnp.ndarray,
    k: float = 0.25,
    alpha: float = 0.0,
    gamma: float = 2.0,
    query_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """IoU-aware BCE (losses.py:24-33; unused by shipped configs)."""
    prob = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
    t = targets_onehot.astype(logits.dtype)
    iou_aware = jnp.clip(prob**k * gt_score[..., None] ** (1 - k), 0.01)
    target_score = t * iou_aware
    weight = (1 - alpha) * prob**gamma * (1 - t) + t
    loss = _bce_with_logits(logits, target_score) * weight
    if query_mask is not None:
        loss = loss * query_mask[..., None]
    num_queries = max(loss.shape[1], 1)
    return (loss.sum(axis=1) / num_queries).sum() / num_boxes
