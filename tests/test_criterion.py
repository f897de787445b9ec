import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from relation_detr_tpu.losses.criterion import (
    CriterionConfig,
    calculate_loss,
    compute_matching,
)
from relation_detr_tpu.losses.losses import sigmoid_focal_loss


def test_sigmoid_focal_loss_matches_torch_formula():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 7, 5).astype(np.float32)
    targets = (rng.rand(2, 7, 5) < 0.2).astype(np.float32)
    num_boxes = 3.0
    ours = float(
        sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), num_boxes)
    )
    # reference formula (losses.py:4-12)
    t_logits = torch.from_numpy(logits)
    t_targets = torch.from_numpy(targets)
    prob = t_logits.sigmoid()
    weight = (1 - 0.25) * prob**2 * (1 - t_targets) + t_targets * 0.25 * (1 - prob) ** 2
    loss = F.binary_cross_entropy_with_logits(t_logits, t_targets, reduction="none")
    ref = float(((loss * weight).sum(1) / 7).sum() / num_boxes)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.fixture
def cfg():
    return CriterionConfig(num_classes=5, class_loss_type="focal")


def test_matching_prefers_aligned_predictions(cfg):
    # 2 GTs; queries 0 and 3 sit exactly on them with confident logits
    gt_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]]])
    gt_labels = jnp.asarray([[1, 2]])
    gt_valid = jnp.ones((1, 2), bool)
    pred_boxes = jnp.asarray(
        [[[0.3, 0.3, 0.2, 0.2], [0.5, 0.5, 0.5, 0.5], [0.1, 0.9, 0.2, 0.2],
          [0.7, 0.7, 0.1, 0.1]]]
    )
    logits = jnp.full((1, 4, 5), -4.0)
    logits = logits.at[0, 0, 1].set(4.0).at[0, 3, 2].set(4.0)
    match = np.asarray(
        compute_matching(cfg, logits, pred_boxes, gt_labels, gt_boxes, gt_valid)
    )
    assert match[0].tolist() == [0, 3]


def test_perfect_predictions_give_lower_loss_than_shuffled(cfg):
    gt_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]]])
    gt_labels = jnp.asarray([[1, 2]])
    gt_valid = jnp.ones((1, 2), bool)
    perfect_boxes = jnp.concatenate(
        [gt_boxes, jnp.full((1, 2, 4), 0.5)], axis=1
    )
    perfect_logits = jnp.full((1, 4, 5), -6.0)
    perfect_logits = perfect_logits.at[0, 0, 1].set(6.0).at[0, 1, 2].set(6.0)
    bad_logits = jnp.full((1, 4, 5), -6.0)

    num_boxes = jnp.asarray(2.0)
    good = calculate_loss(cfg, perfect_logits, perfect_boxes, gt_labels, gt_boxes,
                          gt_valid, num_boxes)
    bad = calculate_loss(cfg, bad_logits, perfect_boxes, gt_labels, gt_boxes,
                         gt_valid, num_boxes)
    assert float(good["loss_class"]) < float(bad["loss_class"])
    assert float(good["loss_bbox"]) < 1e-5
    assert float(good["loss_giou"]) < 1e-5


def test_padded_gts_contribute_nothing(cfg):
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 6, 5).astype(np.float32))
    boxes = jnp.asarray(
        np.clip(rng.uniform(0.2, 0.6, (1, 6, 4)), 0.05, 0.95).astype(np.float32)
    )
    gt_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]]])
    gt_labels = jnp.asarray([[1, 3]])
    num_boxes = jnp.asarray(2.0)
    base = calculate_loss(
        cfg, logits, boxes, gt_labels, gt_boxes, jnp.ones((1, 2), bool), num_boxes
    )
    # same GTs plus 3 padded slots with garbage contents
    gt_boxes_pad = jnp.concatenate([gt_boxes, jnp.full((1, 3, 4), 0.9)], 1)
    gt_labels_pad = jnp.concatenate([gt_labels, jnp.full((1, 3), 4, jnp.int32)], 1)
    valid_pad = jnp.asarray([[True, True, False, False, False]])
    padded = calculate_loss(
        cfg, logits, boxes, gt_labels_pad, gt_boxes_pad, valid_pad, num_boxes
    )
    for k in base:
        np.testing.assert_allclose(float(base[k]), float(padded[k]), rtol=1e-5,
                                   err_msg=k)


def _np_cost_matrix(cfg, logits, boxes, labels, tgt_boxes):
    """Literal numpy transcription of the reference cost formula
    (hungarian_matcher.py:41-59): focal-aware class cost + L1 cdist + GIoU."""
    prob = 1.0 / (1.0 + np.exp(-logits))  # (Q, K)
    prob_at = prob[:, labels]  # (Q, G)
    neg = -(1 - cfg.focal_alpha) * prob_at**cfg.focal_gamma * np.log(1 - prob_at + 1e-6)
    pos = -cfg.focal_alpha * (1 - prob_at) ** cfg.focal_gamma * np.log(prob_at + 1e-6)
    cost_class = pos - neg
    cost_bbox = np.abs(boxes[:, None, :] - tgt_boxes[None, :, :]).sum(-1)

    def xyxy(b):
        return np.concatenate([b[..., :2] - b[..., 2:] / 2, b[..., :2] + b[..., 2:] / 2], -1)

    a, b = xyxy(boxes)[:, None, :], xyxy(tgt_boxes)[None, :, :]
    lt, rb = np.maximum(a[..., :2], b[..., :2]), np.minimum(a[..., 2:], b[..., 2:])
    inter = np.clip(rb - lt, 0, None).prod(-1)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    iou = inter / np.maximum(union, 1e-9)
    elt = np.minimum(a[..., :2], b[..., :2])
    erb = np.maximum(a[..., 2:], b[..., 2:])
    enc = np.clip(erb - elt, 0, None).prod(-1)
    giou = iou - (enc - union) / np.maximum(enc, 1e-9)
    return (
        cfg.cost_bbox * cost_bbox + cfg.cost_class * cost_class - cfg.cost_giou * giou
    )


@pytest.mark.parametrize("mixed", [1, 6])
def test_compute_matching_optimal_vs_scipy_on_criterion_costs(mixed):
    """Golden: the on-device match (incl. tiled mixed-match with row groups)
    achieves scipy's optimal cost on an independently-built cost matrix."""
    from scipy.optimize import linear_sum_assignment

    from relation_detr_tpu.losses.criterion import tile_targets

    cfg = CriterionConfig(num_classes=10, mixed_match=mixed)
    rng = np.random.RandomState(11)
    B, Q, G = 2, 60, 5
    logits = rng.randn(B, Q, 10).astype(np.float32)
    boxes = np.clip(rng.uniform(0.2, 0.7, (B, Q, 4)), 0.05, 0.9).astype(np.float32)
    labels = rng.randint(0, 10, (B, G)).astype(np.int32)
    tboxes = np.clip(rng.uniform(0.2, 0.7, (B, G, 4)), 0.05, 0.9).astype(np.float32)
    valid = np.ones((B, G), bool)
    valid[1, 3:] = False

    tl, tb, tv = tile_targets(
        jnp.asarray(labels), jnp.asarray(tboxes), jnp.asarray(valid), mixed, Q
    )
    group = (
        jnp.tile(jnp.arange(G, dtype=jnp.int32), mixed) if mixed > 1 else None
    )
    match = np.asarray(
        compute_matching(
            cfg, jnp.asarray(logits), jnp.asarray(boxes), tl, tb, tv, group
        )
    )
    tl, tb, tv = np.asarray(tl), np.asarray(tb), np.asarray(tv)
    for b in range(B):
        real = np.where(tv[b])[0]
        cost = _np_cost_matrix(cfg, logits[b], boxes[b], tl[b][real], tb[b][real])
        cols = match[b][real]
        assert (match[b][~tv[b]] == -1).all()
        assert (cols >= 0).all() and len(set(cols.tolist())) == len(real)
        ours = cost[cols, np.arange(len(real))].sum()
        ri, ci = linear_sum_assignment(cost)
        np.testing.assert_allclose(
            ours, cost[ri, ci].sum(), rtol=1e-4, atol=1e-3
        )
