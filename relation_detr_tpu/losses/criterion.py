"""Set criterion: Hungarian matching + focal/varifocal + L1 + GIoU losses.

Spec: /root/reference/models/bricks/set_criterion.py and
/root/reference/models/matcher/hungarian_matcher.py. Everything operates on
fixed-capacity padded targets (labels (B, G), boxes (B, G, 4), valid (B, G))
and runs fully on-device under jit; matching uses the Jonker-Volgenant solver
in ops/hungarian.py instead of a host scipy call.

``num_boxes`` is the *global* valid-GT count (a jnp scalar). Under a sharded
batch the sum is a cross-replica psum inserted by XLA, replacing the explicit
all_reduce at set_criterion.py:140-147; dividing the global loss sum by the
global count reproduces the reference's DDP-averaged effective loss exactly.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from relation_detr_tpu.losses.losses import sigmoid_focal_loss, vari_sigmoid_focal_loss
from relation_detr_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    elementwise_box_iou,
    elementwise_generalized_box_iou,
    generalized_box_iou,
)
from relation_detr_tpu.ops.hungarian import hungarian_assignment


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int
    # matcher cost weights (hungarian_matcher.py / config: class 2, bbox 5, giou 2)
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # criterion loss weights (weight_dict: class 1, bbox 5, giou 2)
    weight_class: float = 1.0
    weight_bbox: float = 5.0
    weight_giou: float = 2.0
    # "hybrid" => IoU-aware varifocal class loss (HybridSetCriterion)
    class_loss_type: str = "vari_focal"  # "focal" | "vari_focal"
    two_stage_binary_cls: bool = False
    aux_loss: bool = True
    # Align-DETR mixed assignment (hungarian_matcher.py:83-91): each GT is
    # matched to up to `mixed_match` queries (tiled targets). 1 = standard.
    mixed_match: int = 1


def tile_targets(gt_labels, gt_boxes, gt_valid, copies: int, num_queries: int):
    """Tile targets for mixed assignment; extra copies beyond the dynamic cap
    min(num_queries * 0.5 / gt_size, copies) are masked invalid."""
    if copies <= 1:
        return gt_labels, gt_boxes, gt_valid
    tiled_labels = jnp.tile(gt_labels, (1, copies))
    tiled_boxes = jnp.tile(gt_boxes, (1, copies, 1))
    tiled_valid = jnp.tile(gt_valid, (1, copies))
    gt_size = jnp.maximum(jnp.sum(gt_valid, axis=1, keepdims=True), 1)
    cap = jnp.minimum((num_queries // 2) // gt_size, copies)  # (B, 1)
    copy_idx = jnp.arange(copies).repeat(gt_valid.shape[1])[None]
    return tiled_labels, tiled_boxes, tiled_valid & (copy_idx < cap)


def compute_matching(
    cfg: CriterionConfig,
    pred_logits: jnp.ndarray,  # (B, Q, K)
    pred_boxes: jnp.ndarray,  # (B, Q, 4) cxcywh
    gt_labels: jnp.ndarray,  # (B, G)
    gt_boxes: jnp.ndarray,  # (B, G, 4) cxcywh
    gt_valid: jnp.ndarray,  # (B, G)
    row_group=None,  # (G,) optional: tiled-duplicate group ids (see hungarian.py)
) -> jnp.ndarray:
    """Hungarian match per image -> (B, G) query index per GT (-1 invalid)."""

    def one_image(logits, boxes, labels, tgt_boxes, valid):
        out_prob = jax.nn.sigmoid(logits)  # (Q, K)
        labels_safe = jnp.clip(labels, 0, cfg.num_classes - 1)
        prob_at = out_prob[:, labels_safe]  # (Q, G)
        neg_cost = (
            -(1 - cfg.focal_alpha) * prob_at**cfg.focal_gamma * jnp.log(1 - prob_at + 1e-6)
        )
        pos_cost = (
            -cfg.focal_alpha * (1 - prob_at) ** cfg.focal_gamma * jnp.log(prob_at + 1e-6)
        )
        cost_class = pos_cost - neg_cost  # (Q, G)
        cost_bbox = jnp.sum(
            jnp.abs(boxes[:, None, :] - tgt_boxes[None, :, :]), axis=-1
        )
        cost_giou = -generalized_box_iou(
            box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(tgt_boxes)
        )
        cost = (
            cfg.cost_bbox * cost_bbox
            + cfg.cost_class * cost_class
            + cfg.cost_giou * cost_giou
        )  # (Q, G)
        cost = jnp.where(valid[None, :], cost, 0.0).T  # (G, Q), pad rows uniform
        return hungarian_assignment(cost, valid, row_group)

    return jax.vmap(one_image)(pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid)


def _scatter_targets(
    cfg: CriterionConfig,
    match: jnp.ndarray,  # (B, G) query per GT, -1 invalid
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    iou_score: Optional[jnp.ndarray],  # (B, G) or None
    num_queries: int,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Build (B, Q) target class map (num_classes = background) and IoU map."""
    bs = match.shape[0]
    # out-of-range index => dropped by scatter
    match_safe = jnp.where(gt_valid & (match >= 0), match, num_queries)
    target_classes = jnp.full((bs, num_queries + 1), cfg.num_classes, jnp.int32)
    b_idx = jnp.broadcast_to(jnp.arange(bs)[:, None], match.shape)
    target_classes = target_classes.at[b_idx, match_safe].set(
        jnp.clip(gt_labels, 0, cfg.num_classes - 1), mode="drop"
    )
    target_classes = target_classes[:, :num_queries]
    target_iou = None
    if iou_score is not None:
        target_iou = jnp.zeros((bs, num_queries + 1), iou_score.dtype)
        target_iou = target_iou.at[b_idx, match_safe].set(iou_score, mode="drop")
        target_iou = target_iou[:, :num_queries]
    return target_classes, target_iou


def _class_loss(
    cfg: CriterionConfig,
    pred_logits: jnp.ndarray,  # (B, Q, K)
    target_classes: jnp.ndarray,  # (B, Q)
    target_iou: Optional[jnp.ndarray],  # (B, Q)
    num_boxes: jnp.ndarray,
    query_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    num_queries = pred_logits.shape[1]
    onehot = jax.nn.one_hot(
        target_classes, cfg.num_classes + 1, dtype=pred_logits.dtype
    )[..., :-1]
    if cfg.class_loss_type == "vari_focal":
        loss = vari_sigmoid_focal_loss(
            pred_logits, onehot, target_iou, num_boxes,
            alpha=cfg.focal_alpha, gamma=cfg.focal_gamma, query_mask=query_mask,
        )
    else:
        loss = sigmoid_focal_loss(
            pred_logits, onehot, num_boxes,
            alpha=cfg.focal_alpha, gamma=cfg.focal_gamma, query_mask=query_mask,
        )
    return loss * num_queries  # set_criterion.py:72-80


def _box_losses(
    src_boxes: jnp.ndarray,  # (B, N, 4) cxcywh
    tgt_boxes: jnp.ndarray,  # (B, N, 4)
    pair_valid: jnp.ndarray,  # (B, N)
    num_boxes: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    m = pair_valid[..., None].astype(src_boxes.dtype)
    loss_bbox = jnp.sum(jnp.abs(src_boxes - tgt_boxes) * m) / num_boxes
    giou = elementwise_generalized_box_iou(
        box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    loss_giou = jnp.sum((1.0 - giou) * pair_valid) / num_boxes
    return loss_bbox, loss_giou


def calculate_loss(
    cfg: CriterionConfig,
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_boxes: jnp.ndarray,
    match: Optional[jnp.ndarray] = None,
    query_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Match (if needed) then class + box losses for one output set.

    Mirrors SetCriterion.calculate_loss (set_criterion.py:120-131).
    """
    if match is None:
        row_group = None
        if cfg.mixed_match > 1:
            base_g = gt_labels.shape[1]
            gt_labels, gt_boxes, gt_valid = tile_targets(
                gt_labels, gt_boxes, gt_valid, cfg.mixed_match, pred_logits.shape[1]
            )
            row_group = jnp.tile(jnp.arange(base_g, dtype=jnp.int32), cfg.mixed_match)
        match = compute_matching(
            cfg, pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid, row_group
        )

    bs, num_queries, _ = pred_logits.shape
    b_idx = jnp.broadcast_to(jnp.arange(bs)[:, None], match.shape)
    match_gather = jnp.clip(match, 0, num_queries - 1)
    src_boxes = pred_boxes[b_idx, match_gather]  # (B, G, 4)
    pair_valid = gt_valid & (match >= 0)

    iou_score = None
    if cfg.class_loss_type == "vari_focal":
        iou_score = jax.lax.stop_gradient(
            elementwise_box_iou(
                box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(gt_boxes)
            )
        )
        iou_score = jnp.where(pair_valid, iou_score, 0.0)

    target_classes, target_iou = _scatter_targets(
        cfg, match, gt_labels, pair_valid, iou_score, num_queries
    )
    loss_class = _class_loss(
        cfg, pred_logits, target_classes, target_iou, num_boxes, query_mask
    )
    loss_bbox, loss_giou = _box_losses(src_boxes, gt_boxes, pair_valid, num_boxes)
    return {
        "loss_class": loss_class,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
    }


def criterion_forward(
    cfg: CriterionConfig,
    outputs: Dict,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_boxes: jnp.ndarray,
    row_group=None,
) -> Dict[str, jnp.ndarray]:
    """Losses for final output + per-layer aux + encoder outputs.

    Mirrors SetCriterion.forward (set_criterion.py:133-174): every aux layer
    is re-matched independently. All output sets share (Q, K) shapes, so the
    Hungarian solves are *batched over sets* with one vmapped call — the JV
    while-loops of every set run in lockstep instead of serially (the
    reference runs ~8 scipy solves per image per step).
    """
    if cfg.mixed_match > 1:
        num_queries = outputs["pred_logits"].shape[1]
        base_g = gt_labels.shape[1]
        gt_labels, gt_boxes, gt_valid = tile_targets(
            gt_labels, gt_boxes, gt_valid, cfg.mixed_match, num_queries
        )
        row_group = jnp.tile(jnp.arange(base_g, dtype=jnp.int32), cfg.mixed_match)

    set_names = [""]
    set_logits = [outputs["pred_logits"]]
    set_boxes = [outputs["pred_boxes"]]
    set_labels = [gt_labels]
    if cfg.aux_loss and "aux_outputs" in outputs:
        aux_logits = outputs["aux_outputs"]["pred_logits"]  # (layers-1, B, Q, K)
        for i in range(aux_logits.shape[0]):
            set_names.append(f"_{i}")
            set_logits.append(aux_logits[i])
            set_boxes.append(outputs["aux_outputs"]["pred_boxes"][i])
            set_labels.append(gt_labels)
    if "enc_outputs" in outputs:
        set_names.append("_enc")
        set_logits.append(outputs["enc_outputs"]["pred_logits"])
        set_boxes.append(outputs["enc_outputs"]["pred_boxes"])
        set_labels.append(
            jnp.zeros_like(gt_labels) if cfg.two_stage_binary_cls else gt_labels
        )

    stacked_logits = jnp.stack(set_logits)  # (S, B, Q, K)
    stacked_boxes = jnp.stack(set_boxes)
    stacked_labels = jnp.stack(set_labels)
    match_all = jax.vmap(
        lambda lg, bx, lb: compute_matching(
            cfg, lg, bx, lb, gt_boxes, gt_valid, row_group
        )
    )(stacked_logits, stacked_boxes, stacked_labels)  # (S, B, G)

    losses: Dict[str, jnp.ndarray] = {}
    for i, suffix in enumerate(set_names):
        set_loss = calculate_loss(
            cfg,
            stacked_logits[i],
            stacked_boxes[i],
            stacked_labels[i],
            gt_boxes,
            gt_valid,
            num_boxes,
            match=match_all[i],
        )
        losses.update({f"{k}{suffix}": v for k, v in set_loss.items()})
    return losses


def denoising_loss(
    cfg: CriterionConfig,
    dn_outputs: Dict,  # pred_logits/pred_boxes: (layers, B, dn_cap, ...)
    dn_meta,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_boxes: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """CDN losses with fixed (matching-free) indices.

    Mirrors DNDETRDetector.compute_dn_loss
    (/root/reference/models/detectors/base_detector.py:210-265): positives are
    matched to their own GT, negatives and intra-buffer padding are
    background; num_boxes scales by the group count. Capacity slots beyond the
    used dn region (group >= groups) are excluded via query_mask — they do not
    exist in the reference layout.
    """
    num_layers, bs, dn_cap, _ = dn_outputs["pred_logits"].shape
    dn_num_boxes = num_boxes * dn_meta.groups

    # per-slot gt index (positives), -1 elsewhere
    gt_idx = jnp.clip(dn_meta.dn_gt_index, 0, gt_labels.shape[1] - 1)
    b_idx = jnp.broadcast_to(jnp.arange(bs)[:, None], (bs, dn_cap))
    slot_labels = gt_labels[b_idx, gt_idx]
    slot_boxes = gt_boxes[b_idx, gt_idx]
    positive = dn_meta.dn_positive  # (B, dn_cap)
    target_classes = jnp.where(positive, jnp.clip(slot_labels, 0, cfg.num_classes - 1),
                               cfg.num_classes)
    # slots in used groups (the reference buffer region), incl. per-image padding
    query_mask = jnp.broadcast_to(
        dn_meta.dn_slot_used[None, :], (bs, dn_cap)
    ).astype(jnp.float32)

    losses = {}
    for layer in range(num_layers):
        logits = dn_outputs["pred_logits"][layer]
        boxes = dn_outputs["pred_boxes"][layer]
        target_iou = None
        if cfg.class_loss_type == "vari_focal":
            iou = jax.lax.stop_gradient(
                elementwise_box_iou(box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(slot_boxes))
            )
            target_iou = jnp.where(positive, iou, 0.0)
        loss_class = _class_loss(
            cfg, logits, target_classes, target_iou, dn_num_boxes, query_mask
        )
        loss_bbox, loss_giou = _box_losses(boxes, slot_boxes, positive, dn_num_boxes)
        suffix = "_dn" if layer == num_layers - 1 else f"_dn_{layer}"
        losses[f"loss_class{suffix}"] = loss_class
        losses[f"loss_bbox{suffix}"] = loss_bbox
        losses[f"loss_giou{suffix}"] = loss_giou
    return losses


def build_weight_dict(cfg: CriterionConfig, num_decoder_layers: int, with_dn: bool,
                      with_hybrid: bool) -> Dict[str, float]:
    """Loss-term weights, mirroring the config assembly at
    /root/reference/configs/relation_detr/relation_detr_resnet50_800_1333.py:83-90."""
    base = {
        "loss_class": cfg.weight_class,
        "loss_bbox": cfg.weight_bbox,
        "loss_giou": cfg.weight_giou,
    }
    weights = dict(base)
    if with_dn:
        weights.update({f"{k}_dn": v for k, v in base.items()})
    aux = {}
    for i in range(num_decoder_layers - 1):
        aux.update({f"{k}_{i}": v for k, v in weights.items()})
    weights.update(aux)
    weights.update({f"{k}_enc": v for k, v in base.items()})
    if with_hybrid:
        weights.update({f"{k}_hybrid": v for k, v in weights.items()})
    return weights


def relation_detr_loss(
    cfg: CriterionConfig,
    outputs: Dict,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    hybrid_assign: int = 6,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full Relation-DETR training loss (weighted sum + unweighted dict).

    Mirrors RelationDETR.forward training branch
    (/root/reference/models/detectors/relation_detr.py:109-141).
    """
    num_boxes = jnp.maximum(jnp.sum(gt_valid).astype(jnp.float32), 1.0)

    losses = criterion_forward(
        cfg, outputs, gt_labels, gt_boxes, gt_valid, num_boxes
    )
    if "dn_outputs" in outputs:
        losses.update(
            denoising_loss(
                cfg,
                outputs["dn_outputs"],
                outputs["dn_meta"],
                gt_labels,
                gt_boxes,
                gt_valid,
                num_boxes,
            )
        )
    if "hybrid_outputs" in outputs:
        # targets tiled hybrid_assign x (relation_detr.py:129-134); the
        # criterion recomputes num_boxes from the tiled targets.
        tiled_labels = jnp.tile(gt_labels, (1, hybrid_assign))
        tiled_boxes = jnp.tile(gt_boxes, (1, hybrid_assign, 1))
        tiled_valid = jnp.tile(gt_valid, (1, hybrid_assign))
        hybrid_group = jnp.tile(
            jnp.arange(gt_labels.shape[1], dtype=jnp.int32), hybrid_assign
        )
        hybrid_num_boxes = jnp.maximum(
            jnp.sum(tiled_valid).astype(jnp.float32), 1.0
        )
        hybrid = criterion_forward(
            cfg,
            outputs["hybrid_outputs"],
            tiled_labels,
            tiled_boxes,
            tiled_valid,
            hybrid_num_boxes,
            row_group=hybrid_group,
        )
        losses.update({f"{k}_hybrid": v for k, v in hybrid.items()})

    num_dec_layers = outputs["aux_outputs"]["pred_logits"].shape[0] + 1
    weight_dict = build_weight_dict(
        cfg,
        num_dec_layers,
        with_dn="dn_outputs" in outputs,
        with_hybrid="hybrid_outputs" in outputs,
    )
    total = sum(
        losses[k] * w for k, w in weight_dict.items() if k in losses
    )
    return total, losses
