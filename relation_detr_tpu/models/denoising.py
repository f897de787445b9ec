"""Contrastive denoising (CDN) query generation with static shapes.

Spec: /root/reference/models/bricks/denoising.py:180-331. The reference sizes
its buffers dynamically as 2 * groups * max_gt where
groups = denoising_nums // max_gt (so the total is ~2 * denoising_nums).

TPU redesign: the buffer capacity is the *static* bound
``dn_cap = 2 * denoising_nums``; ``max_gt`` and ``groups`` are traced scalars.
Slot ``s`` decodes as::

    rep   = s // max_gt          # 0..2*groups-1 used
    k     = s %  max_gt          # gt slot within the image
    group = rep // 2
    positive = rep % 2 == 0      # even rep = positive, odd = negative

which reproduces the reference layout [g0_pos | g0_neg | g1_pos | ...]
(scatter at /root/reference/models/bricks/denoising.py:313-320). Slots with
``group >= groups`` or ``k >= n_gt[b]`` are padding: zero queries, isolated in
the attention mask, excluded from loss via ``DenoisingMeta``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from relation_detr_tpu.models.transformer import NEG_INF
from relation_detr_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    inverse_sigmoid,
)


class DenoisingMeta(NamedTuple):
    groups: jnp.ndarray  # () int32, traced
    max_gt: jnp.ndarray  # () int32, traced
    dn_valid: jnp.ndarray  # (B, dn_cap) bool — slot holds a real noised query
    dn_positive: jnp.ndarray  # (B, dn_cap) bool — positive (reconstruction) slot
    dn_gt_index: jnp.ndarray  # (B, dn_cap) int32 — gt slot matched to a positive


class GenerateCDNQueries(nn.Module):
    """Contrastive denoising query generator (static capacity)."""

    num_classes: int
    embed_dim: int = 256
    denoising_nums: int = 100
    label_noise_prob: float = 0.5
    box_noise_scale: float = 1.0

    @property
    def dn_cap(self) -> int:
        return 2 * self.denoising_nums

    @nn.compact
    def __call__(
        self,
        gt_labels: jnp.ndarray,  # (B, G) int32, padded
        gt_boxes: jnp.ndarray,  # (B, G, 4) normalized cxcywh, padded
        gt_valid: jnp.ndarray,  # (B, G) bool
        num_matching_queries: int,
        rng: jax.Array,
    ):
        bs, max_gt_cap = gt_labels.shape
        dn_cap = self.dn_cap
        label_encoder = nn.Embed(
            self.num_classes,
            self.embed_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="label_encoder",
        )

        n_gt = jnp.sum(gt_valid, axis=1).astype(jnp.int32)  # (B,)
        max_gt = jnp.clip(jnp.max(n_gt), 1, max_gt_cap)
        # groups = denoising_nums * max_gt // max(max_gt**2, 1), >= 1
        # (/root/reference/models/bricks/denoising.py:253-254)
        groups = jnp.maximum(self.denoising_nums // max_gt, 1)

        slots = jnp.arange(dn_cap, dtype=jnp.int32)
        rep = slots // max_gt  # (dn_cap,)
        k = slots % max_gt
        group = rep // 2
        positive = rep % 2 == 0
        slot_used = group < groups  # used by the dn layout at all
        valid = slot_used[None, :] & (k[None, :] < n_gt[:, None])  # (B, dn_cap)

        labels = jnp.take_along_axis(
            gt_labels, jnp.broadcast_to(k[None], (bs, dn_cap)), axis=1
        )
        labels = jnp.clip(labels, 0, self.num_classes - 1)
        boxes = jnp.take_along_axis(
            gt_boxes, jnp.broadcast_to(k[None, :, None], (bs, dn_cap, 4)), axis=1
        )

        rng_label_mask, rng_label_new, rng_sign, rng_part = jax.random.split(rng, 4)
        # label noise with prob * 0.5 (/root/reference/models/bricks/denoising.py:275)
        flip = (
            jax.random.uniform(rng_label_mask, (bs, dn_cap)) < self.label_noise_prob * 0.5
        )
        random_labels = jax.random.randint(
            rng_label_new, (bs, dn_cap), 0, self.num_classes
        )
        noised_labels = jnp.where(flip, random_labels, labels)

        # contrastive box noise (/root/reference/models/bricks/denoising.py:202-231):
        # positives jitter inside the box, negatives are pushed outside
        # (rand_part + 1), applied in xyxy space with diff = (w/2, h/2, w/2, h/2).
        diff = jnp.concatenate([boxes[..., 2:] / 2, boxes[..., 2:] / 2], axis=-1)
        rand_sign = (
            jax.random.randint(rng_sign, (bs, dn_cap, 4), 0, 2).astype(jnp.float32) * 2.0
            - 1.0
        )
        rand_part = jax.random.uniform(rng_part, (bs, dn_cap, 4))
        rand_part = jnp.where(positive[None, :, None], rand_part, rand_part + 1.0)
        rand_part = rand_part * rand_sign
        xyxy = box_cxcywh_to_xyxy(boxes)
        xyxy = xyxy + rand_part * diff * self.box_noise_scale
        xyxy = jnp.clip(xyxy, 0.0, 1.0)
        noised_boxes = box_xyxy_to_cxcywh(xyxy)

        label_queries = label_encoder(noised_labels)  # (B, dn_cap, C)
        box_queries = inverse_sigmoid(noised_boxes)  # logit space

        label_queries = jnp.where(valid[..., None], label_queries, 0.0)
        box_queries = jnp.where(valid[..., None], box_queries, 0.0)

        # attention bias over [dn | matching] queries
        # (/root/reference/models/bricks/denoising.py:66-78): matching queries
        # cannot see dn keys; dn queries see only their own group's dn keys
        # (padding slots land in out-of-range groups => isolated, but the
        # diagonal stays open so softmax rows never go all -inf).
        total = dn_cap + num_matching_queries
        q_group = jnp.concatenate(
            [group, jnp.full((num_matching_queries,), -1, jnp.int32)]
        )
        is_dn = jnp.arange(total) < dn_cap
        same_group = q_group[:, None] == q_group[None, :]
        blocked = is_dn[None, :] & ~same_group  # key is dn & different group
        blocked = blocked & ~jnp.eye(total, dtype=bool)
        attn_bias = jnp.where(blocked, NEG_INF, 0.0)[None, None]  # (1, 1, T, T)

        meta = DenoisingMeta(
            groups=groups,
            max_gt=max_gt,
            dn_valid=valid,
            dn_positive=positive[None, :] & valid,
            dn_gt_index=jnp.where(positive[None, :] & valid, k[None, :], -1),
        )
        return label_queries, box_queries, attn_bias, meta
