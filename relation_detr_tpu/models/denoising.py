"""Denoising query generation (DN and contrastive CDN) with static shapes.

Spec: /root/reference/models/bricks/denoising.py. The reference sizes its
buffers dynamically (CDN: 2 * groups * max_gt with
groups = denoising_nums // max_gt, so ~2 * denoising_nums total; DN:
groups * max_gt with a fixed group count).

TPU redesign: buffer capacity is *static*; ``max_gt`` and the effective group
count are traced scalars. Slot ``s`` decodes as::

    rep   = s // max_gt              # repetition of the gt list
    k     = s %  max_gt              # gt slot within the image
    group = rep // reps_per_group    # reps_per_group = 2 for CDN (pos+neg), 1 for DN
    positive = (rep % reps_per_group) == 0   # CDN: even rep positive; DN: all

which reproduces the reference scatter layout [g0_pos | g0_neg | g1_pos | ...]
(denoising.py:313-320). Slots with ``group >= groups`` or ``k >= n_gt[b]`` are
padding: zero queries, isolated in the attention mask, excluded from loss via
``DenoisingMeta``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

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
    groups: jnp.ndarray  # () int32, traced effective group count
    max_gt: jnp.ndarray  # () int32, traced
    dn_valid: jnp.ndarray  # (B, dn_cap) bool — slot holds a real noised query
    dn_positive: jnp.ndarray  # (B, dn_cap) bool — reconstruction slot
    dn_gt_index: jnp.ndarray  # (B, dn_cap) int32 — matched gt slot, -1 otherwise
    dn_slot_used: jnp.ndarray  # (dn_cap,) bool — slot inside the used dn region


def _cdn_box_noise(boxes, positive, box_noise_scale, rng, draws=None):
    """Contrastive noise (denoising.py:202-231): positives jitter inside the
    box, negatives are pushed outside (rand_part + 1), in xyxy space.

    ``draws`` optionally injects the random draws (parity tests vs the torch
    transcription use identical noise on both sides)."""
    if draws is None:
        rng_sign, rng_part = jax.random.split(rng)
        rand_sign = (
            jax.random.randint(rng_sign, boxes.shape, 0, 2).astype(jnp.float32)
            * 2.0 - 1.0
        )
        rand_part = jax.random.uniform(rng_part, boxes.shape)
    else:
        rand_sign = draws["rand_sign"]
        rand_part = draws["rand_part"]
    diff = jnp.concatenate([boxes[..., 2:] / 2, boxes[..., 2:] / 2], axis=-1)
    rand_part = jnp.where(positive[None, :, None], rand_part, rand_part + 1.0)
    xyxy = box_cxcywh_to_xyxy(boxes) + rand_part * rand_sign * diff * box_noise_scale
    return box_xyxy_to_cxcywh(jnp.clip(xyxy, 0.0, 1.0))


def _dn_box_noise(boxes, box_noise_scale, rng, draws=None):
    """DN-DETR noise (denoising.py:56-64): center jitter up to wh/2, size
    jitter up to wh, directly in cxcywh space."""
    u = jax.random.uniform(rng, boxes.shape) if draws is None else draws["noise_u"]
    diff = jnp.concatenate([boxes[..., 2:] / 2, boxes[..., 2:]], axis=-1)
    noise = (u * 2.0 - 1.0) * diff * box_noise_scale
    return jnp.clip(boxes + noise, 0.0, 1.0)


class GenerateDenoisingQueries(nn.Module):
    """Shared DN/CDN generator; ``contrastive=True`` = CDN."""

    num_classes: int
    embed_dim: int = 256
    contrastive: bool = True
    denoising_nums: int = 100  # CDN: target total positives
    denoising_groups: int = 5  # DN: fixed group count
    max_gt_cap_dn: int = 60  # DN: static per-group capacity bound
    label_noise_prob: float = 0.5
    box_noise_scale: float = 1.0
    with_indicator: bool = False

    @property
    def reps_per_group(self) -> int:
        return 2 if self.contrastive else 1

    @property
    def dn_cap(self) -> int:
        if self.contrastive:
            return 2 * self.denoising_nums
        return self.denoising_groups * self.max_gt_cap_dn

    @nn.compact
    def __call__(
        self,
        gt_labels: jnp.ndarray,  # (B, G) int32, padded
        gt_boxes: jnp.ndarray,  # (B, G, 4) normalized cxcywh, padded
        gt_valid: jnp.ndarray,  # (B, G) bool
        num_matching_queries: int,
        rng: jax.Array,
        noise_draws=None,  # optional injected draws (parity tests)
    ):
        bs, max_gt_cap = gt_labels.shape
        dn_cap = self.dn_cap
        rpg = self.reps_per_group
        embed_width = self.embed_dim - 1 if self.with_indicator else self.embed_dim
        label_encoder = nn.Embed(
            self.num_classes,
            embed_width,
            embedding_init=nn.initializers.normal(1.0),
            name="label_encoder",
        )

        n_gt = jnp.sum(gt_valid, axis=1).astype(jnp.int32)  # (B,)
        max_gt = jnp.clip(jnp.max(n_gt), 1, max_gt_cap)
        if self.contrastive:
            # groups = denoising_nums // max_gt, >= 1 (denoising.py:253-254)
            groups = jnp.maximum(self.denoising_nums // max_gt, 1)
        else:
            # fixed group count, reduced only if the static capacity would
            # overflow (crowded images beyond max_gt_cap_dn)
            groups = jnp.maximum(
                jnp.minimum(self.denoising_groups, dn_cap // max_gt), 1
            )

        slots = jnp.arange(dn_cap, dtype=jnp.int32)
        rep = slots // max_gt
        k = slots % max_gt
        group = rep // rpg
        positive = (rep % rpg) == 0
        slot_used = group < groups
        valid = slot_used[None, :] & (k[None, :] < n_gt[:, None])  # (B, dn_cap)

        labels = jnp.take_along_axis(
            gt_labels, jnp.broadcast_to(k[None], (bs, dn_cap)), axis=1
        )
        labels = jnp.clip(labels, 0, self.num_classes - 1)
        boxes = jnp.take_along_axis(
            gt_boxes, jnp.broadcast_to(k[None, :, None], (bs, dn_cap, 4)), axis=1
        )

        rng_flip, rng_new, rng_box = jax.random.split(rng, 3)
        # CDN halves the flip probability (denoising.py:275)
        flip_prob = self.label_noise_prob * (0.5 if self.contrastive else 1.0)
        if noise_draws is None:
            flip_u = jax.random.uniform(rng_flip, (bs, dn_cap))
            random_labels = jax.random.randint(
                rng_new, (bs, dn_cap), 0, self.num_classes
            )
        else:
            flip_u = noise_draws["flip_u"]
            random_labels = noise_draws["random_labels"]
        flip = flip_u < flip_prob
        noised_labels = jnp.where(flip, random_labels, labels)

        if self.contrastive:
            noised_boxes = _cdn_box_noise(
                boxes, positive, self.box_noise_scale, rng_box, noise_draws
            )
        else:
            noised_boxes = _dn_box_noise(
                boxes, self.box_noise_scale, rng_box, noise_draws
            )

        label_queries = label_encoder(noised_labels)  # (B, dn_cap, embed_width)
        if self.with_indicator:
            # dn queries carry indicator 1 (denoising.py:121-122)
            ones = jnp.ones((bs, dn_cap, 1), label_queries.dtype)
            label_queries = jnp.concatenate([label_queries, ones], axis=-1)
        box_queries = inverse_sigmoid(noised_boxes)  # logit space

        label_queries = jnp.where(valid[..., None], label_queries, 0.0)
        box_queries = jnp.where(valid[..., None], box_queries, 0.0)

        # attention bias over [dn | matching] (denoising.py:66-78): matching
        # queries cannot see dn keys; dn queries see only their own group.
        total = dn_cap + num_matching_queries
        q_group = jnp.concatenate(
            [group, jnp.full((num_matching_queries,), -1, jnp.int32)]
        )
        is_dn_key = jnp.arange(total) < dn_cap
        same_group = q_group[:, None] == q_group[None, :]
        blocked = is_dn_key[None, :] & ~same_group
        blocked = blocked & ~jnp.eye(total, dtype=bool)
        attn_bias = jnp.where(blocked, NEG_INF, 0.0)[None, None]  # (1, 1, T, T)

        meta = DenoisingMeta(
            groups=groups,
            max_gt=max_gt,
            dn_valid=valid,
            dn_positive=positive[None, :] & valid,
            dn_gt_index=jnp.where(positive[None, :] & valid, k[None, :], -1),
            dn_slot_used=slot_used,
        )
        return label_queries, box_queries, attn_bias, meta


class GenerateCDNQueries(GenerateDenoisingQueries):
    """Contrastive denoising (DINO-style), spec denoising.py:180-331."""

    contrastive: bool = True
    with_indicator: bool = False


class GenerateDNQueries(GenerateDenoisingQueries):
    """Plain denoising (DN-DETR), spec denoising.py:8-177."""

    contrastive: bool = False
    label_noise_prob: float = 0.2
    box_noise_scale: float = 0.4
    with_indicator: bool = True
