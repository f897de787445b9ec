"""Relation-DETR detector (flax module, static shapes).

Spec: /root/reference/models/detectors/relation_detr.py and
/root/reference/models/detectors/base_detector.py:152-281.

TPU-first split of responsibilities vs. the reference:
- image resize/normalize/pad-to-bucket happens on the host (data pipeline),
  not inside the model — the model consumes a static (B, H, W, 3) canvas and a
  padding mask (the reference performs eval resize inside forward,
  base_detector.py:60-80, which would force dynamic shapes under jit).
- the model returns raw output pytrees; loss (criterion) and COCO decoding
  (post_process) are separate pure functions, so the same apply fits under
  jax.grad / pjit without branching on mode.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from relation_detr_tpu.models.backbones import build_backbone
from relation_detr_tpu.models.denoising import (
    DenoisingMeta,
    GenerateDenoisingQueries,
)
from relation_detr_tpu.models.neck import ChannelMapper
from relation_detr_tpu.models.position_encoding import position_embedding_sine
from relation_detr_tpu.models.transformer import RelationTransformer


def downsample_mask(mask: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor mask downsample, matching F.interpolate(mode='nearest')
    at /root/reference/models/detectors/base_detector.py:159-160."""
    b, in_h, in_w = mask.shape
    out_h, out_w = out_hw
    rows = (np.arange(out_h) * in_h) // out_h
    cols = (np.arange(out_w) * in_w) // out_w
    return mask[:, rows][:, :, cols]


class RelationDETR(nn.Module):
    """Full detector: backbone -> neck -> transformer (+ CDN when training).

    Call returns a dict of output heads; see ``losses/criterion.py`` for the
    training loss and ``models/post_process.py`` for COCO decoding.
    """

    num_classes: int
    embed_dim: int = 256
    num_queries: int = 900
    hybrid_num_proposals: int = 1500
    hybrid_assign: int = 6
    denoising_nums: int = 100
    num_feature_levels: int = 4
    num_heads: int = 8
    dim_feedforward: int = 2048
    transformer_enc_layers: int = 6
    transformer_dec_layers: int = 6
    backbone_arch: str = "resnet50"
    # model-family switches (DINO++ / Def-DETR++ / DN++ / DAB++ reuse this body)
    encoder_memory_fusion: bool = True
    decoder_use_relation: bool = True
    with_hybrid: bool = True
    denoising: Optional[str] = "cdn"  # "cdn" | "dn" | None
    dn_groups: int = 5  # for denoising == "dn"
    query_source: str = "tgt_embed"  # "tgt_embed" | "memory" | "learned_anchor"
    backbone_dtype: Optional[str] = None  # e.g. "bfloat16" compute dtype
    # transformer compute dtype ("bfloat16" = the reference's
    # --mixed-precision bf16, main.py:28-35; fp32 islands stay fp32)
    compute_dtype: Optional[str] = None
    # per-stage DCN switch for ResNet archs (reference resnet.py:188-193)
    backbone_stage_with_dcn: Optional[Tuple[bool, bool, bool, bool]] = None
    dropout: float = 0.0  # transformer dropout (shipped configs use 0.0)
    # rematerialization policy for transformer layers (none|dots|dots_no_batch);
    # "dots" saves matmul outputs so bf16 cast chains don't re-run in the
    # backward sweep (models/transformer.py::resolve_remat_policy)
    remat_policy: Optional[str] = None

    def setup(self):
        dtype = jnp.dtype(self.backbone_dtype) if self.backbone_dtype else None
        bb_kwargs = {}
        if self.backbone_stage_with_dcn is not None:
            bb_kwargs["stage_with_dcn"] = tuple(self.backbone_stage_with_dcn)
        self.backbone = build_backbone(
            self.backbone_arch, name="backbone", dtype=dtype, **bb_kwargs
        )
        self.neck = ChannelMapper(
            num_inputs=len(self.backbone.num_channels),
            out_channels=self.embed_dim,
            num_outs=self.num_feature_levels,
            name="neck",
        )
        self.transformer = RelationTransformer(
            num_classes=self.num_classes,
            embed_dim=self.embed_dim,
            d_ffn=self.dim_feedforward,
            num_heads=self.num_heads,
            num_feature_levels=self.num_feature_levels,
            num_encoder_layers=self.transformer_enc_layers,
            num_decoder_layers=self.transformer_dec_layers,
            two_stage_num_proposals=self.num_queries,
            hybrid_num_proposals=self.hybrid_num_proposals if self.with_hybrid else 0,
            encoder_memory_fusion=self.encoder_memory_fusion,
            decoder_use_relation=self.decoder_use_relation,
            query_source=self.query_source,
            learned_query_indicator=self.denoising == "dn",
            dropout=self.dropout,
            remat_policy=self.remat_policy,
            dtype=jnp.dtype(self.compute_dtype) if self.compute_dtype else None,
            name="transformer",
        )
        if self.denoising == "cdn":
            self.denoising_generator = GenerateDenoisingQueries(
                num_classes=self.num_classes,
                embed_dim=self.embed_dim,
                contrastive=True,
                denoising_nums=self.denoising_nums,
                label_noise_prob=0.5,
                box_noise_scale=1.0,
                name="denoising_generator",
            )
        elif self.denoising == "dn":
            self.denoising_generator = GenerateDenoisingQueries(
                num_classes=self.num_classes,
                embed_dim=self.embed_dim,
                contrastive=False,
                denoising_groups=self.dn_groups,
                label_noise_prob=0.2,
                box_noise_scale=0.4,
                with_indicator=True,
                name="denoising_generator",
            )

    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) normalized float
        mask: jnp.ndarray,  # (B, H, W) bool, True = padding
        gt_labels: Optional[jnp.ndarray] = None,  # (B, G) int32
        gt_boxes: Optional[jnp.ndarray] = None,  # (B, G, 4) normalized cxcywh
        gt_valid: Optional[jnp.ndarray] = None,  # (B, G) bool
        train: bool = False,
    ):
        feats = self.backbone(images)
        multi_level_feats = list(self.neck(feats))
        multi_level_masks = [
            downsample_mask(mask, f.shape[1:3]) for f in multi_level_feats
        ]
        multi_level_pos = [
            position_embedding_sine(
                m, num_pos_feats=self.embed_dim // 2, normalize=True, offset=-0.5
            )
            for m in multi_level_masks
        ]

        dn_meta: Optional[DenoisingMeta] = None
        noised_label_queries = noised_box_queries = attn_bias = None
        if train and self.denoising is not None:
            rng = self.make_rng("denoising")
            noised_label_queries, noised_box_queries, attn_bias, dn_meta = (
                self.denoising_generator(
                    gt_labels, gt_boxes, gt_valid, self.num_queries, rng
                )
            )

        (
            outputs_class,  # (layers, B, Qdn+Q, K)
            outputs_coord,
            enc_class,
            enc_coord,
            hybrid_class,
            hybrid_coord,
            hybrid_enc_class,
            hybrid_enc_coord,
        ) = self.transformer(
            multi_level_feats,
            multi_level_masks,
            multi_level_pos,
            noised_label_queries,
            noised_box_queries,
            attn_bias=attn_bias,
            train=train and self.with_hybrid,
        )

        outputs = {}
        if dn_meta is not None:
            dn_cap = self.denoising_generator.dn_cap
            dn_class, outputs_class = outputs_class[:, :, :dn_cap], outputs_class[:, :, dn_cap:]
            dn_coord, outputs_coord = outputs_coord[:, :, :dn_cap], outputs_coord[:, :, dn_cap:]
            outputs["dn_outputs"] = {"pred_logits": dn_class, "pred_boxes": dn_coord}
            outputs["dn_meta"] = dn_meta

        outputs["pred_logits"] = outputs_class[-1]
        outputs["pred_boxes"] = outputs_coord[-1]
        outputs["aux_outputs"] = {
            "pred_logits": outputs_class[:-1],
            "pred_boxes": outputs_coord[:-1],
        }
        if enc_class is not None:
            outputs["enc_outputs"] = {
                "pred_logits": enc_class, "pred_boxes": enc_coord
            }
        if hybrid_class is not None:
            outputs["hybrid_outputs"] = {
                "pred_logits": hybrid_class[-1],
                "pred_boxes": hybrid_coord[-1],
                "aux_outputs": {
                    "pred_logits": hybrid_class[:-1],
                    "pred_boxes": hybrid_coord[:-1],
                },
                "enc_outputs": {
                    "pred_logits": hybrid_enc_class,
                    "pred_boxes": hybrid_enc_coord,
                },
            }
        return outputs
