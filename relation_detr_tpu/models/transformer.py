"""Relation-DETR transformer stack (encoder, decoder, two-stage + hybrid).

Spec: /root/reference/models/bricks/relation_transformer.py and
/root/reference/models/bricks/base_transformer.py:101-124. Design differences
from the reference are TPU-driven, not behavioral:

- spatial shapes are static tuples; every gather/top-k has a fixed shape.
- the CDN attention mask arrives as an additive float bias (B|1, 1|H, Q, Q)
  with -inf for blocked pairs; the position-relation bias is merged into it
  rather than materializing bool masks.
- dropout defaults to 0.0 (the shipped configs' setting,
  /root/reference/configs/relation_detr/relation_detr_resnet50_800_1333.py:51)
  and is applied at the reference's three insertion points per layer when set.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from relation_detr_tpu.models import base_transformer as bt
from relation_detr_tpu.models.attention import (
    MultiheadAttention,
    MultiScaleDeformableAttention,
)
from relation_detr_tpu.models.layers import (
    MLP,
    prior_prob_bias_init,
    with_pos_embed,
    xavier_uniform,
    zeros_init,
)
from relation_detr_tpu.models.position_encoding import get_sine_pos_embed
from relation_detr_tpu.models.relation import PositionRelationEmbedding
from relation_detr_tpu.ops.boxes import inverse_sigmoid

NEG_INF = -1e9  # finite -inf stand-in: keeps softmax rows with all-blocked keys NaN-free


def resolve_remat_policy(name: Optional[str]):
    """Map a config string to a jax.checkpoint rematerialization policy.

    "dots" saves matmul outputs (cheap recompute stays, the MXU work and —
    crucially under bf16 — the cast chains feeding dots do not re-run in the
    backward sweep); "dots_no_batch" is the stricter variant; "save_all"
    disables recompute entirely (every residual saved — B=1-only memory
    profile). None/"none" keeps full rematerialization (the fp32 default,
    lowest memory)."""
    if name in (None, "none"):
        return None
    policies = {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
        # no recompute at all: every residual is saved. Viable at B=1 only
        # because the tiled-MSDA custom VJPs shrank the saved set from the
        # round-1 49G gather residuals to A/patch-sized operands.
        "save_all": jax.checkpoint_policies.everything_saveable,
    }
    if name not in policies:
        raise ValueError(
            f"unknown remat policy {name!r}; use none|" + "|".join(policies)
        )
    return policies[name]


class TransformerEncoderLayer(nn.Module):
    """MSDA self-attention + FFN (pre-add + LayerNorm).

    Spec: /root/reference/models/bricks/relation_transformer.py:208-276.
    ``spatial_shapes`` is a module field (trace-time constant) so the layer
    can be wrapped in nn.remat without static-argument plumbing.
    """

    spatial_shapes: Tuple[Tuple[int, int], ...]
    embed_dim: int = 256
    d_ffn: int = 2048
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.0  # shipped configs use 0.0 (config:51); capability parity
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, query, query_pos, reference_points, key_padding_mask,
                 deterministic: bool = True):
        drop = lambda x: nn.Dropout(self.dropout, name=None)(x, deterministic=deterministic) \
            if self.dropout > 0 else x
        attn = MultiScaleDeformableAttention(
            self.embed_dim, self.num_levels, self.num_heads, self.num_points,
            dtype=self.dtype, name="self_attn",
        )(
            query=with_pos_embed(query, query_pos),
            reference_points=reference_points,
            value=query,
            spatial_shapes=self.spatial_shapes,
            key_padding_mask=key_padding_mask,
        )
        query = nn.LayerNorm(name="norm1")(query + drop(attn))
        ffn = nn.Dense(self.d_ffn, kernel_init=xavier_uniform, dtype=self.dtype,
                       name="linear1")(query)
        ffn = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                       name="linear2")(drop(nn.relu(ffn)))
        return nn.LayerNorm(name="norm2")(query + drop(ffn))


class RelationTransformerEncoder(nn.Module):
    """Encoder with memory fusion over all layer outputs.

    Spec: /root/reference/models/bricks/relation_transformer.py:162-205.
    Layers are rematerialized (jax.checkpoint) by default: without it the
    backward pass stores every MSDA gather residual — 6 layers x ~16 x 87MB
    activations (observed 49GB HBM ask at 800x1344) — with it, gathers are
    recomputed in the backward sweep.
    """

    embed_dim: int = 256
    d_ffn: int = 2048
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_layers: int = 6
    memory_fusion: bool = True  # False => plain DINO encoder (dino_transformer.py:117-151)
    remat: bool = True
    remat_policy: Optional[str] = None  # see resolve_remat_policy
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, query_pos, reference_points, spatial_shapes,
                 key_padding_mask, deterministic: bool = True):
        layer_cls = (
            nn.remat(TransformerEncoderLayer, static_argnums=(5,),
                     policy=resolve_remat_policy(self.remat_policy))
            if self.remat
            else TransformerEncoderLayer
        )
        states = [query]
        for i in range(self.num_layers):
            query = layer_cls(
                tuple(spatial_shapes),
                self.embed_dim,
                self.d_ffn,
                self.num_heads,
                self.num_levels,
                self.num_points,
                self.dropout,
                self.dtype,
                name=f"layers_{i}",
            )(query, query_pos, reference_points, key_padding_mask, deterministic)
            states.append(query)
        if not self.memory_fusion:
            return query
        fused = jnp.concatenate(states, axis=-1)
        fused = nn.Dense(self.embed_dim, dtype=self.dtype, name="fusion_0")(fused)
        fused = nn.relu(fused)
        fused = nn.Dense(self.embed_dim, dtype=self.dtype, name="fusion_1")(fused)
        return nn.LayerNorm(name="fusion_norm")(fused)


class TransformerDecoderLayer(nn.Module):
    """MHA self-attention (with additive bias) + MSDA cross-attention + FFN.

    Spec: /root/reference/models/bricks/relation_transformer.py:386-478.
    """

    embed_dim: int = 256
    d_ffn: int = 2048
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query,
        query_pos,
        reference_points,
        value,
        spatial_shapes,
        key_padding_mask,
        self_attn_bias: Optional[jnp.ndarray],
        deterministic: bool = True,
        packed_tables=None,  # shared raw corner-pack tables (decoder prepack)
    ):
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic) \
            if self.dropout > 0 else x
        q_with_pos = with_pos_embed(query, query_pos)
        attn = MultiheadAttention(self.embed_dim, self.num_heads,
                                  dtype=self.dtype, name="self_attn")(
            query=q_with_pos, key=q_with_pos, value=query, attn_bias=self_attn_bias
        )
        query = nn.LayerNorm(name="norm2")(query + drop(attn))

        cross = MultiScaleDeformableAttention(
            self.embed_dim, self.num_levels, self.num_heads, self.num_points,
            dtype=self.dtype, name="cross_attn",
        )(
            query=with_pos_embed(query, query_pos),
            reference_points=reference_points,
            value=value,
            spatial_shapes=spatial_shapes,
            key_padding_mask=key_padding_mask,
            packed_tables=packed_tables,
        )
        query = nn.LayerNorm(name="norm1")(query + drop(cross))

        ffn = nn.Dense(self.d_ffn, kernel_init=xavier_uniform, dtype=self.dtype,
                       name="linear1")(query)
        ffn = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                       name="linear2")(drop(nn.relu(ffn)))
        return nn.LayerNorm(name="norm3")(query + drop(ffn))


class RelationTransformerDecoder(nn.Module):
    """Decoder with iterative box refinement, look-forward-twice, and the
    position-relation attention bias between consecutive layers' boxes.

    Spec: /root/reference/models/bricks/relation_transformer.py:279-383.
    """

    num_classes: int
    embed_dim: int = 256
    d_ffn: int = 2048
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_layers: int = 6
    use_relation: bool = True  # False => plain DINO-style decoder without relation bias
    dropout: float = 0.0
    remat: bool = True  # rematerialize layers in the backward pass
    remat_policy: Optional[str] = None  # see resolve_remat_policy
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query,  # (B, Q, C)
        reference_points,  # (B, Q, 4) sigmoid space
        value,  # (B, S, C)
        spatial_shapes,
        valid_ratios,  # (B, L, 2)
        key_padding_mask,  # (B, S)
        attn_bias: Optional[jnp.ndarray] = None,  # (B|1, 1, Q, Q) CDN bias, -inf blocked
        skip_relation: bool = False,
        deterministic: bool = True,
        packed_tables=None,  # prepacked raw corner tables (shared across layers)
    ):
        ref_point_head = MLP(self.embed_dim, self.embed_dim, 2, name="ref_point_head")
        query_scale = MLP(self.embed_dim, self.embed_dim, 2, name="query_scale")
        norm = nn.LayerNorm(name="norm")
        relation_embed = (
            PositionRelationEmbedding(16, self.num_heads, name="position_relation_embedding")
            if self.use_relation
            else None
        )

        valid_ratio_scale = jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None]  # (B,1,L,4)

        outputs_classes = []
        outputs_coords = []
        pos_relation = attn_bias  # fallback, matches relation_transformer.py:335
        tgt_boxes = None
        for layer_idx in range(self.num_layers):
            ref_input = (
                jax.lax.stop_gradient(reference_points)[:, :, None] * valid_ratio_scale
            )  # (B, Q, L, 4)
            query_sine = get_sine_pos_embed(ref_input[:, :, 0, :], self.embed_dim // 2)
            query_pos = ref_point_head(query_sine)
            if layer_idx != 0:
                query_pos = query_pos * query_scale(query)

            layer_cls = (
                nn.remat(TransformerDecoderLayer, static_argnums=(5, 8),
                         policy=resolve_remat_policy(self.remat_policy))
                if self.remat
                else TransformerDecoderLayer
            )
            query = layer_cls(
                self.embed_dim,
                self.d_ffn,
                self.num_heads,
                self.num_levels,
                self.num_points,
                self.dropout,
                self.dtype,
                name=f"layers_{layer_idx}",
            )(
                query,
                query_pos,
                ref_input,
                value,
                tuple(spatial_shapes),
                key_padding_mask,
                pos_relation,
                deterministic,
                packed_tables,
            )

            normed = norm(query)
            bbox_head = MLP(
                self.embed_dim,
                4,
                3,
                last_kernel_init=zeros_init,
                name=f"bbox_head_{layer_idx}",
            )
            output_class = nn.Dense(
                self.num_classes,
                bias_init=prior_prob_bias_init(0.01),
                name=f"class_head_{layer_idx}",
            )(normed)
            # look-forward-twice: reference_points NOT detached here
            # (relation_transformer.py:356-362)
            output_coord = nn.sigmoid(bbox_head(normed) + inverse_sigmoid(reference_points))
            outputs_classes.append(output_class)
            outputs_coords.append(output_coord)

            if layer_idx == self.num_layers - 1:
                break

            if relation_embed is not None and not skip_relation:
                src_boxes = tgt_boxes if layer_idx >= 1 else reference_points
                tgt_boxes = output_coord
                pos_relation = relation_embed(src_boxes, tgt_boxes)  # (B, H, Q, Q)
                if attn_bias is not None:
                    pos_relation = pos_relation + attn_bias  # -inf blocks survive addition

            # iterative refinement on detached references
            # (relation_transformer.py:377-379); the bbox head sees the raw
            # (un-normed) query, matching the reference.
            reference_points = nn.sigmoid(
                bbox_head(query) + inverse_sigmoid(jax.lax.stop_gradient(reference_points))
            )

        return jnp.stack(outputs_classes), jnp.stack(outputs_coords)


class RelationTransformer(nn.Module):
    """Two-stage transformer with hybrid-branch training.

    Spec: /root/reference/models/bricks/relation_transformer.py:16-159 plus
    the two-stage helpers at
    /root/reference/models/bricks/base_transformer.py:84-124.
    """

    num_classes: int
    embed_dim: int = 256
    d_ffn: int = 2048
    num_heads: int = 8
    num_feature_levels: int = 4
    num_points: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    two_stage_num_proposals: int = 900
    hybrid_num_proposals: int = 1500
    encoder_memory_fusion: bool = True
    decoder_use_relation: bool = True
    dropout: float = 0.0
    # model-family switches:
    # "tgt_embed"      — learned content queries + two-stage box proposals
    #                    (Relation-DETR / DINO, relation_transformer.py:99)
    # "memory"         — content queries gathered from encoder memory
    #                    (DAB two-stage, dab_transformer.py:78)
    # "learned_anchor" — single-stage learned queries + learned anchor boxes
    #                    (DN, dn_transformer.py:36-48, 77-87)
    query_source: str = "tgt_embed"
    learned_query_indicator: bool = False  # DN: last channel is an indicator
    remat_policy: Optional[str] = None  # see resolve_remat_policy
    # compute dtype for the transformer stack (Dense/attention matmuls);
    # fp32 islands: MSDA sampling core, softmaxes, LayerNorms, box math, heads
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder = RelationTransformerEncoder(
            self.embed_dim,
            self.d_ffn,
            self.num_heads,
            self.num_feature_levels,
            self.num_points,
            self.num_encoder_layers,
            memory_fusion=self.encoder_memory_fusion,
            dropout=self.dropout,
            remat_policy=self.remat_policy,
            dtype=self.dtype,
            name="encoder",
        )
        self.decoder = RelationTransformerDecoder(
            self.num_classes,
            self.embed_dim,
            self.d_ffn,
            self.num_heads,
            self.num_feature_levels,
            self.num_points,
            self.num_decoder_layers,
            use_relation=self.decoder_use_relation,
            dropout=self.dropout,
            remat_policy=self.remat_policy,
            dtype=self.dtype,
            name="decoder",
        )
        self.level_embeds = self.param(
            "level_embeds",
            nn.initializers.normal(1.0),
            (self.num_feature_levels, self.embed_dim),
        )
        self.two_stage = self.query_source in ("tgt_embed", "memory")
        if self.two_stage:
            self.enc_output = nn.Dense(
                self.embed_dim, kernel_init=xavier_uniform, bias_init=zeros_init,
                name="enc_output",
            )
            self.enc_output_norm = nn.LayerNorm(name="enc_output_norm")
            self.encoder_class_head = nn.Dense(
                self.num_classes, bias_init=prior_prob_bias_init(0.01),
                name="encoder_class_head",
            )
            self.encoder_bbox_head = MLP(
                self.embed_dim, 4, 3, last_kernel_init=zeros_init,
                name="encoder_bbox_head",
            )
        if self.query_source == "tgt_embed":
            self.tgt_embed = self.param(
                "tgt_embed",
                nn.initializers.normal(1.0),
                (self.two_stage_num_proposals, self.embed_dim),
            )
        elif self.query_source == "learned_anchor":
            # DN: zero-init content queries (minus indicator col) + learned
            # anchors initialized uniform -> clamped logit (dn_transformer.py:44-48)
            width = self.embed_dim - (1 if self.learned_query_indicator else 0)
            self.tgt_embed = self.param(
                "tgt_embed", zeros_init, (self.two_stage_num_proposals, width)
            )

            def _refpoint_init(key, shape, dtype=jnp.float32):
                u = jax.random.uniform(key, shape, dtype)
                return jnp.clip(inverse_sigmoid(u), -3.0, 3.0)

            self.refpoint_embed = self.param(
                "refpoint_embed", _refpoint_init, (self.two_stage_num_proposals, 4)
            )
        if self.hybrid_num_proposals > 0:
            self.hybrid_tgt_embed = self.param(
                "hybrid_tgt_embed",
                nn.initializers.normal(1.0),
                (self.hybrid_num_proposals, self.embed_dim),
            )
            self.hybrid_class_head = nn.Dense(
                self.num_classes, bias_init=prior_prob_bias_init(0.01),
                name="hybrid_class_head",
            )
            self.hybrid_bbox_head = MLP(
                self.embed_dim, 4, 3, last_kernel_init=zeros_init,
                name="hybrid_bbox_head",
            )

    def get_encoder_output(self, memory, proposals, memory_padding_mask):
        """Mask invalid proposals, inverse-sigmoid them, and project memory.

        Spec: /root/reference/models/bricks/base_transformer.py:116-124.
        """
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), axis=-1, keepdims=True)
        p = jnp.clip(proposals, 1e-7, 1.0 - 1e-7)
        proposals_logit = jnp.log(p / (1.0 - p))
        invalid = memory_padding_mask[..., None] | ~valid
        proposals_logit = jnp.where(invalid, jnp.inf, proposals_logit)
        output_memory = memory * (~memory_padding_mask[..., None]) * valid
        output_memory = self.enc_output_norm(self.enc_output(output_memory))
        return output_memory, proposals_logit

    def _select_topk(self, class_logits, coords, k):
        """Top-k proposals by max class logit (relation_transformer.py:92-95)."""
        scores = jnp.max(class_logits, axis=-1)  # (B, S)
        _, topk_index = jax.lax.top_k(scores, k)  # (B, k)
        topk_class = jnp.take_along_axis(class_logits, topk_index[..., None], axis=1)
        topk_coord = jnp.take_along_axis(coords, topk_index[..., None], axis=1)
        return topk_class, topk_coord, topk_index

    def __call__(
        self,
        multi_level_feats: Sequence[jnp.ndarray],  # NHWC per level
        multi_level_masks: Sequence[jnp.ndarray],  # (B, H, W) True = pad
        multi_level_pos_embeds: Sequence[jnp.ndarray],  # NHWC per level
        noised_label_query: Optional[jnp.ndarray] = None,  # (B, Qdn, C)
        noised_box_query: Optional[jnp.ndarray] = None,  # (B, Qdn, 4) logit space
        attn_bias: Optional[jnp.ndarray] = None,  # (B|1, 1, Qt, Qt)
        train: bool = False,
    ):
        spatial_shapes = bt.get_spatial_shapes(multi_level_masks)
        feat_flatten = bt.flatten_multi_level(multi_level_feats)
        mask_flatten = bt.flatten_multi_level(multi_level_masks)
        lvl_pos = [
            p + self.level_embeds[i][None, None, None, :]
            for i, p in enumerate(multi_level_pos_embeds)
        ]
        lvl_pos_flatten = bt.flatten_multi_level(lvl_pos)
        valid_ratios = bt.multi_level_valid_ratios(multi_level_masks)
        reference_points, proposals = bt.get_reference(spatial_shapes, valid_ratios)

        memory = self.encoder(
            query=feat_flatten,
            query_pos=lvl_pos_flatten,
            reference_points=reference_points,
            spatial_shapes=spatial_shapes,
            key_padding_mask=mask_flatten,
            deterministic=not train,
        )

        bs = feat_flatten.shape[0]
        hybrid_enc_class = hybrid_enc_coord = None
        if self.two_stage:
            output_memory, output_proposals = self.get_encoder_output(
                memory, proposals, mask_flatten
            )
            enc_class = self.encoder_class_head(output_memory)
            enc_coord = nn.sigmoid(
                self.encoder_bbox_head(output_memory) + output_proposals
            )
            enc_class, enc_coord, topk_index = self._select_topk(
                enc_class, enc_coord, self.two_stage_num_proposals
            )
            reference = jax.lax.stop_gradient(enc_coord)
            if self.query_source == "memory":
                # DAB: content queries are the selected memory features
                # (dab_transformer.py:78)
                target = jax.lax.stop_gradient(
                    jnp.take_along_axis(output_memory, topk_index[..., None], axis=1)
                )
            else:
                target = jnp.broadcast_to(
                    self.tgt_embed[None], (bs, *self.tgt_embed.shape)
                )

            if train and self.hybrid_num_proposals > 0:
                hybrid_enc_class = self.hybrid_class_head(output_memory)
                hybrid_enc_coord = nn.sigmoid(
                    self.hybrid_bbox_head(output_memory) + output_proposals
                )
                hybrid_enc_class, hybrid_enc_coord, _ = self._select_topk(
                    hybrid_enc_class, hybrid_enc_coord, self.hybrid_num_proposals
                )
                hybrid_reference = jax.lax.stop_gradient(hybrid_enc_coord)
                hybrid_target = jnp.broadcast_to(
                    self.hybrid_tgt_embed[None], (bs, *self.hybrid_tgt_embed.shape)
                )
        else:
            # DN single-stage: learned queries (+ zero indicator column for the
            # matching part) and learned anchors (dn_transformer.py:77-87)
            enc_class = enc_coord = None
            tgt = self.tgt_embed
            if self.learned_query_indicator:
                tgt = jnp.concatenate(
                    [tgt, jnp.zeros((tgt.shape[0], 1), tgt.dtype)], axis=-1
                )
            target = jnp.broadcast_to(tgt[None], (bs, *tgt.shape))
            reference = nn.sigmoid(
                jnp.broadcast_to(
                    self.refpoint_embed[None], (bs, *self.refpoint_embed.shape)
                )
            )

        if noised_label_query is not None and noised_box_query is not None:
            target = jnp.concatenate([noised_label_query, target], axis=1)
            reference = jnp.concatenate(
                [nn.sigmoid(noised_box_query), reference], axis=1
            )

        # decoder prepack: the 4-corner pack of the raw memory is built ONCE
        # and shared by every decoder layer of both passes; each layer then
        # applies its own value_proj as a block-diagonal MXU einsum
        # (ops/msda.py::corner_pack_raw_tables — exact, pack & proj commute)
        from relation_detr_tpu.ops import msda as msda_ops

        packed_tables = None
        if msda_ops.decoder_prepack_enabled():
            packed_tables = msda_ops.corner_pack_raw_tables(
                memory, tuple(spatial_shapes), mask_flatten
            )

        outputs_classes, outputs_coords = self.decoder(
            query=target,
            reference_points=reference,
            value=memory,
            spatial_shapes=spatial_shapes,
            valid_ratios=valid_ratios,
            key_padding_mask=mask_flatten,
            attn_bias=attn_bias,
            deterministic=not train,
            packed_tables=packed_tables,
        )

        if train and self.hybrid_num_proposals > 0:
            hybrid_classes, hybrid_coords = self.decoder(
                query=hybrid_target,
                reference_points=hybrid_reference,
                value=memory,
                spatial_shapes=spatial_shapes,
                valid_ratios=valid_ratios,
                key_padding_mask=mask_flatten,
                attn_bias=None,
                skip_relation=True,
                deterministic=not train,
                packed_tables=packed_tables,
            )
        else:
            hybrid_classes = hybrid_coords = None

        return (
            outputs_classes,
            outputs_coords,
            enc_class,
            enc_coord,
            hybrid_classes,
            hybrid_coords,
            hybrid_enc_class,
            hybrid_enc_coord,
        )
