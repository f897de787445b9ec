"""Torch oracle: an independent re-implementation of the reference
Relation-DETR transformer forward, used for end-to-end numeric parity tests.

The module tree is *named to reproduce the reference's state_dict keys*
(/root/reference/models/bricks/relation_transformer.py module structure), so
`tools/convert_torch_weights.convert_state_dict` can map this oracle's
weights onto the flax model — which value-tests the converter and the full
forward simultaneously.

Semantics follow the reference as spec:
- encoder layer / memory fusion: relation_transformer.py:162-276
- decoder with relation bias + refinement: relation_transformer.py:279-478
- two-stage top-k + hybrid branch: relation_transformer.py:59-159
- two-stage helpers: base_transformer.py:16-124
- MSDA module: ms_deform_attn.py:286-377
- position relation embedding: relation_transformer.py:481-532
"""
from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def inverse_sigmoid(x, eps=1e-3):
    x = x.clamp(min=0, max=1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def get_sine_pos_embed(pos, num_pos_feats=128, temperature=10000.0,
                       scale=2 * math.pi, exchange_xy=True):
    # dim_t per position_encoding.py:102-105; interleave per :131-137
    i = torch.arange(num_pos_feats // 2, dtype=torch.float32)
    dim_t = temperature ** (i * 2.0 / num_pos_feats)
    p = pos.unsqueeze(-1) * scale / dim_t  # (..., K, n//2)
    p = torch.stack((p.sin(), p.cos()), dim=-1).flatten(-2)  # (..., K, n)
    if exchange_xy and p.shape[-2] >= 2:
        p = torch.cat([p[..., 1:2, :], p[..., 0:1, :], p[..., 2:, :]], dim=-2)
    return p.flatten(-2)


class MLP(nn.Module):
    def __init__(self, in_dim, hidden, out_dim, num_layers):
        super().__init__()
        dims = [in_dim] + [hidden] * (num_layers - 1)
        self.num_layers = num_layers
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [out_dim])
        )

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < self.num_layers - 1 else layer(x)
        return x


class MultiScaleDeformableAttention(nn.Module):
    def __init__(self, embed_dim, num_levels, num_heads, num_points):
        super().__init__()
        self.embed_dim, self.num_heads = embed_dim, num_heads
        self.num_levels, self.num_points = num_levels, num_points
        self.sampling_offsets = nn.Linear(embed_dim, num_heads * num_levels * num_points * 2)
        self.attention_weights = nn.Linear(embed_dim, num_heads * num_levels * num_points)
        self.value_proj = nn.Linear(embed_dim, embed_dim)
        self.output_proj = nn.Linear(embed_dim, embed_dim)

    def forward(self, query, reference_points, value, spatial_shapes,
                key_padding_mask=None):
        bs, num_query, _ = query.shape
        h_, l_, p_ = self.num_heads, self.num_levels, self.num_points
        head_dim = self.embed_dim // h_
        v = self.value_proj(value)
        if key_padding_mask is not None:
            v = v.masked_fill(key_padding_mask[..., None], 0.0)
        v = v.view(bs, -1, h_, head_dim)

        offsets = self.sampling_offsets(query).view(bs, num_query, h_, l_, p_, 2)
        attn = self.attention_weights(query).view(bs, num_query, h_, l_ * p_)
        attn = attn.softmax(-1).view(bs, num_query, h_, l_, p_)

        if reference_points.shape[-1] == 2:
            normalizer = torch.tensor(
                [[w, h] for h, w in spatial_shapes], dtype=torch.float32
            )
            locs = (reference_points[:, :, None, :, None, :]
                    + offsets / normalizer[None, None, None, :, None, :])
        else:
            locs = (reference_points[:, :, None, :, None, :2]
                    + offsets / p_ * reference_points[:, :, None, :, None, 2:] * 0.5)

        grids = 2 * locs - 1
        start, per_level = 0, []
        for lvl, (h, w) in enumerate(spatial_shapes):
            vl = v[:, start:start + h * w]
            start += h * w
            vl = vl.permute(0, 2, 3, 1).reshape(bs * h_, head_dim, h, w)
            g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(
                bs * h_, num_query, p_, 2
            )
            per_level.append(
                F.grid_sample(vl, g, mode="bilinear", padding_mode="zeros",
                              align_corners=False)
            )
        stacked = torch.stack(per_level, dim=-2)  # (B*H, D, Q, L, P)
        attn_r = attn.permute(0, 2, 1, 3, 4).reshape(bs * h_, 1, num_query, l_, p_)
        out = (stacked * attn_r).sum(dim=(-2, -1))
        out = out.reshape(bs, h_, head_dim, num_query).permute(0, 3, 1, 2)
        return self.output_proj(out.reshape(bs, num_query, self.embed_dim))


class EncoderLayer(nn.Module):
    def __init__(self, embed_dim, d_ffn, num_heads, num_levels, num_points):
        super().__init__()
        self.self_attn = MultiScaleDeformableAttention(
            embed_dim, num_levels, num_heads, num_points)
        self.norm1 = nn.LayerNorm(embed_dim)
        self.linear1 = nn.Linear(embed_dim, d_ffn)
        self.linear2 = nn.Linear(d_ffn, embed_dim)
        self.norm2 = nn.LayerNorm(embed_dim)

    def forward(self, query, query_pos, reference_points, spatial_shapes,
                key_padding_mask):
        src2 = self.self_attn(query + query_pos, reference_points, query,
                              spatial_shapes, key_padding_mask)
        query = self.norm1(query + src2)
        query = self.norm2(query + self.linear2(F.relu(self.linear1(query))))
        return query


class Encoder(nn.Module):
    def __init__(self, num_layers, embed_dim, d_ffn, num_heads, num_levels,
                 num_points):
        super().__init__()
        self.layers = nn.ModuleList(
            EncoderLayer(embed_dim, d_ffn, num_heads, num_levels, num_points)
            for _ in range(num_layers)
        )
        self.memory_fusion = nn.Sequential(
            nn.Linear((num_layers + 1) * embed_dim, embed_dim),
            nn.ReLU(),
            nn.Linear(embed_dim, embed_dim),
            nn.LayerNorm(embed_dim),
        )

    def forward(self, query, query_pos, reference_points, spatial_shapes,
                key_padding_mask):
        queries = [query]
        for layer in self.layers:
            query = layer(query, query_pos, reference_points, spatial_shapes,
                          key_padding_mask)
            queries.append(query)
        return self.memory_fusion(torch.cat(queries, -1))


def box_rel_encoding(src_boxes, tgt_boxes, eps=1e-5):
    xy1, wh1 = src_boxes.split([2, 2], -1)
    xy2, wh2 = tgt_boxes.split([2, 2], -1)
    delta_xy = torch.abs(xy1.unsqueeze(-2) - xy2.unsqueeze(-3))
    delta_xy = torch.log(delta_xy / (wh1.unsqueeze(-2) + eps) + 1.0)
    delta_wh = torch.log((wh1.unsqueeze(-2) + eps) / (wh2.unsqueeze(-3) + eps))
    return torch.cat([delta_xy, delta_wh], -1)


class PositionRelationEmbedding(nn.Module):
    def __init__(self, embed_dim=16, num_heads=8):
        super().__init__()
        # Conv2dNormActivation(norm_layer=None) => Sequential(Conv2d, ReLU)
        self.pos_proj = nn.Sequential(
            nn.Conv2d(embed_dim * 4, num_heads, 1), nn.ReLU()
        )
        self.embed_dim = embed_dim

    def forward(self, src_boxes, tgt_boxes):
        pos = box_rel_encoding(src_boxes, tgt_boxes)
        pos = get_sine_pos_embed(pos, self.embed_dim, scale=100.0,
                                 exchange_xy=False).permute(0, 3, 1, 2)
        return self.pos_proj(pos)


class DecoderLayer(nn.Module):
    def __init__(self, embed_dim, d_ffn, num_heads, num_levels, num_points):
        super().__init__()
        self.embed_dim, self.num_heads = embed_dim, num_heads
        self.cross_attn = MultiScaleDeformableAttention(
            embed_dim, num_levels, num_heads, num_points)
        self.norm1 = nn.LayerNorm(embed_dim)
        self.self_attn = nn.MultiheadAttention(embed_dim, num_heads,
                                               batch_first=True)
        self.norm2 = nn.LayerNorm(embed_dim)
        self.linear1 = nn.Linear(embed_dim, d_ffn)
        self.linear2 = nn.Linear(d_ffn, embed_dim)
        self.norm3 = nn.LayerNorm(embed_dim)

    def forward(self, query, query_pos, reference_points, value,
                spatial_shapes, key_padding_mask, self_attn_mask):
        qk = query + query_pos
        q2 = self.self_attn(qk, qk, query, attn_mask=self_attn_mask,
                            need_weights=False)[0]
        query = self.norm2(query + q2)
        q2 = self.cross_attn(query + query_pos, reference_points, value,
                             spatial_shapes, key_padding_mask)
        query = self.norm1(query + q2)
        query = self.norm3(query + self.linear2(F.relu(self.linear1(query))))
        return query


class Decoder(nn.Module):
    def __init__(self, num_layers, num_classes, embed_dim, d_ffn, num_heads,
                 num_levels, num_points):
        super().__init__()
        self.embed_dim, self.num_layers = embed_dim, num_layers
        self.layers = nn.ModuleList(
            DecoderLayer(embed_dim, d_ffn, num_heads, num_levels, num_points)
            for _ in range(num_layers)
        )
        self.ref_point_head = MLP(2 * embed_dim, embed_dim, embed_dim, 2)
        self.query_scale = MLP(embed_dim, embed_dim, embed_dim, 2)
        self.class_head = nn.ModuleList(
            nn.Linear(embed_dim, num_classes) for _ in range(num_layers))
        self.bbox_head = nn.ModuleList(
            MLP(embed_dim, embed_dim, 4, 3) for _ in range(num_layers))
        self.norm = nn.LayerNorm(embed_dim)
        self.position_relation_embedding = PositionRelationEmbedding(16, num_heads)

    def forward(self, query, reference_points, value, spatial_shapes,
                valid_ratios, key_padding_mask, attn_mask=None,
                skip_relation=False):
        outputs_classes, outputs_coords = [], []
        valid_ratio_scale = torch.cat([valid_ratios, valid_ratios], -1)[:, None]
        pos_relation = attn_mask
        tgt_boxes = None
        for layer_idx, layer in enumerate(self.layers):
            ref_input = reference_points.detach()[:, :, None] * valid_ratio_scale
            query_sine = get_sine_pos_embed(ref_input[:, :, 0, :],
                                            self.embed_dim // 2)
            query_pos = self.ref_point_head(query_sine)
            if layer_idx != 0:
                query_pos = query_pos * self.query_scale(query)
            query = layer(query, query_pos, ref_input, value, spatial_shapes,
                          key_padding_mask, pos_relation)
            normed = self.norm(query)
            output_class = self.class_head[layer_idx](normed)
            output_coord = (self.bbox_head[layer_idx](normed)
                            + inverse_sigmoid(reference_points)).sigmoid()
            outputs_classes.append(output_class)
            outputs_coords.append(output_coord)
            if layer_idx == self.num_layers - 1:
                break
            if not skip_relation:
                src_boxes = tgt_boxes if layer_idx >= 1 else reference_points
                tgt_boxes = output_coord
                pos_relation = self.position_relation_embedding(
                    src_boxes, tgt_boxes).flatten(0, 1)
                if attn_mask is not None:
                    pos_relation = pos_relation.masked_fill(
                        attn_mask, float("-inf"))
            reference_points = (
                self.bbox_head[layer_idx](query)
                + inverse_sigmoid(reference_points.detach())
            ).sigmoid()
        return torch.stack(outputs_classes), torch.stack(outputs_coords)


class RelationTransformer(nn.Module):
    """Names match the reference state_dict under a `transformer.` prefix."""

    def __init__(self, num_classes, embed_dim=32, d_ffn=64, num_heads=4,
                 num_levels=3, num_points=4, num_encoder_layers=2,
                 num_decoder_layers=2, two_stage_num_proposals=20,
                 hybrid_num_proposals=30):
        super().__init__()
        self.num_classes = num_classes
        self.embed_dim = embed_dim
        self.two_stage_num_proposals = two_stage_num_proposals
        self.hybrid_num_proposals = hybrid_num_proposals
        self.encoder = Encoder(num_encoder_layers, embed_dim, d_ffn, num_heads,
                               num_levels, num_points)
        self.decoder = Decoder(num_decoder_layers, num_classes, embed_dim,
                               d_ffn, num_heads, num_levels, num_points)
        self.level_embeds = nn.Parameter(torch.randn(num_levels, embed_dim))
        self.enc_output = nn.Linear(embed_dim, embed_dim)
        self.enc_output_norm = nn.LayerNorm(embed_dim)
        self.tgt_embed = nn.Embedding(two_stage_num_proposals, embed_dim)
        self.encoder_class_head = nn.Linear(embed_dim, num_classes)
        self.encoder_bbox_head = MLP(embed_dim, embed_dim, 4, 3)
        self.hybrid_tgt_embed = nn.Embedding(hybrid_num_proposals, embed_dim)
        self.hybrid_class_head = nn.Linear(embed_dim, num_classes)
        self.hybrid_bbox_head = MLP(embed_dim, embed_dim, 4, 3)

    @staticmethod
    def flatten_multi_level(elements):
        flat = torch.cat([e.flatten(-2) for e in elements], dim=-1)
        return flat.transpose(1, 2) if flat.ndim == 3 else flat

    @staticmethod
    def get_valid_ratios(mask):
        _, h, w = mask.shape
        valid_h = torch.sum(~mask[:, :, 0], 1).float()
        valid_w = torch.sum(~mask[:, 0, :], 1).float()
        return torch.stack([valid_w / w, valid_h / h], -1)

    def get_reference(self, spatial_shapes, valid_ratios):
        refs = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            ry, rx = torch.meshgrid(torch.arange(0.5, h + 0.5),
                                    torch.arange(0.5, w + 0.5), indexing="ij")
            ry = ry.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
            rx = rx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
            refs.append(torch.stack((rx, ry), -1))
        full = torch.cat(refs, 1)
        reference_points = full[:, :, None] * valid_ratios[:, None]
        wh = torch.cat([
            torch.full((h * w, 2), 0.05 * 2.0 ** lvl)
            for lvl, (h, w) in enumerate(spatial_shapes)
        ])[None].expand_as(full)
        proposals = torch.cat([full, wh], -1)
        return reference_points, proposals

    def get_encoder_output(self, memory, proposals, memory_padding_mask):
        valid = ((proposals > 0.01) & (proposals < 0.99)).all(-1, keepdim=True)
        proposals = torch.log(proposals / (1 - proposals))
        invalid = memory_padding_mask.unsqueeze(-1) | ~valid
        proposals = proposals.masked_fill(invalid, float("inf"))
        output_memory = memory * (~memory_padding_mask.unsqueeze(-1)) * valid
        return self.enc_output_norm(self.enc_output(output_memory)), proposals

    def forward(self, multi_level_feats, multi_level_masks,
                multi_level_pos_embeds, noised_label_query=None,
                noised_box_query=None, attn_mask=None, training=False):
        feat_flatten = self.flatten_multi_level(multi_level_feats)
        mask_flatten = self.flatten_multi_level(multi_level_masks)
        lvl_pos = [p + l.view(1, -1, 1, 1)
                   for p, l in zip(multi_level_pos_embeds, self.level_embeds)]
        lvl_pos_flatten = self.flatten_multi_level(lvl_pos)
        spatial_shapes = [tuple(m.shape[-2:]) for m in multi_level_masks]
        valid_ratios = torch.stack(
            [self.get_valid_ratios(m) for m in multi_level_masks], 1)
        reference_points, proposals = self.get_reference(spatial_shapes,
                                                         valid_ratios)

        memory = self.encoder(feat_flatten, lvl_pos_flatten, reference_points,
                              spatial_shapes, mask_flatten)

        output_memory, output_proposals = self.get_encoder_output(
            memory, proposals, mask_flatten)
        enc_class = self.encoder_class_head(output_memory)
        enc_coord = (self.encoder_bbox_head(output_memory)
                     + output_proposals).sigmoid()
        topk = self.two_stage_num_proposals
        topk_index = torch.topk(enc_class.max(-1)[0], topk, dim=1)[1][..., None]
        enc_class = enc_class.gather(
            1, topk_index.expand(-1, -1, self.num_classes))
        enc_coord = enc_coord.gather(1, topk_index.expand(-1, -1, 4))

        reference = enc_coord.detach()
        bs = feat_flatten.shape[0]
        target = self.tgt_embed.weight.expand(bs, -1, -1)

        hybrid_class = hybrid_coord = hybrid_enc_class = hybrid_enc_coord = None
        if training:
            hybrid_enc_class = self.hybrid_class_head(output_memory)
            hybrid_enc_coord = (self.hybrid_bbox_head(output_memory)
                                + output_proposals).sigmoid()
            k = self.hybrid_num_proposals
            idx = torch.topk(hybrid_enc_class.max(-1)[0], k, dim=1)[1][..., None]
            hybrid_enc_class = hybrid_enc_class.gather(
                1, idx.expand(-1, -1, self.num_classes))
            hybrid_enc_coord = hybrid_enc_coord.gather(1, idx.expand(-1, -1, 4))
            hybrid_reference = hybrid_enc_coord.detach()
            hybrid_target = self.hybrid_tgt_embed.weight.expand(bs, -1, -1)

        if noised_label_query is not None and noised_box_query is not None:
            target = torch.cat([noised_label_query, target], 1)
            reference = torch.cat([noised_box_query.sigmoid(), reference], 1)

        outputs_classes, outputs_coords = self.decoder(
            target, reference, memory, spatial_shapes, valid_ratios,
            mask_flatten, attn_mask=attn_mask)

        if training:
            hybrid_class, hybrid_coord = self.decoder(
                hybrid_target, hybrid_reference, memory, spatial_shapes,
                valid_ratios, mask_flatten, skip_relation=True)

        return (outputs_classes, outputs_coords, enc_class, enc_coord,
                hybrid_class, hybrid_coord, hybrid_enc_class, hybrid_enc_coord)


class DetectorShell(nn.Module):
    """Gives the transformer the `transformer.` state_dict prefix the
    converter expects (relation_detr.py module tree)."""

    def __init__(self, transformer):
        super().__init__()
        self.transformer = transformer


# ---------------------------------------------------------------------------
# Full-detector oracle (round-3): FrozenBN ResNet-50 + ChannelMapper +
# PositionEmbeddingSine + PostProcess, named to reproduce the reference
# detector's state_dict keys (relation_detr.py module tree) so
# convert_state_dict maps backbone/neck/batch_stats too.
# ---------------------------------------------------------------------------


class FrozenBatchNorm2d(nn.Module):
    """Spec: /root/reference/models/bricks/misc.py:9-59."""

    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(num_features))
        self.register_buffer("bias", torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def forward(self, x):
        w = self.weight.reshape(1, -1, 1, 1)
        b = self.bias.reshape(1, -1, 1, 1)
        rv = self.running_var.reshape(1, -1, 1, 1)
        rm = self.running_mean.reshape(1, -1, 1, 1)
        scale = w * (rv + self.eps).rsqrt()
        return x * scale + (b - rm * scale)


class Bottleneck(nn.Module):
    """torchvision Bottleneck with FrozenBN
    (spec: /root/reference/models/backbones/resnet.py:100-158)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = FrozenBatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = FrozenBatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = FrozenBatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class ResNet50Backbone(nn.Module):
    """torchvision-style resnet50 returning layer2..layer4 features
    (spec: /root/reference/models/backbones/resnet.py:63-339,444-451;
    the reference freezes BN via FrozenBatchNorm2d)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = FrozenBatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        layers = [3, 4, 6, 3]
        self.inplanes = 64
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                FrozenBatchNorm2d(planes * 4),
            )
        out = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        out += [Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*out)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c3, c4, c5]


class ChannelMapper(nn.Module):
    """Spec: /root/reference/models/necks/channel_mapper.py:27-89 — the extra
    stride-2 levels append to the SAME `convs` list; norm is GroupNorm(32),
    no activation (config norm_layer=GN, activation_layer=None)."""

    def __init__(self, in_channels, out_channels, num_outs):
        super().__init__()
        convs = []
        for c in in_channels:
            convs.append(nn.Sequential(
                nn.Conv2d(c, out_channels, 1, bias=False),
                nn.GroupNorm(32, out_channels),
            ))
        c = in_channels[-1]
        for _ in range(num_outs - len(in_channels)):
            convs.append(nn.Sequential(
                nn.Conv2d(c, out_channels, 3, 2, 1, bias=False),
                nn.GroupNorm(32, out_channels),
            ))
            c = out_channels
        self.convs = nn.ModuleList(convs)
        self.num_inputs = len(in_channels)

    def forward(self, feats):
        outs = [self.convs[i](feats[i]) for i in range(self.num_inputs)]
        for i in range(self.num_inputs, len(self.convs)):
            src = feats[-1] if i == self.num_inputs else outs[-1]
            outs.append(self.convs[i](src))
        return outs


def position_embedding_sine(mask, num_pos_feats, temperature=10000.0,
                            scale=2 * math.pi, offset=-0.5):
    """Spec: /root/reference/models/bricks/position_encoding.py:49-68
    (normalize=True, offset=-0.5, eps=1e-6)."""
    not_mask = (~mask).int()
    y_embed = not_mask.cumsum(1).float()
    x_embed = not_mask.cumsum(2).float()
    y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + 1e-6) * scale
    x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + 1e-6) * scale
    i = torch.arange(num_pos_feats // 2, dtype=torch.float32)
    dim_t = temperature ** (i * 2.0 / num_pos_feats)
    dim_t = dim_t.repeat_interleave(2)  # get_dim_t: position_encoding.py:101-105
    pos_x = x_embed.unsqueeze(-1) / dim_t
    pos_y = y_embed.unsqueeze(-1) / dim_t
    pos_x = torch.stack(
        (pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), -1).flatten(-2)
    pos_y = torch.stack(
        (pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), -1).flatten(-2)
    return torch.cat((pos_y, pos_x), 3).permute(0, 3, 1, 2)


def post_process_topk(pred_logits, pred_boxes, target_sizes, topk):
    """Spec: /root/reference/models/bricks/post_process.py:28-43 — flat top-k
    over (queries x classes) of sigmoid scores, cxcywh->xyxy, scale."""
    prob = pred_logits.sigmoid()
    bs, q, k = prob.shape
    scores, idx = torch.topk(prob.view(bs, -1), topk, dim=1)
    topk_boxes = torch.div(idx, k, rounding_mode="trunc")
    labels = idx % k
    cx, cy, w, h = pred_boxes.unbind(-1)
    boxes = torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    boxes = torch.gather(boxes, 1, topk_boxes.unsqueeze(-1).repeat(1, 1, 4))
    img_h, img_w = target_sizes.unbind(1)
    scale = torch.stack([img_w, img_h, img_w, img_h], 1)
    return boxes * scale[:, None, :], scores, labels


class FullDetector(nn.Module):
    """Eval-mode reference detector: backbone -> neck -> masks/pos-embeds ->
    transformer (spec: relation_detr.py:51-144 + base_detector.py:153-165).
    State_dict names mirror the reference detector module tree."""

    def __init__(self, transformer, num_classes, embed_dim):
        super().__init__()
        self.backbone = ResNet50Backbone()
        self.neck = ChannelMapper([512, 1024, 2048], embed_dim,
                                  len(transformer.level_embeds))
        self.transformer = transformer
        # CDN generator's label encoder rides in checkpoints
        # (relation_detr.py:42-49); eval forward does not use it
        self.denoising_generator = nn.Module()
        self.denoising_generator.label_encoder = nn.Embedding(
            num_classes, embed_dim)
        self.embed_dim = embed_dim

    def forward(self, images, mask):
        feats = self.neck(self.backbone(images))
        masks = [
            F.interpolate(mask[None].float(), size=f.shape[-2:]).to(torch.bool)[0]
            for f in feats
        ]
        pos = [
            position_embedding_sine(m, self.embed_dim // 2) for m in masks
        ]
        return self.transformer(feats, masks, pos, training=False)
