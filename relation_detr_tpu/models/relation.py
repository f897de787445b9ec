"""Position relation embedding — the paper's core novelty.

Spec: /root/reference/models/bricks/relation_transformer.py:481-532. Pairwise
box geometry (|delta center| / src wh, log wh ratio) is sine-embedded per
coordinate (16 feats, temperature 1e4, scale 100, no gradient) and projected
by a 1x1 conv + ReLU to one additive attention-bias value per head.

TPU-first: the 1x1 conv over an NCHW (B, 64, N, N) map is expressed as a
Dense over the trailing feature dim of (B, N, N, 64) — identical math, MXU
friendly, no layout shuffles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from relation_detr_tpu.models.layers import torch_linear_bias_init
from relation_detr_tpu.models.position_encoding import get_sine_pos_embed


def box_rel_encoding(
    src_boxes: jnp.ndarray, tgt_boxes: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Pairwise 4-vector relation of cxcywh boxes.

    Mirrors /root/reference/models/bricks/relation_transformer.py:481-490.
    src_boxes: (B, N1, 4), tgt_boxes: (B, N2, 4) -> (B, N1, N2, 4).
    """
    xy1, wh1 = src_boxes[..., :2], src_boxes[..., 2:]
    xy2, wh2 = tgt_boxes[..., :2], tgt_boxes[..., 2:]
    delta_xy = jnp.abs(xy1[..., :, None, :] - xy2[..., None, :, :])
    delta_xy = jnp.log(delta_xy / (wh1[..., :, None, :] + eps) + 1.0)
    delta_wh = jnp.log((wh1[..., :, None, :] + eps) / (wh2[..., None, :, :] + eps))
    return jnp.concatenate([delta_xy, delta_wh], axis=-1)


class _PosProj(nn.Module):
    """Sine-embed + 1x1-conv projection + ReLU, with a fused Pallas path.

    Owns the same {kernel, bias} params as the nn.Dense it replaces (child
    name "pos_proj" keeps checkpoint/converter paths identical). On TPU the
    sine features are computed in VMEM by ops/relation_pallas.py instead of
    materializing the (B, N1, N2, 4*embed_dim) tensor in HBM.
    """

    embed_dim: int
    num_heads: int
    temperature: float
    scale: float

    @nn.compact
    def __call__(self, rel: jnp.ndarray) -> jnp.ndarray:
        in_feats = rel.shape[-1] * self.embed_dim
        # torch Conv2d default init (kaiming_uniform(a=sqrt(5)) over fan_in)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (in_feats, self.num_heads),
        )
        bias = self.param(
            "bias", torch_linear_bias_init(in_feats), (self.num_heads,)
        )
        from relation_detr_tpu.ops import relation_pallas

        if jax.default_backend() == "tpu" and relation_pallas.fused_relation_enabled():
            return relation_pallas.fused_relation_bias(
                rel, kernel, bias, self.embed_dim, self.temperature, self.scale
            )
        pos = get_sine_pos_embed(
            rel,
            num_pos_feats=self.embed_dim,
            temperature=self.temperature,
            scale=self.scale,
            exchange_xy=False,
        )  # (B, N1, N2, 4 * embed_dim)
        out = nn.relu(pos @ kernel + bias)
        return jnp.transpose(out, (0, 3, 1, 2))  # (B, H, N1, N2)


class PositionRelationEmbedding(nn.Module):
    """Box-pair geometry -> per-head additive attention bias (B, H, N1, N2)."""

    embed_dim: int = 16
    num_heads: int = 8
    temperature: float = 10000.0
    scale: float = 100.0

    @nn.compact
    def __call__(self, src_boxes: jnp.ndarray, tgt_boxes: jnp.ndarray) -> jnp.ndarray:
        # sine embedding carries no gradient
        # (/root/reference/models/bricks/relation_transformer.py:527-529)
        rel = box_rel_encoding(
            jax.lax.stop_gradient(src_boxes), jax.lax.stop_gradient(tgt_boxes)
        )
        rel = jax.lax.stop_gradient(rel)
        return _PosProj(
            self.embed_dim,
            self.num_heads,
            self.temperature,
            self.scale,
            name="pos_proj",
        )(rel)
