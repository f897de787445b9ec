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


def separable_relation_bias(
    src_boxes: jnp.ndarray,
    tgt_boxes: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    embed_dim: int = 16,
    temperature: float = 10000.0,
    scale: float = 100.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Relation bias with per-box transcendentals for the wh coordinates.

    The wh relation coords are differences of per-box logs —
    ``log((w1+eps)/(w2+eps)) = p_i − q_j`` — so their sine features factor
    by the angle-addition identities:

      sin(f(p−q)) = sin(fp)cos(fq) − cos(fp)sin(fq)
      cos(f(p−q)) = cos(fp)cos(fq) + sin(fp)sin(fq)

    Folding the projection weights in, the wh half of the (pre-ReLU) bias
    is a rank-2·embed_dim bilinear form per head: sin/cos run over N boxes
    instead of N² pairs (×N fewer transcendentals), and the pair mixing is
    one MXU matmul per head. Only the xy coords (``log1p(|Δc|/w1)``, not
    separable) still pay per-pair sin/cos — half the VPU transcendental
    work of the direct embedding. Same math as the reference
    (relation_transformer.py:481-532); fp difference vs the direct form is
    ~1e-4 (identity regrouping at large angles).
    """
    half = embed_dim // 2
    inv = scale / (
        temperature ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / embed_dim)
    )  # (half,)
    xy1, wh1 = src_boxes[..., :2], src_boxes[..., 2:]
    xy2, wh2 = tgt_boxes[..., :2], tgt_boxes[..., 2:]
    num_heads = kernel.shape[1]

    # pairwise xy coords — exactly box_rel_encoding's first two
    delta_xy = jnp.abs(xy1[..., :, None, :] - xy2[..., None, :, :])
    delta_xy = jnp.log(delta_xy / (wh1[..., :, None, :] + eps) + 1.0)
    ang_xy = delta_xy[..., None] * inv  # (B,N1,N2,2,half)
    pos_xy = jnp.stack([jnp.sin(ang_xy), jnp.cos(ang_xy)], axis=-1).reshape(
        *delta_xy.shape[:-1], 2 * embed_dim
    )
    part_xy = jnp.einsum(
        "bijf,fh->bijh", pos_xy, kernel[: 2 * embed_dim],
        preferred_element_type=jnp.float32,
    )

    # separable wh coords: per-box angles only
    p = jnp.log(wh1 + eps)[..., None] * inv  # (B,N1,2,half)
    q = jnp.log(wh2 + eps)[..., None] * inv  # (B,N2,2,half)
    sp, cp = jnp.sin(p), jnp.cos(p)
    sq, cq = jnp.sin(q), jnp.cos(q)
    w_wh = kernel[2 * embed_dim:].reshape(2, half, 2, num_heads)
    ws = jnp.transpose(w_wh[:, :, 0], (2, 0, 1))  # (H, 2, half)
    wc = jnp.transpose(w_wh[:, :, 1], (2, 0, 1))
    alpha = sp[..., None, :, :] * ws + cp[..., None, :, :] * wc  # (B,N1,H,2,half)
    beta = sp[..., None, :, :] * wc - cp[..., None, :, :] * ws
    a_feats = jnp.stack([alpha, beta], axis=-1).reshape(
        *alpha.shape[:2], num_heads, 2 * embed_dim
    )
    b_feats = jnp.stack([cq, sq], axis=-1).reshape(*cq.shape[:2], 2 * embed_dim)
    part_wh = jnp.einsum(
        "bihf,bjf->bijh", a_feats, b_feats, preferred_element_type=jnp.float32
    )
    out = nn.relu(part_xy + part_wh + bias)
    return jnp.transpose(out, (0, 3, 1, 2))  # (B, H, N1, N2)


class _PosProj(nn.Module):
    """Sine-embed + 1x1-conv projection + ReLU, with fused fast paths.

    Owns the same {kernel, bias} params as the nn.Dense it replaces (child
    name "pos_proj" keeps checkpoint/converter paths identical). On TPU the
    default (version 3) computes the wh features separably from per-box
    transcendentals (``separable_relation_bias``); versions 1/2 build the
    sine features in VMEM via ops/relation_pallas.py instead of
    materializing the (B, N1, N2, 4*embed_dim) tensor in HBM.
    """

    embed_dim: int
    num_heads: int
    temperature: float
    scale: float

    @nn.compact
    def __call__(
        self,
        src_boxes: jnp.ndarray,
        tgt_boxes: jnp.ndarray,
        eps: float = 1e-5,
    ) -> jnp.ndarray:
        in_feats = 4 * self.embed_dim
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

        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and relation_pallas.fused_relation_enabled():
            if relation_pallas.fused_relation_version() == 4:
                return relation_pallas.fused_relation_bias_v4(
                    src_boxes, tgt_boxes, kernel, bias,
                    self.embed_dim, self.temperature, self.scale, eps,
                )
            if relation_pallas.fused_relation_version() == 3:
                return separable_relation_bias(
                    src_boxes, tgt_boxes, kernel, bias,
                    self.embed_dim, self.temperature, self.scale, eps,
                )
            return relation_pallas.fused_relation_bias(
                box_rel_encoding(src_boxes, tgt_boxes, eps), kernel, bias,
                self.embed_dim, self.temperature, self.scale,
            )
        pos = get_sine_pos_embed(
            box_rel_encoding(src_boxes, tgt_boxes, eps),
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
        return _PosProj(
            self.embed_dim,
            self.num_heads,
            self.temperature,
            self.scale,
            name="pos_proj",
        )(jax.lax.stop_gradient(src_boxes), jax.lax.stop_gradient(tgt_boxes))
