"""Sinusoidal position encodings (functional, NHWC).

Numerical spec: /root/reference/models/bricks/position_encoding.py.
The flagship configs use PositionEmbeddingSine(num_pos_feats=embed_dim//2,
temperature=10000, normalize=True, offset=-0.5)
(/root/reference/configs/relation_detr/relation_detr_resnet50_800_1333.py:32-34).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def _dim_t(num_pos_feats: int, temperature: float) -> jnp.ndarray:
    """temperature ** (2*floor(i/1)/n) over i in [0, n//2).

    Matches get_dim_t at /root/reference/models/bricks/position_encoding.py:101-105.
    """
    i = jnp.arange(num_pos_feats // 2, dtype=jnp.float32)
    return temperature ** (i * 2.0 / num_pos_feats)


def position_embedding_sine(
    mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
    offset: float = -0.5,
) -> jnp.ndarray:
    """DETR sine position embedding from a padding mask.

    Args:
      mask: (B, H, W) bool, True = padding.
    Returns:
      (B, H, W, 2*num_pos_feats); channel order [y-feats, x-feats] matching
      the reference's cat((pos_y, pos_x))
      (/root/reference/models/bricks/position_encoding.py:67).
    """
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    else:
        y_embed = y_embed + offset
        x_embed = x_embed + offset

    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = x_embed[..., None] / dim_t  # (B, H, W, n//2)
    pos_y = y_embed[..., None] / dim_t
    # interleave (sin, cos) pairs -> (B, H, W, n)
    pos_x = jnp.stack([jnp.sin(pos_x), jnp.cos(pos_x)], axis=-1).reshape(
        *pos_x.shape[:-1], -1
    )
    pos_y = jnp.stack([jnp.sin(pos_y), jnp.cos(pos_y)], axis=-1).reshape(
        *pos_y.shape[:-1], -1
    )
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute position embedding.

    Spec: /root/reference/models/bricks/position_encoding.py:71-98 — separate
    row/col embedding tables (uniform[0,1) init), indexed by pixel coordinate
    and concatenated channel-wise as [col(x), row(y)] (note: the opposite
    order from the sine encoding's [y, x]). Unused by the shipped configs but
    part of the reference brick inventory.

    Returns (B, H, W, 2*num_pos_feats) — NHWC, vs the reference's NCHW.
    """

    num_embeddings: int = 50
    num_pos_feats: int = 256

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        b, h, w = mask.shape
        row = self.param(
            "row_embed",
            nn.initializers.uniform(scale=1.0),
            (self.num_embeddings, self.num_pos_feats),
        )
        col = self.param(
            "col_embed",
            nn.initializers.uniform(scale=1.0),
            (self.num_embeddings, self.num_pos_feats),
        )
        x_emb = col[jnp.arange(w)]  # (W, F)
        y_emb = row[jnp.arange(h)]  # (H, F)
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(x_emb[None, :, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(y_emb[:, None, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (b, h, w, 2 * self.num_pos_feats))


def get_sine_pos_embed(
    pos_tensor: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    scale: float = 2 * math.pi,
    exchange_xy: bool = True,
) -> jnp.ndarray:
    """Sine-embed each coordinate of a (..., K) tensor to num_pos_feats dims.

    Matches /root/reference/models/bricks/position_encoding.py:115-138:
    pos * scale / dim_t, (sin, cos) interleaved, optional swap of the first
    two coordinates (so [x, y, ...] embeds as [pos(y), pos(x), ...]).

    Returns: (..., K * num_pos_feats).
    """
    dim_t = _dim_t(num_pos_feats, temperature)
    pos = pos_tensor[..., None] * scale / dim_t  # (..., K, n//2)
    pos = jnp.stack([jnp.sin(pos), jnp.cos(pos)], axis=-1).reshape(
        *pos.shape[:-1], -1
    )  # (..., K, n)
    if exchange_xy and pos.shape[-2] >= 2:
        pos = jnp.concatenate([pos[..., 1:2, :], pos[..., 0:1, :], pos[..., 2:, :]], axis=-2)
    return pos.reshape(*pos.shape[:-2], -1)
