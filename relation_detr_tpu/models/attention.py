"""Attention modules: dense MHA with additive bias and MS deformable attention.

TPU-first: the decoder self-attention consumes the position-relation bias as
an additive (B, heads, Q, K) term on the logits — one fused matmul-softmax
chain on the MXU, mirroring nn.MultiheadAttention with a float attn_mask
(/root/reference/models/bricks/relation_transformer.py:452-459).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from relation_detr_tpu.models.layers import xavier_uniform, zeros_init
from relation_detr_tpu.ops.msda import (
    msda_prepacked,
    multi_scale_deformable_attention,
    project_corner_pack_tables,
)


class MultiheadAttention(nn.Module):
    """Dense multi-head attention with an optional additive logit bias.

    Parameter layout mirrors torch's in_proj/out_proj split
    (xavier_uniform init per
    /root/reference/models/bricks/relation_transformer.py:422-425) so a
    weight converter can map checkpoints 1:1.
    """

    embed_dim: int
    num_heads: int
    # compute dtype for the projections/matmuls (params stay fp32); the
    # softmax runs in fp32 regardless (torch-autocast island parity)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        key: jnp.ndarray,  # (B, K, C)
        value: jnp.ndarray,  # (B, K, C)
        attn_bias: Optional[jnp.ndarray] = None,  # (B, H, Q, K) additive, -inf = masked
    ) -> jnp.ndarray:
        head_dim = self.embed_dim // self.num_heads
        q = nn.Dense(self.embed_dim, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.embed_dim, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(self.embed_dim, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="v_proj")(value)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        if attn_bias is not None:
            logits = logits + attn_bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)  # fp32 island
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        out = out.reshape(out.shape[0], out.shape[1], self.embed_dim)
        return nn.Dense(
            self.embed_dim, kernel_init=xavier_uniform, bias_init=zeros_init,
            dtype=self.dtype, name="out_proj",
        )(out)


class _DenseParams(nn.Module):
    """Declares {kernel, bias} with nn.Dense's names/shapes/inits without
    applying them — lets a caller reuse the same parameters in a different
    (mathematically identical) contraction, e.g. the decoder prepack path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", xavier_uniform, (self.in_features, self.features)
        )
        bias = self.param("bias", zeros_init, (self.features,))
        return kernel, bias


def _sampling_offsets_bias_init(num_heads: int, num_levels: int, num_points: int):
    """Per-head radial offset bias.

    Mirrors /root/reference/models/bricks/ms_deform_attn.py:266-278: head h
    points along angle 2*pi*h/H, normalized to unit chebyshev length, tiled
    over levels, scaled by (point_index + 1).
    """

    def init(key, shape, dtype=jnp.float32):
        thetas = jnp.arange(num_heads, dtype=jnp.float32) * (2.0 * math.pi / num_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)  # (H, 2)
        grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
        scale = jnp.arange(1, num_points + 1, dtype=jnp.float32)[None, None, :, None]
        grid = grid * scale
        return grid.reshape(-1).astype(dtype)

    return init


class MultiScaleDeformableAttention(nn.Module):
    """Multi-scale deformable attention (Deformable-DETR).

    Spec: /root/reference/models/bricks/ms_deform_attn.py:215-377. The core
    sampling runs through the gather/Pallas op in fp32; projections follow the
    reference init (zero offsets weight + radial bias, zero attention weights,
    xavier value/output projections).
    """

    embed_dim: int = 256
    num_levels: int = 4
    num_heads: int = 8
    num_points: int = 4
    # compute dtype for the projections (params stay fp32); the sampling
    # core + location math + softmax stay fp32 (the fp32 island the reference
    # keeps under AMP, ms_deform_attn.py:358-373)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        reference_points: jnp.ndarray,  # (B, Q, L, 2) or (B, Q, L, 4), in [0,1]
        value: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],  # static
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True = pad
        packed_tables=None,  # corner_pack_raw_tables(value) — decoder prepack
    ) -> jnp.ndarray:
        bs, num_queries, _ = query.shape
        num_value = value.shape[1]
        head_dim = self.embed_dim // self.num_heads
        h, l, p = self.num_heads, self.num_levels, self.num_points

        # value_proj params declared explicitly (same names/shapes/init as
        # the nn.Dense they replace, so checkpoints and the torch converter
        # are unaffected): the prepack path consumes them in a block-diagonal
        # einsum over the shared raw corner tables instead of projecting the
        # raw memory per layer (ops/msda.py::project_corner_pack_tables).
        vp_kernel, vp_bias = _DenseParams(
            self.embed_dim, self.embed_dim, name="value_proj"
        )()
        if packed_tables is None:
            compute = (self.dtype or jnp.float32)
            value = (
                value.astype(compute) @ vp_kernel.astype(compute)
                + vp_bias.astype(compute)
            )
            if key_padding_mask is not None:
                value = jnp.where(key_padding_mask[..., None], 0.0, value)
            value = value.reshape(bs, num_value, h, head_dim)

        sampling_offsets = nn.Dense(
            h * l * p * 2,
            kernel_init=zeros_init,
            bias_init=_sampling_offsets_bias_init(h, l, p),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).astype(jnp.float32).reshape(bs, num_queries, h, l, p, 2)
        attention_weights = nn.Dense(
            h * l * p, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="attention_weights",
        )(query).astype(jnp.float32).reshape(bs, num_queries, h, l * p)
        attention_weights = jax.nn.softmax(attention_weights, axis=-1).reshape(
            bs, num_queries, h, l, p
        )

        if reference_points.shape[-1] == 2:
            # (w, h) normalizer per level
            normalizer = jnp.asarray(
                [(w_, h_) for h_, w_ in spatial_shapes], jnp.float32
            )  # (L, 2)
            sampling_locations = (
                reference_points[:, :, None, :, None, :]
                + sampling_offsets / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            sampling_locations = (
                reference_points[:, :, None, :, None, :2]
                + sampling_offsets / p * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        else:
            raise ValueError(
                f"reference_points last dim must be 2 or 4, got {reference_points.shape[-1]}"
            )

        # recorded only when an "intermediates"-mutable apply asks for them
        # (free otherwise): lets utils/clamp_check.py measure a checkpoint's
        # tiled-kernel clamp fraction at load time without touching the op
        self.sow(
            "intermediates", "msda_sampling",
            (sampling_locations, attention_weights),
        )
        if packed_tables is not None:
            proj_tables = project_corner_pack_tables(
                packed_tables, vp_kernel, vp_bias, h
            )
            output = msda_prepacked(
                proj_tables, tuple(spatial_shapes), sampling_locations,
                attention_weights,
            ).astype(query.dtype)
        else:
            output = multi_scale_deformable_attention(
                value, tuple(spatial_shapes), sampling_locations,
                attention_weights,
            )
        return nn.Dense(
            self.embed_dim, kernel_init=xavier_uniform, bias_init=zeros_init,
            dtype=self.dtype, name="output_proj",
        )(output)
