"""Multi-scale deformable attention — XLA gather formulation.

This is the numerical specification for the op the reference implements in
CUDA (/root/reference/models/bricks/ops/cuda/ms_deform_im2col_cuda.cuh:227-288)
and in pure torch via per-level ``grid_sample``
(/root/reference/models/bricks/ms_deform_attn.py:159-212). Bilinear sampling
semantics follow ``grid_sample(align_corners=False, padding_mode="zeros")``:
a normalized location ``p`` in [0, 1] maps to pixel coordinate
``p * size - 0.5``; samples outside the feature map contribute zero (each
corner is masked independently, mirroring the gather formulation at
/root/reference/models/bricks/ms_deform_attn.py:87-156).

TPU-first design notes:
- ``spatial_shapes`` is a *static* tuple so every level's gather compiles to a
  fixed-shape XLA gather (no dynamic shapes under jit).
- The level loop is a Python loop over <=4 levels; XLA fuses the per-level
  elementwise work and the final weighted reduction.
- The backward pass is XLA autodiff: the corner gathers transpose to
  scatter-adds, which replaces the hand-written CUDA col2im reductions
  (/root/reference/models/bricks/ops/cuda/ms_deform_im2col_cuda.cuh:290-911).
- Computation runs in fp32 regardless of input dtype (the reference keeps the
  CUDA op in fp32 under AMP: /root/reference/models/bricks/ms_deform_attn.py:358-373).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_start_indices(spatial_shapes: Sequence[Tuple[int, int]]):
    starts = []
    acc = 0
    for h, w in spatial_shapes:
        starts.append(acc)
        acc += h * w
    return starts, acc


def multi_scale_deformable_attention(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Deformable attention core.

    Args:
      value: (B, S, H, D) flattened multi-level values, S = sum(h*w).
      spatial_shapes: static sequence of (h, w) per level.
      sampling_locations: (B, Q, H, L, P, 2) normalized (x, y) in [0, 1].
      attention_weights: (B, Q, H, L, P), softmax-normalized over L*P.

    Returns:
      (B, Q, H * D) attended features, dtype of ``value``.
    """
    in_dtype = value.dtype
    value = value.astype(jnp.float32)
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    bs, _, num_heads, head_dim = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    starts, total = _level_start_indices(spatial_shapes)
    assert value.shape[1] == total, (value.shape, spatial_shapes)

    out = jnp.zeros((bs, num_queries, num_heads, head_dim), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], h * w, axis=1)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        sampled = jnp.zeros((bs, num_queries, num_heads, num_points, head_dim), jnp.float32)
        for dy, dx, wgt in (
            (0, 0, (1.0 - fx) * (1.0 - fy)),
            (0, 1, fx * (1.0 - fy)),
            (1, 0, (1.0 - fx) * fy),
            (1, 1, fx * fy),
        ):
            xc = x0i + dx
            yc = y0i + dy
            valid = (xc >= 0) & (xc < w) & (yc >= 0) & (yc < h)
            idx = jnp.clip(yc, 0, h - 1) * w + jnp.clip(xc, 0, w - 1)
            # gather along the token axis: operand (B, hw, H, D),
            # indices (B, Q*P, H, 1) -> (B, Q*P, H, D)
            idx_flat = jnp.transpose(idx, (0, 1, 3, 2)).reshape(
                bs, num_queries * num_points, num_heads
            )
            got = jnp.take_along_axis(value_l, idx_flat[..., None], axis=1)
            got = got.reshape(bs, num_queries, num_points, num_heads, head_dim)
            got = jnp.transpose(got, (0, 1, 3, 2, 4))  # (B, Q, H, P, D)
            sampled = sampled + got * (wgt * valid)[..., None]

        out = out + jnp.sum(
            sampled * attention_weights[:, :, :, lvl, :, None], axis=3
        )

    return out.reshape(bs, num_queries, num_heads * head_dim).astype(in_dtype)
