"""Shared DETR-transformer helpers (pure functions, static shapes).

Spec: /root/reference/models/bricks/base_transformer.py. All spatial shapes
are static Python tuples so the flatten/reference-point math compiles to
fixed-shape XLA programs; only mask *contents* are dynamic.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def flatten_multi_level(elements: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concat per-level NHWC maps into (B, S, C) tokens (or (B, S) for masks).

    Mirrors /root/reference/models/bricks/base_transformer.py:17-23 (which
    flattens NCHW; channel-last here).
    """
    flat = []
    for e in elements:
        if e.ndim == 4:
            b, h, w, c = e.shape
            flat.append(e.reshape(b, h * w, c))
        else:
            b, h, w = e.shape
            flat.append(e.reshape(b, h * w))
    return jnp.concatenate(flat, axis=1)


def get_spatial_shapes(masks: Sequence[jnp.ndarray]) -> Tuple[Tuple[int, int], ...]:
    return tuple((int(m.shape[1]), int(m.shape[2])) for m in masks)


def get_valid_ratios(mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of non-padded rows/cols, (B, 2) in (w, h) order.

    Mirrors /root/reference/models/bricks/base_transformer.py:41-51: counts
    the first column/row of the unpadded region.
    """
    _, h, w = mask.shape
    valid_h = jnp.sum(~mask[:, :, 0], axis=1).astype(jnp.float32)
    valid_w = jnp.sum(~mask[:, 0, :], axis=1).astype(jnp.float32)
    return jnp.stack([valid_w / w, valid_h / h], axis=-1)


def multi_level_valid_ratios(masks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """(B, L, 2)."""
    return jnp.stack([get_valid_ratios(m) for m in masks], axis=1)


def get_full_reference_points(
    spatial_shapes: Sequence[Tuple[int, int]], valid_ratios: jnp.ndarray
) -> jnp.ndarray:
    """Cell-center grid per level, scaled by 1/valid_ratio -> (B, S, 2) (x, y).

    Mirrors /root/reference/models/bricks/base_transformer.py:56-70.
    """
    refs: List[jnp.ndarray] = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ref_y = jnp.broadcast_to(ys, (h, w)).reshape(-1)[None]  # (1, hw)
        ref_x = jnp.broadcast_to(xs, (h, w)).reshape(-1)[None]
        ref_y = ref_y / (valid_ratios[:, None, lvl, 1] * h)
        ref_x = ref_x / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([ref_x, ref_y], axis=-1))
    return jnp.concatenate(refs, axis=1)


def get_reference(
    spatial_shapes: Sequence[Tuple[int, int]], valid_ratios: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encoder reference points and two-stage proposals.

    Returns:
      reference_points: (B, S, L, 2), full refs scaled by per-level ratios.
      proposals: (B, S, 4) cxcywh with level-scaled wh = 0.05 * 2**lvl.

    Mirrors /root/reference/models/bricks/base_transformer.py:72-81.
    """
    full = get_full_reference_points(spatial_shapes, valid_ratios)
    reference_points = full[:, :, None, :] * valid_ratios[:, None, :, :]
    wh_chunks = [
        jnp.full((h * w, 2), 0.05 * (2.0**lvl), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes)
    ]
    level_wh = jnp.concatenate(wh_chunks, axis=0)[None]
    level_wh = jnp.broadcast_to(level_wh, full.shape)
    proposals = jnp.concatenate([full, level_wh], axis=-1)
    return reference_points, proposals
