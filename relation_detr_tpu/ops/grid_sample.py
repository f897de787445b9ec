"""Bilinear point sampling of NHWC feature maps (grid_sample semantics).

Shared primitive for DCN and any module needing arbitrary-point sampling;
same align_corners=False / zero-padding convention as ops/msda.py.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (B, H, W, C) at pixel coords points (B, N, 2) as (x, y).

    Coordinates are in pixel units (0..W-1 / 0..H-1 at texel centers);
    out-of-bounds corners contribute zero. Returns (B, N, C).
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    x = points[..., 0]
    y = points[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    out = 0.0
    for dy, dx, wgt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xc = x0 + dx
        yc = y0 + dy
        valid = (xc >= 0) & (xc < w) & (yc >= 0) & (yc < h)
        idx = jnp.clip(yc, 0, h - 1) * w + jnp.clip(xc, 0, w - 1)
        got = jnp.take_along_axis(flat, idx[..., None], axis=1)
        out = out + got * (wgt * valid)[..., None]
    return out
