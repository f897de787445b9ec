"""Pallas TPU kernel fusing the position-relation bias pipeline.

The relation embedding (models/relation.py, spec:
/root/reference/models/bricks/relation_transformer.py:481-532) computes, per
decoder layer, sine embeddings of a (B, N1, N2, 4) box-relation tensor to
(B, N1, N2, 64) and projects them to one bias per head. Under XLA the
64-feature sine tensor must materialize in HBM as the projection's matmul
operand (~200 MB per layer at N=900) — measured ~1.3 ms/layer of pure
bandwidth. This kernel computes the sin/cos features in VMEM and
accumulates the (64 -> H) projection on the VPU, reading only the 4 relation
planes and writing only the (B, H, N1, N2) bias: ~30x less HBM traffic.

Numerics match get_sine_pos_embed(num_pos_feats=16, temperature=1e4,
scale=100, exchange_xy=False) + Dense + ReLU exactly (same fp32 ops, same
interleaved sin/cos feature order). The backward recomputes the unfused
reference path under jax.vjp (the sine features carry no gradient by spec —
reference :527-529 — so only the projection weights receive grads).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# benchmark A/B switch: models/relation.py routes through the fused path
# only when this is on (and the backend is TPU); "version" picks the body
# (3 = separable per-box wh transcendentals + bilinear MXU mixing in
# models/relation.py — the default, measured -1.6 ms in-model over v1;
# 1 = per-head VPU Pallas accumulate, 2 = (64,L) feature block + MXU dot)
_FUSED = {"enabled": True, "version": 3}


def set_fused_relation(enabled: bool = None, version: int = None) -> None:
    if enabled is not None:
        _FUSED["enabled"] = bool(enabled)
    if version is not None:
        _FUSED["version"] = int(version)


def fused_relation_enabled() -> bool:
    return _FUSED["enabled"]


def fused_relation_version() -> int:
    return _FUSED["version"]


def _freqs(embed_dim: int, temperature: float, scale: float) -> np.ndarray:
    k = np.arange(embed_dim // 2, dtype=np.float64)
    return (scale / temperature ** (k * 2.0 / embed_dim)).astype(np.float32)


def _kernel_v2(rel_ref, w_ref, b_ref, out_ref, *, freqs):
    # rel_ref: (4, L); w_ref: (H, 64) [transposed kernel]; b_ref: (1, H)
    # out_ref: (H, L). Features are built as (64, L) rows in VMEM and the
    # (64 -> H) projection runs as ONE MXU dot — v1's per-(c,k,h) scalar
    # broadcast FMAs (512 per block) dominated its runtime.
    rows = []
    for c in range(rel_ref.shape[0]):
        p = rel_ref[c:c + 1, :]  # (1, L)
        for f in freqs:
            ang = p * f
            rows.append(jnp.sin(ang))
            rows.append(jnp.cos(ang))
    feats = jnp.concatenate(rows, axis=0)  # (64, L)
    out = jax.lax.dot_general(
        w_ref[...], feats, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, L)
    out_ref[...] = jnp.maximum(out + jnp.transpose(b_ref[...], (1, 0)), 0.0)


def _kernel(rel_ref, w_ref, b_ref, out_ref, *, freqs, num_heads):
    # rel_ref: (4, 1, bn1, N2); w_ref: (4*2*len(freqs), H); b_ref: (1, H)
    # out_ref: (1, H, bn1, N2)
    n_coords = rel_ref.shape[0]
    bn1, n2 = rel_ref.shape[2], rel_ref.shape[3]
    acc = [
        jnp.full((bn1, n2), b_ref[0, h], jnp.float32) for h in range(num_heads)
    ]
    for c in range(n_coords):
        p = rel_ref[c, 0, :, :]  # (bn1, N2)
        for k, f in enumerate(freqs):
            ang = p * f
            s, co = jnp.sin(ang), jnp.cos(ang)
            row = c * 2 * len(freqs) + 2 * k
            for h in range(num_heads):
                acc[h] = acc[h] + s * w_ref[row, h] + co * w_ref[row + 1, h]
    for h in range(num_heads):
        out_ref[0, h, :, :] = jnp.maximum(acc[h], 0.0)


def _fused_fwd(rel, kernel, bias, embed_dim, temperature, scale):
    b, n1, n2, n_coords = rel.shape
    num_heads = kernel.shape[1]
    freqs = tuple(float(f) for f in _freqs(embed_dim, temperature, scale))
    if _FUSED["version"] == 2:
        total = b * n1 * n2
        rel_t = jnp.moveaxis(rel, -1, 0).reshape(n_coords, total)
        blk = 4096
        body = functools.partial(_kernel_v2, freqs=freqs)
        out = pl.pallas_call(
            body,
            grid=(pl.cdiv(total, blk),),
            in_specs=[
                pl.BlockSpec((n_coords, blk), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_heads, kernel.shape[0]), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, num_heads), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((num_heads, blk), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_heads, total), jnp.float32),
            interpret=_use_interpret(),
        )(rel_t.astype(jnp.float32),
          jnp.transpose(kernel.astype(jnp.float32), (1, 0)),
          bias.reshape(1, num_heads).astype(jnp.float32))
        return jnp.transpose(out.reshape(num_heads, b, n1, n2), (1, 0, 2, 3))

    rel_t = jnp.moveaxis(rel, -1, 0)  # (4, B, N1, N2); fuses into producers
    # block height: 8 head accumulators + double-buffered in/out blocks must
    # fit the ~16 MB scoped-VMEM budget (measured: bn1=128 at N2=900 OOMs)
    bn1 = min(n1, 32)
    grid = (b, pl.cdiv(n1, bn1))
    body = functools.partial(_kernel, freqs=freqs, num_heads=num_heads)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_coords, 1, bn1, n2), lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kernel.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_heads, bn1, n2),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, n1, n2), jnp.float32),
        interpret=_use_interpret(),
    )(rel_t.astype(jnp.float32), kernel.astype(jnp.float32),
      bias.reshape(1, num_heads).astype(jnp.float32))


def _reference_bias(rel, kernel, bias, embed_dim, temperature, scale):
    """Unfused math (used for the backward and as the numerics oracle)."""
    from relation_detr_tpu.models.position_encoding import get_sine_pos_embed

    pos = get_sine_pos_embed(
        rel, num_pos_feats=embed_dim, temperature=temperature, scale=scale,
        exchange_xy=False,
    )
    out = jax.nn.relu(pos @ kernel + bias)
    return jnp.transpose(out, (0, 3, 1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_relation_bias(rel, kernel, bias, embed_dim=16, temperature=10000.0,
                        scale=100.0):
    """relu(sine_embed(rel) @ kernel + bias) -> (B, H, N1, N2), fused."""
    return _fused_fwd(rel, kernel, bias, embed_dim, temperature, scale)


def _vjp_fwd(rel, kernel, bias, embed_dim, temperature, scale):
    out = _fused_fwd(rel, kernel, bias, embed_dim, temperature, scale)
    return out, (rel, kernel, bias)


def _vjp_bwd(embed_dim, temperature, scale, residuals, g):
    rel, kernel, bias = residuals
    _, vjp = jax.vjp(
        lambda k, b: _reference_bias(rel, k, b, embed_dim, temperature, scale),
        kernel, bias,
    )
    dk, db = vjp(g)
    return jnp.zeros_like(rel), dk, db


fused_relation_bias.defvjp(_vjp_fwd, _vjp_bwd)
