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
# (4 = boxes-in/bias-out kernel: xy pair angles built in VMEM, separable
# wh mixing as in-kernel MXU dots, (B,H,N1,N2) written directly;
# 3 = separable per-box wh transcendentals + bilinear MXU mixing in
# models/relation.py — measured -1.6 ms in-model over v1;
# 1 = per-head VPU Pallas accumulate, 2 = (64,L) feature block + MXU dot)
# v4 default: measured 44.1 -> 43.0 ms in-model over v3 (round 4);
# v4_block 64 exceeds the 16 MB scoped-VMEM limit (21.7M ask) — 32 is max.
_FUSED = {"enabled": True, "version": 4, "v4_block": 32}


def set_fused_relation(enabled: bool = None, version: int = None,
                       v4_block: int = None) -> None:
    if enabled is not None:
        _FUSED["enabled"] = bool(enabled)
    if version is not None:
        _FUSED["version"] = int(version)
    if v4_block is not None:
        _FUSED["v4_block"] = int(v4_block)


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


def _kernel_v4(src_ref, tgtt_ref, a_ref, bt_ref, wblk_ref, b_ref, out_ref, *,
               freqs, num_heads, eps):
    # src_ref: (1, bn1, 4) cxcywh rows for this i-block
    # tgtt_ref: (1, 2, N2) target centers, coord-major
    # a_ref: (1, H, bn1, 2E) folded per-box wh features (alpha|beta)
    # bt_ref: (1, 2E, N2) per-box target wh features (cos|sin), transposed
    # wblk_ref: (H*bn1, F*bn1) block-diagonal xy projection,
    #           wblk[h*bn1+i, f*bn1+i] = w_xy[f, h]
    # b_ref: (1, H); out_ref: (1, H, bn1, N2)
    two_e = bt_ref.shape[1]
    n2 = tgtt_ref.shape[2]
    bn1 = src_ref.shape[1]
    # xy pair angles built in VMEM: rel = log1p(|c1_i - c2_j| / w1_i).
    # Mixing the F=2*2*len(freqs) sine/cosine feature maps into heads is
    # ONE real MXU dot against the block-diagonal weight matrix (the
    # feature maps concatenate along sublanes into a 2D (F*bn1, N2)
    # operand — Mosaic supports that; a (H,F)x(F,bn1,N2) contraction needs
    # an unsupported 3D shape cast). Per-(feature, head) scalar FMAs on
    # the VPU instead (v4.0) cost 256 full-block passes per block and left
    # the kernel ~16x off the HBM roofline (0.52 ms/call).
    feats = []
    for c in range(2):
        c1 = src_ref[0, :, c].reshape(bn1, 1)
        w1 = src_ref[0, :, 2 + c].reshape(bn1, 1)
        c2 = tgtt_ref[0, c, :].reshape(1, n2)
        # clip keeps the partial-block PADDING rows finite (garbage w1 can
        # make the ratio negative/inf -> log/sin NaN, and the block-diagonal
        # dot below would propagate it through its ZERO entries into valid
        # rows). Real cxcywh boxes have ratio in [0, ~1e5]: no-op for data.
        # CAVEAT (ADVICE r4): this also rewrites NaN/Inf from genuinely
        # corrupted boxes to finite biases on this v4 default path, while
        # the v3/direct paths would NaN loudly — when debugging a
        # path-dependent NaN discrepancy, the clamp-check/divergence
        # guards are the canary, not this kernel.
        ratio = jnp.abs(c1 - c2) / (w1 + eps)
        ratio = jnp.where(ratio < 1e8, ratio, 1e8)  # NaN compares false
        ratio = jnp.where(ratio >= 0.0, ratio, 0.0)
        rel_c = jnp.log(ratio + 1.0)
        for f in freqs:
            ang = rel_c * f
            feats.append(jnp.sin(ang))
            feats.append(jnp.cos(ang))
    fstack = jnp.concatenate(feats, axis=0)  # (F*bn1, n2), f-major blocks
    xy = jax.lax.dot_general(
        wblk_ref[...], fstack, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H*bn1, n2), h-major blocks
    # wh bilinear half: same h-major row layout via one (H*bn1, 2E) dot
    a_rows = a_ref[0].reshape(num_heads * bn1, two_e)
    part_wh = jax.lax.dot_general(
        a_rows, bt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H*bn1, n2)
    res = (xy + part_wh).reshape(num_heads, bn1, n2)
    for h in range(num_heads):  # scalar bias adds (a (H,1,1) broadcast
        out_ref[0, h] = jnp.maximum(res[h] + b_ref[0, h], 0.0)  # is an
        # unsupported Mosaic shape cast)


def _v4_fwd(src_boxes, tgt_boxes, kernel, bias, embed_dim, temperature,
            scale, eps, block_n1=None):
    if block_n1 is None:
        block_n1 = int(_FUSED.get("v4_block", 32))
    b, n1 = src_boxes.shape[:2]
    n2 = tgt_boxes.shape[1]
    num_heads = kernel.shape[1]
    half = embed_dim // 2
    freqs = tuple(float(f) for f in _freqs(embed_dim, temperature, scale))
    inv = jnp.asarray(np.asarray(freqs, np.float32))

    # per-box wh features with the projection weights folded in (the same
    # angle-addition factoring as models/relation.py::separable_relation_bias)
    wh1, wh2 = src_boxes[..., 2:], tgt_boxes[..., 2:]
    p = jnp.log(wh1 + eps)[..., None] * inv  # (B, N1, 2, half)
    q = jnp.log(wh2 + eps)[..., None] * inv  # (B, N2, 2, half)
    sp, cp = jnp.sin(p), jnp.cos(p)
    sq, cq = jnp.sin(q), jnp.cos(q)
    w_wh = kernel[2 * embed_dim:].reshape(2, half, 2, num_heads)
    ws = jnp.transpose(w_wh[:, :, 0], (2, 0, 1))  # (H, 2, half)
    wc = jnp.transpose(w_wh[:, :, 1], (2, 0, 1))
    alpha = sp[..., None, :, :] * ws + cp[..., None, :, :] * wc
    beta = sp[..., None, :, :] * wc - cp[..., None, :, :] * ws
    a_feats = jnp.stack([alpha, beta], axis=-1).reshape(
        b, n1, num_heads, 2 * embed_dim
    )
    a_feats = jnp.transpose(a_feats, (0, 2, 1, 3))  # (B, H, N1, 2E)
    b_feats = jnp.stack([cq, sq], axis=-1).reshape(b, n2, 2 * embed_dim)
    bt = jnp.transpose(b_feats, (0, 2, 1))  # (B, 2E, N2)
    tgt_t = jnp.transpose(tgt_boxes[..., :2], (0, 2, 1))  # (B, 2, N2)

    body = functools.partial(
        _kernel_v4, freqs=freqs, num_heads=num_heads, eps=eps
    )
    two_e = 2 * embed_dim
    # block-diagonal xy weights: wblk[h*bn+i, f*bn+i] = w_xy[f, h] — lets
    # the kernel mix the sublane-concatenated (F*bn, N2) feature maps into
    # all heads with ONE MXU dot (see _kernel_v4)
    w_xy = kernel[:two_e].astype(jnp.float32)  # (F=2E, H), f-row order
    eye = jnp.eye(block_n1, dtype=jnp.float32)
    wblk = (
        w_xy.T[:, None, :, None] * eye[None, :, None, :]
    ).reshape(num_heads * block_n1, two_e * block_n1)
    return pl.pallas_call(
        body,
        grid=(b, pl.cdiv(n1, block_n1)),
        in_specs=[
            pl.BlockSpec((1, block_n1, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, block_n1, two_e),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_e, n2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads * block_n1, two_e * block_n1),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_heads, block_n1, n2),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, n1, n2), jnp.float32),
        interpret=_use_interpret(),
    )(src_boxes.astype(jnp.float32), tgt_t.astype(jnp.float32),
      a_feats.astype(jnp.float32), bt.astype(jnp.float32),
      wblk, bias.reshape(1, num_heads).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_relation_bias_v4(src_boxes, tgt_boxes, kernel, bias, embed_dim=16,
                           temperature=10000.0, scale=100.0, eps=1e-5):
    """Boxes-in/bias-out fused relation bias -> (B, H, N1, N2).

    One Pallas kernel computes the xy pair angles + sin/cos features in
    VMEM (never materializing the (B, N1, N2, feats) tensor in HBM) and
    mixes the separable wh half as per-head MXU dots over folded per-box
    features. HBM traffic is the output plus O(N) per-box operands.

    GRADIENT CONTRACT: src/tgt box gradients are ZERO by construction —
    the relation-bias spec stop-gradients the boxes (reference
    relation_transformer.py:527-529) and the in-tree caller
    (models/relation.py) relies on that. Do NOT differentiate through the
    box arguments expecting real gradients; use the v3/direct paths if a
    future caller needs them (ADVICE r4).
    """
    return _v4_fwd(src_boxes, tgt_boxes, kernel, bias, embed_dim,
                   temperature, scale, eps)


def _v4_vjp_fwd(src_boxes, tgt_boxes, kernel, bias, embed_dim, temperature,
                scale, eps):
    out = _v4_fwd(src_boxes, tgt_boxes, kernel, bias, embed_dim, temperature,
                  scale, eps)
    return out, (src_boxes, tgt_boxes, kernel, bias)


def _v4_vjp_bwd(embed_dim, temperature, scale, eps, residuals, g):
    # sine features carry no gradient by spec (reference relation_
    # transformer.py:527-529; boxes are stop_gradient'ed at the caller);
    # kernel/bias grads recompute through the separable unfused path.
    src_boxes, tgt_boxes, kernel, bias = residuals
    from relation_detr_tpu.models.relation import separable_relation_bias

    _, vjp = jax.vjp(
        lambda k, b: separable_relation_bias(
            src_boxes, tgt_boxes, k, b, embed_dim, temperature, scale, eps
        ),
        kernel, bias,
    )
    dk, db = vjp(g)
    return jnp.zeros_like(src_boxes), jnp.zeros_like(tgt_boxes), dk, db


fused_relation_bias_v4.defvjp(_v4_vjp_fwd, _v4_vjp_bwd)


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
