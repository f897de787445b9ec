"""Pallas TPU kernels for the separable tiled-MSDA contraction.

Two kernels live here:

- ``slab_dot`` (round 4): XLA builds A, the kernel contracts it against
  the lane-unpadded (M, C) patch slab. MEASURED NEGATIVE RESULT
  (PERF.md round 4): 46.6 ms flagship eval fwd vs 42.7 ms for the XLA
  separable einsum it replaces — the 8 tiny per-head (M,T)x(M,D=32) dots
  use 32 of 128 MXU output lanes and forfeit XLA pipelining; kept
  default-off with golden tests as the design record.
- ``sep_contract_fused`` (round 3d): fuses the A-BUILD itself into the
  kernel. MEASURED NEGATIVE RESULT (PERF.md round 3d): 69.3 ms flagship eval fwd vs
48.4 ms for the XLA separable path it replaces (77.8 ms with tile(16,8)).
Same lesson as ops/msda_pallas.py in round 3a — XLA's fused A-build +
contraction beats a hand-scheduled VMEM kernel here. Kept default-OFF
(`tiled_sep_kernel`) as documentation, with golden tests pinning its
semantics (tests/test_msda.py::test_msda_sep_kernel_*).

Context (PERF.md round 3b/3d): the tiled encoder MSDA is
``out = A @ patch`` per (tile, level); the separable build composes A from
per-axis soft vectors ``oy`` (B,nt,H,P,ph,T) and ``ox`` (B,nt,H,P,pw,T) as P
rank-1 outer products. The XLA path (`ops/msda.py::_sep_contract`)
materializes A — shape (B,nt,H,ph,pw,T) — in HBM as the einsum operand:
~780 MB/layer at flagship scale, with the minor (pw, T) dims tile-padding to
(24, 128), ~1.9x extra traffic. Post-separable-build that A traffic is the
dominant encoder cost, so this kernel builds A_t(M, T) on the fly in VMEM
(never touching HBM) and feeds the per-head MXU dot directly, reading only
oy/ox (~10x smaller than A) and the patch.

Layout notes (lessons from ops/msda_pallas.py): A is built transposed as
A_t(M, T) so every build op is sublane-dim data movement against lane-minor
T rows — the reoriented (T, M) build measured 2x slower (PERF.md round 3a).
The rank-1 accumulation uses ``pltpu.repeat`` on sublanes for oy (row y
repeated pw times = patch-row order y*pw + x) and a static concat for ox.

Math spec: bitwise the same contraction as `_sep_contract`
(reference semantics: grid_sample(align_corners=False, zeros),
/root/reference/models/bricks/ms_deform_attn.py:159-212). The backward
REUSES the XLA einsum backward from ops/msda.py (A-sized einsums) — the
kernel is a forward-path optimization; autodiff sees identical math.

Shapes (M = ph * pw, C = H * D):
  oy:    (B, NT, H, P, ph, T) f32
  ox:    (B, NT, H, P, pw, T) f32
  patch: (B, NT, M, C) f32
  out:   (B, NT, T, C) f32   == transpose of _sep_contract's (B,NT,H,T,D)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot_t(a, b):
    """Contract dim 0 of both operands: (K, M) x (K, N) -> (M, N)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(oy_ref, ox_ref, patch_ref, out_ref, *, num_heads, head_dim,
                num_points, ph, pw):
    outs = []
    for h in range(num_heads):
        a_t = None
        for p in range(num_points):
            oyp = oy_ref[0, 0, h, p]  # (ph, T)
            oxp = ox_ref[0, 0, h, p]  # (pw, T)
            # patch-row order is y * pw + x: element-repeat each y-row pw
            # times (broadcast + sublane collapse — row-major identical),
            # block-tile the x-rows ph times (pltpu.repeat IS block tiling)
            ry = jnp.broadcast_to(
                oyp[:, None, :], (ph, pw, oyp.shape[1])
            ).reshape(ph * pw, oyp.shape[1])
            tx = pltpu.repeat(oxp, ph, axis=0)  # (ph*pw, T)
            term = ry * tx
            a_t = term if a_t is None else a_t + term
        ph_block = patch_ref[0, 0, :, h * head_dim:(h + 1) * head_dim]
        outs.append(_dot_t(a_t, ph_block))  # (T, D)
    out_ref[0, 0] = jnp.concatenate(outs, axis=1)  # (T, C)


def _fwd_pallas(oy, ox, patch):
    b, nt, num_heads, num_points, ph, t = oy.shape
    pw = ox.shape[4]
    m, c = patch.shape[2], patch.shape[3]
    assert m == ph * pw and c % num_heads == 0
    kernel = functools.partial(
        _fwd_kernel, num_heads=num_heads, head_dim=c // num_heads,
        num_points=num_points, ph=ph, pw=pw,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, num_heads, num_points, ph, t),
                         lambda i, j: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_heads, num_points, pw, t),
                         lambda i, j: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt, t, c), jnp.float32),
        interpret=_use_interpret(),
    )(oy, ox, patch)


@jax.custom_vjp
def sep_contract_fused(oy, ox, patch):
    """out(B,NT,T,C) = per-(b,tile) [sum_p oy_p (x) ox_p] @ patch, A in VMEM.

    Same contraction as ops/msda.py::_sep_contract but with the output
    already in (T, C) token-major layout (no epilogue transpose).
    """
    return _fwd_pallas(oy.astype(jnp.float32), ox.astype(jnp.float32),
                       patch.astype(jnp.float32))


def _fused_fwd(oy, ox, patch):
    return sep_contract_fused(oy, ox, patch), (oy, ox, patch)


def _fused_bwd(res, g):
    # XLA A-sized einsums (mirrors ops/msda.py::_sep_contract_bwd); the
    # kernel only accelerates the forward, training math is unchanged
    oy, ox, patch = res
    b, nt, num_heads, num_points, ph, t = oy.shape
    pw = ox.shape[4]
    c = patch.shape[3]
    head_dim = c // num_heads
    g5 = jnp.transpose(
        g.reshape(b, nt, t, num_heads, head_dim), (0, 1, 3, 2, 4)
    )  # (B,nt,H,T,D)
    patch6 = patch.reshape(b, nt, ph, pw, num_heads, head_dim)
    da = jnp.einsum(
        "bnhtd,bnyxhd->bnhyxt", g5, patch6,
        preferred_element_type=jnp.float32,
    )
    d_oy = jnp.sum(da[:, :, :, None] * ox[..., None, :, :], axis=-2)
    d_ox = jnp.sum(da[:, :, :, None] * oy[..., :, None, :], axis=-3)
    a = jnp.sum(oy[..., :, None, :] * ox[..., None, :, :], axis=3)
    d_patch = jnp.einsum(
        "bnhyxt,bnhtd->bnyxhd", a, g5, preferred_element_type=jnp.float32,
    ).reshape(b, nt, ph * pw, c)
    return (d_oy.astype(oy.dtype), d_ox.astype(ox.dtype),
            d_patch.astype(patch.dtype))


sep_contract_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# slab_dot: A-from-XLA, slab-unpadded per-head contraction (round 4)
#
# The round-3d kernel above lost because it rebuilt A on the VPU inside the
# kernel (f32 repeats/broadcasts serialized against the MXU). This one keeps
# the XLA separable A-build — measured at the HBM roofline — and moves ONLY
# the contraction into VMEM so the patch slab is consumed in its natural
# (M, C=H*D) layout. The XLA einsum needed the slab head-split to
# (..., ph, pw, H, D), whose D=32-minor layout lane-pads 32->128: a 4x
# physical copy (hlo_stats round 4: ~0.67 ms/encoder-layer of reshapes at
# 200-300 GiB/s) plus 4x-padded dot reads. In-kernel the head split is a
# free 32-lane slice of VMEM, and the output comes out token-major (T, C)
# so the per-level accumulate + final untile need no transpose at all.
# ---------------------------------------------------------------------------


def _slab_kernel(a_ref, patch_ref, out_ref, *, num_heads, head_dim):
    patch = patch_ref[0, 0]  # (M, C)
    outs = []
    for h in range(num_heads):
        a_h = a_ref[0, 0, h]  # (M, T)
        p_h = patch[:, h * head_dim:(h + 1) * head_dim]  # (M, D)
        outs.append(_dot_t(a_h, p_h))  # (T, D) f32
    out_ref[0, 0] = jnp.concatenate(outs, axis=1)  # (T, C)


@jax.custom_vjp
def slab_dot(a, patch):
    """out(B,NT,T,C) = per-(b,tile,head) A_h(M,T)^T @ patch[:, h*D:(h+1)*D].

    a (B,NT,H,M,T), patch (B,NT,M,C) — the same contraction as
    ops/msda.py::_sep_contract given A = sum_p oy_p (x) ox_p, but the slab
    operand stays lane-unpadded (C=256 minor) and the output is token-major.
    """
    b, nt, num_heads, m, t = a.shape
    c = patch.shape[3]
    kernel = functools.partial(
        _slab_kernel, num_heads=num_heads, head_dim=c // num_heads
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, num_heads, m, t), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt, t, c), jnp.float32),
        interpret=_use_interpret(),
    )(a, patch)


def _slab_fwd(a, patch):
    return slab_dot(a, patch), (a, patch)


def _slab_bwd(res, g):
    # XLA einsums, same shapes as the forward operands (g is (B,NT,T,C))
    a, patch = res
    b, nt, num_heads, m, t = a.shape
    head_dim = patch.shape[3] // num_heads
    g5 = jnp.transpose(
        g.reshape(b, nt, t, num_heads, head_dim), (0, 1, 3, 2, 4)
    )  # (B,NT,H,T,D)
    pm = patch.reshape(b, nt, m, num_heads, head_dim)
    da = jnp.einsum(
        "bnhtd,bnmhd->bnhmt", g5, pm, preferred_element_type=jnp.float32
    )
    d_patch = jnp.einsum(
        "bnhmt,bnhtd->bnmhd", a, g5, preferred_element_type=jnp.float32
    ).reshape(b, nt, m, num_heads * head_dim)
    return da.astype(a.dtype), d_patch.astype(patch.dtype)


slab_dot.defvjp(_slab_fwd, _slab_bwd)
