"""Pallas TPU kernel for the separable tiled-MSDA contraction.

``sep_contract_fused`` (round 3d) fuses the separable A-BUILD into a VMEM
kernel so A never touches HBM. MEASURED NEGATIVE RESULT (PERF.md round 3d):
69.3 ms flagship eval fwd vs 48.4 ms for the XLA separable path it replaces
(77.8 ms with tile(16,8)). Same lesson as ops/msda_pallas.py in round 3a —
XLA's fused A-build + contraction beats a hand-scheduled VMEM kernel here.
Kept default-OFF (`tiled_sep_kernel`) as THE one design record for the
"build A in VMEM" family, with golden tests pinning its semantics
(tests/test_msda.py::test_msda_sep_kernel_*). A second variant — `slab_dot`
(round 4: A from XLA, per-head contraction in VMEM; 46.6 vs 42.7 ms, 8 tiny
per-head dots using 32/128 MXU lanes) — was pruned in round 5 per the
one-negative-result policy; see PERF.md round 4 for its numbers.

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
