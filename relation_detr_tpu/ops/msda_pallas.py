"""Pallas TPU kernel for the tiled MSDA core: one-hot weight matrix built in
VMEM + per-head MXU matmul, forward and backward.

Context (PERF.md): the tiled formulation in ops/msda.py turns the MSDA
gather into  out = A @ patch  per (tile, level), where A(T, M) holds the
bilinear-corner x attention weights scattered by patch-row index. Building A
with XLA elementwise ops materializes ~200M floats per encoder layer in HBM
(~15 ms/layer measured). This kernel builds A on the fly in VMEM — it never
touches HBM — and feeds the MXU directly.

Layout notes (the first version was 2x slower than the XLA path because it
read lane-strided entry columns): A is built TRANSPOSED as A_t(M, T) so every
entry update is a natural row broadcast — m/w arrive as (..., E, T) rows,
iota runs over sublanes, and the matmuls consume A_t via dot_general
contracting dim 0 (the MXU reads the transposed operand natively, nothing is
re-laid-out).

Math spec: identical to the A-build in ops/msda.py::_msda_tiled (reference
semantics: grid_sample(align_corners=False, zeros) per
/root/reference/models/bricks/ms_deform_attn.py:159-212; the hand-written
CUDA backward scatter at ms_deform_im2col_cuda.cuh:290-911 becomes
dpatch = A_t @ g, an MXU matmul).

Shapes (E = num_points * 4 corner entries, C = H * D):
  m_all: (B, NT, H, E, T) int32 — patch-row index per entry
  w_all: (B, NT, H, E, T) f32  — folded weight per entry (0 for invalid)
  patch: (B, NT, M, C) f32    — per-tile value patch rows
  out:   (B, NT, T, C) f32
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    # CPU tests (8-dev virtual mesh) run the kernel in interpreter mode
    return jax.default_backend() != "tpu"


def _build_a_t(m_ref, w_ref, h: int, t: int, m_rows: int, num_entries: int):
    """A_t(M, T) = sum_e onehot-rows: every op is a (1, T) row broadcast
    against a sublane iota — no lane-strided reads, no transposes."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (m_rows, t), 0)
    a_t = jnp.zeros((m_rows, t), jnp.float32)
    for e in range(num_entries):
        idx = m_ref[0, 0, h, e, :][None, :]  # (1, T) row
        wgt = w_ref[0, 0, h, e, :][None, :]
        a_t = a_t + jnp.where(iota == idx, wgt, 0.0)
    return a_t


def _dot_t(a, b):
    """Contract dim 0 of both operands: (K, M) x (K, N) -> (M, N)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(m_ref, w_ref, patch_ref, out_ref, *, num_heads, head_dim,
                num_entries):
    t = m_ref.shape[4]
    m_rows = patch_ref.shape[2]
    for h in range(num_heads):
        a_t = _build_a_t(m_ref, w_ref, h, t, m_rows, num_entries)  # (M, T)
        ph = patch_ref[0, 0, :, h * head_dim:(h + 1) * head_dim]  # (M, D)
        # out(T, D) = A @ patch = A_t^T @ patch, contracted on M
        out_ref[0, 0, :, h * head_dim:(h + 1) * head_dim] = _dot_t(a_t, ph)


def _bwd_kernel(m_ref, w_ref, patch_ref, g_ref, dw_ref, dpatch_ref, *,
                num_heads, head_dim, num_entries):
    t = m_ref.shape[4]
    m_rows = patch_ref.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m_rows, t), 0)
    for h in range(num_heads):
        a_t = _build_a_t(m_ref, w_ref, h, t, m_rows, num_entries)
        gh = g_ref[0, 0, :, h * head_dim:(h + 1) * head_dim]  # (T, D)
        ph = patch_ref[0, 0, :, h * head_dim:(h + 1) * head_dim]  # (M, D)
        # the CUDA col2im scatter-add, as one MXU matmul: (M,T)@(T,D)
        dpatch_ref[0, 0, :, h * head_dim:(h + 1) * head_dim] = jnp.dot(
            a_t, gh, preferred_element_type=jnp.float32
        )
        # da_t(M, T) = patch @ g^T, contracted on D
        da_t = jax.lax.dot_general(
            ph, gh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for e in range(num_entries):
            idx = m_ref[0, 0, h, e, :][None, :]
            dw_ref[0, 0, h, e, :] = jnp.sum(
                jnp.where(iota == idx, da_t, 0.0), axis=0
            )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tiled_matmul_core(m_all, w_all, patch, dims: Tuple[int, int]):
    """out(B, NT, T, C) = per-(b, tile, head) A @ patch with A built in VMEM."""
    return _core_fwd(m_all, w_all, patch, dims)[0]


def _core_fwd(m_all, w_all, patch, dims):
    num_heads, head_dim = dims
    b, nt, _, e, t = m_all.shape
    m_rows, c = patch.shape[2], patch.shape[3]
    kernel = functools.partial(
        _fwd_kernel, num_heads=num_heads, head_dim=head_dim, num_entries=e
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, num_heads, e, t), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_heads, e, t), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_rows, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt, t, c), jnp.float32),
        interpret=_use_interpret(),
    )(m_all, w_all, patch)
    return out, (m_all, w_all, patch)


def _core_bwd(dims, residuals, g):
    num_heads, head_dim = dims
    m_all, w_all, patch = residuals
    b, nt, _, e, t = m_all.shape
    m_rows, c = patch.shape[2], patch.shape[3]
    kernel = functools.partial(
        _bwd_kernel, num_heads=num_heads, head_dim=head_dim, num_entries=e
    )
    dw, dpatch = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, num_heads, e, t), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_heads, e, t), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_rows, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, num_heads, e, t), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_rows, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nt, num_heads, e, t), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, m_rows, c), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(m_all, w_all, patch, g)
    dm = np.zeros(m_all.shape, jax.dtypes.float0)  # int input: no gradient
    return dm, dw, dpatch


tiled_matmul_core.defvjp(_core_fwd, _core_bwd)
