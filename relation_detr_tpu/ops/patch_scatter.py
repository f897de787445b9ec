"""Pallas TPU kernel: accumulate per-tile patch-grad windows onto a canvas.

The adjoint of `_slice_patches` (ops/msda.py) — nt static window extractions
from one level canvas — is a windowed sum: every window's cotangent adds
back at its (y0, x0) origin, windows overlap by the halo. `lax.scatter_add`
lowers this on TPU to a SERIAL while loop of nt read-modify-write
dynamic-update-slices (~2 ms per encoder level-0 layer, ~30 ms of the
flagship train step across 6 layers x 4 levels — profiled via hlo_stats).

This kernel keeps a (h, w_pad, CB) canvas block resident in VMEM across a
sequential grid over windows and accumulates each window at a dynamic
offset (scalar-prefetched origins). Traffic is one read of the window
grads + one canvas write — the ideal. Details forced by Mosaic's layout
rules:

- dynamic offsets on the sublane (x) dim must be 8-aligned, so windows are
  statically right-padded with 8 zero columns, rolled in-kernel by
  ``x0 % 8`` (`pltpu.roll` wraps the zero tail to the front), and stored at
  the aligned origin ``x0 - x0 % 8``;
- the canvas is over-allocated by the padded window width (sliced back by
  the caller);
- the channel dim splits into blocks so the level-0 canvas fits VMEM; the
  grid is (C-blocks, windows) with windows innermost, so each canvas block
  is revisited (stays in VMEM) for the whole window sweep.

Addition order over windows matches scatter_add's ascending order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _accum_kernel(y0_ref, x0_ref, g_ref, out_ref, *, ph, pw_al):
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    y0 = y0_ref[w]
    x0 = x0_ref[w]
    shift = jax.lax.rem(x0, 8)
    g = pltpu.roll(g_ref[0], shift, 1)  # zero tail wraps to the front
    idx = (pl.ds(y0, ph), pl.ds(x0 - shift, pw_al), slice(None))
    out_ref[idx] = out_ref[idx] + g


def _band_accumulate(g, y0s, x0s, hb, w_pad, pw_al, cb):
    nt, ph, _, c = g.shape
    grid = (c // cb, nt)
    return pl.pallas_call(
        functools.partial(_accum_kernel, ph=ph, pw_al=pw_al),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, ph, pw_al, cb), lambda cblk, wi, y0, x0: (wi, 0, 0, cblk)
                ),
            ],
            out_specs=pl.BlockSpec(
                (hb, w_pad, cb), lambda cblk, wi, y0, x0: (0, 0, cblk)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((hb, w_pad, c), g.dtype),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(y0s, jnp.int32), jnp.asarray(x0s, jnp.int32), g)


_VMEM_BUDGET = 12 * 1024 * 1024  # canvas block is double-buffered; stay safe


def window_accumulate(
    g: jnp.ndarray,  # (nt, ph, pw, C) window cotangents
    y0s: np.ndarray,  # (nt,) static window origins
    x0s: np.ndarray,
    h: int,
    w: int,
) -> jnp.ndarray:
    """sum of windows placed at (y0, x0) on an (h, w, C) canvas."""
    nt, ph, pw, c = g.shape
    y0s = np.asarray(y0s, np.int64)
    x0s = np.asarray(x0s, np.int64)
    pw_al = -(-(pw + 8) // 8) * 8
    # aligned stores overhang the true width by < pw_al; tighten the pad to
    # what the actual origins need
    w_pad = max(w, int((x0s - x0s % 8).max(initial=0)) + pw_al)
    w_pad = -(-w_pad // 8) * 8
    g = jnp.pad(g, ((0, 0), (0, 0), (0, pw_al - pw), (0, 0)))

    cb = min(c, 128) if c % 128 == 0 or c <= 128 else c
    itm = g.dtype.itemsize
    # rows per band so the double-buffered canvas block fits VMEM
    hb_max = _VMEM_BUDGET // (2 * w_pad * cb * itm)
    if hb_max >= h:
        bands = [(0, h)]
    else:
        body = max(8, hb_max - ph + 1)  # band height excluding window overhang
        bands = [(s, min(s + body - 1 + ph, h) - s) for s in range(0, h, body)]

    if len(bands) == 1:
        return _band_accumulate(g, y0s, x0s, h, w_pad, pw_al, cb)[:, :w]

    out = jnp.zeros((h, w_pad, c), g.dtype)
    for start, hb in bands:
        sel = np.flatnonzero((y0s >= start) & (y0s < start + max(1, hb - ph + 1)))
        if sel.size == 0:
            continue
        band = _band_accumulate(
            jnp.take(g, jnp.asarray(sel), axis=0),
            y0s[sel] - start,
            x0s[sel],
            hb,
            w_pad,
            pw_al,
            cb,
        )
        out = out.at[start:start + hb].add(band)
    return out[:, :w]
