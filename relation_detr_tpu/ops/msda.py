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

from typing import Optional, Sequence, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np


import contextlib

# framework-wide MSDA kernel selection (analogous to torch.backends flags);
# modules read these defaults so configs/benchmarks can switch implementations
# without re-plumbing every layer. "auto" routes encoder-layout calls
# (queries == raster tokens) to the tiled MXU kernel and everything else to
# corner_pack, which is numerically exact vs the naive gather for arbitrary
# locations (PERF.md has the measured ladder).
_MSDA_DEFAULTS = {
    "impl": "auto",
    "gather_dtype": jnp.float32,
    # tiled-kernel tunables: dtype of the A-matrix/patch einsum operands.
    # "auto" = bf16 on TPU-class backends, fp32 elsewhere. Rationale
    # (PERF.md round-3e, measured): XLA's DEFAULT dot precision already
    # rounds f32 MXU operands to bf16 — explicitly pre-rounding A and the
    # patch slab is BITWISE IDENTICAL to the fp32 path on hardware — so
    # "fp32" never bought full-precision products on TPU; it only bought
    # fp32 HBM traffic for the A operand. Building A in bf16 halves that
    # traffic (48.4 -> 45.1 ms flagship) and stays in the same
    # operand-rounding error class (~2x magnitude: the rank-1 A-build's
    # inputs are rounded too, not just its output). Sampling GEOMETRY
    # (halo coverage, clamp semantics, zero-padding) is dtype-independent.
    # CPU resolves to fp32 so golden tests compare bitwise-fp32 math.
    # Force with --msda-dtype fp32|bf16 (fp32 on TPU = the old default:
    # fp32-built A, still bf16-rounded at the dot by the MXU).
    # tiled_halos: the per-level
    # halo radii that bound the exact-sampling region. "auto" = num_points+1
    # per level, which provably covers the reference's radial offset init
    # (radius <= num_points level-texels, ms_deform_attn.py:266-278 —
    # measured zero clamped corners at worst-case radius-4 offsets; PERF.md).
    # Offsets beyond the halo border-clamp: use tiled_clamp_fraction to
    # check a trained checkpoint and --msda-halos to tune. Margin 1 is the
    # smallest patch margin with zero clamped corners at worst-case
    # radius-4 init offsets across a 6-canvas sweep (margin 0 clamps
    # 0.9-2.1e-3; PERF.md round-3b) and measures 6.4 ms faster than
    # margin 2 on the flagship.
    "tiled_dtype": "auto",
    "tiled_halos": "auto",
    # (12,8) = 96 tokens/tile: T-minor tensors pad 96->128 lanes (1.33x)
    # instead of (10,8)'s 80->128 (1.6x). Round-5 flagship sweep (queued
    # ms): (12,8) 39.7 / (10,8) 42.2 / (24,8) 40.6 / (12,10) 48.4 /
    # (14,8) 58.3 / (16,8) 57.2 (round 3d) — the sweep is nonmonotonic in
    # T, so treat geometry as empirical per-hardware tuning.
    "tiled_tile_tokens": (12, 8),
    "tiled_margin": 1,
    # corner_pack levels with <= this many rows use a one-hot MXU matmul
    # instead of a row gather (exact; beats the issue-bound gather there)
    "dense_level_rows": 1536,
    # decoder prepack: build the 4-corner pack of the RAW memory once per
    # forward and give every decoder layer its projected table via one MXU
    # einsum (pack(proj(V)) == blockdiag-proj(pack(V)) by linearity) instead
    # of re-running the HBM-bound 4-roll pack per layer
    "decoder_prepack": True,
    # tiled-kernel overflow residual: corners beyond the halo are computed
    # EXACTLY via a fixed-capacity side channel (up to this many out-of-halo
    # corners per (tile, head, level); beyond it they fall back to the border
    # clamp, never worse than before). "auto" = 0 when halos are "auto"
    # (provably nothing to catch at the offset init) else 8.
    "tiled_overflow": "auto",
    # patch extraction: "slices" = band-grid static lax.slice ops (gy row
    # bands + gx column windows, starts are trace-time constants; bit-exact,
    # any batch size; measured -3.8 ms vs gather on the flagship at the old
    # per-tile form). "gather" = one lax.gather of nt slabs.
    "tiled_patch_mode": "slices",
    # physical element order of the extracted patch slab (the RHS of the
    # A @ patch MXU dot). XLA's layout assignment re-lays the slab out per
    # (layer, level) when the slice-stack's natural order differs from the
    # dot's preferred operand layout — a materialized copy of the full slab
    # (~4.4 ms/iter at B=1, ~10 ms/image at B=4; round-5 hlo profile, the
    # whole "B=4 regression"). Orders:
    #   "yx": (B, nt, ph, pw, C)  — the natural order (default)
    #   "xy": (B, nt, pw, ph, C)  — ph minor: matches the B=1 dot want
    #   "bm": (nt, ph, pw, B, C)  — batch minor: matches the B>1 dot want
    # MEASURED NEUTRAL (round 5, flagship): 42.2/42.6 ms B=1 yx/xy and
    # 221.2/219.9/219.9 ms B=4 yx/bm/xy — XLA's layout assignment re-chooses
    # its dot-operand layout against whatever order the producer emits and
    # re-inserts the copy, so pre-arranging the slab buys nothing. Kept as
    # the design record for the B>1 layout-copy investigation; the shipped
    # fix for the B=4 regression is tiled_batch_unroll below.
    "tiled_slab_order": "yx",
    # unroll the tiled encoder op over the batch at trace time when B > 1:
    # each slice runs the B=1 program, whose slab layouts XLA compiles
    # copy-free (at B > 1 it re-lays out every (layer, level) patch slab
    # for the dot — ~10 ms/image of materialized reshapes on the round-5
    # B=4 profile — and no slab element order avoids that; see
    # tiled_slab_order). Trades ~B x encoder HLO size (compile time, cached)
    # for per-image parity with the measured-fast B=1 path.
    # DEFAULT OFF: under a sharded (pjit) batch, slicing the data axis would
    # serialize the mesh (each B=1 slice lives on one device). Single-device
    # eval drivers enable it at trace time (utils/evaluation.py, bench.py).
    "tiled_batch_unroll": False,
    # tiled prep layout: "t_minor" transposes T to the minor dim;
    # "t_major" keeps the take's natural order with no transposes
    "tiled_layout": "t_minor",
    # fuse the separable A-build into a Pallas VMEM kernel (A never hits
    # HBM; ops/msda_sep_pallas.py) instead of the XLA einsum whose A
    # operand is ~780 MB/layer of HBM traffic
    "tiled_sep_kernel": False,
    # NOTE: a second VMEM-kernel variant ("tiled_slab_kernel" = slab_dot,
    # A from XLA + per-head contraction in VMEM) was pruned in round 5 per
    # the one-negative-result policy; its numbers live in PERF.md round 4
    # (46.6 vs 42.7 ms — 8 tiny per-head dots at 32/128 MXU lanes).
    # cast fp32 MXU-dot operands (the A matrix and the patch slab) to bf16
    # at the einsum boundary, leaving the A-build itself fp32. MEASURED
    # (PERF.md round-3e, flagship on TPU): bitwise identical to the fp32
    # path AND the same speed (48.4 vs 49.0 ms) — XLA's DEFAULT dot
    # precision already rounds f32 operands to bf16 (RTNE, f32 accumulate)
    # and already places the convert optimally, so the explicit cast is a
    # no-op in both bits and time. Kept (default off) as the proof harness
    # for the tiled_dtype="auto" bf16 default above: it demonstrates on
    # hardware that "fp32" operands never reached the MXU at full
    # precision. "auto" = on for TPU-class backends.
    "tiled_dot_bf16": False,
    # EVAL-ONLY experiment (PERF.md round 5, the last untried bytes lever):
    # store the per-level patch slab as int8 with a per-channel absmax
    # scale. The per-channel dequant commutes with the A @ patch token
    # contraction, so the scale is applied ONCE to each level's (tiny)
    # contraction output instead of to the slab — the slab buffer and its
    # dot-layout copies move half the bytes of bf16. Quantization error
    # ~amax/254 per channel (beyond the bf16 accuracy class): opt-in,
    # never a default. FORWARD ONLY — jnp.round carries zero gradient, so
    # a train step with this flag would silently drop value grads.
    "tiled_int8_slab": False,
}


def _resolve_tiled_dtype():
    d = _MSDA_DEFAULTS["tiled_dtype"]
    if d == "auto":
        return (
            jnp.bfloat16
            if jax.default_backend() in ("tpu", "axon")
            else jnp.float32
        )
    return d


def _tiled_dot_bf16_enabled() -> bool:
    flag = _MSDA_DEFAULTS["tiled_dot_bf16"]
    if flag == "auto":
        return jax.default_backend() in ("tpu", "axon")
    return bool(flag)


def _boundary_cast(*ops):
    """Cast fp32 MXU-dot operands to bf16 iff tiled_dot_bf16 resolves on."""
    if _tiled_dot_bf16_enabled():
        return tuple(
            o.astype(jnp.bfloat16) if o.dtype == jnp.float32 else o
            for o in ops
        )
    return ops


def set_msda_defaults(impl: str = None, gather_dtype=None, tiled_dtype=None,
                      tiled_halos=None, tiled_tile_tokens=None,
                      tiled_margin=None, dense_level_rows=None,
                      tiled_layout=None, decoder_prepack=None,
                      tiled_overflow=None, tiled_patch_mode=None,
                      tiled_sep_kernel=None, tiled_dot_bf16=None,
                      tiled_slab_order=None,
                      tiled_batch_unroll=None, tiled_int8_slab=None):
    if tiled_int8_slab is not None:
        _MSDA_DEFAULTS["tiled_int8_slab"] = bool(tiled_int8_slab)
    if tiled_slab_order is not None:
        assert tiled_slab_order in ("auto", "yx", "xy", "bm")
        _MSDA_DEFAULTS["tiled_slab_order"] = tiled_slab_order
    if tiled_batch_unroll is not None:
        _MSDA_DEFAULTS["tiled_batch_unroll"] = bool(tiled_batch_unroll)
    if tiled_dot_bf16 is not None:
        _MSDA_DEFAULTS["tiled_dot_bf16"] = (
            "auto" if tiled_dot_bf16 == "auto" else bool(tiled_dot_bf16)
        )
    if tiled_sep_kernel is not None:
        _MSDA_DEFAULTS["tiled_sep_kernel"] = bool(tiled_sep_kernel)
    if tiled_patch_mode is not None:
        _MSDA_DEFAULTS["tiled_patch_mode"] = tiled_patch_mode
    if decoder_prepack is not None:
        _MSDA_DEFAULTS["decoder_prepack"] = bool(decoder_prepack)
    if tiled_overflow is not None:
        _MSDA_DEFAULTS["tiled_overflow"] = (
            "auto" if tiled_overflow == "auto" else int(tiled_overflow)
        )
    if impl is not None:
        _MSDA_DEFAULTS["impl"] = impl
    if gather_dtype is not None:
        _MSDA_DEFAULTS["gather_dtype"] = gather_dtype
    if tiled_dtype is not None:
        _MSDA_DEFAULTS["tiled_dtype"] = tiled_dtype
    if tiled_halos is not None:
        _MSDA_DEFAULTS["tiled_halos"] = (
            "auto" if tiled_halos == "auto" else tuple(tiled_halos)
        )
    if tiled_tile_tokens is not None:
        _MSDA_DEFAULTS["tiled_tile_tokens"] = tuple(tiled_tile_tokens)
    if tiled_margin is not None:
        _MSDA_DEFAULTS["tiled_margin"] = tiled_margin
    if dense_level_rows is not None:
        _MSDA_DEFAULTS["dense_level_rows"] = dense_level_rows
    if tiled_layout is not None:
        _MSDA_DEFAULTS["tiled_layout"] = tiled_layout


def apply_msda_cli_flags(args) -> None:
    """Wire the shared --msda-impl / --msda-halos CLI flags (train.py,
    test.py) into the framework-wide MSDA defaults."""
    if getattr(args, "msda_impl", None):
        set_msda_defaults(impl=args.msda_impl)
    if getattr(args, "msda_halos", None):
        set_msda_defaults(
            tiled_halos="auto" if args.msda_halos == "auto"
            else tuple(int(v) for v in args.msda_halos.split(","))
        )
    if getattr(args, "msda_dtype", None):
        set_msda_defaults(
            tiled_dtype={
                "fp32": jnp.float32,
                "bf16": jnp.bfloat16,
                "auto": "auto",
            }[args.msda_dtype]
        )
    if getattr(args, "msda_int8_slab", False):
        set_msda_defaults(tiled_int8_slab=True)


@contextlib.contextmanager
def msda_defaults(impl: str = None, gather_dtype=None, tiled_dtype=None,
                  tiled_halos=None, tiled_tile_tokens=None, tiled_margin=None,
                  dense_level_rows=None, tiled_layout=None,
                  decoder_prepack=None, tiled_overflow=None,
                  tiled_patch_mode=None, tiled_sep_kernel=None,
                  tiled_dot_bf16=None,
                  tiled_slab_order=None, tiled_batch_unroll=None,
                  tiled_int8_slab=None):
    saved = dict(_MSDA_DEFAULTS)
    set_msda_defaults(impl, gather_dtype, tiled_dtype, tiled_halos,
                      tiled_tile_tokens, tiled_margin, dense_level_rows,
                      tiled_layout, decoder_prepack, tiled_overflow,
                      tiled_patch_mode, tiled_sep_kernel, tiled_dot_bf16,
                      tiled_slab_order, tiled_batch_unroll, tiled_int8_slab)
    try:
        yield
    finally:
        _MSDA_DEFAULTS.update(saved)


def _level_start_indices(spatial_shapes: Sequence[Tuple[int, int]]):
    starts = []
    acc = 0
    for h, w in spatial_shapes:
        starts.append(acc)
        acc += h * w
    return starts, acc


class _TileGeometry:
    """Static tiling of the multi-level token raster for `_msda_tiled`.

    Computed once per (spatial_shapes, tile_tokens, halos) at trace time with
    numpy; everything here is a compile-time constant, so the tiled kernel
    stays fully static under jit.
    """

    __slots__ = ("grid", "ntiles", "T", "perm", "slot_valid", "inv", "patches",
                 "patch_grid", "M")

    def __init__(self, spatial_shapes, tile_tokens, halos, margin=2):
        h0, w0 = spatial_shapes[0]
        gy = max(1, -(-h0 // tile_tokens[0]))
        gx = max(1, -(-w0 // tile_tokens[1]))
        self.grid = (gy, gx)
        nt = gy * gx
        self.ntiles = nt

        # token -> tile assignment by normalized raster position
        tile_of = []
        for h, w in spatial_shapes:
            ty = np.minimum(((np.arange(h) + 0.5) / h * gy).astype(np.int64), gy - 1)
            tx = np.minimum(((np.arange(w) + 0.5) / w * gx).astype(np.int64), gx - 1)
            tile_of.append((ty[:, None] * gx + tx[None, :]).ravel())
        tile_of = np.concatenate(tile_of)
        total = tile_of.shape[0]

        counts = np.bincount(tile_of, minlength=nt)
        T = int(-(-int(counts.max()) // 8) * 8)  # pad slots to a sublane multiple
        self.T = T
        perm = np.zeros((nt, T), np.int32)
        slot_valid = np.zeros((nt, T), bool)
        order = np.argsort(tile_of, kind="stable")
        fill = np.zeros(nt, np.int64)
        tiles_sorted = tile_of[order]
        slots = np.zeros(total, np.int64)
        # slot within tile = running count (tokens of one tile are contiguous
        # in `order` thanks to the stable sort)
        boundaries = np.flatnonzero(np.diff(tiles_sorted, prepend=-1))
        seg_start = np.repeat(boundaries, np.diff(np.append(boundaries, total)))
        slots = np.arange(total) - seg_start
        perm[tiles_sorted, slots] = order.astype(np.int32)
        slot_valid[tiles_sorted, slots] = True
        self.perm = perm
        self.slot_valid = slot_valid
        inv = np.zeros(total, np.int32)
        inv[order] = (tiles_sorted * T + slots).astype(np.int32)
        self.inv = inv

        # per-level patch boxes: uniform (Ph, Pw) per level, per-tile static
        # (y0, x0) clamped to the level interior
        patches = []
        patch_grid = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            r = halos[min(lvl, len(halos) - 1)]
            th, tw = h / gy, w / gx
            ph = min(h, int(np.ceil(th)) + 2 * r + margin)
            pw = min(w, int(np.ceil(tw)) + 2 * r + margin)
            y0 = np.clip(np.floor(np.arange(gy) * th).astype(np.int64) - r, 0, h - ph)
            x0 = np.clip(np.floor(np.arange(gx) * tw).astype(np.int64) - r, 0, w - pw)
            y0s = np.repeat(y0, gx).astype(np.int32)
            x0s = np.tile(x0, gy).astype(np.int32)
            patches.append((y0s, x0s, ph, pw))
            # origins are a separable (row, col) grid by construction —
            # `_slice_patches` extracts row bands then column windows
            patch_grid.append((tuple(int(v) for v in y0),
                               tuple(int(v) for v in x0)))
        self.patches = patches
        self.patch_grid = patch_grid
        self.M = sum(ph * pw for _, _, ph, pw in patches)


_TILE_GEO_CACHE = {}


def _tile_geometry(spatial_shapes, tile_tokens, halos, margin=2):
    key = (tuple(spatial_shapes), tuple(tile_tokens), tuple(halos), margin)
    geo = _TILE_GEO_CACHE.get(key)
    if geo is None:
        geo = _TileGeometry(spatial_shapes, tile_tokens, halos, margin)
        _TILE_GEO_CACHE[key] = geo
    return geo


def multi_scale_deformable_attention(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = None,
    gather_dtype=None,
) -> jnp.ndarray:
    """Deformable attention core.

    Args:
      value: (B, S, H, D) flattened multi-level values, S = sum(h*w).
      spatial_shapes: static sequence of (h, w) per level.
      sampling_locations: (B, Q, H, L, P, 2) normalized (x, y) in [0, 1].
      attention_weights: (B, Q, H, L, P), softmax-normalized over L*P.
      impl: "gather" (4 point gathers per corner) or "pair" (one gather per
        (point, y-row) fetching the 2 x-adjacent corners contiguously).
      gather_dtype: dtype the value tensor is gathered in; weights and the
        final reduction stay fp32 (the fp32 island the reference keeps,
        ms_deform_attn.py:358-373).

    Returns:
      (B, Q, H * D) attended features, dtype of ``value``.
    """
    impl = impl or _MSDA_DEFAULTS["impl"]
    gather_dtype = gather_dtype or _MSDA_DEFAULTS["gather_dtype"]
    if impl in ("auto", "auto_xla", "auto_pallas"):
        # encoder layout (queries == raster tokens): tiled matmul formulation;
        # decoder (sparse queries, no locality): corner-packed gather.
        # The tiled route is TPU-only: it exists to feed the MXU / avoid the
        # issue-bound HBM gather, and off-TPU it is slow to compile (its
        # Pallas variant even runs in interpret mode). Within tiled, the XLA
        # one-hot einsum beats the Pallas kernel (13.0 vs 20.0 ms at encoder
        # scale — XLA fuses the A-build into the prep instead of
        # materializing (B,nt,H,E,T) operands at a kernel boundary; PERF.md),
        # so "auto" means tiled_xla; "auto_pallas" selects the kernel.
        _, total = _level_start_indices(spatial_shapes)
        if sampling_locations.shape[1] != total:
            impl = "corner_pack"
        elif jax.default_backend() != "tpu":
            impl = "corner_pack"
        else:
            impl = "tiled" if impl == "auto_pallas" else "tiled_xla"
    if impl in ("tiled", "tiled_xla"):
        # a forced tiled impl can only serve the encoder layout (Q == S in
        # raster order); other call sites in the same model (decoder,
        # two-stage head) route to corner_pack instead of asserting, so
        # --msda-impl tiled_xla is usable on a full detector
        _, total = _level_start_indices(spatial_shapes)
        if sampling_locations.shape[1] != total:
            impl = "corner_pack"
        else:
            return _msda_tiled(
                value, spatial_shapes, sampling_locations, attention_weights,
                gather_dtype, use_pallas=impl == "tiled",
            )
    if impl == "pair":
        return _msda_pair_gather(
            value, spatial_shapes, sampling_locations, attention_weights, gather_dtype
        )
    if impl == "corner_pack":
        return _msda_corner_pack(
            value, spatial_shapes, sampling_locations, attention_weights,
            gather_dtype,
        )
    in_dtype = value.dtype
    value = value.astype(gather_dtype)
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


def _perm_take(x, perm, inv, axis=1):
    """take(x, perm) whose backward is take(g, inv) — not a scatter.

    XLA lowers the VJP of a gather to scatter-add; for the tiled kernel's
    token<->tile-slot permutations the adjoint is itself a permutation
    take. Padding slots (perm duplicates token 0) are safe: their
    cotangents are exactly zero because only the inverse-permuted outputs
    leave the kernel.
    """

    @jax.custom_vjp
    def f(x):
        return jnp.take(x, perm, axis=axis)

    def fwd(x):
        return f(x), None

    def bwd(_, g):
        return (jnp.take(g, inv, axis=axis),)

    f.defvjp(fwd, bwd)
    return f(x)


def _perm_untile(x, inv, perm, valid, axis=1):
    """take(x, inv) (tile slots -> tokens) with a take-based backward.

    Backward: d(slots)[s] = g[perm[s]] for valid slots, 0 for padding.
    """

    @jax.custom_vjp
    def f(x):
        return jnp.take(x, inv, axis=axis)

    def fwd(x):
        return f(x), None

    def bwd(_, g):
        d = jnp.take(g, perm, axis=axis)
        shape = [1] * d.ndim
        shape[axis] = valid.shape[0]
        return (d * valid.reshape(shape).astype(d.dtype),)

    f.defvjp(fwd, bwd)
    return f(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _slice_patches(vl, y0u, x0u, ph, pw, order="yx"):
    """Band-grid window extraction from one level canvas, any batch size.

    vl (B, h, w, C) -> the patch slab with nt = len(y0u) * len(x0u) tiles in
    row-major tile order. Tile origins form a separable (row, col) grid
    (`_TileGeometry.patch_grid`), so instead of nt per-tile slices — whose
    tiny per-tile reshape+update chains cost ~1.6 ms/iter of HLO self time
    plus ~1.5 ms of staging copies on the flagship (round-4 hlo_stats) —
    extraction is gy row-band slices followed by gx column slices of the
    stacked bands: ~30 big static slices per level instead of 210.
    Static `lax.slice` starts remain ~4 ms faster than the equivalent slab
    gather on the flagship forward; the stack-of-slices VJP is windowed
    scatter-add (the custom backward below), not nt full-canvas pad+adds
    (measured 1.34 s/train-step).

    `order` picks the slab's ELEMENT ORDER (see tiled_slab_order in
    _MSDA_DEFAULTS): the same windows, pre-arranged so XLA's dot layout
    assignment does not re-materialize the slab per (layer, level):
      "yx": (B, nt, ph, pw, C)
      "xy": (B, nt, pw, ph, C)   transposed canvas, x slices innermost
      "bm": (nt, ph, pw, B, C)   batch-minor canvas
    """
    bsz, h, w, c = vl.shape
    gy, gx = len(y0u), len(x0u)
    if order == "yx":
        rows = jnp.stack(
            [jax.lax.slice(vl, (0, y0, 0, 0), (bsz, y0 + ph, w, c))
             for y0 in y0u],
            axis=1,
        )  # (B, gy, ph, w, C)
        cols = jnp.stack(
            [
                jax.lax.slice(rows, (0, 0, 0, x0, 0), (bsz, gy, ph, x0 + pw, c))
                for x0 in x0u
            ],
            axis=2,
        )  # (B, gy, gx, ph, pw, C)
        return cols.reshape(bsz, gy * gx, ph, pw, c)
    if order == "xy":
        vt = jnp.swapaxes(vl, 1, 2)  # (B, w, h, C) — one small transpose
        rows = jnp.stack(
            [jax.lax.slice(vt, (0, 0, y0, 0), (bsz, w, y0 + ph, c))
             for y0 in y0u],
            axis=1,
        )  # (B, gy, w, ph, C)
        cols = jnp.stack(
            [
                jax.lax.slice(rows, (0, 0, x0, 0, 0), (bsz, gy, x0 + pw, ph, c))
                for x0 in x0u
            ],
            axis=2,
        )  # (B, gy, gx, pw, ph, C)
        return cols.reshape(bsz, gy * gx, pw, ph, c)
    assert order == "bm"
    vt = jnp.transpose(vl, (1, 2, 0, 3))  # (h, w, B, C)
    rows = jnp.stack(
        [jax.lax.slice(vt, (y0, 0, 0, 0), (y0 + ph, w, bsz, c))
         for y0 in y0u],
        axis=0,
    )  # (gy, ph, w, B, C)
    cols = jnp.stack(
        [
            jax.lax.slice(rows, (0, 0, x0, 0, 0), (gy, ph, x0 + pw, bsz, c))
            for x0 in x0u
        ],
        axis=1,
    )  # (gy, gx, ph, pw, B, C)
    return cols.reshape(gy * gx, ph, pw, bsz, c)


def _slice_patches_fwd(vl, y0u, x0u, ph, pw, order="yx"):
    return _slice_patches(vl, y0u, x0u, ph, pw, order), vl.shape


def _slice_patches_bwd(y0u, x0u, ph, pw, order, shape, g):
    # windowed accumulate in a Pallas kernel: lax.scatter_add lowers to a
    # SERIAL while of nt read-modify-write dynamic-update-slices
    # (~30 ms/train-step across the encoder; hlo_stats-profiled), the
    # kernel keeps the canvas in VMEM and runs at HBM speed
    # (ops/patch_scatter.py). Overlapping windows ACCUMULATE — do it in
    # f32 even for bf16 slabs (one rounding at the end, not one per
    # overlapping window).
    from relation_detr_tpu.ops.patch_scatter import window_accumulate

    if order == "xy":  # (B, nt, pw, ph, C) -> (B, nt, ph, pw, C)
        g = jnp.swapaxes(g, 2, 3)
    elif order == "bm":  # (nt, ph, pw, B, C) -> (B, nt, ph, pw, C)
        g = jnp.transpose(g, (3, 0, 1, 2, 4))
    y0s = np.repeat(np.asarray(y0u, np.int32), len(x0u))
    x0s = np.tile(np.asarray(x0u, np.int32), len(y0u))
    d = jnp.stack([
        window_accumulate(
            g[b].astype(jnp.float32), y0s, x0s, shape[1], shape[2]
        )
        for b in range(g.shape[0])
    ])
    # slicing preserves dtype, so the primal's dtype == the cotangent's
    return (d.astype(g.dtype),)


_slice_patches.defvjp(_slice_patches_fwd, _slice_patches_bwd)


# einsum subscripts per slab order: (forward, d_A-from-g, d_patch)
_SEP_SUBS = {
    "yx": ("bnhyxt,bnyxhd->bnhdt", "bnhdt,bnyxhd->bnhyxt",
           "bnhyxt,bnhdt->bnyxhd"),
    "xy": ("bnhyxt,bnxyhd->bnhdt", "bnhdt,bnxyhd->bnhyxt",
           "bnhyxt,bnhdt->bnxyhd"),
    "bm": ("bnhyxt,nyxbhd->bnhdt", "bnhdt,nyxbhd->bnhyxt",
           "bnhyxt,bnhdt->nyxbhd"),
}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sep_contract(oy, ox, patch, order="yx"):
    """out[t,d] = sum_{p,y,x} oy[p,y,t]*ox[p,x,t]*patch[y,x,d] (batched).

    oy (B,nt,H,P,ph,T), ox (B,nt,H,P,pw,T), patch in `order`'s layout
    ((B,nt,ph,pw,H,D) / (B,nt,pw,ph,H,D) / (nt,ph,pw,B,H,D)) ->
    (B,nt,H,D,T). The forward builds A = sum_p oy_p (x) ox_p as P fused
    rank-1 accumulations and contracts it on the MXU. The custom backward
    exists because reverse-mode autodiff of the P-sum materializes
    (B,nt,H,P,ph,pw,T) products (4x the A matrix, ~3 GB per encoder layer
    at flagship scale — measured 1.34 s/train-step vs 374 ms before the
    separable build). Here the backward is two A-sized einsums plus two
    fused VPU broadcast-reductions of exactly the forward A-build cost.
    The `order` variants are bitwise-identical math — only the slab's
    physical element order changes (see tiled_slab_order).
    """
    a = jnp.sum(oy[..., :, None, :] * ox[..., None, :, :], axis=3)
    a, patch = _boundary_cast(a, patch)  # TPU: rounding the MXU does anyway
    # NOTE (round 4, measured): pre-transposing the patch slab to
    # (B,nt,H,D,M) so the dot RHS has the contraction dim minor (avoiding
    # the 4x D=32->128 lane padding) is a LOSER — 47.4 vs 43.0 ms on the
    # flagship; the explicit transpose materializes instead of fusing into
    # the band-grid slice stack. XLA's own layout choice wins.
    # The OUTPUT order is (B,nt,H,D,T): with T minor the result pads
    # 80->128 lanes (1.6x) instead of the 4x a D-minor (...,T,H,D)
    # accumulator pays; the caller sums all levels in this layout and
    # transposes once.
    return jnp.einsum(
        _SEP_SUBS[order][0], a, patch, preferred_element_type=jnp.float32
    )


def _sep_contract_fwd(oy, ox, patch, order="yx"):
    return _sep_contract(oy, ox, patch, order), (oy, ox, patch)


def _sep_contract_bwd(order, res, g):
    oy, ox, patch = res  # g (B,nt,H,D,T)
    g_c, patch_c = _boundary_cast(g, patch)
    da = jnp.einsum(
        _SEP_SUBS[order][1], g_c, patch_c,
        preferred_element_type=jnp.float32,
    )  # (B,nt,H,ph,pw,T)
    d_oy = jnp.sum(
        da[:, :, :, None] * ox[..., None, :, :], axis=-2
    )  # (B,nt,H,P,ph,T)
    d_ox = jnp.sum(
        da[:, :, :, None] * oy[..., :, None, :], axis=-3
    )  # (B,nt,H,P,pw,T)
    a = jnp.sum(oy[..., :, None, :] * ox[..., None, :, :], axis=3)
    a_c, g_c = _boundary_cast(a, g)
    d_patch = jnp.einsum(
        _SEP_SUBS[order][2], a_c, g_c, preferred_element_type=jnp.float32
    )
    # cotangent dtypes must match the primals (bf16 under --msda-dtype bf16)
    return (d_oy.astype(oy.dtype), d_ox.astype(ox.dtype),
            d_patch.astype(patch.dtype))


_sep_contract.defvjp(_sep_contract_fwd, _sep_contract_bwd)


def _msda_tiled(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    gather_dtype,
    tile_tokens: Tuple[int, int] = None,
    halos: Sequence[int] = None,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Tiled one-hot-matmul formulation — the TPU encoder kernel.

    The encoder is the only place MSDA is hot (Q = S = 22k tokens at
    800x1344), and there every query's sampling locations cluster around the
    query's own raster position (reference points are grid centers,
    base_transformer.py:52-91; offsets are initialized <= num_points texels,
    ms_deform_attn.py:266-278 in the reference). This kernel exploits that
    locality to replace the per-point HBM gather (issue-bound at ~15 ns per
    request, PERF.md) with MXU matmuls:

      1. tokens are grouped into static normalized-space tiles (trace-time
         geometry — `_TileGeometry`);
      2. per (tile, level) a static value patch covering the tile footprint
         plus a halo is sliced out (210 big contiguous slabs instead of 2.9M
         row gathers);
      3. the bilinear corner weights x attention weights are scattered into a
         per-level one-hot matrix A of shape (T, M_l) via VPU compares;
      4. the sample-and-reduce becomes  out = sum_l  A_l @ patch_l  — batched
         (B, tile, head) matmuls on the MXU. The backward is A^T @ g and
         g @ patch^T: the CUDA col2im scatter-add
         (ms_deform_im2col_cuda.cuh:290-911) becomes a matmul too.

    Exactness: identical to grid_sample(align_corners=False, zeros) whenever
    every sampled corner lies within its tile's patch (true when per-level
    offsets stay within the halo, by construction at init). Corners beyond
    the halo are clamped to the patch border (documented approximation —
    border sampling); corners outside the *level* contribute exactly zero.
    Requires Q == sum(h*w) with queries in raster token order (the encoder
    layout); callers use `impl="auto"` which falls back to corner_pack
    otherwise.
    """
    in_dtype = value.dtype
    if value.shape[0] > 1 and _MSDA_DEFAULTS.get("tiled_batch_unroll", False):
        # trace-time unroll over the batch: each slice compiles as the B=1
        # program, which XLA lays out copy-free (see tiled_batch_unroll)
        return jnp.concatenate(
            [
                _msda_tiled(
                    value[b:b + 1],
                    spatial_shapes,
                    sampling_locations[b:b + 1],
                    attention_weights[b:b + 1],
                    gather_dtype,
                    tile_tokens,
                    halos,
                    use_pallas,
                )
                for b in range(value.shape[0])
            ],
            axis=0,
        )
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)
    bs, total_v, num_heads, head_dim = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    starts, total = _level_start_indices(spatial_shapes)
    assert value.shape[1] == total
    assert num_queries == total, (
        "tiled MSDA requires queries == raster tokens (encoder layout); "
        f"got Q={num_queries}, S={total}"
    )

    if halos is None:
        halos = _MSDA_DEFAULTS["tiled_halos"]
    halos_auto = halos == "auto"
    if halos_auto:  # exact at the radial offset init (radius <= P)
        halos = (num_points + 1,) * num_levels
    overflow_k = _MSDA_DEFAULTS["tiled_overflow"]
    if overflow_k == "auto":
        # nothing can clamp at the offset init under auto halos; smaller
        # halos get the exact side channel for the (rare) out-of-halo
        # corners of a trained checkpoint
        overflow_k = 0 if halos_auto else 8
    if _MSDA_DEFAULTS.get("tiled_layout") == "t_major":
        overflow_k = 0  # residual implemented for the default t_minor layout
    if tile_tokens is None:
        tile_tokens = _MSDA_DEFAULTS["tiled_tile_tokens"]
    tiled_dtype = _resolve_tiled_dtype()
    geo = _tile_geometry(
        spatial_shapes, tile_tokens, halos, _MSDA_DEFAULTS["tiled_margin"]
    )
    nt, T = geo.ntiles, geo.T

    # Layout discipline (the perf-critical part): every intermediate keeps T
    # in the MINOR dimension. TPU tensors tile the last two dims to (8, 128);
    # a tensor ending in (..., P=4, 2) pads 128x and the prep drowns in pad
    # traffic (measured 29.5 ms/op vs 6.3 ms kernel before this layout).
    # The take runs on lane-packed (B, Q, H*L*P*{2,1}) rows, then ONE
    # transpose per tensor moves T to the back.
    # ("t_major" keeps the take's natural (B,nt,T,...) order with no
    # transposes at all and lets XLA assign layouts inside the fusion.)
    t_major = _MSDA_DEFAULTS.get("tiled_layout") == "t_major"
    # numpy index constants (NOT jnp): the _perm_take/_perm_untile custom-vjp
    # closures capture them, and a jnp array materialized inside a remat
    # trace would leak into the later backward trace
    permf_np = geo.perm.reshape(-1)
    invf_np = geo.inv
    loc_t = _perm_take(
        sampling_locations.reshape(bs, num_queries, -1), permf_np, invf_np
    ).reshape(bs, nt, T, num_heads, num_levels, num_points, 2)
    attn_t = _perm_take(
        attention_weights.reshape(bs, num_queries, -1), permf_np, invf_np
    ).reshape(bs, nt, T, num_heads, num_levels, num_points)
    if not t_major:
        loc_t = jnp.transpose(loc_t, (0, 1, 3, 4, 5, 6, 2))  # (B,nt,H,L,P,2,T)
        attn_t = jnp.transpose(attn_t, (0, 1, 3, 4, 5, 2))  # (B,nt,H,L,P,T)

    # slab element order: only the default separable-slices branch consumes
    # non-"yx" slabs (the Pallas/t_major/slab-kernel branches index flat M)
    slab_order = _MSDA_DEFAULTS.get("tiled_slab_order", "auto")
    if slab_order == "auto":
        slab_order = "xy" if bs == 1 else "bm"
    if (use_pallas or t_major or _MSDA_DEFAULTS.get("tiled_sep_kernel")
            or _MSDA_DEFAULTS.get("tiled_patch_mode") != "slices"):
        slab_order = "yx"

    # int8 slab (eval-only opt-in, see _MSDA_DEFAULTS["tiled_int8_slab"]):
    # only the default separable slices branch supports the per-channel
    # dequant-after-dot trick; the overflow side channel's difference form
    # reads unquantized values and would break exactness.
    int8_slab = (
        _MSDA_DEFAULTS.get("tiled_int8_slab", False)
        and not use_pallas and not t_major
        and not _MSDA_DEFAULTS.get("tiled_sep_kernel")
        and _MSDA_DEFAULTS.get("tiled_patch_mode") == "slices"
        and overflow_k == 0
    )
    vflat = value.astype(gather_dtype).reshape(bs, total, num_heads * head_dim)
    out = jnp.zeros((bs, nt, T, num_heads, head_dim), jnp.float32)
    # default separable branch: per-level (B,nt,H,D,T) pieces, summed in ONE
    # fusion and transposed ONCE after the loop. Accumulating per level into
    # the (...,T,H,D) buffer paid a 4x lane-padded (D=32 minor) read+write
    # per level (~3 ms/iter of the round-4 "data formatting" bucket).
    parts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        y0s, x0s, ph, pw = geo.patches[lvl]
        vl = jax.lax.dynamic_slice_in_dim(vflat, starts[lvl], h * w, axis=1)
        vl = vl.reshape(bs, h, w, num_heads * head_dim)
        # one static-index gather of nt contiguous (Ph, Pw, C) slabs
        starts_np = jnp.asarray(np.stack([y0s, x0s], axis=1))  # (nt, 2)
        lvl_scale = None
        if _MSDA_DEFAULTS.get("tiled_patch_mode") == "slices":
            # cast to the contraction dtype BEFORE extraction: rounding
            # commutes with slicing, so this is bitwise-identical to the
            # post-extraction cast while the slice windows move half
            # the bytes and the separate convert/copy passes disappear
            y0u, x0u = geo.patch_grid[lvl]
            if int8_slab:
                # per-channel absmax int8: quantize the LEVEL MAP once so
                # the slice windows and the slab buffer move 1-byte
                # elements; the scale is applied to the per-level
                # contraction output below (dequant commutes with the
                # token-dim dot). jnp.round has zero gradient — eval only.
                amax = jnp.max(jnp.abs(vl), axis=(0, 1, 2))
                lvl_scale = jnp.maximum(amax, 1e-12) / 127.0  # (C,)
                q = jnp.clip(
                    jnp.round(vl / lvl_scale), -127.0, 127.0
                ).astype(jnp.int8)
                patch = _slice_patches(q, y0u, x0u, ph, pw, slab_order)
            else:
                patch = _slice_patches(
                    vl.astype(tiled_dtype), y0u, x0u, ph, pw, slab_order
                )
            if slab_order == "yx":
                patch = patch.reshape(bs, nt, ph * pw, num_heads * head_dim)
        elif bs == 1:
            # transpose-free path: gather straight into (nt, Ph, Pw, C)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            )
            patch = jax.lax.gather(
                vl.reshape(h, w, num_heads * head_dim),
                starts_np,
                dnums,
                slice_sizes=(ph, pw, num_heads * head_dim),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(1, nt, ph * pw, num_heads * head_dim)
        else:
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3, 4),
                collapsed_slice_dims=(),
                start_index_map=(1, 2),
            )
            patch = jax.lax.gather(
                vl,
                starts_np,
                dnums,
                slice_sizes=(bs, ph, pw, num_heads * head_dim),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # (nt, B, Ph, Pw, C)
            patch = jnp.transpose(patch, (1, 0, 2, 3, 4)).reshape(
                bs, nt, ph * pw, num_heads * head_dim
            )

        by = jnp.asarray(y0s).reshape(1, nt, 1, 1, 1)
        bx = jnp.asarray(x0s).reshape(1, nt, 1, 1, 1)
        if t_major:
            loc = loc_t[:, :, :, :, lvl]  # (B,nt,T,H,P,2)
            x = loc[..., 0] * w - 0.5  # (B,nt,T,H,P)
            y = loc[..., 1] * h - 0.5
            attn = attn_t[:, :, :, :, lvl]  # (B,nt,T,H,P)
        else:
            loc = loc_t[:, :, :, lvl]  # (B,nt,H,P,2,T)
            x = loc[:, :, :, :, 0] * w - 0.5  # (B,nt,H,P,T) — T stays minor
            y = loc[:, :, :, :, 1] * h - 0.5
            attn = attn_t[:, :, :, lvl]  # (B,nt,H,P,T)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # Per-entry patch-row index + folded weight (E = 4 corners * P) in
        # the kernel entry layout ((B,nt,H,E,T), or (B,nt,T,H,E) for
        # t_major). Only the Pallas kernel, the t_major A/B path and the
        # overflow side channel consume these rows — the default XLA path
        # builds A separably below and never enumerates corners over M.
        need_entries = use_pallas or t_major or overflow_k > 0
        ms, ws, bads, gids, gclamps = [], [], [], [], []
        entry_axis = -1 if t_major else -2
        if need_entries:
            for dy, wy in ((0, 1.0 - fy), (1, fy)):
                cy = y0i + dy
                ly = jnp.clip(cy - by, 0, ph - 1)
                vy = (cy >= 0) & (cy < h)
                off_y = (cy - by < 0) | (cy - by > ph - 1)
                for dx, wx in ((0, 1.0 - fx), (1, fx)):
                    cx = x0i + dx
                    lx = jnp.clip(cx - bx, 0, pw - 1)
                    in_level = (cx >= 0) & (cx < w) & vy
                    ms.append(ly * pw + lx)
                    ws.append(attn * wy * wx * in_level)
                    if overflow_k > 0:
                        off = off_y | (cx - bx < 0) | (cx - bx > pw - 1)
                        bads.append(in_level & off)
                        gids.append(
                            jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
                        )
                        # border slot the clamped matmul path actually reads
                        gclamps.append((ly + by) * w + (lx + bx))
            m_all = jnp.concatenate(ms, axis=entry_axis)
            w_all = jnp.concatenate(ws, axis=entry_axis)

        residual = None
        if overflow_k > 0:
            # EXACT side channel for out-of-halo corners (fixed capacity K
            # per (tile, head, level)): compact the flagged entries with a
            # cumsum + one-hot contraction, gather their true values from
            # the full level, and scatter them back with a one-hot matmul.
            # Entries beyond capacity keep the border-clamp fallback (never
            # worse than the clamp-only kernel). DIFFERENCE FORM: the matmul
            # path keeps every clamped contribution (no per-entry masking,
            # which the separable A-build below could not express) and the
            # residual adds w * (v[true corner] - v[border slot the clamp
            # read]) — net effect w * v_true, exactly.
            K = overflow_k
            bad_all = jnp.concatenate(bads, axis=entry_axis)  # (B,nt,H,E,T)
            g_all = jnp.concatenate(gids, axis=entry_axis)
            # compaction rank in token-major order, WITHOUT any lane- or
            # sublane-serial prefix sum: per-token counts reduce over the E
            # sublanes, their exclusive prefix over tokens is one tiny
            # triangular matmul on the MXU, and the within-token rank over
            # the E=4P corner entries is ANOTHER tiny triangular matmul —
            # jnp.cumsum(axis=-2) here lowered to a full reduce_window_sum
            # (E x the traffic, 4.9 ms/iter on the flagship profile).
            # ROUND-5 NEGATIVE RESULT: replacing this one-hot compaction
            # with one lax.top_k over the E*T lanes (weight-keyed) measured
            # 82.8 ms vs 50.2 on the flagship (fast halos + of8) — TPU
            # top_k lowers to sorts that cost far more than the ~69 MB of
            # masked reductions it saves. The one-hot design stays.
            bad_i = bad_all.astype(jnp.float32)
            E = bad_i.shape[-2]
            count_t = jnp.sum(bad_i, axis=-2)  # (B,nt,H,T)
            tri = jnp.tril(jnp.ones((T, T), jnp.float32), k=-1)
            base_t = jnp.einsum(
                "ts,bnhs->bnht", tri, count_t,
                preferred_element_type=jnp.float32,
            )  # exclusive prefix over tokens
            tri_e = jnp.tril(jnp.ones((E, E), jnp.float32), k=-1)
            within = jnp.einsum(
                "ef,bnhft->bnhet", tri_e, bad_i,
                preferred_element_type=jnp.float32,
            )  # exclusive prefix over corner entries
            pos_et = (base_t[:, :, :, None, :] + within).astype(jnp.int32)
            pos_et = jnp.where(bad_all, pos_et, K)  # non-bad: park beyond K
            bad_f = bad_all.reshape(bs, nt, num_heads, -1)
            w_f = w_all.reshape(bs, nt, num_heads, -1)
            et = bad_f.shape[-1]
            t_f = jnp.broadcast_to(
                jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, 1, et // T, T), 4
                ).reshape(1, 1, 1, et),
                bad_f.shape,
            )
            pos = pos_et.reshape(bs, nt, num_heads, -1)
            handled = bad_f & (pos < K)
            g_f = g_all.reshape(bs, nt, num_heads, -1)
            gc_f = jnp.concatenate(gclamps, axis=entry_axis).reshape(
                bs, nt, num_heads, -1
            )
            # pack (level row, token) into ONE integer so the masked
            # reductions below go 4 -> 3; g*T + t stays < 2^24 for any
            # realistic level (f32-exact), with a guarded fallback
            packable = h * w * T < (1 << 24)
            if packable:
                pk_f = g_f * T + t_f
            # compaction one-hot with K on SUBLANES and ET on lanes — the
            # (..., ET, K) einsum layout pads K=8 to 128 lanes (16x traffic,
            # measured +25 ms on the flagship); lane-reductions over the
            # (B,nt,H,K,ET) layout are ~free. Each k-row has at most one
            # nonzero entry, so the f32 sums below are exact selects.
            onehot = (
                handled[..., None, :]
                & (pos[..., None, :] == jnp.arange(K)[:, None])
            ).astype(jnp.float32)  # (B,nt,H,K,ET)
            if packable:
                pk_buf = jax.lax.stop_gradient(
                    jnp.sum(onehot * pk_f[..., None, :].astype(jnp.float32),
                            -1)
                ).astype(jnp.int32)
                row_buf = pk_buf // T
                t_buf = pk_buf % T
            else:
                row_buf = jax.lax.stop_gradient(
                    jnp.sum(onehot * g_f[..., None, :].astype(jnp.float32),
                            -1)
                ).astype(jnp.int32)
                t_buf = jax.lax.stop_gradient(
                    jnp.sum(onehot * t_f[..., None, :].astype(jnp.float32),
                            -1)
                ).astype(jnp.int32)
            border_buf = jax.lax.stop_gradient(
                jnp.sum(onehot * gc_f[..., None, :].astype(jnp.float32), -1)
            ).astype(jnp.int32)
            w_buf = jnp.sum(onehot * w_f[..., None, :], -1)
            vhw = vl.reshape(bs, h * w, num_heads, head_dim)
            head_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, num_heads, 1), 2
            )
            dnums_r = jax.lax.GatherDimensionNumbers(
                offset_dims=(2,),
                collapsed_slice_dims=(1, 2),
                start_index_map=(1, 2),
                operand_batching_dims=(0,),
                start_indices_batching_dims=(0,),
            )

            def fetch(rows, k):
                idx2 = jnp.stack(
                    [rows, jnp.broadcast_to(head_iota, rows.shape)], -1
                ).reshape(bs, nt * num_heads * k, 2)
                return jax.lax.gather(
                    vhw,
                    idx2,
                    dnums_r,
                    slice_sizes=(1, 1, 1, head_dim),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                ).reshape(bs, nt, num_heads, k, head_dim)

            # one gather for both the true corner and the border slot it
            # replaces — halves the per-gather launch overhead
            both = fetch(
                jnp.concatenate([row_buf, border_buf], axis=-1), 2 * K
            )
            vals = both[..., :K, :] - both[..., K:, :]
            onehot_t = (t_buf[..., None] == jnp.arange(T)).astype(jnp.float32)
            # scatter K entries back over tokens on the VPU: an einsum here
            # is a batched (T,K)@(K,D) matmul with K=8 — 6% MXU lane
            # utilization, measured as the bulk of the side channel's cost
            wv = w_buf[..., None] * vals.astype(jnp.float32)  # (B,nt,H,K,D)
            residual = jnp.sum(
                onehot_t[..., :, :, None] * wv[..., :, None, :], axis=3
            )  # (B,nt,H,T,D); transposed at the add site per branch layout

        if use_pallas:
            from relation_detr_tpu.ops.msda_pallas import tiled_matmul_core

            contrib = tiled_matmul_core(
                m_all,
                w_all,
                patch.astype(jnp.float32).reshape(
                    bs, nt, ph * pw, num_heads * head_dim
                ),
                (num_heads, head_dim),
            )  # (B,nt,T,C)
            out = out + contrib.reshape(bs, nt, T, num_heads, head_dim)
        elif t_major:
            m_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, 1, 1, ph * pw), 5
            )
            # A built in the out layout directly: (B,nt,T,H,M), E reduced
            a_mat = jnp.sum(
                w_all.astype(tiled_dtype)[..., None]
                * (m_all[..., None] == m_iota).astype(tiled_dtype),
                axis=-2,
            )  # (B,nt,T,H,M)
            a_mat, patch_c = _boundary_cast(
                a_mat,
                patch.astype(tiled_dtype).reshape(
                    bs, nt, ph * pw, num_heads, head_dim
                ),
            )
            contrib = jnp.einsum(
                "bnthm,bnmhd->bnthd",
                a_mat,
                patch_c,
                preferred_element_type=jnp.float32,
            )
            out = out + contrib
        else:
            # SEPARABLE A-build (the default XLA path). Bilinear is an outer
            # product: point p's 2x2 corner stencil = (2-entry y-vector) x
            # (2-entry x-vector), where per-axis clamp puts mass on the
            # border slot and per-axis level-validity zeros it — the product
            # reproduces the per-corner clamp+zero semantics bitwise (masks
            # are exact 1.0/0.0 factors). Cost: O(E*(ph+pw)) compares for
            # the axis vectors + O(P*M) FMAs for the rank-1 accumulations,
            # ~5x fewer VPU ops than scattering E=16 one-hot entries over
            # all M slots (which is what the Pallas/t_major paths still do).
            y_iota = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0)
            x_iota = jax.lax.broadcasted_iota(jnp.int32, (pw, 1), 0)

            def axis_soft(c0, frac, base, psize, lim, iota, fold):
                # (B,nt,H,P,psize,T) soft one-hot over one patch axis
                acc = None
                for d, wgt in ((0, 1.0 - frac), (1, frac)):
                    c = c0 + d
                    slot = jnp.clip(c - base, 0, psize - 1)
                    w_c = (wgt if fold is None else fold * wgt) * (
                        (c >= 0) & (c < lim)
                    )
                    term = w_c[..., None, :] * (slot[..., None, :] == iota)
                    acc = term if acc is None else acc + term
                return acc

            oy = axis_soft(y0i, fy, by, ph, h, y_iota, attn)
            ox = axis_soft(x0i, fx, bx, pw, w, x_iota, None)
            if _MSDA_DEFAULTS.get("tiled_sep_kernel"):
                # fused VMEM kernel: A never materializes in HBM
                from relation_detr_tpu.ops.msda_sep_pallas import (
                    sep_contract_fused,
                )

                contrib = sep_contract_fused(
                    oy.astype(tiled_dtype),
                    ox.astype(tiled_dtype),
                    patch.astype(tiled_dtype).reshape(
                        bs, nt, ph * pw, num_heads * head_dim
                    ),
                )
                out = out + contrib.reshape(
                    bs, nt, T, num_heads, head_dim
                )
            else:
                # A (B,nt,H,ph,pw,T) = sum of P rank-1 outer products,
                # fused into the MXU contraction; custom VJP keeps the
                # backward at A-sized einsums (see _sep_contract)
                # astype is a no-op when patch already carries tiled_dtype
                # (non-yx orders); for the int8 slab it is the dot-operand
                # convert XLA fuses into the contraction's slab read
                if slab_order == "yx":
                    patch6 = patch.astype(tiled_dtype).reshape(
                        bs, nt, ph, pw, num_heads, head_dim
                    )
                else:  # head-split is a free reshape
                    patch6 = patch.astype(tiled_dtype).reshape(
                        patch.shape[:-1] + (num_heads, head_dim)
                    )
                contrib = _sep_contract(
                    oy.astype(tiled_dtype),
                    ox.astype(tiled_dtype),
                    patch6,
                    slab_order,
                )
                if lvl_scale is not None:
                    # per-channel dequant on the contraction OUTPUT: the
                    # scale is constant over the contracted token dim, so
                    # this equals dequantizing the slab, at output bytes
                    contrib = contrib * lvl_scale.reshape(
                        num_heads, head_dim, 1
                    )
                parts.append(contrib)  # (B,nt,H,D,T)
        if residual is not None:  # (B,nt,H,T,D)
            if parts and parts[0].ndim == 4:  # token-major (B,nt,T,C)
                parts.append(
                    jnp.transpose(residual, (0, 1, 3, 2, 4)).reshape(
                        bs, nt, T, num_heads * head_dim
                    )
                )
            elif parts:
                parts.append(jnp.transpose(residual, (0, 1, 2, 4, 3)))
            else:
                out = out + jnp.transpose(residual, (0, 1, 3, 2, 4))

    if parts:  # sum in the dot-output layout, transpose (at most) once
        acc = parts[0]
        for p in parts[1:]:
            acc = acc + p
        if acc.ndim == 4:  # (B,nt,T,C) token-major: final reshape is free
            out = acc
        else:  # (B,nt,H,D,T)
            out = jnp.transpose(acc, (0, 1, 4, 2, 3))  # (B,nt,T,H,D)
    out = out.reshape(bs, nt * T, num_heads * head_dim)
    out = _perm_untile(
        out, invf_np, permf_np, geo.slot_valid.reshape(-1)
    )  # (B, Q, H*D)
    return out.astype(in_dtype)


def tiled_clamp_fraction(
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray = None,
    tile_tokens: Tuple[int, int] = None,
    halos: Sequence[int] = None,
    margin: int = None,
) -> jnp.ndarray:
    """Fraction of bilinear corners the tiled kernel would border-clamp.

    The tiled encoder path (``_msda_tiled``) is exact only while every
    sampled corner lands inside its tile's halo'd patch; corners beyond the
    halo are clamped to the patch border (documented approximation). This
    diagnostic measures, for real sampling locations (e.g. from a converted
    checkpoint), how often that approximation engages — weighted by
    attention weight when ``attention_weights`` is given — so halo defaults
    can be chosen from data rather than guessed.

    Returns a scalar in [0, 1] (0 = tiled output is exact).
    """
    if halos is None:
        halos = _MSDA_DEFAULTS["tiled_halos"]
    if halos == "auto":
        halos = (sampling_locations.shape[-2] + 1,) * len(spatial_shapes)
    if tile_tokens is None:
        tile_tokens = _MSDA_DEFAULTS["tiled_tile_tokens"]
    if margin is None:
        margin = _MSDA_DEFAULTS["tiled_margin"]
    sampling_locations = jnp.asarray(sampling_locations, jnp.float32)
    bs, num_queries = sampling_locations.shape[:2]
    geo = _tile_geometry(spatial_shapes, tile_tokens, halos, margin)
    nt, T = geo.ntiles, geo.T
    permf = jnp.asarray(geo.perm.reshape(-1))
    loc_t = jnp.take(
        sampling_locations.reshape(bs, num_queries, -1), permf, axis=1
    ).reshape(bs, nt, T, *sampling_locations.shape[2:])  # (B,nt,T,H,L,P,2)
    valid_t = jnp.asarray(geo.slot_valid).reshape(1, nt, T, 1, 1)
    if attention_weights is not None:
        w_t = jnp.take(
            jnp.asarray(attention_weights, jnp.float32).reshape(bs, num_queries, -1),
            permf, axis=1,
        ).reshape(bs, nt, T, *attention_weights.shape[2:])  # (B,nt,T,H,L,P)
    clamped_w = 0.0
    total_w = 0.0
    for lvl, (h, w) in enumerate(spatial_shapes):
        y0s, x0s, ph, pw = geo.patches[lvl]
        by = jnp.asarray(y0s).reshape(1, nt, 1, 1)
        bx = jnp.asarray(x0s).reshape(1, nt, 1, 1)
        loc = loc_t[:, :, :, :, lvl]  # (B,nt,T,H,P,2)
        x0i = jnp.floor(loc[..., 0] * w - 0.5).astype(jnp.int32)
        y0i = jnp.floor(loc[..., 1] * h - 0.5).astype(jnp.int32)
        bad = jnp.zeros(x0i.shape, bool)
        for dy in (0, 1):
            cy = y0i + dy
            in_lvl_y = (cy >= 0) & (cy < h)
            off_y = (cy - by[..., None] < 0) | (cy - by[..., None] > ph - 1)
            for dx in (0, 1):
                cx = x0i + dx
                in_lvl = in_lvl_y & (cx >= 0) & (cx < w)
                off = off_y | (cx - bx[..., None] < 0) | (cx - bx[..., None] > pw - 1)
                bad = bad | (in_lvl & off)  # out-of-level corners are exact 0s
        wgt = w_t[:, :, :, :, lvl] if attention_weights is not None else 1.0
        clamped_w = clamped_w + jnp.sum(bad * wgt * valid_t)
        total_w = total_w + jnp.sum(jnp.ones_like(bad) * wgt * valid_t)
    return clamped_w / jnp.maximum(total_w, 1e-9)


def _msda_corner_pack(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    gather_dtype,
) -> jnp.ndarray:
    """Corner-packed formulation — the TPU-tuned gather.

    TPU gathers fetch at vector-register-row (and often full-tile)
    granularity, so a naive per-corner gather of D=32 floats wastes ~4-32x of
    every fetch. Here the value tensor is pre-packed per level so one row
    holds all four bilinear corners contiguously in the 128-lane dimension:

        packed[y*W + x] = [V(y,x) | V(y,x+1) | V(y+1,x) | V(y+1,x+1)]

    (built with three rolls — O(S) streaming). One gather per (query, head,
    point) then fetches a full 4*D = 128-lane row covering the whole 2x2
    bilinear footprint: 4x fewer requests, each using 100% of a vreg row.

    Exactness: the pack start is clamped to the level interior
    (x in [0, W-2], y in [0, H-2]); per-slot weights re-derive which slot is
    which corner, so clamped starts and out-of-bounds corners contribute
    exactly the grid_sample zero-padding result.
    """
    in_dtype = value.dtype
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)
    bs, _, num_heads, head_dim = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    starts, total = _level_start_indices(spatial_shapes)
    assert value.shape[1] == total

    vhm = jnp.transpose(value.astype(gather_dtype), (0, 2, 1, 3)).reshape(
        bs * num_heads, total, head_dim
    )

    out = jnp.zeros((bs, num_queries, num_heads, head_dim), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(vhm, starts[lvl], h * w, axis=1)
        # pack 2x2 corner neighborhoods into the lane dim: (B*H, hw, 4D).
        # (A two-step pack via an intermediate [V(r)|V(r+1)] table measured
        # 4 ms SLOWER on the flagship — XLA fuses this 4-roll concat into
        # one pass; the intermediate forces an extra materialization.)
        packed = jnp.concatenate(
            [
                value_l,
                jnp.roll(value_l, -1, axis=1),
                jnp.roll(value_l, -w, axis=1),
                jnp.roll(value_l, -(w + 1), axis=1),
            ],
            axis=-1,
        )

        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        xc = jnp.clip(x0, 0, max(w - 2, 0))
        yc = jnp.clip(y0, 0, max(h - 2, 0))

        def axis_slot_weight(s, base, clamped, frac, size):
            coord = clamped + s
            w0 = jnp.where((coord == base) & (base >= 0) & (base < size), 1.0 - frac, 0.0)
            w1 = jnp.where(
                (coord == base + 1) & (base + 1 >= 0) & (base + 1 < size), frac, 0.0
            )
            return w0 + w1

        wx = jnp.stack(
            [axis_slot_weight(s, x0, xc, fx, w) for s in (0, 1)], -1
        )  # (B, Q, H, P, 2)
        wy = jnp.stack(
            [axis_slot_weight(s, y0, yc, fy, h) for s in (0, 1)], -1
        )
        # slot order matches the pack: (y slot, x slot) = 00, 01, 10, 11
        wslot = (wy[..., :, None] * wx[..., None, :]).reshape(
            bs, num_queries, num_heads, num_points, 4
        )
        wslot = wslot * attention_weights[:, :, :, lvl][..., None]
        # head-major (B*H, Q*P, 4), then broadcast each slot weight across its
        # 32-lane group so the weighted product stays in an (N, 128) layout
        # (a separate (..., 4, 32) temp gets a 4x-padded T(4,128) layout)
        wslot_hm = jnp.transpose(wslot, (0, 2, 1, 3, 4)).reshape(
            bs * num_heads, num_queries * num_points, 4
        )
        wlanes = jnp.repeat(wslot_hm, head_dim, axis=-1)  # (B*H, Q*P, 4D)

        idx = yc * w + xc  # (B, Q, H, P)
        idx = jnp.transpose(idx, (0, 2, 1, 3)).reshape(
            bs * num_heads, num_queries * num_points
        )
        if h * w <= _MSDA_DEFAULTS["dense_level_rows"] and num_queries <= 4096:
            # small level: a one-hot MXU matmul beats the issue-bound gather
            # (requests cost ~15 ns each regardless of level size, PERF.md;
            # at <=1536 rows the one-hot build + matmul is cheaper). Exact:
            # selects the same packed rows.
            onehot = (
                idx[..., None] == jnp.arange(h * w, dtype=idx.dtype)
            ).astype(packed.dtype)
            got = jnp.einsum(
                "nqs,nsd->nqd", onehot, packed,
                preferred_element_type=jnp.float32,
            )  # (B*H, Q*P, 4D)
        else:
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(2,),
                collapsed_slice_dims=(1,),
                start_index_map=(1,),
                operand_batching_dims=(0,),
                start_indices_batching_dims=(0,),
            )
            got = jax.lax.gather(
                packed,
                idx[..., None],
                dnums,
                slice_sizes=(1, 1, 4 * head_dim),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # (B*H, Q*P, 4D)
        weighted = got.astype(jnp.float32) * wlanes  # (B*H, Q*P, 4D), 128-lane layout
        contrib = jnp.sum(
            weighted.reshape(bs, num_heads, num_queries, num_points * 4, head_dim),
            axis=3,
        )  # (B, H, Q, D)
        out = out + jnp.transpose(contrib, (0, 2, 1, 3))

    return out.reshape(bs, num_queries, num_heads * head_dim).astype(in_dtype)


def decoder_prepack_enabled() -> bool:
    """True when the decoder corner-pack route should hoist the pack.

    Prepacking helps exactly when the corner-packed gather is in play (the
    decoder layout under "auto"/"corner_pack"); other impls read raw values.
    """
    return bool(_MSDA_DEFAULTS["decoder_prepack"]) and _MSDA_DEFAULTS[
        "impl"
    ] in ("auto", "auto_xla", "auto_pallas", "corner_pack")


def corner_pack_raw_tables(
    value_raw: jnp.ndarray,  # (B, S, C) memory BEFORE value projection
    spatial_shapes: Sequence[Tuple[int, int]],
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True = pad
):
    """Per-level 4-corner pack of the raw decoder memory, built ONCE.

    Every decoder layer samples the same encoder memory through its own
    ``value_proj``; because both the projection and the corner pack are
    linear, ``pack(mask(proj_i(V)))`` equals a block-diagonal projection of
    ``pack(mask_raw(V))`` plus a bias term weighted by the packed validity.
    Hoisting the pack replaces six HBM-bound 4-roll+concat passes with one,
    leaving each layer a single MXU einsum (see
    ``project_corner_pack_tables``). Numerics are unchanged: the reference
    masks the PROJECTED value (ms_deform_attn.py:334-336), which the validity
    channel reproduces exactly (masked corners contribute neither value nor
    bias).

    Returns a tuple per level of ``(vm, mval)`` with ``vm`` (B, hw, 4, C) =
    masked raw values of the 2x2 corner neighborhood and ``mval`` (B, hw, 4)
    the per-corner padding validity. Corner slot order matches
    ``_msda_corner_pack``: (y,x) = 00, 01, 10, 11. Rolled-in rows from the
    next raster row / level edge are harmless: per-slot weights derived at
    gather time zero any corner outside the level.
    """
    starts, total = _level_start_indices(spatial_shapes)
    assert value_raw.shape[1] == total
    valid = (
        jnp.ones(value_raw.shape[:2], jnp.float32)
        if key_padding_mask is None
        else (~key_padding_mask).astype(jnp.float32)
    )
    vm_all = value_raw.astype(jnp.float32) * valid[..., None]
    tables = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(vm_all, starts[lvl], h * w, axis=1)
        m = jax.lax.dynamic_slice_in_dim(valid, starts[lvl], h * w, axis=1)
        shifts = (0, -1, -w, -(w + 1))
        vm = jnp.stack([jnp.roll(v, s, axis=1) for s in shifts], axis=2)
        mval = jnp.stack([jnp.roll(m, s, axis=1) for s in shifts], axis=2)
        tables.append((vm, mval))
    return tuple(tables)


def project_corner_pack_tables(tables, kernel, bias, num_heads: int):
    """Apply one layer's value projection to the prepacked raw tables.

    kernel (C, C), bias (C,) are the layer's ``value_proj`` parameters.
    Returns a tuple per level of (B, hw, H, 4*D) tables laid out so one
    gather row holds all four corners of one head contiguously in the lane
    dimension (same 128-lane rows as ``_msda_corner_pack``'s packed value).
    """
    c_in = kernel.shape[0]
    head_dim = kernel.shape[1] // num_heads
    k = kernel.astype(jnp.float32).reshape(c_in, num_heads, head_dim)
    b = bias.astype(jnp.float32).reshape(num_heads, head_dim)
    out = []
    for vm, mval in tables:
        bsz, hw = vm.shape[:2]
        vm_c, k_c = _boundary_cast(vm, k)
        t = jnp.einsum(
            "bsfc,chd->bshfd", vm_c, k_c, preferred_element_type=jnp.float32
        )
        t = t + b[None, None, :, None, :] * mval[:, :, None, :, None]
        out.append(t.reshape(bsz, hw, num_heads, 4 * head_dim))
    return tuple(out)


def msda_prepacked(
    packed_tables,  # tuple per level of (B, hw, H, 4*D)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Q, H, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, Q, H, L, P)
) -> jnp.ndarray:
    """Corner-packed MSDA over prepacked+projected tables.

    Identical numerics to ``_msda_corner_pack`` (same slot-weight
    re-derivation, so clamped pack starts and out-of-level corners contribute
    the exact grid_sample zero-padding result); the value projection and
    padding mask are already folded into the tables.
    Returns (B, Q, H*D) in fp32.
    """
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)
    bs, num_queries, num_heads = sampling_locations.shape[:3]
    num_levels, num_points = sampling_locations.shape[3:5]
    head_dim = packed_tables[0].shape[-1] // 4

    out = jnp.zeros((bs, num_heads, num_queries, head_dim), jnp.float32)
    head_col = jax.lax.broadcasted_iota(
        jnp.int32, (1, num_heads, num_queries * num_points), 1
    )
    for lvl, (h, w) in enumerate(spatial_shapes):
        tbl = packed_tables[lvl]  # (B, hw, H, 4D)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        xc = jnp.clip(x0, 0, max(w - 2, 0))
        yc = jnp.clip(y0, 0, max(h - 2, 0))

        def axis_slot_weight(s, base, clamped, frac, size):
            coord = clamped + s
            w0 = jnp.where(
                (coord == base) & (base >= 0) & (base < size), 1.0 - frac, 0.0
            )
            w1 = jnp.where(
                (coord == base + 1) & (base + 1 >= 0) & (base + 1 < size),
                frac, 0.0,
            )
            return w0 + w1

        wx = jnp.stack([axis_slot_weight(s, x0, xc, fx, w) for s in (0, 1)], -1)
        wy = jnp.stack([axis_slot_weight(s, y0, yc, fy, h) for s in (0, 1)], -1)
        wslot = (wy[..., :, None] * wx[..., None, :]).reshape(
            bs, num_queries, num_heads, num_points, 4
        ) * attention_weights[:, :, :, lvl][..., None]
        # (B, H, Q*P, 4) -> broadcast each slot weight over its D-lane group
        wslot_hm = jnp.transpose(wslot, (0, 2, 1, 3, 4)).reshape(
            bs, num_heads, num_queries * num_points, 4
        )
        wlanes = jnp.repeat(wslot_hm, head_dim, axis=-1)  # (B, H, Q*P, 4D)

        idx = yc * w + xc  # (B, Q, H, P)
        idx = jnp.transpose(idx, (0, 2, 1, 3)).reshape(
            bs, num_heads, num_queries * num_points
        )
        if h * w <= _MSDA_DEFAULTS["dense_level_rows"] and num_queries <= 4096:
            onehot = (
                idx[..., None] == jnp.arange(h * w, dtype=idx.dtype)
            ).astype(tbl.dtype)
            got = jnp.einsum(
                "bhqs,bshd->bhqd", onehot, tbl,
                preferred_element_type=jnp.float32,
            )  # (B, H, Q*P, 4D)
        else:
            starts2 = jnp.stack(
                [idx, jnp.broadcast_to(head_col, idx.shape)], axis=-1
            ).reshape(bs, num_heads * num_queries * num_points, 2)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(2,),
                collapsed_slice_dims=(1, 2),
                start_index_map=(1, 2),
                operand_batching_dims=(0,),
                start_indices_batching_dims=(0,),
            )
            got = jax.lax.gather(
                tbl,
                starts2,
                dnums,
                slice_sizes=(1, 1, 1, 4 * head_dim),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(bs, num_heads, num_queries * num_points, 4 * head_dim)
        weighted = got.astype(jnp.float32) * wlanes
        out = out + jnp.sum(
            weighted.reshape(bs, num_heads, num_queries, num_points * 4, head_dim),
            axis=3,
        )

    return jnp.transpose(out, (0, 2, 1, 3)).reshape(
        bs, num_queries, num_heads * head_dim
    )


def _msda_pair_gather(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    gather_dtype,
) -> jnp.ndarray:
    """Corner-pair formulation: one lax.gather slice of (2, D) contiguous
    texels per (query, head, level, point, y-row) — half the requests of the
    4-corner form, each fetching 2*D contiguous floats.

    The x-pair start is clamped to [0, W-2]; per-slot weights re-derive which
    slot corresponds to x0/x1 so out-of-bounds corners contribute exactly 0,
    preserving grid_sample zero-padding semantics.
    """
    in_dtype = value.dtype
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)
    bs, _, num_heads, head_dim = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    starts, total = _level_start_indices(spatial_shapes)
    assert value.shape[1] == total

    # head-major (B*H, S, D) so each head gathers independently
    vhm = jnp.transpose(value.astype(gather_dtype), (0, 2, 1, 3)).reshape(
        bs * num_heads, total, head_dim
    )

    out = jnp.zeros((bs, num_queries, num_heads, head_dim), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(vhm, starts[lvl], h * w, axis=1)
        value_l = value_l.reshape(bs * num_heads, h, w, head_dim)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0

        # pair start, clamped so the 2-slice stays in-row
        xc = jnp.clip(x0, 0, max(w - 2, 0))
        # slot weights: slot s holds column xc+s; match it to x0/x1
        def slot_weight(s):
            col = xc + s
            w0 = jnp.where((col == x0) & (x0 >= 0) & (x0 < w), 1.0 - fx, 0.0)
            w1 = jnp.where((col == x0 + 1) & (x0 + 1 >= 0) & (x0 + 1 < w), fx, 0.0)
            return w0 + w1

        wx = jnp.stack([slot_weight(0), slot_weight(1)], -1)  # (B, Q, H, P, 2)

        gathered = []
        wy_list = []
        for dy, wy in ((0, 1.0 - fy), (1, fy)):
            yc = y0 + dy
            y_valid = (yc >= 0) & (yc < h)
            yc_safe = jnp.clip(yc, 0, h - 1)
            # indices (B*H, Q*P, 2): (y, x) start of a (1, 2, D) slice
            idx = jnp.stack([yc_safe, xc], -1)  # (B, Q, H, P, 2)
            idx = jnp.transpose(idx, (0, 2, 1, 3, 4)).reshape(
                bs * num_heads, num_queries * num_points, 2
            )
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(2, 3),
                collapsed_slice_dims=(1,),
                start_index_map=(1, 2),
                operand_batching_dims=(0,),
                start_indices_batching_dims=(0,),
            )
            got = jax.lax.gather(
                value_l,
                idx,
                dnums,
                slice_sizes=(1, 1, 2, head_dim),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # (B*H, Q*P, 2, D)
            got = got.reshape(bs, num_heads, num_queries, num_points, 2, head_dim)
            gathered.append(got)
            wy_list.append(jnp.where(y_valid, wy, 0.0))

        attn = attention_weights[:, :, :, lvl]  # (B, Q, H, P)
        contrib = jnp.zeros((bs, num_queries, num_heads, head_dim), jnp.float32)
        for got, wy in zip(gathered, wy_list):
            # (B, H, Q, P, 2, D) * weights (B, Q, H, P, 2)
            wfull = (wx * wy[..., None] * attn[..., None]).astype(jnp.float32)
            wfull = jnp.transpose(wfull, (0, 2, 1, 3, 4))  # (B, H, Q, P, 2)
            contrib = contrib + jnp.transpose(
                jnp.sum(got.astype(jnp.float32) * wfull[..., None], axis=(3, 4)),
                (0, 2, 1, 3),
            )
        out = out + contrib

    return out.reshape(bs, num_queries, num_heads * head_dim).astype(in_dtype)
