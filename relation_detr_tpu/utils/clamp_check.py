"""Checkpoint-load clamp-fraction diagnostic for the tiled MSDA kernel.

The tiled encoder kernel (ops/msda.py::_msda_tiled) is exact while sampled
corners stay within each tile's halo'd patch; beyond it they are either
routed through the exact overflow side channel (up to its capacity) or
border-clamped. A trained checkpoint's offsets can exceed any fixed halo, so
the framework measures the actual clamp fraction ON THE CHECKPOINT'S OWN
SAMPLING LOCATIONS at load time (round-2 verdict: the builder-facing
diagnostic must reach the user automatically).

Mechanics: one eval forward with the "intermediates" collection mutable
captures every MSDA layer's (sampling_locations, attention_weights) — sown
in models/attention.py — and `tiled_clamp_fraction` scores the encoder
layers (queries == raster tokens) against the halos that will actually run.
"""
from __future__ import annotations

import logging
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from relation_detr_tpu.ops.msda import _MSDA_DEFAULTS, tiled_clamp_fraction

logger = logging.getLogger("relation_detr_tpu")

_STRIDES = (8, 16, 32, 64)


def _encoder_spatial_shapes(h: int, w: int, num_levels: int = 4):
    return tuple(
        (-(-h // s), -(-w // s)) for s in _STRIDES[:num_levels]
    )


def _iter_sampling(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == "msda_sampling":
                # sow stores a tuple of appended values; one apply -> one entry
                for locs, attn in v:
                    yield "/".join(path), locs, attn
            else:
                yield from _iter_sampling(v, path + (k,))


def capture_sampling(model, variables, images, mask):
    """One captured eval forward: returns (spatial_shapes, [(path, locs,
    attn)] for the encoder MSDA layers). Fractions for any halo setting can
    then be scored without re-running the model."""
    images = jnp.asarray(images)
    mask = jnp.asarray(mask)
    if images.dtype == jnp.uint8:
        # device-side normalization (EvalPreset(normalize_host=False) path,
        # identical to utils/evaluation.py::make_detections_fn)
        from relation_detr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        x = (images.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        images = jnp.where(mask[..., None], 0.0, x)
    _, state = model.apply(
        dict(variables), images, mask, train=False, mutable=["intermediates"]
    )
    shapes = _encoder_spatial_shapes(images.shape[1], images.shape[2])
    total = sum(hh * ww for hh, ww in shapes)
    captured = [
        (path, locs, attn)
        for path, locs, attn in _iter_sampling(state.get("intermediates", {}))
        if locs.shape[1] == total  # decoder layout: corner_pack, any offsets
    ]
    return shapes, captured


def fractions_for(shapes, captured, halos=None) -> Dict[str, float]:
    return {
        path: float(tiled_clamp_fraction(shapes, locs, attn, halos=halos))
        for path, locs, attn in captured
    }


def measure_clamp_fractions(
    model, variables, images, mask, halos=None
) -> Dict[str, float]:
    """Run one captured eval forward; return encoder-layer clamp fractions.

    Fractions are attention-weighted (a clamped corner the model barely
    attends to barely matters). Keys are module paths, values in [0, 1].
    """
    shapes, captured = capture_sampling(model, variables, images, mask)
    return fractions_for(shapes, captured, halos=halos)


def check_checkpoint_clamp(
    model,
    variables,
    images,
    mask,
    threshold: float = 1e-3,
    halos_forced: bool = False,
    force: bool = False,
) -> Optional[float]:
    """Measure + report the checkpoint's tiled clamp fraction; fail loudly
    when the user forced clamping halos past the threshold.

    Returns the max per-layer fraction (None when the tiled route is off and
    ``force`` is False).
    """
    if not force:
        if _MSDA_DEFAULTS["impl"] not in ("auto", "auto_xla", "auto_pallas",
                                          "tiled", "tiled_xla"):
            return None
        if jax.default_backend() != "tpu" and _MSDA_DEFAULTS["impl"] in (
            "auto", "auto_xla", "auto_pallas"
        ):
            return None  # auto routes off the tiled kernel on this backend
    fracs = measure_clamp_fractions(model, variables, images, mask)
    if not fracs:
        return None
    worst = max(fracs.values())
    halos = _MSDA_DEFAULTS["tiled_halos"]
    overflow = _MSDA_DEFAULTS["tiled_overflow"]
    logger.info(
        "tiled MSDA clamp fraction for this checkpoint (halos=%s, "
        "overflow=%s): max %.2e over %d encoder layers%s",
        halos, overflow, worst, len(fracs),
        "" if worst == 0.0 else " — nonzero fractions: "
        + ", ".join(f"{p}={v:.2e}" for p, v in fracs.items() if v > 0),
    )
    if worst > threshold:
        msg = (
            f"tiled MSDA would border-clamp {worst:.2%} (attention-weighted) "
            f"of this checkpoint's sampling corners at halos={halos}. "
            "Use --msda-halos auto (or larger per-level radii), or raise the "
            "overflow capacity (ops.msda.set_msda_defaults(tiled_overflow=N))."
        )
        if halos_forced:
            raise RuntimeError(msg)
        logger.warning(msg)
    return worst


FAST_HALOS = (4, 3, 2, 2)


def check_and_select_profile(
    model,
    variables,
    images,
    mask,
    threshold: float = 1e-3,
    fast_threshold: float = 1e-6,
    halos_forced: bool = False,
    allow_fast: bool = True,
    force: bool = False,
) -> Optional[str]:
    """One captured forward: report the clamp fraction at the active halos
    (failing loudly per ``check_checkpoint_clamp`` semantics) and, when
    ``allow_fast`` and the checkpoint's measured offsets stay within the
    fast halos, switch the framework defaults to the reduced-halo profile:
    halos (4,3,2,2) with NO overflow channel.

    Round-5 economics (flagship, queued): fast halos + overflow 0 run
    35.1 ms vs the exact default's 42.5 — but every overflow-channel
    design measured has eaten the margin and more (one-hot compaction
    50.2 ms, top_k compaction 82.8; PERF.md rounds 3b/5), so the guarded
    variant is never worth running. The gate is therefore the measured
    fraction itself: the switch only engages when the checkpoint's
    attention-weighted out-of-halo fraction on the probe batch is
    <= ``fast_threshold`` (1e-6). Unmeasured images can still stray past
    the halo; those corners border-clamp, with error bounded by the same
    attention-weight scale the gate just measured. Set tiled_overflow
    explicitly (ops.msda.set_msda_defaults) to trade speed back for the
    exact side channel. Returns "fast"/"exact"/None (tiled route inactive).
    """
    if not force:
        if _MSDA_DEFAULTS["impl"] not in ("auto", "auto_xla", "auto_pallas",
                                          "tiled", "tiled_xla"):
            return None
        if jax.default_backend() != "tpu" and _MSDA_DEFAULTS["impl"] in (
            "auto", "auto_xla", "auto_pallas"
        ):
            return None
    shapes, captured = capture_sampling(model, variables, images, mask)
    if not captured:
        return None
    fracs = fractions_for(shapes, captured)
    worst = max(fracs.values())
    halos = _MSDA_DEFAULTS["tiled_halos"]
    logger.info(
        "tiled MSDA clamp fraction for this checkpoint (halos=%s): max %.2e "
        "over %d encoder layers", halos, worst, len(fracs),
    )
    if worst > threshold:
        msg = (
            f"tiled MSDA would border-clamp {worst:.2%} (attention-weighted) "
            f"of this checkpoint's sampling corners at halos={halos}. "
            "Use --msda-halos auto (or larger per-level radii), or raise the "
            "overflow capacity (ops.msda.set_msda_defaults(tiled_overflow=N))."
        )
        if halos_forced:
            raise RuntimeError(msg)
        logger.warning(msg)
    if not allow_fast or halos_forced:
        return "exact"
    fast_worst = max(fractions_for(shapes, captured, halos=FAST_HALOS).values())
    if fast_worst <= fast_threshold:
        from relation_detr_tpu.ops.msda import set_msda_defaults

        set_msda_defaults(tiled_halos=FAST_HALOS, tiled_overflow=0)
        logger.info(
            "fast MSDA profile auto-selected: this checkpoint's measured "
            "sampling corners all fall within halos %s (attention-weighted "
            "fraction %.1e <= 1e-6); strays on unmeasured images "
            "border-clamp. Force --msda-profile exact to disable.",
            FAST_HALOS, fast_worst,
        )
        return "fast"
    logger.info(
        "staying on exact halos: fast-profile clamp fraction %.2e > %.0e",
        fast_worst, fast_threshold,
    )
    return "exact"
