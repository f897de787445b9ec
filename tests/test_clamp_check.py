"""Checkpoint-load clamp diagnostic (utils/clamp_check.py): the framework
itself measures a checkpoint's tiled-MSDA clamp fraction and fails loudly
when forced halos would clamp it (round-2 verdict item 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relation_detr_tpu.ops.msda import msda_defaults
from relation_detr_tpu.utils.clamp_check import (
    check_checkpoint_clamp,
    measure_clamp_fractions,
)
from relation_detr_tpu.utils.config import Config


@pytest.fixture(scope="module")
def tiny_model():
    cfg = Config("configs/relation_detr/relation_detr_resnet50_tiny_test.py")
    model = cfg.model
    B, H, W = 1, 128, 160
    variables = model.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        jnp.zeros((B, H, W, 3), jnp.float32), jnp.zeros((B, H, W), bool),
        jnp.zeros((B, 8), jnp.int32), jnp.full((B, 8, 4), 0.5),
        jnp.zeros((B, 8), bool), train=True,
    )
    images = jnp.asarray(
        np.random.RandomState(0).rand(B, H, W, 3).astype(np.float32)
    )
    mask = jnp.zeros((B, H, W), bool)
    return model, variables, images, mask


def test_init_checkpoint_is_exact_at_auto_halos(tiny_model):
    model, variables, images, mask = tiny_model
    fracs = measure_clamp_fractions(model, variables, images, mask)
    assert fracs, "no encoder MSDA layer captured"
    # provably exact at the radial offset init under auto halos
    assert max(fracs.values()) == 0.0


def test_forced_clamping_halos_fail_loudly(tiny_model):
    model, variables, images, mask = tiny_model
    with msda_defaults(tiled_halos=(0, 0, 0, 0), tiled_overflow=0):
        with pytest.raises(RuntimeError, match="border-clamp"):
            check_checkpoint_clamp(
                model, variables, images, mask,
                threshold=1e-3, halos_forced=True, force=True,
            )
        # same fraction without forced halos only warns
        worst = check_checkpoint_clamp(
            model, variables, images, mask,
            threshold=1e-3, halos_forced=False, force=True,
        )
        assert worst is not None and worst > 1e-3


def test_gate_skips_when_tiled_route_off(tiny_model):
    model, variables, images, mask = tiny_model
    with msda_defaults(impl="corner_pack"):
        assert check_checkpoint_clamp(model, variables, images, mask) is None


def test_profile_auto_selection(tiny_model):
    """check_and_select_profile: at the offset init (radius ~ num_points) the
    fast halos clamp, so the profile stays exact; with shrunken offsets the
    fast profile is provably safe and gets auto-selected (defaults switch to
    FAST_HALOS + overflow safety)."""
    from relation_detr_tpu.ops.msda import _MSDA_DEFAULTS
    from relation_detr_tpu.utils.clamp_check import (
        FAST_HALOS,
        check_and_select_profile,
    )

    model, variables, _, _ = tiny_model
    # canvas large enough that fast-halo patches do NOT cover whole levels
    # (on the 128x160 fixture canvas every patch spans its full level, so
    # nothing can ever clamp and "fast" is trivially correct)
    B, H, W = 1, 256, 320
    images = jnp.asarray(
        np.random.RandomState(0).rand(B, H, W, 3).astype(np.float32))
    mask = jnp.zeros((B, H, W), bool)
    with msda_defaults():  # snapshot defaults; restore on exit
        sel = check_and_select_profile(
            model, variables, images, mask, force=True, allow_fast=True)
        assert sel == "exact"
        assert _MSDA_DEFAULTS["tiled_halos"] == "auto"

    flat = jax.tree_util.tree_flatten_with_path(dict(variables))
    shrunk = []
    for path, leaf in flat[0]:
        keys = [str(getattr(k, "key", k)) for k in path]
        if "sampling_offsets" in keys and keys[-1] == "bias":
            leaf = leaf * 0.05
        shrunk.append(leaf)
    v2 = jax.tree_util.tree_unflatten(flat[1], shrunk)
    with msda_defaults():
        sel = check_and_select_profile(
            model, v2, images, mask, force=True, allow_fast=True)
        assert sel == "fast"
        assert tuple(_MSDA_DEFAULTS["tiled_halos"]) == FAST_HALOS
        # round 5: the fast profile drops the overflow channel — every
        # channel design measured costs more than the halo reduction saves
        # (PERF.md); the gate is the measured <=1e-6 clamp fraction itself
        assert _MSDA_DEFAULTS["tiled_overflow"] == 0
    assert _MSDA_DEFAULTS["tiled_halos"] == "auto"  # restored
