"""Gradient-accumulation equivalence (round-4 verdict item 8).

``--accumulate-steps k`` routes through optax.MultiSteps wrapping the WHOLE
masked optimizer chain (utils/param_groups.py:96-97), mirroring
accelerator.accumulate (/root/reference/util/engine.py:44). The classic trap
is ordering: clipping/masking must apply to the ACCUMULATED mean gradient,
not to each micro-gradient — MultiSteps-wrapping-the-chain gets this right,
chain-wrapping-MultiSteps would not. This test pins that: k micro-steps of
half-batch gradients == one step on their mean, through the real chain
(frozen mask, clip 0.1, adam, wd mask, low-lr mask, schedule).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from relation_detr_tpu.utils.param_groups import (
    build_optimizer,
    warmup_multistep_schedule,
)


def _param_tree(rng):
    """Names chosen to hit every mask: frozen (backbone/conv1), low-lr
    (backbone, sampling_offsets), no-wd (bias/scale), plain."""

    def t(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32))

    return {
        "backbone": {
            "conv1": {"kernel": t(3, 3, 4, 8)},  # frozen
            "layer2_0": {"kernel": t(8, 8), "bias": t(8)},  # low-lr
        },
        "sampling_offsets": {"kernel": t(8, 16), "bias": t(16)},  # low-lr
        "norm": {"scale": t(8), "bias": t(8)},  # no-wd
        "head": {"kernel": t(8, 4), "bias": t(4)},
    }


def _grad_like(params, rng, scale=1.0):
    return jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)) * scale,
        params,
    )


def test_accumulated_equals_full_batch_step():
    rng = np.random.RandomState(0)
    params = _param_tree(rng)
    sched = warmup_multistep_schedule(1e-4, steps_per_epoch=100)

    # gradients large enough that clip_by_global_norm(0.1) actually bites —
    # the ordering trap is invisible if clipping is a no-op
    g_a = _grad_like(params, rng, scale=3.0)
    g_b = _grad_like(params, rng, scale=0.1)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g_a, g_b)

    tx1 = build_optimizer(sched, accumulate_steps=1)
    s1 = tx1.init(params)
    u1, _ = tx1.update(g_mean, s1, params)
    want = optax.apply_updates(params, u1)

    tx2 = build_optimizer(sched, accumulate_steps=2)
    s2 = tx2.init(params)
    u2a, s2 = tx2.update(g_a, s2, params)
    mid = optax.apply_updates(params, u2a)
    # micro-step 1 must not move the params
    jax.tree.map(
        lambda p, m: np.testing.assert_array_equal(np.asarray(p), np.asarray(m)),
        params, mid,
    )
    u2b, s2 = tx2.update(g_b, s2, mid)
    got = optax.apply_updates(mid, u2b)

    jax.tree.map(
        lambda w, g: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7
        ),
        want, got,
    )
    # frozen params stayed exactly put through both paths
    np.testing.assert_array_equal(
        np.asarray(got["backbone"]["conv1"]["kernel"]),
        np.asarray(params["backbone"]["conv1"]["kernel"]),
    )


def test_accumulation_advances_schedule_once_per_k():
    """The lr schedule must see ONE step per accumulated update (torch
    semantics: scheduler.step() once per optimizer step), not one per
    micro-batch — MultiSteps' inner chain only runs on emit."""
    rng = np.random.RandomState(1)
    params = _param_tree(rng)
    # schedule with a visible warmup slope so step-count leaks are loud
    sched = warmup_multistep_schedule(1e-2, steps_per_epoch=10, warmup_steps=4)
    g = _grad_like(params, rng)

    tx1 = build_optimizer(sched, accumulate_steps=1)
    tx2 = build_optimizer(sched, accumulate_steps=2)
    p1, s1 = params, tx1.init(params)
    p2, s2 = params, tx2.init(params)
    for _ in range(2):  # two full steps
        u, s1 = tx1.update(g, s1, p1)
        p1 = optax.apply_updates(p1, u)
    for _ in range(4):  # four micro-steps == two full steps
        u, s2 = tx2.update(g, s2, p2)
        p2 = optax.apply_updates(p2, u)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        p1, p2,
    )
