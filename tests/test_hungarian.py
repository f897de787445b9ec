import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from relation_detr_tpu.ops.hungarian import hungarian_assignment


@pytest.mark.parametrize("method", ["scan", "fused"])
@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("shape", [(5, 12), (1, 4), (16, 16), (30, 100)])
def test_matches_scipy_optimal_cost(seed, shape, method):
    rng = np.random.RandomState(seed)
    n, m = shape
    cost = rng.randn(n, m).astype(np.float32) * 10
    col4row = np.asarray(
        hungarian_assignment(jnp.asarray(cost), jnp.ones((n,), bool),
                             method=method)
    )
    # assignment validity
    assert (col4row >= 0).all()
    assert len(set(col4row.tolist())) == n
    ours_cost = cost[np.arange(n), col4row].sum()
    ri, ci = linear_sum_assignment(cost)
    ref_cost = cost[ri, ci].sum()
    np.testing.assert_allclose(ours_cost, ref_cost, rtol=1e-5, atol=1e-4)


def test_padded_rows_do_not_disturb_real_rows():
    rng = np.random.RandomState(0)
    real, pad, m = 6, 10, 20
    cost_real = rng.randn(real, m).astype(np.float32)
    cost = np.zeros((real + pad, m), np.float32)
    cost[:real] = cost_real
    mask = np.zeros((real + pad,), bool)
    mask[:real] = True
    col4row = np.asarray(hungarian_assignment(jnp.asarray(cost), jnp.asarray(mask)))
    assert (col4row[real:] == -1).all()
    ours_cost = cost_real[np.arange(real), col4row[:real]].sum()
    ri, ci = linear_sum_assignment(cost_real)
    np.testing.assert_allclose(ours_cost, cost_real[ri, ci].sum(), rtol=1e-5, atol=1e-4)


def test_vmaps_over_batch():
    rng = np.random.RandomState(1)
    cost = rng.randn(3, 4, 9).astype(np.float32)
    mask = np.ones((3, 4), bool)
    mask[1, 2:] = False
    out = np.asarray(
        jax.vmap(hungarian_assignment)(jnp.asarray(cost), jnp.asarray(mask))
    )
    for b in range(3):
        nb = int(mask[b].sum())
        ri, ci = linear_sum_assignment(cost[b, : nb])
        ours = cost[b][np.arange(nb), out[b, :nb]].sum()
        np.testing.assert_allclose(ours, cost[b][ri, ci].sum(), rtol=1e-5, atol=1e-4)


def test_jit_compiles():
    cost = jnp.asarray(np.random.RandomState(2).randn(8, 30).astype(np.float32))
    f = jax.jit(hungarian_assignment)
    out = f(cost, jnp.ones((8,), bool))
    assert out.shape == (8,)


def test_stress_vs_scipy_tiled_ties_padding():
    """Structured stress: hybrid-style tiled duplicate rows (block-capped
    validity), heavy integer ties, and random padding — the cases that broke
    past warm-start variants. Contract: optimal total cost == scipy's."""
    rng = np.random.RandomState(7)
    fns = [jax.jit(lambda c, m, meth=meth: hungarian_assignment(
        c, m, method=meth)) for meth in ("scan", "fused")]

    def assert_optimal(cost, mask, out):
        real = np.where(mask)[0]
        if len(real) == 0:
            assert (out == -1).all()
            return
        assert (out[~mask] == -1).all()
        cols = out[real]
        assert (cols >= 0).all() and len(set(cols.tolist())) == len(real)
        ri, ci = linear_sum_assignment(cost[real])
        np.testing.assert_allclose(
            cost[real, cols].sum(), cost[real][ri, ci].sum(), rtol=1e-5, atol=1e-4
        )

    def check(cost, mask):
        # both formulations must reach a scipy-optimal assignment
        for f in fns:
            assert_optimal(cost, mask,
                           np.asarray(f(jnp.asarray(cost), jnp.asarray(mask))))

    for _ in range(4):
        base = rng.randn(6, 150).astype(np.float32)
        check(np.tile(base, (6, 1)), np.tile(rng.rand(6) < 0.7, 6))
    for _ in range(4):
        check(rng.randint(0, 4, (12, 40)).astype(np.float32), np.ones(12, bool))
    for _ in range(4):
        check(rng.randn(20, 90).astype(np.float32), rng.rand(20) < 0.6)


def test_nan_cost_terminates_and_is_discardable():
    """Non-finite costs must not hang the on-device while_loops (regression:
    a NaN batch stalled the whole train step before the non-finite skip could
    engage). The assignment value is unspecified — only termination and shape
    are contracted."""
    import jax.numpy as jnp
    from relation_detr_tpu.ops.hungarian import hungarian_assignment

    cost = jnp.full((4, 6), jnp.nan, jnp.float32)
    out = hungarian_assignment(cost, jnp.ones((4,), bool))
    assert out.shape == (4,)

    half = jnp.where(jnp.arange(6)[None, :] < 3, jnp.nan, 1.0) * jnp.ones((4, 1))
    out = hungarian_assignment(half.astype(jnp.float32), jnp.ones((4,), bool))
    assert out.shape == (4,)


def test_serial_iteration_scaling():
    """Perf-property regression: the fused solver's while-loop trip count (the
    quantity that maps to TPU serial-window latency) must scale with REAL rows,
    not padded capacity, and grouped tiled duplicates must collapse to ~1
    iteration per row (PERF.md round 3c)."""
    import jax.lax as lax
    from relation_detr_tpu.ops import hungarian as hung

    counts = []
    orig = lax.while_loop

    def counting(cond, body, init):
        c = init
        n = 0
        while bool(cond(c)):
            c = body(c)
            n += 1
        counts.append(n)
        return c

    rng = np.random.RandomState(0)
    lax.while_loop = counting
    try:
        # capacity independence: 7 real rows in a 100-row buffer
        cost = rng.randn(100, 900).astype(np.float32)
        mask = np.zeros(100, bool)
        mask[:7] = True
        counts.clear()
        hung.hungarian_assignment(jnp.asarray(cost), jnp.asarray(mask),
                                  method="fused")
        assert sum(counts) <= 12, counts  # ~1/row + slack

        # grouped tiled duplicates: 6 copies of 7 rows -> ~1 iter/real row
        base = rng.randn(20, 1500).astype(np.float32)
        cost = np.tile(base, (6, 1))
        mask = np.zeros(20, bool)
        mask[:7] = True
        mask = np.tile(mask, 6)
        group = np.tile(np.arange(20, dtype=np.int32), 6)
        counts.clear()
        hung.hungarian_assignment(
            jnp.asarray(cost), jnp.asarray(mask), jnp.asarray(group),
            method="fused",
        )
        assert sum(counts) <= 70, counts  # 42 real rows + collision slack
    finally:
        lax.while_loop = orig
