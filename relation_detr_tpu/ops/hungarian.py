"""On-device Hungarian assignment (Jonker-Volgenant shortest augmenting path).

The reference matcher ships each cost matrix to the CPU and calls
``scipy.optimize.linear_sum_assignment``
(/root/reference/models/matcher/hungarian_matcher.py:80) — a host sync point
per matched output set per image (~8 sets/step for Relation-DETR). Here the
solver is expressed with ``lax.scan``/``lax.while_loop`` so it jits, vmaps
over (batch x output-set), and runs on-device with no host roundtrip.

The algorithm is the dense rectangular Jonker-Volgenant variant (one Dijkstra
shortest-augmenting-path per row, dual updates keep reduced costs
non-negative), which is exactly what scipy implements, so assignments agree
with the reference up to cost ties.

Static-shape strategy: rows (ground-truth boxes) are padded to a fixed
capacity. Padded rows are processed under ``lax.cond`` no-ops, so runtime
scales with the *actual* number of ground truths, not the padded capacity.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


class _SolverState(NamedTuple):
    u: jnp.ndarray  # (R,) row duals
    v: jnp.ndarray  # (M,) col duals
    row4col: jnp.ndarray  # (M,) assigned row per column, -1 if free
    col4row: jnp.ndarray  # (R,) assigned column per row, -1 if free


def _augment_row(state: _SolverState, cost_row_fn, cur_row: jnp.ndarray, num_rows: int, num_cols: int):
    """Find a shortest augmenting path from ``cur_row`` and apply it."""
    u, v, row4col, col4row = state

    def dijkstra_cond(carry):
        sink = carry[0]
        return sink < 0

    def dijkstra_body(carry):
        _, i, min_val, spc, path, sc, sr = carry
        sr = sr.at[i].set(True)
        reduced = min_val + cost_row_fn(i) - u[i] - v
        better = (~sc) & (reduced < spc)
        spc = jnp.where(better, reduced, spc)
        path = jnp.where(better, i, path)

        masked = jnp.where(sc, _INF, spc)
        lowest = jnp.min(masked)
        at_min = masked == lowest
        at_min_free = at_min & (row4col < 0)
        any_free = jnp.any(at_min_free)
        j = jnp.where(any_free, jnp.argmax(at_min_free), jnp.argmax(at_min))
        sc = sc.at[j].set(True)

        col_free = row4col[j] < 0
        sink = jnp.where(col_free, j, -1)
        i_next = jnp.where(col_free, i, row4col[j])
        return (sink, i_next, lowest, spc, path, sc, sr)

    init = (
        jnp.int32(-1),
        cur_row,
        jnp.float32(0.0),
        jnp.full((num_cols,), _INF, jnp.float32),
        jnp.full((num_cols,), -1, jnp.int32),
        jnp.zeros((num_cols,), bool),
        jnp.zeros((num_rows,), bool),
    )
    sink, _, min_val, spc, path, sc, sr = jax.lax.while_loop(
        dijkstra_cond, dijkstra_body, init
    )

    # Dual updates (Crouse 2016, as in scipy's _lsap).
    u = u.at[cur_row].add(min_val)
    other_sr = sr & (jnp.arange(num_rows) != cur_row)
    spc_at_col4row = spc[jnp.clip(col4row, 0, num_cols - 1)]
    u = u + jnp.where(other_sr, min_val - spc_at_col4row, 0.0)
    v = v - jnp.where(sc, min_val - spc, 0.0)

    # Backtrack the augmenting path. A broken path entry (-1) terminates the
    # loop instead of cycling: with non-finite costs the Dijkstra pass never
    # relaxes any column, `path` stays -1, and an unguarded backtrack
    # while_loop would spin forever ON DEVICE (one NaN batch would hang the
    # whole training job rather than reach the non-finite skip logic).
    def aug_cond(carry):
        done = carry[3]
        return ~done

    def aug_body(carry):
        j, r4c, c4r, _ = carry
        i = path[j]
        r4c = r4c.at[j].set(i)
        j_next = c4r[jnp.maximum(i, 0)]
        c4r = c4r.at[jnp.maximum(i, 0)].set(jnp.where(i < 0, c4r[0], j))
        return (j_next, r4c, c4r, (i == cur_row) | (i < 0))

    _, row4col, col4row, _ = jax.lax.while_loop(
        aug_cond, aug_body, (sink, row4col, col4row, jnp.bool_(False))
    )
    return _SolverState(u, v, row4col, col4row)


def hungarian_assignment(cost: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment of rows (GTs) to columns (queries).

    Args:
      cost: (R, M) cost matrix, R <= M. Padded rows may hold arbitrary finite
        values; they are skipped entirely.
      row_mask: (R,) bool, True for real rows.

    Returns:
      (R,) int32: assigned column per row (valid only where ``row_mask``;
      padded rows return -1).
    """
    num_rows, num_cols = cost.shape
    cost = cost.astype(jnp.float32)
    # non-finite costs (e.g. a NaN forward before the train step's
    # non-finite skip engages) must not stall the solver: clamp them to a
    # large finite value so every while_loop still terminates; the resulting
    # assignment is garbage but the step's loss is non-finite anyway, so the
    # skip logic discards it (scipy raises here; an on-device solver cannot).
    cost = jnp.where(jnp.isfinite(cost), jnp.clip(cost, -_INF, _INF), _INF)

    def cost_row_fn(i):
        return cost[i]

    # Row-dual warm start: u = per-row minima, v = 0. Feasible (reduced =
    # cost - rowmin >= 0), the matching starts EMPTY (trivially extreme),
    # and — critically — every free column keeps v = 0: the Dijkstra stop
    # rule "first free column at minimum distance" equals the true minimum
    # matching-cost change ONLY when all free columns share the same v
    # (dist(j) = dcost - u[row] - v[j]). Two warm starts that violate
    # invariants were caught by the scipy stress test and must NOT come
    # back: (a) LAPJV-style column-reduction pre-assignment (partial
    # matching is not extreme), (b) v = column minima (free columns with
    # unequal v skew the stop rule). With u warmed, most rows' first
    # Dijkstra iteration pops their zero-reduced argmin column, cutting the
    # serial while-loop iterations that dominate the matcher's on-device
    # cost (~58 ms of the 341 ms train step, loop latency not arithmetic).
    u0 = jnp.min(cost, axis=1)  # (R,)
    u0 = jnp.where(row_mask & jnp.isfinite(u0), u0, 0.0)

    def scan_body(state, cur_row):
        new_state = jax.lax.cond(
            row_mask[cur_row],
            lambda s: _augment_row(s, cost_row_fn, cur_row, num_rows, num_cols),
            lambda s: s,
            state,
        )
        return new_state, None

    init = _SolverState(
        u=u0,
        v=jnp.zeros((num_cols,), jnp.float32),
        row4col=jnp.full((num_cols,), -1, jnp.int32),
        col4row=jnp.full((num_rows,), -1, jnp.int32),
    )
    final, _ = jax.lax.scan(scan_body, init, jnp.arange(num_rows, dtype=jnp.int32))
    return jnp.where(row_mask, final.col4row, -1)
