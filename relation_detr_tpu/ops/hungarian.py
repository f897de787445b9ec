"""On-device Hungarian assignment (Jonker-Volgenant shortest augmenting path).

The reference matcher ships each cost matrix to the CPU and calls
``scipy.optimize.linear_sum_assignment``
(/root/reference/models/matcher/hungarian_matcher.py:80) — a host sync point
per matched output set per image (~8 sets/step for Relation-DETR). Here the
solver jits, vmaps over (batch x output-set), and runs on-device with no host
roundtrip.

The algorithm is the dense rectangular Jonker-Volgenant variant (one Dijkstra
shortest-augmenting-path per row, dual updates keep reduced costs
non-negative) — the same family scipy implements, so assignments agree with
the reference up to cost ties.

Two formulations, selected by ``method`` / ``set_hungarian_method``:

- ``"scan"`` (DEFAULT): ``lax.scan`` over padded row capacity; each row runs
  a Dijkstra ``while_loop`` plus a backtrack ``while_loop`` under a validity
  ``lax.cond``. With the row-minima warm start most rows' Dijkstra pass pops
  a zero-reduced free column on its first iteration.
- ``"fused"``: the entire solve as ONE ``lax.while_loop`` whose body fuses
  one Dijkstra relaxation + (on termination) the dual update + the first
  backtrack step + next-active-row advance; padded rows are skipped via a
  precomputed table, and ``row_group`` collapses the hybrid branch's tiled
  duplicate rows to ~1 iteration per REAL row. CPU-counted serial windows
  drop ~10x vs scan (PERF.md round 3c).

MEASURED VERDICT (round 3d, flagship train step B=1 800x1344 on TPU v5e):
scan wins at BOTH capacities — 331.5 ms vs fused 390.1 at G=20 cap, and
363.1 ms vs fused 372.4 at the real loader capacity (MAX_GT=100, 600-row
hybrid buffer). The window-count model behind the fusion was wrong on
hardware: XLA pipelines the scan's short whiles across the vmapped
(batch x set) lanes well, while the fused body's full-matrix relaxation per
iteration costs more than the windows it saves. ``"scan"`` is therefore the
default; ``"fused"`` is kept as the measured-negative-result alternative
(both are exactness-tested against scipy).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)

_METHOD = "scan"

# Steps of the fused solver body executed per while_loop trip. Each trip pays
# one serial loop-window latency on TPU; unrolling trades window count for a
# longer fused body. Exactness is unaffected (completed lanes pass through
# unrolled sub-steps unchanged). Applies to method="fused" only.
_UNROLL = 1


def set_hungarian_method(method: str) -> None:
    global _METHOD
    assert method in ("scan", "fused")
    _METHOD = method


def set_hungarian_unroll(n: int) -> None:
    global _UNROLL
    assert n >= 1
    _UNROLL = n


def hungarian_assignment(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray,
    row_group: jnp.ndarray | None = None,
    method: str | None = None,
) -> jnp.ndarray:
    """Solve min-cost assignment of rows (GTs) to columns (queries).

    Args:
      cost: (R, M) cost matrix, R <= M. Padded rows may hold arbitrary finite
        values; they are skipped entirely.
      row_mask: (R,) bool, True for real rows.
      row_group: optional (R,) int32. Rows sharing a group id MUST have
        bitwise-identical cost rows (the hybrid branch's 6x tiled targets,
        /root/reference/models/matcher/hungarian_matcher.py:83-91). Used by
        method="fused" to pop all same-group-owned columns in one iteration;
        ignored (harmlessly) by method="scan".
      method: "scan" | "fused"; default is the module setting (see
        set_hungarian_method; "scan" unless overridden).

    Returns:
      (R,) int32: assigned column per row (valid only where ``row_mask``;
      padded rows return -1).
    """
    cost = cost.astype(jnp.float32)
    # non-finite costs (e.g. a NaN forward before the train step's
    # non-finite skip engages) must not stall the solver: clamp them to a
    # large finite value so every while_loop still terminates; the resulting
    # assignment is garbage but the step's loss is non-finite anyway, so the
    # skip logic discards it (scipy raises here; an on-device solver cannot).
    cost = jnp.where(jnp.isfinite(cost), jnp.clip(cost, -_INF, _INF), _INF)

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
    # Dijkstra step pops a zero-reduced free column.
    u0 = jnp.min(cost, axis=1)  # (R,)
    u0 = jnp.where(row_mask & jnp.isfinite(u0), u0, 0.0)

    if (method or _METHOD) == "fused":
        return _assignment_fused(cost, row_mask, row_group, u0)
    return _assignment_scan(cost, row_mask, u0)


# --------------------------------------------------------------------------
# method="scan": lax.scan over rows, per-row Dijkstra + backtrack whiles
# --------------------------------------------------------------------------


class _SolverState(NamedTuple):
    u: jnp.ndarray  # (R,) row duals
    v: jnp.ndarray  # (M,) col duals
    row4col: jnp.ndarray  # (M,) assigned row per column, -1 if free
    col4row: jnp.ndarray  # (R,) assigned column per row, -1 if free


def _augment_row(state: _SolverState, cost, cur_row: jnp.ndarray,
                 num_rows: int, num_cols: int):
    """Find a shortest augmenting path from ``cur_row`` and apply it."""
    u, v, row4col, col4row = state

    def dijkstra_cond(carry):
        sink = carry[0]
        return sink < 0

    def dijkstra_body(carry):
        _, i, min_val, spc, path, sc, sr = carry
        sr = sr.at[i].set(True)
        reduced = min_val + cost[i] - u[i] - v
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


def _assignment_scan(cost, row_mask, u0):
    num_rows, num_cols = cost.shape

    def scan_body(state, cur_row):
        new_state = jax.lax.cond(
            row_mask[cur_row],
            lambda s: _augment_row(s, cost, cur_row, num_rows, num_cols),
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
    final, _ = jax.lax.scan(
        scan_body, init, jnp.arange(num_rows, dtype=jnp.int32)
    )
    return jnp.where(row_mask, final.col4row, -1)


# --------------------------------------------------------------------------
# method="fused": ONE while_loop; Dijkstra step + dual update + backtrack
# step + row advance fused into a single body (PERF.md round 3c/3d)
# --------------------------------------------------------------------------


class _Carry(NamedTuple):
    cur_row: jnp.ndarray  # () int32 — row being augmented; num_rows => done
    in_backtrack: jnp.ndarray  # () bool — phase flag
    u: jnp.ndarray  # (R,) row duals
    v: jnp.ndarray  # (M,) col duals
    row4col: jnp.ndarray  # (M,) assigned row per column, -1 if free
    col4row: jnp.ndarray  # (R,) assigned column per row, -1 if free
    # Dijkstra state (valid while in the Dijkstra phase for cur_row)
    i: jnp.ndarray  # () int32 — row whose costs relax next
    min_val: jnp.ndarray  # () f32 — distance of the last scanned column
    spc: jnp.ndarray  # (M,) shortest path costs
    path: jnp.ndarray  # (M,) predecessor row per column, -1 unset
    sc: jnp.ndarray  # (M,) bool — scanned columns
    sr: jnp.ndarray  # (R,) bool — scanned rows
    bt_j: jnp.ndarray  # () int32 — backtrack cursor (backtrack phase only)


def _assignment_fused(cost, row_mask, row_group, u0):
    """One fused while_loop per solve.

    ``row_group``: rows sharing a group id MUST have bitwise-identical cost
    rows. Dijkstra relaxation through a same-group row is then provably a
    no-op (matched edges have reduced cost 0 and identical rows share cost
    entries, so every path through the matched edge ties the direct distance
    — strict-< relaxation never fires), which licenses popping ALL
    same-group-owned columns below the stop distance in a single iteration.
    Copy c of a tiled GT walks c columns owned by its earlier copies;
    grouping collapses that walk to one iteration (CPU-counted: 42-real-row
    hybrid solve 147 -> ~49 iterations). Default (None) is one group per
    row — exactly the ungrouped algorithm.
    """
    num_rows, num_cols = cost.shape

    # next_active[r] = smallest active row >= r, else num_rows (suffix min).
    ridx = jnp.arange(num_rows, dtype=jnp.int32)
    if row_group is None:
        row_group = ridx  # one group per row: `same` never fires
    else:
        row_group = row_group.astype(jnp.int32)
    masked_idx = jnp.where(row_mask, ridx, num_rows)
    next_active = jnp.concatenate(
        [
            jax.lax.cummin(masked_idx[::-1])[::-1],
            jnp.array([num_rows], jnp.int32),
        ]
    )  # (R+1,)

    inf_cols = jnp.full((num_cols,), _INF, jnp.float32)
    neg1_cols = jnp.full((num_cols,), -1, jnp.int32)
    false_cols = jnp.zeros((num_cols,), bool)
    false_rows = jnp.zeros((num_rows,), bool)

    cur_row0 = next_active[0]
    init = _Carry(
        cur_row=cur_row0,
        in_backtrack=jnp.bool_(False),
        u=u0,
        v=jnp.zeros((num_cols,), jnp.float32),
        row4col=jnp.full((num_cols,), -1, jnp.int32),
        col4row=jnp.full((num_rows,), -1, jnp.int32),
        i=cur_row0,
        min_val=jnp.float32(0.0),
        spc=inf_cols,
        path=neg1_cols,
        sc=false_cols,
        sr=false_rows,
        bt_j=jnp.int32(0),
    )

    def cond(c: _Carry):
        return c.cur_row < num_rows

    def body(c: _Carry) -> _Carry:
        is_dij = ~c.in_backtrack

        # ---- one Dijkstra relaxation step (discarded when backtracking) ----
        i = jnp.clip(c.i, 0, num_rows - 1)
        sr1 = c.sr.at[i].set(True)
        reduced = c.min_val + cost[i] - c.u[i] - c.v
        better = (~c.sc) & (reduced < c.spc)
        spc1 = jnp.where(better, reduced, c.spc)
        path1 = jnp.where(better, i, c.path)

        # Pop: stop candidates are unscanned columns that are free or owned
        # by another group (relaxing a same-group owner is a no-op, see the
        # docstring). All same-group-owned columns at distance <= the stop
        # distance are popped in this same iteration — exactly the set a
        # sequential Dijkstra would pop before stopping (ties at the stop
        # distance scan with zero u/v effect).
        assigned = c.row4col >= 0
        own_grp = row_group[jnp.clip(c.row4col, 0, num_rows - 1)]
        same = assigned & (own_grp == row_group[c.cur_row])
        unscanned = ~c.sc
        stop_ok = unscanned & ~same
        lowest = jnp.min(jnp.where(stop_ok, spc1, _INF))
        at_min = stop_ok & (spc1 == lowest)
        at_min_free = at_min & ~assigned
        any_free = jnp.any(at_min_free)
        j = jnp.where(any_free, jnp.argmax(at_min_free), jnp.argmax(at_min))
        popped = unscanned & same & (spc1 <= lowest)
        sc1 = (c.sc | popped).at[j].set(True)
        col_free = c.row4col[j] < 0
        found = is_dij & col_free
        i_next = jnp.where(col_free, i, c.row4col[j])
        # popped owners count as scanned rows for the dual update (their
        # matched-column distances sit in spc1, as in the sequential order);
        # one-hot contraction instead of a scatter
        sr1 = sr1 | jnp.any(
            popped[None, :] & (c.row4col[None, :] == ridx[:, None]), axis=1
        )

        # ---- dual update (Crouse 2016, as in scipy's _lsap), on `found` ----
        u1 = c.u.at[c.cur_row].add(lowest)
        other_sr = sr1 & (ridx != c.cur_row)
        spc_at_c4r = spc1[jnp.clip(c.col4row, 0, num_cols - 1)]
        u1 = u1 + jnp.where(other_sr, lowest - spc_at_c4r, 0.0)
        v1 = c.v - jnp.where(sc1, lowest - spc1, 0.0)
        u2 = jnp.where(found, u1, c.u)
        v2 = jnp.where(found, v1, c.v)

        # ---- commit the Dijkstra state only on Dijkstra iterations ----
        spc2 = jnp.where(is_dij, spc1, c.spc)
        path2 = jnp.where(is_dij, path1, c.path)
        sc2 = jnp.where(is_dij, sc1, c.sc)
        sr2 = jnp.where(is_dij, sr1, c.sr)
        min_val2 = jnp.where(is_dij, lowest, c.min_val)
        i2 = jnp.where(is_dij, i_next, c.i)

        # ---- one backtrack step: inline right after `found`, or continuing.
        # A broken path entry (-1) terminates the row instead of cycling
        # (non-finite-cost regression; see _augment_row's backtrack note).
        do_bt = found | c.in_backtrack
        j0 = jnp.where(c.in_backtrack, c.bt_j, j)
        bi = path2[j0]  # predecessor row, -1 if broken
        r4c1 = jnp.where(do_bt, c.row4col.at[j0].set(bi), c.row4col)
        bi_safe = jnp.maximum(bi, 0)
        j_next = c.col4row[bi_safe]
        c4r_new = c.col4row.at[bi_safe].set(
            jnp.where(bi < 0, c.col4row[0], j0)
        )
        c4r1 = jnp.where(do_bt, c4r_new, c.col4row)
        bt_term = (bi == c.cur_row) | (bi < 0)

        advance = do_bt & bt_term
        in_bt_next = do_bt & ~bt_term
        bt_j_next = jnp.where(in_bt_next, j_next, 0)

        cur_row_next = jnp.where(
            advance,
            next_active[jnp.clip(c.cur_row + 1, 0, num_rows)],
            c.cur_row,
        )

        # ---- reset the Dijkstra state when advancing to the next row ----
        return _Carry(
            cur_row=cur_row_next,
            in_backtrack=in_bt_next,
            u=u2,
            v=v2,
            row4col=r4c1,
            col4row=c4r1,
            i=jnp.where(advance, cur_row_next, i2),
            min_val=jnp.where(advance, 0.0, min_val2),
            spc=jnp.where(advance, inf_cols, spc2),
            path=jnp.where(advance, neg1_cols, path2),
            sc=jnp.where(advance, false_cols, sc2),
            sr=jnp.where(advance, false_rows, sr2),
            bt_j=bt_j_next,
        )

    def unrolled_body(c: _Carry) -> _Carry:
        out = body(c)
        for _ in range(_UNROLL - 1):
            done = out.cur_row >= num_rows
            nxt = body(out)
            out = jax.tree.map(
                lambda a, b: jnp.where(done, a, b), out, nxt
            )
        return out

    final = jax.lax.while_loop(cond, unrolled_body, init)
    return jnp.where(row_mask, final.col4row, -1)
