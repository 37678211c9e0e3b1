"""Linear sum assignment, jittable.

The reference ships the matching to the host: costs are moved to CPU and
scipy's `linear_sum_assignment` runs per image
(reference: src/models/matcher.py:71-74). On TPU that round-trip would stall
the step pipeline, so the default here is a Jonker-Volgenant shortest
augmenting path solver expressed with `lax.while_loop` — it runs on-device,
vmaps over the batch, and returns bit-identical assignments (cost-optimal;
ties may resolve differently, which leaves the loss unchanged).

A `pure_callback`-to-scipy variant is kept for cross-checking and for hosts
without a device budget for the serial loop. NOTE: the axon TPU backend
does not implement host send/recv callbacks (pure_callback raises
UNIMPLEMENTED there), so `backend="scipy"` is a CPU-only path; on TPU the
JV solver is the only option.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e30


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost perfect matching on a square cost matrix.

    Args:
      cost: (n, n) float matrix. Must be finite.
    Returns:
      col4row: (n,) int32 — col4row[i] is the column assigned to row i.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    arange = jnp.arange(n, dtype=jnp.int32)

    def outer(cur_row, state):
        u, v, col4row, row4col = state

        # --- Dijkstra over columns for the shortest augmenting path ---
        def dij_cond(s):
            return s[6] < 0

        def dij_body(s):
            i, minval, SR, SC, spc, path, _sink = s
            SR = SR.at[i].set(True)
            r = minval + cost[i] - u[i] - v
            upd = (r < spc) & (~SC)
            path = jnp.where(upd, i, path)
            spc = jnp.where(upd, r, spc)
            masked = jnp.where(SC, _INF, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            minval = masked[j]
            SC = SC.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt < 0, j, jnp.int32(-1))
            i = jnp.where(nxt < 0, i, nxt)
            return (i, minval, SR, SC, spc, path, sink)

        init = (
            jnp.int32(cur_row),
            jnp.float32(0.0),
            jnp.zeros((n,), jnp.bool_),
            jnp.zeros((n,), jnp.bool_),
            jnp.full((n,), _INF, jnp.float32),
            jnp.zeros((n,), jnp.int32),
            jnp.int32(-1),
        )
        _, minval, SR, SC, spc, path, sink = jax.lax.while_loop(
            dij_cond, dij_body, init)

        # --- dual updates (scipy rectangular_lsap.cpp semantics) ---
        u = u.at[cur_row].add(minval)
        others = SR & (arange != cur_row)
        spc_at_col4row = spc[jnp.clip(col4row, 0, n - 1)]
        u = jnp.where(others, u + minval - spc_at_col4row, u)
        v = jnp.where(SC, v - (minval - spc), v)

        # --- augment along the alternating path ---
        def aug_cond(s):
            return ~s[3]

        def aug_body(s):
            j, c4r, r4c, _ = s
            i = path[j]
            r4c = r4c.at[j].set(i)
            tmp = c4r[i]
            c4r = c4r.at[i].set(j)
            return (tmp, c4r, r4c, i == cur_row)

        _, col4row, row4col, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, col4row, row4col, False))
        return (u, v, col4row, row4col)

    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    c0 = jnp.full((n,), -1, jnp.int32)
    r0 = jnp.full((n,), -1, jnp.int32)
    _, _, col4row, _ = jax.lax.fori_loop(0, n, outer, (u0, v0, c0, r0))
    return col4row


def hungarian_rect(cost: jnp.ndarray, n_rows: jnp.ndarray) -> jnp.ndarray:
    """Rectangular JV: assign the first `n_rows` rows of a (T, Q) cost
    matrix (T <= Q) to distinct columns, minimizing total cost — scipy's
    rectangular `linear_sum_assignment(cost[:n_rows])` semantics
    (rectangular_lsap.cpp augments once per row of the smaller side).

    Rows t >= n_rows are skipped via a gated while-loop condition, so the
    sequential work is O(n_rows * path_len) instead of the square solver's
    O(Q * path_len) — the DETR matcher only has `n_valid` real targets
    (typically 4-30) against Q=100 queries, a ~10-25x cut in the serial
    augmenting-path iterations that dominate the train step on TPU.

    Returns col4row: (T,) int32; col4row[t] is the assigned column for
    t < n_rows, -1 for skipped rows.
    """
    T, Q = cost.shape
    cost = cost.astype(jnp.float32)
    arange_t = jnp.arange(T, dtype=jnp.int32)

    def outer(cur_row, state):
        u, v, col4row, row4col = state
        do = cur_row < n_rows

        def dij_cond(s):
            return do & (s[6] < 0)

        def dij_body(s):
            i, minval, SR, SC, spc, path, _sink = s
            SR = SR.at[i].set(True)
            r = minval + cost[i] - u[i] - v
            upd = (r < spc) & (~SC)
            path = jnp.where(upd, i, path)
            spc = jnp.where(upd, r, spc)
            masked = jnp.where(SC, _INF, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            minval = masked[j]
            SC = SC.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt < 0, j, jnp.int32(-1))
            i = jnp.where(nxt < 0, i, nxt)
            return (i, minval, SR, SC, spc, path, sink)

        init = (
            jnp.int32(cur_row),
            jnp.float32(0.0),
            jnp.zeros((T,), jnp.bool_),
            jnp.zeros((Q,), jnp.bool_),
            jnp.full((Q,), _INF, jnp.float32),
            jnp.zeros((Q,), jnp.int32),
            jnp.int32(-1),
        )
        _, minval, SR, SC, spc, path, sink = jax.lax.while_loop(
            dij_cond, dij_body, init)

        # dual updates (scipy rectangular_lsap.cpp semantics)
        u2 = u.at[cur_row].add(minval)
        others = SR & (arange_t != cur_row)
        spc_at_col4row = spc[jnp.clip(col4row, 0, Q - 1)]
        u2 = jnp.where(others, u2 + minval - spc_at_col4row, u2)
        v2 = jnp.where(SC, v - (minval - spc), v)

        def aug_cond(s):
            return do & (~s[3])

        def aug_body(s):
            j, c4r, r4c, _ = s
            i = path[j]
            r4c = r4c.at[j].set(i)
            tmp = c4r[i]
            c4r = c4r.at[i].set(j)
            return (tmp, c4r, r4c, i == cur_row)

        _, c4r2, r4c2, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, col4row, row4col, False))

        new_state = (u2, v2, c4r2, r4c2)
        return jax.tree.map(lambda a, b: jnp.where(do, a, b),
                            new_state, state)

    u0 = jnp.zeros((T,), jnp.float32)
    v0 = jnp.zeros((Q,), jnp.float32)
    c0 = jnp.full((T,), -1, jnp.int32)
    r0 = jnp.full((Q,), -1, jnp.int32)
    _, _, col4row, _ = jax.lax.fori_loop(0, T, outer, (u0, v0, c0, r0))
    return col4row


def hungarian_scipy(cost: jnp.ndarray) -> jnp.ndarray:
    """Host fallback via scipy (square matrix), same output convention."""
    n = cost.shape[0]

    def _solve(c):
        from scipy.optimize import linear_sum_assignment
        rows, cols = linear_sum_assignment(np.asarray(c, dtype=np.float64))
        out = np.full((n,), -1, dtype=np.int32)
        out[rows] = cols.astype(np.int32)
        return out

    return jax.pure_callback(
        _solve, jax.ShapeDtypeStruct((n,), jnp.int32), cost, vmap_method="sequential")


def match_lines(cost: jnp.ndarray, n_valid: jnp.ndarray,
                backend: str = "jax") -> jnp.ndarray:
    """DETR-style rectangular matching with padded targets.

    Args:
      cost: (Q, T) cost of assigning query q to target slot t; entries for
        t >= n_valid are ignored.
      n_valid: scalar int, number of real targets (<= T <= Q).
      backend: "jax" | "scipy".
    Returns:
      tgt2query: (T,) int32 — for each target slot, the matched query index
        (well-defined for slots < n_valid; arbitrary but in-range otherwise).

    The jax backend solves the RECTANGULAR problem directly
    (`hungarian_rect` augments only the n_valid real targets — exactly
    scipy's `linear_sum_assignment` on cost[:, :n_valid]); the scipy
    backend embeds into a square matrix whose constant-cost padding
    columns add a constant to every perfect matching and therefore leave
    the real columns' optimal assignment identical
    (reference: src/models/matcher.py:74).

    The assignment is a non-differentiable decision; gradients are blocked
    here exactly like the reference's @torch.no_grad matcher
    (reference: src/models/matcher.py:28-29) — required for the scipy
    pure_callback backend and a no-op for the integer outputs otherwise.
    """
    cost = jax.lax.stop_gradient(cost)
    Q, T = cost.shape
    tcols = jnp.arange(T)
    valid = tcols < n_valid
    if backend == "jax":
        cost_tq = jnp.where(valid[:, None], cost.T, 0.0)   # (T, Q)
        col4row = hungarian_rect(cost_tq, n_valid)          # target -> query
        return jnp.clip(col4row, 0, Q - 1)
    sq = jnp.zeros((Q, Q), jnp.float32)
    sq = sq.at[:, :T].set(jnp.where(valid[None, :], cost, 0.0))
    col4row = hungarian_scipy(sq)  # (Q,) row -> col
    # invert: for each target col t < T, the row assigned to it
    row4col = jnp.zeros((Q,), jnp.int32)
    row4col = row4col.at[col4row].set(jnp.arange(Q, dtype=jnp.int32))
    return row4col[:T]
