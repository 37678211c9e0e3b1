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
JV solver is the only option. The JV while_loop trip count is
data-dependent — ~20 ms/step slower on structured scenes than on random
targets at reference sizes (batch 1, Q=100).
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

    Padding columns are given a constant cost, which adds a constant to every
    perfect matching and therefore leaves the real columns' optimal
    assignment identical to scipy's rectangular solve
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
    sq = jnp.zeros((Q, Q), jnp.float32)
    sq = sq.at[:, :T].set(jnp.where(valid[None, :], cost, 0.0))
    solver = hungarian if backend == "jax" else hungarian_scipy
    col4row = solver(sq)  # (Q,) row -> col
    # invert: for each target col t < T, the row assigned to it
    row4col = jnp.zeros((Q,), jnp.int32)
    row4col = row4col.at[col4row].set(jnp.arange(Q, dtype=jnp.int32))
    return row4col[:T]
