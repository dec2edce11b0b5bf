"""Exact Hungarian assignment, jit-compiled, fixed shape, rectangular.

The reference calls ``scipy.optimize.linear_sum_assignment`` on a ragged
(detections x boxes) cost matrix (V5_ProjectingBBoxes.py:360), a C boundary
in the middle of the pipeline.  Problem sizes are small and lopsided
(<= 32 detections x <= 384 boxes), so this is the rectangular
shortest-augmenting-path algorithm (the same family as scipy's): one
Dijkstra augmentation per ROW, i.e. at most 32 sequential ``while_loop``
phases regardless of the box count -- the shape that matters on TPU, where
sequential loop iterations dominate latency, not the vectorized
column-wide updates inside them.

Invalid rows/columns are handled by padding with a large uniform cost:
padded pairs never displace a feasible real pair, so the restriction of the
solution to real rows and columns equals scipy's assignment on the
compacted matrix (up to exact-cost ties, which may resolve to a different
equally-optimal permutation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_COST = 1.0e6


def hungarian(cost, row_mask=None, col_mask=None):
    """Solve the min-cost assignment on an (R, C) cost matrix, R <= C.

    Args:
      cost: (R, C) finite float costs.  Every row gets a distinct column
        (possible since R <= C).
      row_mask: optional (R,) bool; invalid rows get ``PAD_COST`` everywhere.
      col_mask: optional (C,) bool; invalid cols get ``PAD_COST`` everywhere.

    Returns:
      col4row: (R,) int32 column assigned to each row.  Callers filter
      padded pairs via their own masks/thresholds.
    """
    r, c = cost.shape
    if r > c:
        raise ValueError(f"hungarian needs rows <= cols, got {r}x{c}; "
                         "pad the column axis")
    cost = cost.astype(jnp.float32)
    if row_mask is not None:
        cost = jnp.where(row_mask[:, None], cost, PAD_COST)
    if col_mask is not None:
        cost = jnp.where(col_mask[None, :], cost, PAD_COST)

    inf = jnp.float32(jnp.inf)

    def solve_row(carry, cur_row):
        u, v, row4col, col4row = carry

        # --- Dijkstra over columns from cur_row (shortest augmenting path) ---
        def dijkstra_cond(state):
            sink = state[0]
            return sink < 0

        def dijkstra_body(state):
            sink, i, min_val, spc, path, sr, sc = state
            sr = sr.at[i].set(True)
            cand = min_val + cost[i] - u[i] - v            # (C,)
            better = (cand < spc) & (~sc)
            spc = jnp.where(better, cand, spc)
            path = jnp.where(better, i, path)
            masked = jnp.where(sc, inf, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            unassigned = row4col[j] < 0
            sink = jnp.where(unassigned, j, jnp.int32(-1))
            i = jnp.where(unassigned, i, row4col[j])
            return (sink, i, min_val, spc, path, sr, sc)

        init = (jnp.int32(-1), cur_row, jnp.float32(0.0),
                jnp.full((c,), inf), jnp.full((c,), -1, jnp.int32),
                jnp.zeros((r,), bool), jnp.zeros((c,), bool))
        sink, _, min_val, spc, path, sr, sc = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, init)

        # --- dual updates ---
        u = u.at[cur_row].add(min_val)
        other_rows = sr & (jnp.arange(r) != cur_row)
        # col4row[i] is valid for every assigned row i in SR (other than cur).
        u = jnp.where(other_rows,
                      u + min_val - spc[jnp.clip(col4row, 0, c - 1)], u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # --- augment along the alternating path back to cur_row ---
        def aug_cond(state):
            done = state[0]
            return ~done

        def aug_body(state):
            _, j, row4col, col4row = state
            i = path[j]
            row4col = row4col.at[j].set(i)
            next_j = col4row[i]
            col4row = col4row.at[i].set(j)
            return (i == cur_row, next_j, row4col, col4row)

        _, _, row4col, col4row = jax.lax.while_loop(
            aug_cond, aug_body, (jnp.bool_(False), sink, row4col, col4row))

        return (u, v, row4col, col4row), None

    u0 = jnp.zeros((r,), jnp.float32)
    v0 = jnp.zeros((c,), jnp.float32)
    row4col0 = jnp.full((c,), -1, jnp.int32)
    col4row0 = jnp.full((r,), -1, jnp.int32)
    (_, _, _, col4row), _ = jax.lax.scan(
        solve_row, (u0, v0, row4col0, col4row0),
        jnp.arange(r, dtype=jnp.int32))
    return col4row
