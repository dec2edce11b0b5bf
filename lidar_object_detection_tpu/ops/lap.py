"""Serving-speed exact assignment: fixed-trip shortest-augmenting-path.

The row-sequential SAP in :mod:`.hungarian` is exact but pays TPU's
price for *dynamic* control flow: two nested ``while_loop``s whose trip
counts XLA cannot see (~40 s compile, ~0.6 s/frame at 32 x 384 -- each
tiny-bodied iteration costs step-dispatch latency, and ``vmap`` over
frames runs worst-case trips anyway).

This solver is the same algorithm with a structural observation that
bounds every loop statically: a Dijkstra phase stops at the first
*unassigned* column it scans, and scanned columns are distinct with all
but the last assigned -- so phase ``k`` (0-based, ``k`` rows already
assigned) scans at most ``k + 1`` columns, never ``C``.  Likewise the
augmenting path alternates distinct assigned rows, so it has at most
``k + 1`` edges.  Every loop becomes a fixed-trip ``lax.scan`` with a
``done`` mask -- fully static control flow, one compiled loop nest of
dense (C,)-wide vector work.  Total inner steps: ``R * (R + 3) / 2``
(~560 for 32 x 384) regardless of the column count.

Exactness is unchanged (same pops, same dual updates, masking only
freezes finished phases), so the scipy-parity contract of
:func:`~.hungarian.hungarian` carries over verbatim; tests compare both
against scipy.  ``solve_fn`` compiles in seconds and runs ~milliseconds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_COST = 1.0e6


def lap(cost, row_mask=None, col_mask=None):
    """Exact min-cost assignment, (R, C) with R <= C; fixed-trip loops.

    Drop-in for :func:`~.hungarian.hungarian` (same padding semantics:
    masked rows/cols get a large uniform cost and never displace a real
    pair).  Returns col4row: (R,) int32.
    """
    r, c = cost.shape
    if r > c:
        raise ValueError(f"assignment needs rows <= cols, got {r}x{c}; "
                         "pad the column axis")
    cost = cost.astype(jnp.float32)
    if row_mask is not None:
        cost = jnp.where(row_mask[:, None], cost, PAD_COST)
    if col_mask is not None:
        cost = jnp.where(col_mask[None, :], cost, PAD_COST)

    inf = jnp.float32(jnp.inf)
    cols = jnp.arange(c, dtype=jnp.int32)
    rows = jnp.arange(r, dtype=jnp.int32)

    def solve_row(carry, cur_row):
        u, v, row4col, col4row = carry
        # phase cur_row scans at most cur_row + 1 columns; the static
        # bound over the scan below is r, frozen by `done` once the sink
        # is found.

        def dijkstra_step(st, _):
            sink, i, min_val, spc, path, sr, sc, done = st
            sr = sr | (rows == i) & ~done
            cand = min_val + cost[i] - u[i] - v              # (C,)
            better = (cand < spc) & (~sc) & (~done)
            spc = jnp.where(better, cand, spc)
            path = jnp.where(better, i, path)
            masked = jnp.where(sc, inf, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            new_min = masked[j]
            hit = cols == j
            sc = sc | (hit & ~done)
            unassigned = row4col[j] < 0
            new_sink = jnp.where(unassigned, j, jnp.int32(-1))
            new_i = jnp.where(unassigned, i, row4col[j])
            sink = jnp.where(done, sink, new_sink)
            i = jnp.where(done, i, new_i)
            min_val = jnp.where(done, min_val, new_min)
            done = done | unassigned
            return (sink, i, min_val, spc, path, sr, sc, done), None

        init = (jnp.int32(-1), cur_row, jnp.float32(0.0),
                jnp.full((c,), inf), jnp.full((c,), -1, jnp.int32),
                jnp.zeros((r,), bool), jnp.zeros((c,), bool),
                jnp.bool_(False))
        (sink, _, min_val, spc, path, sr, sc, _), _ = jax.lax.scan(
            dijkstra_step, init, None, length=r)

        # --- dual updates (identical to the while_loop solver) ---
        u = u.at[cur_row].add(min_val)
        other_rows = sr & (rows != cur_row)
        u = jnp.where(other_rows,
                      u + min_val - spc[jnp.clip(col4row, 0, c - 1)], u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # --- augment: walk path back to cur_row, at most r edges ---
        def aug_step(st, _):
            done, j, row4col, col4row = st
            i = path[j]
            row4col = jnp.where(done, row4col,
                                jnp.where(cols == j, i, row4col))
            next_j = col4row[i]
            col4row = jnp.where(done, col4row,
                                jnp.where(rows == i, j, col4row))
            done = done | (i == cur_row)
            j = jnp.where(done, j, next_j)
            return (done, j, row4col, col4row), None

        (_, _, row4col, col4row), _ = jax.lax.scan(
            aug_step, (jnp.bool_(False), sink, row4col, col4row), None,
            length=r)
        return (u, v, row4col, col4row), None

    u0 = jnp.zeros((r,), jnp.float32)
    v0 = jnp.zeros((c,), jnp.float32)
    row4col0 = jnp.full((c,), -1, jnp.int32)
    col4row0 = jnp.full((r,), -1, jnp.int32)
    (_, _, _, col4row), _ = jax.lax.scan(
        solve_row, (u0, v0, row4col0, col4row0), rows)
    return col4row
