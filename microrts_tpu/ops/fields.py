"""Grid field ops: vectorized BFS distance fields.

TPU-native replacement for the reference's sequential pathfinders
(ai/abstraction/pathfinding/AStarPathFinding.java:26-90 and friends): a
multi-source BFS computed by bounded iterated relaxation — K rounds of
4-neighbor min-plus — which jits, vmaps, and fuses, unlike open-list A*.
Rush-bot movement follows the descending-distance direction with the
reference A*'s tie order (down, left, up, right; AStarPathFinding.java:73-76).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.kernel import pull
from ..engine.types import INF

# tie order: down, left, up, right (AStarPathFinding.java:73-76)
TIE_ORDER = (2, 3, 0, 1)


def distance_field(sources: jax.Array, passable: jax.Array,
                   iters: int) -> jax.Array:
    """int32 [H, W] shortest 4-neighbor path length to the nearest source.

    ``sources`` cells have distance 0 (they need not be passable — e.g. the
    target unit's own cell); all other cells must route through ``passable``
    cells.  Unreachable cells = INF.
    """
    d0 = jnp.where(sources, 0, INF).astype(jnp.int32)

    def body(_, d):
        best = d
        for k in range(4):
            best = jnp.minimum(best, pull(d, k, fill=INF - 1) + 1)
        return jnp.where(sources, 0, jnp.where(passable, best, INF))

    return jax.lax.fori_loop(0, iters, body, d0)


def distance_field2(sources: jax.Array, passable: jax.Array,
                    iters: int):
    """Two-nearest-DISTINCT-source BFS: per cell, the distances and flat
    source positions of the nearest source and the nearest source at a
    *different* position.  Enables dense "closest OTHER ally" routing
    (ai/abstraction/MoveToUnitBasic semantics: a unit must not treat its
    own cell as the target) without per-unit fields: a source cell's
    first entry is itself (d=0) and its second entry is the closest
    other source.

    Returns ``(d1, i1, d2, i2)``: int32 [H, W] each; ``i*`` are flat
    row-major positions, -1 where no such source; unreachable = INF.
    """
    H, W = sources.shape
    flat = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W \
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    d1 = jnp.where(sources, 0, INF).astype(jnp.int32)
    i1 = jnp.where(sources, flat, -1)
    d2 = jnp.full((H, W), INF, jnp.int32)
    i2 = jnp.full((H, W), -1, jnp.int32)

    def insert(st, dc, ic):
        """Merge candidate (dc, ic) into the best-two-distinct struct."""
        d1, i1, d2, i2 = st
        valid = ic >= 0
        same1 = (ic == i1) & valid
        beats1 = (dc < d1) & valid
        case_b = ~same1 & beats1          # new first, old first -> second
        case_c = ~same1 & ~beats1 & valid  # competes for second
        # ic == i2 and ic != i2 collapse to the same update here
        d2c = jnp.minimum(d2, dc)
        i2c = jnp.where(dc < d2, ic, i2)
        nd1 = jnp.where(same1, jnp.minimum(d1, dc),
                        jnp.where(case_b, dc, d1))
        ni1 = jnp.where(case_b, ic, i1)
        nd2 = jnp.where(case_b, d1, jnp.where(case_c, d2c, d2))
        ni2 = jnp.where(case_b, i1, jnp.where(case_c, i2c, i2))
        return nd1, ni1, nd2, ni2

    def body(_, st):
        out = st
        for k in range(4):
            nd1 = pull(st[0], k, fill=INF - 1) + 1
            ni1 = pull(st[1], k, fill=-1)
            nd2 = pull(st[2], k, fill=INF - 1) + 1
            ni2 = pull(st[3], k, fill=-1)
            out = insert(out, nd1, ni1)
            out = insert(out, nd2, ni2)
        d1n, i1n, d2n, i2n = out
        ok = sources | passable
        d1n = jnp.where(ok, d1n, INF)
        i1n = jnp.where(ok, i1n, -1)
        d2n = jnp.where(ok, d2n, INF)
        i2n = jnp.where(ok, i2n, -1)
        # source cells pin their own first entry
        d1n = jnp.where(sources, 0, d1n)
        i1n = jnp.where(sources, flat, i1n)
        return d1n, i1n, d2n, i2n

    return jax.lax.fori_loop(0, iters, body, (d1, i1, d2, i2))


def descend_direction_excluding(st, movable, self_id: jax.Array
                                ) -> jax.Array:
    """Direction toward the nearest source whose id differs from
    ``self_id`` (per-cell flat id, e.g. the acting unit's own position),
    -1 if none improves.  ``st`` is ``distance_field2`` output."""
    d1, i1, d2, _ = st

    def val(d1v, i1v, d2v):
        return jnp.where(i1v != self_id, d1v, d2v)

    best_d = jnp.full(d1.shape, -1, jnp.int32)
    best_v = val(d1, i1, d2)
    for k in TIE_ORDER:
        v = val(pull(d1, k, fill=INF),
                pull(i1, k, fill=-1),
                pull(d2, k, fill=INF))
        ok = movable[..., k] & (v < best_v)
        best_d = jnp.where(ok, k, best_d)
        best_v = jnp.where(ok, v, best_v)
    return best_d


def descend_direction(dist: jax.Array, movable: jax.Array) -> jax.Array:
    """For each cell: direction of the strictly-smaller-distance neighbor
    (tie order down/left/up/right), -1 if none.  ``movable[d]`` gates which
    neighbor cells can actually be stepped into."""
    best_d = jnp.full(dist.shape, -1, jnp.int32)
    best_v = dist  # must strictly improve
    for k in TIE_ORDER:
        v = pull(dist, k, fill=INF)
        ok = movable[..., k] & (v < best_v)
        best_d = jnp.where(ok, k, best_d)
        best_v = jnp.where(ok, v, best_v)
    return best_d
