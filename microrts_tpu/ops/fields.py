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
