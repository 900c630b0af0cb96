"""Joint-action-space size: the BranchingFactorCalculator family.

Re-design of ai/BranchingFactorCalculator{Long,Double,BigInteger}.java and
the counting side of rts/PlayerActionGenerator (ctor :56-106 computes the
product of per-unit choice-list sizes): per-unit action counts come from
the legality masks in one pass, and the joint size is their product —
returned in the reference's three numeric flavors (exact python int =
BigInteger, float = Double, and log10 for display).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.types import State


def per_unit_action_counts(env, state: State, player) -> jax.Array:
    """int32 [H, W]: number of legal actions per own idle unit (0 at cells
    without one).  Mirrors Unit.getUnitActions list length (moves +
    harvests + returns + produce (dir,type) pairs + attacks + the always-
    present NONE, Unit.java:368-522)."""
    m = env.engine.legal_masks(state, player)
    count = (jnp.sum(m["move"].astype(jnp.int32), -1)
             + jnp.sum(m["harvest"].astype(jnp.int32), -1)
             + jnp.sum(m["ret"].astype(jnp.int32), -1)
             + jnp.sum(jnp.sum(m["produce_pair"].astype(jnp.int32), -1), -1)
             + jnp.sum(m["attack"].astype(jnp.int32), -1)
             + 1)  # NONE
    return jnp.where(m["can_act"], count, 0)


def branching_factor(env, state: State, player) -> Tuple[int, float, float]:
    """(exact int, float, log10) joint-action count for one player —
    the BigInteger / Double / display flavors of the reference."""
    counts = np.asarray(per_unit_action_counts(env, state, player))
    counts = counts[counts > 0]
    exact = 1
    for c in counts:
        exact *= int(c)
    log10 = float(np.sum(np.log10(counts))) if counts.size else 0.0
    return exact, float(exact) if exact < 1e308 else math.inf, log10
