"""Dense per-cell unit-action ("arm") catalog.

The reference's search algorithms factor a PlayerAction into per-unit
UnitAction choices (``PlayerActionGenerator.getChoices``,
rts/PlayerActionGenerator.java:69-105; ``Unit.getUnitActions``,
rts/units/Unit.java:368-522): each unit carries a *list* of its legal
actions and search statistics index into that list
(``UnitActionTableEntry``, ai/mcts/naivemcts/UnitActionTableEntry.java).

TPU re-design: variable-length per-unit lists become one FIXED catalog of
every expressible unit action — the "arm space" — so per-unit statistics
are a dense ``[H, W, A]`` table, legality is a ``[H, W, A]`` bool mask
derived from the engine's legal_masks, and sampling is one masked
categorical per cell.  No dynamic shapes, no gathers.

Catalog layout (A = 13 + 4*T + D*D arms):

====================  =========================================
arm index             unit action
====================  =========================================
0                     NONE
1 + d                 MOVE     dir d            (d in 0..3)
5 + d                 HARVEST  dir d
9 + d                 RETURN   dir d
13 + d*T + t          PRODUCE  dir d, type t    (t in 0..T-1)
13 + 4T + r           ATTACK   rel-window pos r (r in 0..D*D-1)
====================  =========================================
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..engine.types import ATTACK, HARVEST, MOVE, NONE, PRODUCE, RETURN


@dataclasses.dataclass(frozen=True)
class ArmSpace:
    """Static shape of the arm catalog for a (UTT, max_range) config."""
    num_types: int   # T
    diam: int        # D = 2 * max_range + 1

    @property
    def n_arms(self) -> int:
        return 13 + 4 * self.num_types + self.diam * self.diam

    @property
    def attack_base(self) -> int:
        return 13 + 4 * self.num_types


def arm_space(env) -> ArmSpace:
    ecfg = env.cfg.engine
    return ArmSpace(ecfg.num_types, 2 * ecfg.max_range + 1)


def arm_masks(sp: ArmSpace, m) -> jax.Array:
    """Legality per arm, bool [H, W, A], from ``Engine.legal_masks`` output.

    NONE is legal for any unit that can act (Unit.getUnitActions always
    appends a NONE, Unit.java:516-521); everything else ANDs the per-type
    gate with the per-parameter gate.  ``produce_pair`` is already the
    joint (dir, type) legality, matching Java's explicit (dir, type) loop.
    """
    T = sp.num_types
    can = m["can_act"][..., None]
    parts = [
        m["can_act"][..., None],                       # NONE
        m["move"].astype(bool) & can,                  # 4
        m["harvest"].astype(bool) & can,               # 4
        m["ret"].astype(bool) & can,                   # 4
        (m["produce_pair"].astype(bool) & can[..., None])
        .reshape(*m["can_act"].shape, 4 * T),          # 4*T (d-major)
        m["attack"].astype(bool) & can,                # D*D
    ]
    return jnp.concatenate(parts, axis=-1)


def arms_to_action(sp: ArmSpace, arms: jax.Array) -> jax.Array:
    """Decode an arm-index plane int32 [H, W] (−1 / 0 = no-op) into the
    gridnet action tensor int32 [H, W, 7] the env decode consumes."""
    T = sp.num_types
    ab = sp.attack_base
    a = jnp.maximum(arms, 0)
    at = jnp.select(
        [a == 0, a < 5, a < 9, a < 13, a < ab],
        [NONE, MOVE, HARVEST, RETURN, PRODUCE],
        default=ATTACK)
    pj = jnp.clip(a - 13, 0, 4 * T - 1)
    comp = jnp.stack([
        at,
        jnp.clip(a - 1, 0, 3),    # move dir
        jnp.clip(a - 5, 0, 3),    # harvest dir
        jnp.clip(a - 9, 0, 3),    # return dir
        pj // T,                  # produce dir
        pj % T,                   # produce type
        jnp.clip(a - ab, 0, sp.diam * sp.diam - 1),
    ], axis=-1).astype(jnp.int32)
    return jnp.where((arms > 0)[..., None], comp, 0)


def action_to_arms(sp: ArmSpace, action: jax.Array,
                   acting: jax.Array) -> jax.Array:
    """Inverse of ``arms_to_action``: gridnet [H, W, 7] -> arm plane
    int32 [H, W] (−1 where ``acting`` is False)."""
    T = sp.num_types
    at = action[..., 0]
    arm = jnp.select(
        [at == MOVE, at == HARVEST, at == RETURN, at == PRODUCE,
         at == ATTACK],
        [1 + action[..., 1], 5 + action[..., 2], 9 + action[..., 3],
         13 + action[..., 4] * T + action[..., 5],
         sp.attack_base + action[..., 6]],
        default=0)
    return jnp.where(acting, arm, -1).astype(jnp.int32)


def sample_arms(sp: ArmSpace, key: jax.Array, probs: jax.Array,
                acting: jax.Array) -> jax.Array:
    """One categorical draw per cell over [H, W, A] weights; cells outside
    ``acting`` return −1.  Weights need not be normalized; all-zero rows
    fall back to uniform (cannot happen for a legal acting cell, where
    NONE always carries mass)."""
    w = jnp.where(jnp.any(probs > 0, -1, keepdims=True),
                  probs, jnp.ones_like(probs))
    arm = jax.random.categorical(key, jnp.log(w + 1e-20), axis=-1)
    return jnp.where(acting, arm, -1).astype(jnp.int32)


def one_hot_arms(sp: ArmSpace, arms: jax.Array) -> jax.Array:
    """bool [H, W, A] one-hot of an arm plane (−1 rows all-False).
    Built from an iota compare — a dense op, not a scatter."""
    ar = jax.lax.broadcasted_iota(jnp.int32, arms.shape + (sp.n_arms,),
                                  arms.ndim)
    return ar == arms[..., None]
